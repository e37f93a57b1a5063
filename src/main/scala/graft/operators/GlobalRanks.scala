package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking without a single-task window.
  *
  * `Window.orderBy` with no partition funnels every row through one
  * task (round-1 ADVICE flagged exactly this in q16). The scalable
  * pattern: range-partition by the sort key, compute per-partition
  * counts, broadcast the tiny offset array, then assign ranks locally
  * inside each partition. Total shuffle = one range exchange; driver
  * traffic = numPartitions longs.
  */
object GlobalRanks {

  /** Per-value average ranks (the tie semantics Spearman needs):
    * avgRank(v) = minRank(v) + (count(v) - 1) / 2.
    *
    * Implementation: one hash agg to (value, count), then a range
    * exchange over the distinct values; per-partition local cumsum plus
    * a broadcast offset vector gives minRank. Output: (value, avg_rank).
    */
  def averageRanks(df: DataFrame, valueCol: String, partitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
      .repartitionByRange(partitions, col("v"))
      .sortWithinPartitions(col("v"))
      .as[(Double, Long)]

    // tiny job: per-partition total counts → exclusive prefix offsets
    val perPart = counts.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator.single(i -> s)
      }.collect().sortBy(_._1).map(_._2)
    val offsets = perPart.scanLeft(0L)(_ + _) // offsets(i) = rows before partition i

    counts.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var before = offsets(i)
        it.map { case (v, c) =>
          val avg = before + 1 + (c - 1) / 2.0 // ranks are 1-based
          before += c
          (v, avg)
        }
      }
      .toDF("v", "avg_rank")
  }

  /** Spearman rank correlation of two numeric columns — Pearson on
    * average ranks (reference computes it pandas-side on a sample,
    * wlg/profiler/stats.py:283-310; this version is exact and
    * distributed). Two hash joins against the small rank tables.
    */
  def spearman(df: DataFrame, c1: String, c2: String): Double = {
    val r1 = averageRanks(df, c1).withColumnRenamed("avg_rank", "r1")
    val r2 = averageRanks(df, c2).withColumnRenamed("avg_rank", "r2")
    val joined = df
      .select(col(c1).cast("double").as("v1"), col(c2).cast("double").as("v2"))
      .filter(col("v1").isNotNull && col("v2").isNotNull)
      .join(r1.withColumnRenamed("v", "v1"), "v1")
      .join(r2.withColumnRenamed("v", "v2"), "v2")
    joined.agg(corr(col("r1"), col("r2"))).collect()(0).getDouble(0)
  }

  /** Scalable ntile: global bucket assignment via the same offset trick
    * (replaces `ntile(n) OVER (ORDER BY k)` for big tables). Matches SQL
    * ntile exactly on a UNIQUE order key; with ties, all tied rows share
    * the bucket of their group's middle rank (SQL ntile instead splits a
    * tie group across buckets nondeterministically). Returns df plus a
    * `bucket` column in [1, n].
    */
  def ntileByRange(df: DataFrame, orderCol: String, n: Int, partitions: Int = 32): DataFrame = {
    require(n >= 1, "ntile bucket count must be >= 1")
    val total = df.count()
    require(total > 0, "ntileByRange on an empty dataframe")
    val ranked = averageRanks(df, orderCol, partitions)
      .withColumnRenamed("v", "__v")
    // ntile semantics: first (total % n) buckets get ceil(total/n) rows
    val base = total / n
    val extra = total % n
    val bucketOf = udf { minRankAvg: Double =>
      val rank0 = (minRankAvg - 1).toLong // 0-based min rank for unique keys
      val cut = extra * (base + 1)
      if (rank0 < cut) (rank0 / (base + 1) + 1).toInt
      // base == 0 implies total < n, where every rank0 < cut = total —
      // this branch then only runs with base >= 1; max() is a belt.
      else ((rank0 - cut) / math.max(base, 1L) + extra + 1).toInt
    }
    df.join(ranked, df(orderCol).cast("double") === ranked("__v"))
      .withColumn("bucket", bucketOf(col("avg_rank")))
      .drop("__v", "avg_rank")
  }
}
