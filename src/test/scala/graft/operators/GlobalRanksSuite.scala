package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

class GlobalRanksSuite extends SparkTestBase {

  test("averageRanks handles ties with the average-rank convention") {
    val spark2 = spark
    import spark2.implicits._
    // values: 5, 5, 7, 9, 9, 9 → avg ranks: 1.5, 1.5, 3, 5, 5, 5
    val df = Seq(5, 5, 7, 9, 9, 9).toDF("v")
    val ranks = GlobalRanks.averageRanks(df, "v", partitions = 2)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(ranks(5.0) == 1.5)
    assert(ranks(7.0) == 3.0)
    assert(ranks(9.0) == 5.0)
  }

  test("packByBudget == windowed cumulative-sum formulation") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(23)
    // weights straddle the budget freely, including single rows > budget
    val df = (1 to 3000).map(i =>
      (i.toLong, (rnd.nextInt(40) + 1).toLong * (if (rnd.nextInt(50) == 0) 10 else 1)))
      .toDF("id", "w")
    val packed = GlobalRanks.packByBudget(df, "id", "w", budget = 100L, partitions = 8)
    val ref = df.withColumn("before",
      coalesce(sum(col("w")).over(
        Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_ref", floor(col("before") / 100L))
    val mism = packed.join(ref.select(col("id"), col("seq_ref")), "id")
      .filter(col("seq_id") =!= col("seq_ref")).count()
    assert(mism === 0L)
    // sequences are contiguous id ranges starting at 0
    val seqs = packed.groupBy(col("seq_id")).agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .orderBy(col("seq_id")).collect()
    assert(seqs.head.getLong(0) === 0L)
    seqs.sliding(2).foreach {
      case Array(a, b) => assert(b.getAs[Long]("lo") === a.getAs[Long]("hi") + 1)
      case _ =>
    }
  }

  test("packByBudget/ntileByRange survive a downstream union (stage-relative pid regression)") {
    val spark2 = spark
    import spark2.implicits._
    // Regression: the assignment pass read TaskContext.getPartitionId,
    // which is STAGE-relative — a union of two packed frames renumbered
    // the second branch's tasks past the offset table (observed as an
    // ArrayIndexOutOfBounds in the per-split Curate packing). The pid is
    // now frozen into the cached rows.
    val a = (1 to 500).map(i => (i.toLong, 7L)).toDF("id", "w")
    val b = (1 to 400).map(i => (i.toLong, 3L)).toDF("id", "w")
    val u = GlobalRanks.packByBudget(a, "id", "w", budget = 50L, partitions = 8)
      .unionAll(GlobalRanks.packByBudget(b, "id", "w", budget = 50L, partitions = 8))
    assert(u.count() === 900L) // executes both branches in one union plan
    val firstSeq = u.filter(col("id") === 1L).select(col("seq_id"))
      .as[Long].collect().toSeq
    assert(firstSeq === Seq(0L, 0L)) // both branches start at sequence 0
    val n = GlobalRanks.ntileByRange(a, "id", 4, partitions = 8)
      .unionAll(GlobalRanks.ntileByRange(b, "id", 4, partitions = 8))
    assert(n.groupBy(col("bucket")).count().count() === 4L)
  }

  test("packByBudget exact small case with an over-budget row") {
    val spark2 = spark
    import spark2.implicits._
    // budget 10, weights 4,9,20,3,1 → offsets-before 0,4,13,33,36 → seqs 0,0,1,3,3
    val df = Seq((1L, 4L), (2L, 9L), (3L, 20L), (4L, 3L), (5L, 1L)).toDF("id", "w")
    val got = GlobalRanks.packByBudget(df, "id", "w", budget = 10L, partitions = 3)
      .orderBy(col("id")).select(col("seq_id")).as[Long].collect().toSeq
    assert(got === Seq(0L, 0L, 1L, 3L, 3L))
  }

  test("spearman: monotone transform gives 1, reversal gives -1") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(17)
    val xs = (1 to 5000).map(_ => rnd.nextDouble() * 100)
    val mono = xs.map(x => (x, x * x * x + 5)).toDF("a", "b")
    assert(math.abs(GlobalRanks.spearman(mono, "a", "b") - 1.0) < 1e-9)
    val anti = xs.map(x => (x, -x)).toDF("a", "b")
    assert(math.abs(GlobalRanks.spearman(anti, "a", "b") + 1.0) < 1e-9)
  }

  test("spearman matches the windowed formulation on tied data") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(19)
    val df = (1 to 4000).map(_ => (rnd.nextInt(20).toDouble, rnd.nextDouble()))
      .toDF("a", "b")
    val viaOps = GlobalRanks.spearman(df, "a", "b")
    val wA = Window.orderBy(col("a")); val wB = Window.orderBy(col("b"))
    val viaWindow = df
      .withColumn("r1", rank().over(wA) +
        (count(lit(1)).over(Window.partitionBy(col("a"))) - 1) / 2.0)
      .withColumn("r2", rank().over(wB) +
        (count(lit(1)).over(Window.partitionBy(col("b"))) - 1) / 2.0)
      .agg(corr(col("r1"), col("r2"))).collect()(0).getDouble(0)
    assert(math.abs(viaOps - viaWindow) < 1e-9, s"$viaOps vs $viaWindow")
  }

  test("ntileByRange matches window ntile on a unique key") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(23)
    val df = rnd.shuffle((1 to 10007).toList).map(i => (i.toLong, i * 2.0))
      .toDF("k", "v")
    val viaOps = GlobalRanks.ntileByRange(df, "k", 8, partitions = 4)
      .groupBy("bucket").count().collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("count")).toMap
    val viaWindow = df
      .withColumn("bucket", ntile(8).over(Window.orderBy(col("k"))))
      .groupBy("bucket").count().collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("count")).toMap
    assert(viaOps == viaWindow, s"$viaOps vs $viaWindow")
  }
}
