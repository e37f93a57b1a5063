package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H corpus scale-up by key-shifted replication: each copy i shifts
  * every primary/foreign key by i * (max(key)+1), so copy i of orders
  * references copy i of customer, lineitem follows its orders/parts/
  * suppliers, and every join's fan-out is preserved exactly — the
  * result is a structurally faithful ~factor× corpus (the reference
  * benches at SF16 via dbgen, run_RQ_1_matrix.sh:23; the sandbox has no
  * dbgen, so replication is the honest stand-in for timing-scaling
  * evidence — NOT for oracle checks, which stay at driver scale).
  * region/nation stay fixed (constant-size in TPC-H); the non-TPC-H
  * tables are copied through so Tables.registerAll keeps working.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> [factor]
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))

    // key bases: max(key)+1 per parent table, one tiny agg each
    def base(table: String, key: String): Long =
      spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col(key))).collect()(0).getLong(0) + 1
    val bases = Map(
      "customer" -> base("customer", "c_custkey"),
      "supplier" -> base("supplier", "s_suppkey"),
      "part" -> base("part", "p_partkey"),
      "orders" -> base("orders", "o_orderkey"))

    def replicate(df0: DataFrame, shifts: Seq[(String, Long)]): DataFrame = {
      // spread the source across the box FIRST: a small-SF table is one
      // parquet file, and crossJoin keeps the left side's partitioning,
      // so without this the factor-N row explosion (and the repartition
      // shuffle's map side) runs as ONE task — a 640x build measured
      // 100% of one core with a 23 GB single-task shuffle write
      val df = df0.repartition(32)
      val copies = spark.range(factor).toDF("__copy")
      shifts.foldLeft(df.crossJoin(copies)) { case (d, (c, b)) =>
        d.withColumn(c, col(c) + col("__copy") * lit(b))
      }.drop("__copy")
    }

    // optional 4th arg: comma-separated table subset (e.g. the rq1 sf64
    // rung scales the TPC-H relational tables and skips the text/vector
    // corpora whose 640× copies would exhaust the disk for no reader)
    val only = args.lift(3).map(_.split(",").toSet)
    for (t <- graft.Tables.all if only.forall(_.contains(t))) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = t match {
        case "customer" => replicate(df, Seq("c_custkey" -> bases("customer")))
        case "supplier" => replicate(df, Seq("s_suppkey" -> bases("supplier")))
        case "part" => replicate(df, Seq("p_partkey" -> bases("part")))
        case "orders" => replicate(df,
          Seq("o_orderkey" -> bases("orders"), "o_custkey" -> bases("customer")))
        case "lineitem" => replicate(df, Seq(
          "l_orderkey" -> bases("orders"), "l_partkey" -> bases("part"),
          "l_suppkey" -> bases("supplier")))
        case "events" =>
          // structure-preserving: copy i is an independent later epoch
          // (ts shifted by the full span + 1h per copy, users/ids
          // shifted) so per-user densities and window populations stay
          // constant — time-colocated replication would grow keyless
          // interval-join output QUADRATICALLY, not 10x. The raw ts
          // column has shipped as TIMESTAMP(NANOS)-as-long and as
          // TIMESTAMP(MICROS) (no Tables normalization here): shift in
          // the source unit, restoring the source type afterwards.
          val isTs = df.schema("ts").dataType !=
            org.apache.spark.sql.types.LongType
          val dfl =
            if (isTs) df.withColumn("ts", unix_micros(col("ts").cast("timestamp")))
            else df
          val unitPerSec = if (isTs) 1000000L else 1000000000L
          val b = dfl.agg(max(col("event_id")), max(col("user_id")),
            max(col("ts")) - min(col("ts"))).head()
          val span = b.getLong(2) + 3600L * unitPerSec
          val rep = replicate(dfl, Seq("event_id" -> (b.getLong(0) + 1),
            "user_id" -> (b.getLong(1) + 1), "ts" -> span))
          if (isTs) rep.withColumn("ts",
            timestamp_micros(col("ts")).cast("timestamp_ntz"))
          else rep
        case "documents" =>
          // copy i>0 mutates each doc by deterministically dropping
          // ~10% of words (seeded by doc/copy/position): vocabulary and
          // Zipf shape survive, copies of one doc form a REALISTIC
          // near-dup cluster (~50% 3-gram Jaccard between copies), and
          // no exact dups are introduced (exact-dup groups would make
          // minhash buckets quadratic — pipelines dedup exact first).
          val base = df.agg(max(col("doc_id"))).head().getLong(0) + 1
          val copies = spark.range(factor).toDF("__copy")
          val words = split(col("text"), "\\s+")
          val kept = filter(words, (w, pos) =>
            pmod(xxhash64(col("doc_id"), col("__copy"), pos), lit(10)) =!= 0)
          df.crossJoin(copies)
            .withColumn("doc_id", col("doc_id") + col("__copy") * lit(base))
            .withColumn("text", when(col("__copy") === 0, col("text"))
              .otherwise(array_join(kept, " ")))
            .withColumn("n_chars", length(col("text")).cast("long")) // keep source schema
            .drop("__copy")
        case "embeddings" =>
          // copy i>0 perturbs each dimension by a deterministic +-0.01
          // then renormalizes: copies sit at cosine ~0.999 of their
          // original (a near-dup family, like the mutated documents),
          // never exactly equal (exact dups would degenerate LSH
          // buckets quadratically).
          val base = df.agg(max(col("vec_id"))).head().getLong(0) + 1
          val copies = spark.range(factor).toDF("__copy")
          val noisy = transform(col("embedding"), (x, i) =>
            x + ((pmod(xxhash64(col("vec_id"), col("__copy"), i), lit(2001)) - 1000)
              .cast("double") / 100000.0).cast("float"))
          val norm = sqrt(aggregate(noisy, lit(0.0), (acc, x) => acc + x * x))
          df.crossJoin(copies)
            .withColumn("vec_id", col("vec_id") + col("__copy") * lit(base))
            .withColumn("embedding", when(col("__copy") === 0, col("embedding"))
              .otherwise(transform(noisy, x => (x / norm).cast("float"))))
            .drop("__copy")
        case _ => df // region, nation: constant-size, as-is
      }
      val parts = math.max(1, (out.inputFiles.length * factor) min 32)
      // replicate() already spread the pre-explosion source 32 ways —
      // re-shuffling the EXPANDED rows here would move factor x the
      // bytes for the same file count, so only shuffle when the plan
      // hasn't already produced the target partitioning
      val shaped =
        if (out.rdd.getNumPartitions >= parts) out else out.repartition(parts)
      shaped.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t -> $dst/$t.parquet")
    }
    spark.stop()
  }
}
