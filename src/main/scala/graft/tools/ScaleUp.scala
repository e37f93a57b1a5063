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

    def replicate(df: DataFrame, shifts: Seq[(String, Long)]): DataFrame = {
      val copies = spark.range(factor).toDF("__copy")
      shifts.foldLeft(df.crossJoin(copies)) { case (d, (c, b)) =>
        d.withColumn(c, col(c) + col("__copy") * lit(b))
      }.drop("__copy")
    }

    for (t <- graft.Tables.all) {
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
        case _ => df // region, nation, events, documents, embeddings: as-is
      }
      val parts = math.max(1, (out.inputFiles.length * factor) min 32)
      out.repartition(parts).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t -> $dst/$t.parquet")
    }
    spark.stop()
  }
}
