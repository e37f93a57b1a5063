package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.layout._

/** Measure the per-shard union-bloom shard skipping (round-16, VERDICT
  * r15 Next #5): an orthogonal-key table at a production-ish file count,
  * a scattered small key batch, [[KeyIndex.affectedPaths]] timed with
  * the unions present vs deleted (the pre-r16 read-every-shard path).
  * Results are identical by construction (union skipping only drops
  * per-file-bloom false positives); the delta is sidecar read work.
  *
  * Usage: runMain graft.tools.UnionProbe [rows] [numFiles] [batchKeys] [reps]
  * Prints one JSON line.
  */
object UnionProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(8000000L)
    val numFiles = args.lift(1).map(_.toInt).getOrElse(4096)
    val batchKeys = args.lift(2).map(_.toInt).getOrElse(10)
    val reps = args.lift(3).map(_.toInt).getOrElse(7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_unionprobe_").toString
    // layout orthogonal to the key: zones keep everything, only blooms scope
    val df = spark.range(0L, rows, 1L, 32).select(
      col("id").as("k"),
      (pmod(xxhash64(col("id"), lit(1)), lit(100000)) / 100.0).as("a"),
      (pmod(xxhash64(col("id"), lit(2)), lit(100000)) / 100.0).as("b"),
      lit(1L).as("version"))
    LayoutWriter.write(df, dir, LayoutWriter.LayoutSpec(
      "zorder", Seq("a", "b"), numFiles = Some(numFiles),
      recordKey = Some("k"), precombineCol = Some("version")))
    KeyIndex.build(spark, dir)
    val manifest = ZoneMap.read(dir)

    val keys = (1 to batchKeys).map(i =>
      Math.floorMod(2654435761L * i, rows))
    val hashes = keys.toDF("k")
      .select(xxhash64(col("k"))).as[Long].collect().toSeq

    def once(): (Double, Int, Int) = {
      val t0 = System.nanoTime()
      val r = KeyIndex.affectedPaths(spark, dir, hashes, manifest).get
      ((System.nanoTime() - t0) / 1e6, KeyIndex.lastShardsRead, r.size)
    }
    // interleave the two arms per rep (the first-measured arm is
    // otherwise systematically JIT-colder) by stashing/restoring the
    // unions file; absent above the capacity boundary (build skips
    // saturated unions) — both arms then measure the same path
    val uf = KeyIndex.path(dir).resolve("_unions.bin")
    val hadUnions = java.nio.file.Files.exists(uf)
    val ubytes =
      if (hadUnions) java.nio.file.Files.readAllBytes(uf) else Array.empty[Byte]
    once(); once() // warmup both code paths
    val runs = (1 to reps).map { _ =>
      if (hadUnions) java.nio.file.Files.write(uf, ubytes)
      val w = once()
      java.nio.file.Files.deleteIfExists(uf)
      val wo = once()
      (w, wo)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    val (withMs, shardsWith, sizeWith) =
      (med(runs.map(_._1._1)), runs.last._1._2, runs.last._1._3)
    val (withoutMs, shardsWithout, sizeWithout) =
      (med(runs.map(_._2._1)), runs.last._2._2, runs.last._2._3)

    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"rows":$rows,"files":${manifest.files.length},""" +
      s""""batch_keys":$batchKeys,"reps":$reps,"unions_written":$hadUnions,""" +
      s""""with_unions_ms":${f1(withMs)},"shards_read":$shardsWith,""" +
      s""""affected":$sizeWith,""" +
      s""""without_unions_ms":${f1(withoutMs)},""" +
      s""""shards_read_without":$shardsWithout,""" +
      s""""affected_without":$sizeWithout}""")
    def rec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rec)); f.delete()
    }
    rec(new java.io.File(dir))
    spark.stop()
  }
}
