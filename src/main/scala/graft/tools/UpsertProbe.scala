package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the O(touched-files) claim of the key-set-pruned COW upsert
  * (round-13 Upserter: affected files resolved by exact batch keys via
  * binary-searched NumIn, not the [min,max] range): upsert batches of
  * N scattered keys into a clustered table and record wall, files
  * rewritten, and bytes rewritten per batch size.
  *
  * Usage: runMain graft.tools.UpsertProbe <tableDir> [sizes=10,100,1000]
  * The table must have a recordKey; rows are sampled from the table
  * itself (a price-bump update batch, rq7-style).
  *
  * `mklinear <srcTable> <dstTable>` first re-lays a table LINEAR ON ITS
  * RECORD KEY — the key-clustered shape where file-scoped COW actually
  * pays. On a layout orthogonal to the key (rq7's zorder on value
  * columns) every file's key zone spans the whole domain and NO sound
  * zone prune can scope the rewrite — Hudi needs its bloom/file-group
  * key index for the same reason.
  */
object UpsertProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("mklinear")) {
      val src = args(1); val dst = args(2)
      val m = graft.layout.ZoneMap.read(src)
      val key = m.recordKey.getOrElse(sys.error(s"$src has no recordKey"))
      graft.layout.LayoutWriter.write(
        spark.read.parquet(src), dst,
        graft.layout.LayoutWriter.LayoutSpec("linear", Seq(key),
          numFiles = Some(m.files.length), recordKey = Some(key),
          precombineCol = m.precombineCol))
      println(s"[upsertprobe] wrote $dst linear on $key")
      spark.stop(); return
    }
    val table = args.headOption.getOrElse(sys.error("usage: UpsertProbe <tableDir> [sizes]"))
    val sizes = args.lift(1).getOrElse("10,100,1000").split(",").map(_.trim.toInt).toSeq
    val manifest = graft.layout.ZoneMap.read(table)
    val key = manifest.recordKey.getOrElse(sys.error(s"$table has no recordKey"))
    println(s"table=$table files=${manifest.files.length} " +
      f"bytes=${manifest.files.flatMap(_.bytes).sum / 1e6}%.0fMB key=$key")
    sizes.foreach { n =>
      // uniformly scattered keys: worst case for a range test, the
      // honest case for the key-set prune
      val batch = spark.read.parquet(table)
        .orderBy(xxhash64(col(key), lit(n))).limit(n)
        .withColumn("l_extendedprice",
          when(lit(true), col("l_extendedprice") * 1.0001))
      val before = graft.layout.ZoneMap.read(table).files.map(_.path).toSet
      val t0 = System.nanoTime()
      val m = graft.table.Upserter.upsert(spark, table, batch,
        sortRewrites = true, autoRecluster = false,
        targetFileBytes = 48L * 1024 * 1024)
      val sec = (System.nanoTime() - t0) / 1e9
      val surviving = m.files.map(_.path).toSet.intersect(before).size
      val rewritten = before.size - surviving
      println(f"n_keys=$n%6d wall=$sec%6.2fs files_rewritten=$rewritten%4d " +
        f"of ${before.size}%4d files_after=${m.files.length}%4d")
    }
    spark.stop()
  }
}
