package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the O(touched-files) claim of the key-set-pruned COW upsert
  * (Upserter: affected files resolved by exact batch keys via
  * binary-searched NumIn/StrIn per key column, refined by the bloom
  * KeyIndex when present): upsert batches of N scattered keys into a
  * table and record wall, files rewritten, and sidecar maintenance
  * stats per batch size.
  *
  * Usage: runMain graft.tools.UpsertProbe <tableDir> [sizes=10,100,1000]
  * The table must have a record key (single or composite); rows are
  * sampled from the table itself (a price-bump update batch, rq7-style).
  *
  * `mklinear <srcTable> <dstTable>` first re-lays a table LINEAR ON ITS
  * RECORD KEY TUPLE — the key-clustered shape where file-scoped COW
  * actually pays. On a layout orthogonal to the key (rq7's zorder on
  * value columns) every file's key zone spans the whole domain and NO
  * sound zone prune can scope the rewrite — Hudi needs its
  * bloom/file-group key index for the same reason.
  *
  * `mkuuid <srcTable> <dstTable>` derives a UUID-style STRING record
  * key (md5 of the source key tuple), lays the table out linear on a
  * value column (ORTHOGONAL to the key — the common document-store
  * shape), and builds the bloom KeyIndex: probing it shows string-keyed
  * COW staying batch-proportional where zone maps keep every file.
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
      val keys = m.keyCols
      require(keys.nonEmpty, s"$src has no record key")
      graft.layout.LayoutWriter.write(
        spark.read.parquet(src), dst,
        graft.layout.LayoutWriter.LayoutSpec("linear", keys,
          numFiles = Some(m.files.length),
          recordKey = if (keys.length == 1) Some(keys.head) else None,
          recordKeys = if (keys.length > 1) keys else Nil,
          precombineCol = m.precombineCol))
      println(s"[upsertprobe] wrote $dst linear on ${keys.mkString(",")}")
      spark.stop(); return
    }
    if (args.headOption.contains("mkcomposite")) {
      // lineitem under the reference's composite record_key
      // [l_orderkey, l_linenumber] (tpch_all_schemas.py:84), clustered
      // linear on the key tuple (tuple-deduped: the synthetic generator
      // does not enforce the PK)
      val sfDir = args(1); val dst = args(2)
      val li = graft.Tables.load(spark, sfDir, "lineitem")
        .dropDuplicates("l_orderkey", "l_linenumber")
      graft.layout.LayoutWriter.write(li, dst,
        graft.layout.LayoutWriter.LayoutSpec("linear",
          Seq("l_orderkey", "l_linenumber"), numFiles = Some(48),
          recordKeys = Seq("l_orderkey", "l_linenumber")))
      println(s"[upsertprobe] wrote $dst composite-keyed " +
        "(linear on l_orderkey,l_linenumber)")
      spark.stop(); return
    }
    if (args.headOption.contains("mkuuid")) {
      val src = args(1); val dst = args(2)
      val m = graft.layout.ZoneMap.read(src)
      val keys = m.keyCols
      require(keys.nonEmpty, s"$src has no record key")
      val df = spark.read.parquet(src)
        .withColumn("uuid_key", md5(concat_ws("|", keys.map(col): _*)))
        .drop(keys: _*)
      // layout on a VALUE column → key-orthogonal: only the bloom
      // index can scope a keyed rewrite here
      val valueCol = df.schema.fields
        .find(f => f.dataType == org.apache.spark.sql.types.DoubleType)
        .map(_.name).getOrElse(df.columns.head)
      graft.layout.LayoutWriter.write(df, dst,
        graft.layout.LayoutWriter.LayoutSpec("linear", Seq(valueCol),
          numFiles = Some(m.files.length), recordKey = Some("uuid_key"),
          precombineCol = m.precombineCol))
      graft.layout.KeyIndex.build(spark, dst)
      println(s"[upsertprobe] wrote $dst uuid-keyed (layout on $valueCol, " +
        "key-orthogonal) + bloom KeyIndex")
      spark.stop(); return
    }
    val table = args.headOption.getOrElse(sys.error("usage: UpsertProbe <tableDir> [sizes]"))
    val sizes = args.lift(1).getOrElse("10,100,1000").split(",").map(_.trim.toInt).toSeq
    val manifest = graft.layout.ZoneMap.read(table)
    val keys = manifest.keyCols
    require(keys.nonEmpty, s"$table has no record key")
    println(s"table=$table files=${manifest.files.length} " +
      f"bytes=${manifest.files.flatMap(_.bytes).sum / 1e6}%.0fMB " +
      s"keys=${keys.mkString(",")} layout=${manifest.layout}" +
      s"(${manifest.layoutCols.mkString(",")}) " +
      s"keyindex=${graft.layout.KeyIndex.exists(table)}")
    sizes.foreach { n =>
      // uniformly scattered keys: worst case for a range test, the
      // honest case for the key-set prune
      val src = spark.read.parquet(table)
      val bumped =
        if (src.columns.contains("l_extendedprice"))
          src.withColumn("l_extendedprice", col("l_extendedprice") * 1.0001)
        else src
      val batch = bumped
        .orderBy(xxhash64((keys.map(col) :+ lit(n)): _*)).limit(n)
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
