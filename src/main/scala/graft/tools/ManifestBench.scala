package graft.tools

import graft.layout.{ColRange, FileEntry, NumBetween, TableManifest, ZoneMap}

/** Manifest scale audit (r17 VERDICT Next #7): at 100 TB with ~128 MB
  * files a table holds ~10⁶ file entries, and every planning-time prune
  * (GraftFileIndex / PrunedScan), compaction scan, and keyed commit
  * reads + rewrites `_graft_manifest.json`. This tool measures
  * write / read / prune latency and on-disk size at 10⁴–10⁶ synthetic
  * lineitem-shaped entries (6 stats columns, hive partition values,
  * realistic paths) → results/manifest_scale.json, driving the storage
  * decision the VERDICT asked for.
  *
  * Usage: runMain graft.tools.ManifestBench [outJson] [sizes,csv]
  */
object ManifestBench {

  val StatsCols = Seq("l_shipdate", "l_discount", "l_suppkey",
    "l_orderkey", "l_extendedprice", "l_quantity")

  /** N entries shaped like a curve-laid-out lineitem: contiguous
    * leading-column ranges (so prunes keep a realistic ~band fraction),
    * per-file rows/bytes, hive-partition path segments.
    */
  def synth(n: Int): TableManifest = {
    val files = (0 until n).map { i =>
      val frac = i.toDouble / n
      val ranges = StatsCols.zipWithIndex.map { case (c, j) =>
        val domain = 1e6 * (j + 1)
        val lo = frac * domain
        // leading col: tight contiguous ranges (sorted); others: wide
        val hi = if (j == 0) lo + domain / n else lo + domain * 0.3
        c -> ColRange(Some(lo), Some(hi), None, None, allNull = false)
      }.toMap
      FileEntry(
        s"/data/warehouse/lineitem/l_returnflag=${"NAR".charAt(i % 3)}/" +
          f"l_linestatus=${"OF".charAt(i % 2)}/part-$i%06d-0000.parquet",
        rows = 400000L, ranges = ranges, bytes = Some(128L * 1024 * 1024),
        gen = Some(1L + i % 7))
    }
    TableManifest("zorder", Seq("l_shipdate", "l_discount"), 20, StatsCols,
      None, Some("l_shipdate"), files,
      partitionCols = Some(Seq("l_returnflag", "l_linestatus")),
      recordKeys = Some(Seq("l_orderkey", "l_linenumber")))
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = body; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("results/manifest_scale.json")
    val sizes = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(10000, 100000, 1000000))
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val rt = Runtime.getRuntime
    def usedMb(): Long = {
      System.gc(); System.gc()
      (rt.totalMemory() - rt.freeMemory()) / 1048576L
    }
    val rows = sizes.map { n =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_mb_$n").toString
      try {
        val m0 = usedMb()
        val m = synth(n)
        val (_, secW) = time(ZoneMap.write(dir, m))
        val bytes = java.nio.file.Files.size(
          java.nio.file.Paths.get(dir, ZoneMap.ManifestName))
        // STREAMING prune (r18 VERDICT Next #2): survivors without the
        // manifest in memory — retained heap is O(kept), measured
        // against its own baseline while the synth manifest stays live
        ZoneMap.clearReadCache()
        val b0 = usedMb()
        var (view, secPS) = time(
          ZoneMap.pruneRead(dir, Seq(NumBetween("l_shipdate", 1000.0, 6000.0))))
        val heapStreamMb = usedMb() - b0
        val keptStream = view.kept.length
        val streamed = view.manifest.files.isEmpty && view.filesTotal > 0
        view = null
        // second write with the read manifest = the keyed-commit shape
        val (r1, secR) = time(ZoneMap.read(dir))
        // repeat read = the per-query planning cost with the read cache
        val (_, secRC) = time(ZoneMap.read(dir))
        val heapMb = usedMb() - m0
        // S2-band prune on the leading sort column (~0.5% of entries)
        val (kept, secP) = time(
          r1.prune(Seq(NumBetween("l_shipdate", 1000.0, 6000.0))))
        val (_, secW2) = time(ZoneMap.write(dir, r1))
        assert(kept.nonEmpty && kept.length < n / 50,
          s"prune kept ${kept.length} of $n — synth ranges wrong")
        val sidecarBytes = Option(new java.io.File(dir).listFiles).toSeq.flatten
          .filter(_.getName.startsWith("_graft_manifest_files."))
          .map(_.length).sum
        assert(keptStream == kept.length,
          s"stream prune kept $keptStream, in-memory kept ${kept.length}")
        println(f"[manifest] n=$n%7d  write=${secW}%7.3fs  read=${secR}%7.3fs" +
          f"  read_cached=${secRC}%8.5fs  prune=${secP}%6.3fs" +
          f"  prune_stream=${secPS}%6.3fs (streamed=$streamed," +
          f" heap=${heapStreamMb}%4d MB)  rewrite=${secW2}%7.3fs" +
          f"  size=${(bytes + sidecarBytes) / 1048576.0}%8.1f MB" +
          f"  heap=${heapMb}%5d MB  kept=${kept.length}")
        s"""{"n":$n,"write_sec":${f3(secW)},"read_sec":${f3(secR)},""" +
          s""""read_cached_sec":${"%.5f".formatLocal(java.util.Locale.ROOT, secRC)},""" +
          s""""prune_sec":${f3(secP)},"prune_stream_sec":${f3(secPS)},""" +
          s""""prune_streamed":$streamed,"heap_stream_mb":$heapStreamMb,""" +
          s""""rewrite_sec":${f3(secW2)},""" +
          s""""header_bytes":$bytes,"sidecar_bytes":$sidecarBytes,""" +
          s""""heap_mb":$heapMb,"files_kept":${kept.length}}"""
      } finally {
        graft.cli.Scenario.deleteRec(new java.io.File(dir))
      }
    }
    val json = s"""{"stats_cols":${StatsCols.length},"points":[${rows.mkString(",")}]}"""
    val op = java.nio.file.Paths.get(out)
    if (op.getParent != null) java.nio.file.Files.createDirectories(op.getParent)
    java.nio.file.Files.writeString(op, json + "\n")
    println(json)
  }
}
