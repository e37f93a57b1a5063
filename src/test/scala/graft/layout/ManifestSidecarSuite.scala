package graft.layout

import org.scalatest.funsuite.AnyFunSuite

/** JSONL files-section sidecar + read cache (round-18 manifest scale
  * audit): above [[ZoneMap.sidecarThreshold]] entries the manifest
  * header keeps `files` empty on disk and streams entries to a compact
  * `_graft_manifest_files.g<gen>.jsonl`; reads attach it transparently
  * and cache by the header's (FileTime, size). results/manifest_scale
  * .json carries the measured latency story at 10⁴–10⁶ entries.
  */
class ManifestSidecarSuite extends AnyFunSuite {

  private def entry(i: Int, root: String): FileEntry = FileEntry(
    s"$root/part-$i.parquet", rows = 100L + i,
    ranges = Map("a" -> ColRange(Some(i.toDouble), Some(i + 1.0), None, None,
      allNull = false)),
    bytes = Some(1000L * i))

  private def manifest(n: Int, root: String): TableManifest = TableManifest(
    "linear", Seq("a"), 20, Seq("a"), None, None,
    (0 until n).map(entry(_, root)))

  private def withThreshold[A](t: Int)(body: => A): A = {
    sys.props("graft.manifest.sidecarThreshold") = t.toString
    try body finally sys.props.remove("graft.manifest.sidecarThreshold")
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_sidecar").toString

  private def headerJson(dir: String): String = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, ZoneMap.ManifestName)), "UTF-8")

  private def sidecars(dir: String): Seq[String] =
    new java.io.File(dir).list().toSeq
      .filter(_.startsWith("_graft_manifest_files."))

  test("sidecar round-trip: header stays small, read attaches entries, prune works") {
    withThreshold(5) {
      val dir = tmp()
      val written = ZoneMap.write(dir, manifest(10, dir))
      // the RETURNED manifest keeps full files in memory
      assert(written.files.length == 10 && written.filesRef.isEmpty)
      // on disk: empty files array, filesRef set, one gen-1 sidecar
      val hj = headerJson(dir)
      assert(hj.contains("\"filesRef\""), hj.takeRight(200))
      assert(!hj.contains("part-3.parquet"), "entries must not be in the header")
      assert(sidecars(dir) == Seq("_graft_manifest_files.g1.jsonl"))
      val r = ZoneMap.read(dir)
      assert(r.files == written.files)
      assert(r.generation.contains(1L))
      assert(r.prune(Seq(NumBetween("a", 3.5, 4.5))).map(_.path)
        == Seq(s"$dir/part-3.parquet", s"$dir/part-4.parquet"))
    }
  }

  test("gen-stamped sidecars GC keeping one prior gen; shrink inlines again") {
    withThreshold(5) {
      val dir = tmp()
      val m1 = ZoneMap.write(dir, manifest(10, dir))
      val m2 = ZoneMap.write(dir, m1) // gen 2
      val m3 = ZoneMap.write(dir, m2) // gen 3
      // the PREVIOUS gen's sidecar survives (a concurrent reader of the
      // gen-2 header must still find it); older gens are GCed
      assert(sidecars(dir).sorted == Seq("_graft_manifest_files.g2.jsonl",
        "_graft_manifest_files.g3.jsonl"), sidecars(dir).toString)
      assert(ZoneMap.read(dir).files == m3.files)
      // drop to 2 entries: inline format; the prior sidecar lingers one
      // more generation for the same concurrent-reader window
      val small = ZoneMap.write(dir, m3.copy(files = m3.files.take(2))) // gen 4
      assert(sidecars(dir) == Seq("_graft_manifest_files.g3.jsonl"))
      assert(headerJson(dir).contains("part-1.parquet"))
      assert(ZoneMap.read(dir).files == small.files)
      ZoneMap.write(dir, small) // gen 5: g3 is no longer gen-1, GCed
      assert(sidecars(dir).isEmpty)
    }
  }

  test("read cache: repeat reads reuse the parse, a new commit invalidates") {
    val dir = tmp()
    val m1 = ZoneMap.write(dir, manifest(3, dir))
    val r1 = ZoneMap.read(dir)
    val r2 = ZoneMap.read(dir)
    assert(r1 eq r2, "unchanged header must serve the cached parse")
    val m2 = ZoneMap.write(dir, m1.copy(files = m1.files.take(1)))
    val r3 = ZoneMap.read(dir)
    assert(r3.files.length == 1 && r3.generation.contains(2L),
      s"commit must invalidate the cache: $r3")
    assert(ZoneMap.read(dir) eq r3)
  }

  test("relocated dir with sidecar: read rebases entry paths from the JSONL") {
    withThreshold(5) {
      val dir = tmp()
      ZoneMap.write(dir, manifest(8, dir))
      val moved = dir + "_moved"
      java.nio.file.Files.move(java.nio.file.Paths.get(dir),
        java.nio.file.Paths.get(moved))
      val r = ZoneMap.read(moved)
      assert(r.files.length == 8)
      // rebased paths come back in canonical URI form (file:<dir>/...)
      assert(r.files.forall(_.path.contains(moved + "/")),
        r.files.head.path)
    }
  }
}
