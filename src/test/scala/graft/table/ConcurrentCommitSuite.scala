package graft.table

import graft.SparkTestBase
import graft.layout.{ConcurrentCommitException, LayoutWriter, ZoneMap}
import graft.layout.LayoutWriter.LayoutSpec

/** Optimistic concurrency on the manifest commit (round-19; the OCC
  * Delta/Hudi/Iceberg provide, which the single-writer rename protocol
  * assumed away — two racing commits could silently drop one
  * generation's file set). writeCas check-and-swaps on the generation;
  * Upserter rebases DISJOINT concurrent rewrites and aborts OVERLAPPING
  * ones. The interleaving is driven deterministically through
  * [[Upserter.testHookBeforeCommit]] (a thread race would leave which
  * writer rebases to the scheduler).
  */
class ConcurrentCommitSuite extends SparkTestBase {

  private def base = {
    val spark2 = spark
    import spark2.implicits._
    (1 to 10000).map(i => (i.toLong, s"v$i", i * 1.0, 1L))
      .toDF("k", "payload", "price", "version")
  }

  private def keyedTable(prefix: String): String = {
    val dir = tmpDir(prefix)
    LayoutWriter.write(base, dir,
      LayoutSpec("linear", Seq("k"), numFiles = Some(8),
        recordKey = Some("k"), precombineCol = Some("version")))
    dir
  }

  private def batch(rows: (Long, String)*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (k, p) => (k, p, 0.0, 2L) }
      .toDF("k", "payload", "price", "version")
  }

  test("writeCas: a stale-generation commit throws, a current one lands") {
    val dir = keyedTable("graft_cas")
    val m1 = ZoneMap.read(dir) // gen 1
    val m2 = ZoneMap.writeCas(dir, m1) // gen 2: read at 1, disk at 1 — ok
    assert(m2.generation.contains(2L))
    val e = intercept[ConcurrentCommitException] {
      ZoneMap.writeCas(dir, m1) // still claims gen 1, disk is at 2
    }
    assert(e.onDisk == 2L && e.expected == 1L)
    // plain write stays last-writer-wins for fresh-table flows
    assert(ZoneMap.write(dir, m1).generation.contains(2L))
  }

  test("interleaved upserts on DISJOINT key ranges: both land via rebase") {
    val spark2 = spark
    import spark2.implicits._
    val dir = keyedTable("graft_occ_disjoint")
    // low keys live in different files than high keys (linear layout on
    // k, 8 files) — the two upserts rewrite disjoint file sets
    var ran = false
    Upserter.testHookBeforeCommit = () => {
      if (!ran) { // only inside the OUTER upsert, not the nested one
        ran = true
        Upserter.upsert(spark, dir, batch(9990L -> "hi9990"))
      }
    }
    try Upserter.upsert(spark, dir, batch(5L -> "lo5"))
    finally Upserter.testHookBeforeCommit = () => ()
    assert(ran, "competing upsert must have run inside the commit window")
    val got = spark.read.parquet(dir)
    assert(got.count() == 10000)
    assert(got.filter($"k" === 5L).select("payload").as[String].head() == "lo5")
    assert(got.filter($"k" === 9990L).select("payload").as[String].head() == "hi9990",
      "the rebased commit must carry the OTHER writer's files forward")
    // both commits landed: gen 1 (layout) + 2 upserts
    assert(ZoneMap.read(dir).generation.contains(3L))
    // the manifest references only live files (nothing dropped/dangling)
    val m = ZoneMap.read(dir)
    m.files.foreach { f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
        new java.net.URI(f.path))), s"dangling manifest entry: ${f.path}")
    }
  }

  test("interleaved upserts on the SAME key range: overlap detected, abort") {
    val spark2 = spark
    import spark2.implicits._
    val dir = keyedTable("graft_occ_overlap")
    var ran = false
    Upserter.testHookBeforeCommit = () => {
      if (!ran) {
        ran = true
        Upserter.upsert(spark, dir, batch(5L -> "first5"))
      }
    }
    val e =
      try intercept[ConcurrentCommitException] {
        Upserter.upsert(spark, dir, batch(6L -> "second6"))
      }
      finally Upserter.testHookBeforeCommit = () => ()
    assert(e.getMessage.contains("overlapping"), e.getMessage)
    // the winning commit's data is intact; the aborted one left no rows
    val got = spark.read.parquet(ZoneMap.read(dir).files.map(_.path): _*)
    assert(got.count() == 10000)
    assert(got.filter($"k" === 5L).select("payload").as[String].head() == "first5")
    assert(got.filter($"k" === 6L).select("payload").as[String].head() == "v6",
      "aborted upsert must not have published its rewrite")
    // the aborted writer's staged files are manifest-unreferenced; the
    // next mutation's reconcile purges them and the table stays sound
    Upserter.upsert(spark, dir, batch(7L -> "third7"))
    val after = spark.read.parquet(dir)
    assert(after.count() == 10000)
    assert(after.filter($"k" === 6L).select("payload").as[String].head() == "v6")
    assert(after.filter($"k" === 7L).select("payload").as[String].head() == "third7")
  }
}
