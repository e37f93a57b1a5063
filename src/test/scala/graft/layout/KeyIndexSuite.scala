package graft.layout

import graft.SparkTestBase
import graft.layout.LayoutWriter.LayoutSpec
import graft.table.Upserter
import org.apache.spark.sql.functions._

/** Per-file record-key bloom index (round 13): keyed COW on a layout
  * ORTHOGONAL to the record key — where zone maps keep every file —
  * scopes its rewrite to the files whose blooms may contain a batch
  * key (the Hudi bloom-index analog).
  */
class KeyIndexSuite extends SparkTestBase {

  // zorder on (a, b); record key k is uncorrelated with the layout, so
  // every file's k zone spans ~the whole domain
  private def writeOrthogonal(dir: String): Unit = {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 20000).map { k =>
      (k.toLong, rnd.nextDouble() * 1000, rnd.nextDouble() * 1000, s"v$k", 1L)
    }
    LayoutWriter.write(rows.toDF("k", "a", "b", "payload", "version"), dir,
      LayoutSpec("zorder", Seq("a", "b"), numFiles = Some(16),
        recordKey = Some("k"), precombineCol = Some("version")))
  }

  test("bloom-scoped upsert rewrites few files where zones keep all, rows exact") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("graft_keyidx")
    writeOrthogonal(dir)
    // zones alone: a scattered batch affects everything
    val m0 = ZoneMap.read(dir)
    val zoneKept = m0.files.count(NumIn("k", Seq(10000.0)).mayMatch)
    assert(zoneKept >= m0.files.length - 2,
      s"precondition: key zones span the domain (layout orthogonal to key); " +
        s"only $zoneKept of ${m0.files.length} cover a mid-domain key")

    KeyIndex.build(spark, dir)
    assert(KeyIndex.exists(dir))
    val before = m0.files.map(_.path).toSet
    val batch = Seq(
      (3L, 0.0, 0.0, "upd3", 2L),
      (19997L, 0.0, 0.0, "upd19997", 2L),
      (90001L, 0.0, 0.0, "new", 1L)) // insert (key in no file)
      .toDF("k", "a", "b", "payload", "version")
    val m1 = Upserter.upsert(spark, dir, batch, autoRecluster = false)
    val rewritten = before.size - m1.files.map(_.path).toSet.intersect(before).size
    // 2 present keys live in <=2 files; bloom fpp adds at most a file
    assert(rewritten <= 4,
      s"bloom scoping failed: $rewritten of ${before.size} files rewritten")
    val got = spark.read.parquet(dir)
    assert(got.count() == 20001)
    assert(got.filter($"k" === 3L).select("payload").as[String].head() == "upd3")
    assert(got.filter($"k" === 19997L).select("payload").as[String].head() == "upd19997")
    assert(got.filter($"k" === 90001L).count() == 1)
    assert(got.filter($"k" === 500L).select("payload").as[String].head() == "v500")

    // the index tracked the rewrite: a second upsert against one of the
    // JUST-REWRITTEN keys still scopes (its new file is indexed)
    val before2 = m1.files.map(_.path).toSet
    val m2 = Upserter.upsert(spark, dir,
      Seq((3L, 0.0, 0.0, "upd3b", 3L)).toDF("k", "a", "b", "payload", "version"),
      autoRecluster = false)
    val rewritten2 = before2.size - m2.files.map(_.path).toSet.intersect(before2).size
    assert(rewritten2 <= 2, s"post-update index failed to scope: $rewritten2")
    assert(spark.read.parquet(dir).filter($"k" === 3L)
      .select("payload").as[String].head() == "upd3b")
  }

  // the hash Upserter probes with: xxhash64 over the typed key value
  private def hashOf(k: Long): Long =
    spark.range(1).select(xxhash64(lit(k))).head().getLong(0)

  test("missing index entries are fail-safe affected; reconcile spares the sidecar") {
    val dir = tmpDir("graft_keyidx_fs")
    writeOrthogonal(dir)
    KeyIndex.build(spark, dir)
    // simulate the REAL crash window: a mutation commits a new file +
    // manifest (generation bump) and dies before KeyIndex.update — the
    // new file has no bloom row and its gen exceeds the sidecar's
    // indexedGen, so pure driver-side generation math must flag it
    val manifest = ZoneMap.read(dir)
    val src = new java.io.File(new java.net.URI(manifest.files.head.path))
    val crashed = new java.io.File(src.getParentFile, "part-crashed.parquet")
    java.nio.file.Files.copy(src.toPath, crashed.toPath)
    val committed = ZoneMap.write(dir, manifest.copy(files =
      manifest.files :+ manifest.files.head.copy(
        path = crashed.toURI.toString, gen = None)))
    val victim = KeyIndex.norm(crashed.toURI.toString)
    val h = hashOf(987654321L) // a key in no file: blooms all negative
    val paths = KeyIndex.affectedPaths(spark, dir, Seq(h), committed).get
    assert(paths.contains(victim), "unindexed committed file must be affected")
    assert(paths.size == 1,
      s"indexed files with negative blooms must be pruned: $paths")

    // reconcile must not purge the sidecar's part files
    StagedRewrite.reconcile(spark, dir, ZoneMap.read(dir))
    assert(KeyIndex.exists(dir))
    assert(KeyIndex.affectedPaths(spark, dir, Seq(h), committed).get
      .contains(victim))

    // the next maintenance pass SELF-HEALS: even with nothing added,
    // update() blooms the crash-window file and advances indexedGen
    KeyIndex.update(spark, dir, Nil, Nil)
    val healed = KeyIndex.affectedPaths(spark, dir, Seq(h), ZoneMap.read(dir)).get
    assert(!healed.contains(victim),
      s"after update() the healed file's bloom must prune it: $healed")
  }

  test("lookup broadcasts O(batch), not the live-path set") {
    val dir = tmpDir("graft_keyidx_bc")
    writeOrthogonal(dir)
    KeyIndex.build(spark, dir)
    val manifest = ZoneMap.read(dir)
    val sc = spark.sparkContext
    // drain pending cleanup, then measure broadcast blocks created by
    // ONE lookup: only the batch-hash array (+ per-stage task binaries),
    // never the O(table) path-string set the v2 protocol shipped
    // inflate the manifest to production file counts with fake already-
    // indexed entries (gen 0 <= indexedGen): the v2 protocol broadcast
    // every live path per lookup (~20 MB for these 200k paths); v3 does
    // driver-side set math over them and ships only the batch hashes
    val fake = (1 to 200000).map(i => manifest.files.head.copy(
      path = s"file:///graft/fake/part-${i}%08d-0000.parquet",
      gen = Some(0L)))
    val bigManifest = manifest.copy(files = manifest.files ++ fake)
    System.gc()
    org.apache.spark.graftbridge.SparkBridge.drainListenerBus(sc)
    val before = org.apache.spark.graftbridge.SparkBridge
      .broadcastBlocks(sc).keySet
    val hashes = (1L to 100L).map(hashOf)
    KeyIndex.affectedPaths(spark, dir, hashes, bigManifest)
    val after = org.apache.spark.graftbridge.SparkBridge.broadcastBlocks(sc)
    val newBytes = after.view.filterKeys(!before.contains(_)).values.sum
    // 100 hash longs + the per-job task binary (~0.5 MB, constant in
    // table size): far under the ~20 MB the 200k-path live set measures
    assert(newBytes > 0, "lookup should create the batch-hash broadcast")
    assert(newBytes < 2 * 1024 * 1024,
      s"lookup broadcast must be O(batch), not O(table): $newBytes bytes")
  }

  test("maintenance is append-only; stale rows reclaimed by amortized GC") {
    val dir = tmpDir("graft_keyidx_shard")
    writeOrthogonal(dir)
    KeyIndex.build(spark, dir)
    val manifest = ZoneMap.read(dir)
    // a removal rewrites NOTHING on the mutation path (stale rows are
    // invisible to lookups via the live-manifest intersection) — the
    // Hudi write-once-bloom asymptotic
    val stats = KeyIndex.update(spark, dir, manifest.files.take(2).map(_.path), Nil)
    assert(stats.shardsRewritten == 0 && stats.bytesRewritten == 0L && !stats.gc,
      s"removal must not rewrite the sidecar: $stats")
    // a pure append rewrites nothing either
    val readd = ZoneMap.collectStatsDf(
      StagedRewrite.readFiles(spark, dir,
        manifest.files.drop(2).take(1).map(_.path), partitioned = false),
      manifest.statsCols)
    val stats2 = KeyIndex.update(spark, dir, Nil, readd)
    assert(stats2.shardsRewritten == 0 && stats2.bytesRewritten == 0L,
      s"append-only update must rewrite nothing: $stats2")
    // stale accumulation beyond max(64, files/2) triggers the GC sweep
    val fakeRemovals = (1 to 70).map(i => s"file:/nonexistent/part-$i.parquet")
    val stats3 = KeyIndex.update(spark, dir, fakeRemovals, Nil)
    assert(stats3.gc && stats3.shardsRewritten > 0,
      s"stale overflow must trigger GC: $stats3")
    // GC kept only live-manifest rows; lookups still scope correctly
    val rows = spark.read.parquet(KeyIndex.path(dir).toString).count()
    assert(rows == ZoneMap.read(dir).files.length.toLong,
      s"GC must keep exactly the live rows, got $rows")
  }

  test("string (UUID-style) record key: bloom scoping where zones keep all") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("graft_keyidx_str")
    val rnd = new scala.util.Random(13)
    val rows = (1 to 20000).map { i =>
      (f"doc-${i * 2654435761L % 100000}%05d-$i", rnd.nextDouble() * 1000,
        rnd.nextDouble() * 1000, s"v$i", 1L)
    }
    LayoutWriter.write(rows.toDF("id", "a", "b", "payload", "version"), dir,
      LayoutSpec("zorder", Seq("a", "b"), numFiles = Some(16),
        recordKey = Some("id"), precombineCol = Some("version")))
    KeyIndex.build(spark, dir)
    val before = ZoneMap.read(dir).files.map(_.path).toSet
    val k1 = rows(300)._1; val k2 = rows(19000)._1
    val batch = Seq((k1, 0.0, 0.0, "upd1", 2L), (k2, 0.0, 0.0, "upd2", 2L))
      .toDF("id", "a", "b", "payload", "version")
    val m1 = graft.table.Upserter.upsert(spark, dir, batch, autoRecluster = false)
    val rewritten = before.size - m1.files.map(_.path).toSet.intersect(before).size
    assert(rewritten <= 4,
      s"string-key bloom scoping failed: $rewritten of ${before.size} rewritten")
    val got = spark.read.parquet(dir)
    assert(got.count() == 20000)
    assert(got.filter($"id" === k1).select("payload").as[String].head() == "upd1")
    assert(got.filter($"id" === k2).select("payload").as[String].head() == "upd2")
  }

  test("composite record key: tuple blooms scope, tuple identity dedups") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("graft_keyidx_comp")
    val rnd = new scala.util.Random(17)
    // (ok, ln) like lineitem: 5000 orders x 4 line numbers
    val rows = for { ok <- 1 to 5000; ln <- 1 to 4 } yield
      (ok.toLong, ln, rnd.nextDouble() * 1000, s"v$ok-$ln", 1L)
    LayoutWriter.write(rows.toDF("ok", "ln", "a", "payload", "version"), dir,
      LayoutSpec("linear", Seq("a"), numFiles = Some(16),
        recordKeys = Seq("ok", "ln"), precombineCol = Some("version")))
    assert(ZoneMap.read(dir).keyCols == Seq("ok", "ln"))
    KeyIndex.build(spark, dir)
    val before = ZoneMap.read(dir).files.map(_.path).toSet
    val batch = Seq(
      (42L, 2, 0.0, "upd", 2L), // updates ONE (ok,ln) tuple
      (42L, 9, 0.0, "new", 1L)) // same ok, new ln → INSERT, not update
      .toDF("ok", "ln", "a", "payload", "version")
    val m1 = graft.table.Upserter.upsert(spark, dir, batch, autoRecluster = false)
    val rewritten = before.size - m1.files.map(_.path).toSet.intersect(before).size
    assert(rewritten <= 4,
      s"composite-key bloom scoping failed: $rewritten of ${before.size}")
    val got = spark.read.parquet(dir)
    assert(got.count() == 20001, "same-ok/new-ln row must insert, not merge")
    assert(got.filter($"ok" === 42L && $"ln" === 2).select("payload")
      .as[String].head() == "upd")
    assert(got.filter($"ok" === 42L && $"ln" === 1).select("payload")
      .as[String].head() == "v42-1", "sibling tuple must be untouched")
    assert(got.filter($"ok" === 42L).count() == 5)
  }

  test("snowflake-scale long keys (>2^53) probe exactly — no double rounding") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("graft_keyidx_snow")
    val base = 1L << 60
    // adjacent ids that COLLIDE when rounded through double
    val rows = (0 until 4000).map { i =>
      (base + i, i.toDouble, s"v$i", 1L)
    }
    LayoutWriter.write(rows.toDF("id", "a", "payload", "version"), dir,
      LayoutSpec("linear", Seq("a"), numFiles = Some(8),
        recordKey = Some("id"), precombineCol = Some("version")))
    KeyIndex.build(spark, dir)
    val victim = base + 1234L
    val batch = Seq((victim, 0.0, "updated", 2L))
      .toDF("id", "a", "payload", "version")
    graft.table.Upserter.upsert(spark, dir, batch, autoRecluster = false)
    val got = spark.read.parquet(dir)
    assert(got.count() == 4000, "neighbor ids must not merge")
    assert(got.filter($"id" === victim).select("payload")
      .as[String].head() == "updated")
    assert(got.filter($"id" === (victim + 1)).select("payload")
      .as[String].head() == "v1235", "adjacent id untouched")
  }

  test("hive-partitioned table: index builds, scopes, and survives a partitioned upsert") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("graft_keyidx_part")
    val rnd = new scala.util.Random(11)
    val rows = (1 to 8000).map { k =>
      (k.toLong, rnd.nextDouble() * 100, s"p${k % 3}", s"v$k", 1L)
    }
    LayoutWriter.write(rows.toDF("k", "a", "part", "payload", "version"), dir,
      LayoutSpec("linear", Seq("a"), numFiles = Some(4),
        recordKey = Some("k"), precombineCol = Some("version"),
        partitionBy = Seq("part")))
    KeyIndex.build(spark, dir)
    val before = ZoneMap.read(dir).files.map(_.path).toSet
    val m = Upserter.upsert(spark, dir,
      Seq((7L, 0.0, "p1", "upd7", 2L)).toDF("k", "a", "part", "payload", "version"),
      autoRecluster = false)
    val rewritten = before.size - m.files.map(_.path).toSet.intersect(before).size
    assert(rewritten <= 2,
      s"partitioned index failed to scope: $rewritten of ${before.size}")
    val got = spark.read.parquet(dir)
    assert(got.count() == 8000)
    assert(got.filter($"k" === 7L).select("payload").as[String].head() == "upd7")
    assert(got.filter($"k" === 7L).select("part").as[String].head() == "p1")
  }

  test("whole-table compact rebuilds an index it found (auto-recluster keeps scoping)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("graft_keyidx_cmp")
    writeOrthogonal(dir)
    KeyIndex.build(spark, dir)
    Compactor.compact(spark, dir, targetFileBytes = 256L * 1024)
    assert(KeyIndex.exists(dir), "compact must rebuild the index it dropped")
    // and the rebuilt index is CURRENT: a keyed upsert still scopes
    val m = ZoneMap.read(dir)
    val before = m.files.map(_.path).toSet
    Upserter.upsert(spark, dir,
      Seq((42L, 0.0, 0.0, "u42", 2L)).toDF("k", "a", "b", "payload", "version"),
      autoRecluster = false)
    val after = ZoneMap.read(dir).files.map(_.path).toSet
    val rewritten = before.size - after.intersect(before).size
    assert(rewritten <= 2, s"rebuilt index failed to scope: $rewritten of ${before.size}")
    assert(spark.read.parquet(dir).filter($"k" === 42L)
      .select("payload").as[String].head() == "u42")
    assert(spark.read.parquet(dir).count() == 20000)
  }

  test("secondary index on a non-key column scopes lookups and tracks mutations") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("graft_keyidx_sec")
    // linear on the record key k; h is a content hash (md5-style) —
    // random, so NEITHER the layout nor any zone can scope an h lookup
    val rows = (1 to 20000).map(k => (k.toLong, s"p$k", 1L))
    LayoutWriter.write(
      rows.toDF("k", "payload", "version")
        .withColumn("h", md5(col("payload"))),
      dir, LayoutSpec("linear", Seq("k"), numFiles = Some(16),
        recordKey = Some("k"), precombineCol = Some("version")))
    KeyIndex.build(spark, dir, Seq("h"))
    val secName = KeyIndex.indexName(Seq("h"))
    assert(KeyIndex.exists(dir, secName))
    assert(!KeyIndex.exists(dir)) // no primary was built
    assert(KeyIndex.indexColsOf(dir, secName).contains(Seq("h")))

    val manifest = ZoneMap.read(dir)
    def hashesOf(vals: Seq[String]): Seq[Long] =
      vals.toDF("h").select(xxhash64(col("h"))).as[Long].collect().toSeq

    // a present hash scopes to the one file holding it (+= fpp noise)
    val present = spark.read.parquet(dir).filter($"k" === 1234L)
      .select("h").as[String].head()
    val hit = KeyIndex.affectedPaths(spark, dir, hashesOf(Seq(present)),
      manifest, Seq("h")).get
    assert(hit.nonEmpty && hit.size <= 3,
      s"one present hash should scope to ~1 of ${manifest.files.length} files, got ${hit.size}")
    // an absent hash prunes everything (modulo fpp)
    val miss = KeyIndex.affectedPaths(spark, dir,
      hashesOf(Seq("not-a-real-hash")), manifest, Seq("h")).get
    assert(miss.size <= 1, s"absent hash matched ${miss.size} files")

    // a keyed mutation through KeyedDelta keeps the SECONDARY current:
    // the dropped key's file is rewritten; its replacement must be
    // bloom-indexed so the surviving rows' hashes still resolve
    val victimH = spark.read.parquet(dir).filter($"k" === 2L)
      .select("h").as[String].head()
    val keeperH = spark.read.parquet(dir).filter($"k" === 3L)
      .select("h").as[String].head() // same file as k=2, survives
    KeyedDelta(spark, dir, dropKeys = Seq(2L), addRows = None)
    val m2 = ZoneMap.read(dir)
    val after = KeyIndex.affectedPaths(spark, dir, hashesOf(Seq(keeperH)),
      m2, Seq("h")).get
    val live = m2.files.map(f => KeyIndex.norm(f.path)).toSet
    assert(after.nonEmpty && after.forall(live.contains),
      "surviving hash must resolve to a LIVE file after the rewrite")
    assert(spark.read.parquet(dir).count() == 19999)
  }

  test("secondary index tracks a keyed COW upsert (updateAll path)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("graft_keyidx_sec_upsert")
    writeOrthogonal(dir)
    KeyIndex.build(spark, dir)            // primary (the COW needs it)
    KeyIndex.build(spark, dir, Seq("payload")) // secondary on a non-key col
    val secName = KeyIndex.indexName(Seq("payload"))

    val batch = Seq((7L, 0.0, 0.0, "upd7", 2L))
      .toDF("k", "a", "b", "payload", "version")
    Upserter.upsert(spark, dir, batch, autoRecluster = false)

    // the rewrite's replacement files must be bloom-indexed in BOTH
    // sidecars: the new payload value resolves to a live file
    val m = ZoneMap.read(dir)
    val live = m.files.map(f => KeyIndex.norm(f.path)).toSet
    val h = Seq("upd7").toDF("payload")
      .select(xxhash64(col("payload"))).as[Long].head()
    val hit = KeyIndex.affectedPaths(spark, dir, Seq(h), m, Seq("payload")).get
    assert(hit.nonEmpty && hit.forall(live.contains),
      s"upserted payload must resolve to live files via the secondary: $hit")
    // and a value that never existed stays pruned (fpp noise aside)
    val miss = KeyIndex.affectedPaths(spark, dir,
      Seq(Seq("nope").toDF("payload")
        .select(xxhash64(col("payload"))).as[Long].head()), m, Seq("payload")).get
    assert(miss.size <= 2, s"absent payload matched ${miss.size} files")
  }

  test("legacy (generation-less) manifest: a first stamped commit that crashes " +
      "before the index update still flags its files") {
    val dir = tmpDir("graft_keyidx_gen0")
    writeOrthogonal(dir)
    // strip the stamps: the pre-r15 manifest shape (generation = None,
    // per-file gen = None), written raw so ZoneMap.write can't re-stamp
    val m = ZoneMap.read(dir)
    val legacy = m.copy(generation = None, root = None,
      files = m.files.map(_.copy(gen = None)))
    implicit val fmts: org.json4s.Formats =
      org.json4s.jackson.Serialization.formats(org.json4s.NoTypeHints)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, ZoneMap.ManifestName),
      org.json4s.jackson.Serialization.writePretty(legacy)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // index the legacy table: indexedGen records 0 (no generation yet)
    KeyIndex.build(spark, dir)
    // first stamped commit adds a file, then CRASH before KeyIndex.update.
    // Generations start at 1 precisely so this commit cannot collide with
    // the legacy sidecar's indexedGen of 0 (r15 ADVICE: a gen-0 first
    // commit read as indexed would silently skip these files).
    val src = new java.io.File(new java.net.URI(m.files.head.path))
    val crashed = new java.io.File(src.getParentFile, "part-crashed-gen0.parquet")
    java.nio.file.Files.copy(src.toPath, crashed.toPath)
    val before = ZoneMap.read(dir)
    val committed = ZoneMap.write(dir, before.copy(files =
      before.files :+ m.files.head.copy(
        path = crashed.toURI.toString, gen = None)))
    assert(committed.generation.exists(_ > 0L),
      s"first stamped commit must postdate the legacy indexedGen of 0: " +
        s"${committed.generation}")
    val h = hashOf(987654321L) // in no file: blooms all negative
    val paths = KeyIndex.affectedPaths(spark, dir, Seq(h), committed).get
    assert(paths.contains(KeyIndex.norm(crashed.toURI.toString)),
      s"crash-window file on a legacy table must be affected: $paths")
  }

  test("per-shard union blooms: a scattered small batch reads fewer shard dirs, " +
      "never missing a truly-affected file") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("graft_keyidx_union")
    writeOrthogonal(dir)
    KeyIndex.build(spark, dir)
    val manifest = ZoneMap.read(dir)
    val keys = Seq(3L, 1999L, 4242L, 7777L, 9000L,
      11111L, 13000L, 15555L, 17000L, 19997L)
    val hashes = keys.map(hashOf)
    val skipped = KeyIndex.affectedPaths(spark, dir, hashes, manifest).get
    val shardsSkipped = KeyIndex.lastShardsRead
    assert(shardsSkipped < KeyIndex.Shards,
      s"10 scattered keys must not read all ${KeyIndex.Shards} shards " +
        s"(read $shardsSkipped)")
    // ground truth: the files that actually hold the keys must ALL be in
    // the skipped lookup's result (shard skipping is FP-dropping only)
    val truth = spark.read.parquet(dir)
      .filter(col("k").isin(keys: _*))
      .select(input_file_name()).distinct().as[String].collect()
      .map(KeyIndex.norm).toSet
    assert(truth.subsetOf(skipped),
      s"union skipping dropped truly-affected files: ${truth -- skipped}")
    // files newer than the unions stamp are uncovered: their shard is
    // read unconditionally (driver-side generation math), so a key that
    // exists ONLY in a post-union file still resolves — while the
    // union-negative covered shards stay skipped
    val fresh = Seq((777777L, 1.0, 2.0, "fresh", 1L))
      .toDF("k", "a", "b", "payload", "version")
    val stage = tmpDir("graft_keyidx_unionstage")
    fresh.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dest = new java.io.File(
      new java.io.File(new java.net.URI(manifest.files.head.path)).getParentFile,
      "part-fresh777.parquet")
    java.nio.file.Files.copy(part.toPath, dest.toPath)
    val entries = ZoneMap.collectStatsDf(
      spark.read.parquet(dest.toString), manifest.statsCols)
    ZoneMap.write(dir, ZoneMap.read(dir).copy(
      files = ZoneMap.read(dir).files ++ entries))
    KeyIndex.update(spark, dir, Nil, entries) // appends the row, no refresh
    val m2 = ZoneMap.read(dir)
    val freshHit = KeyIndex.affectedPaths(spark, dir,
      Seq(hashOf(777777L)), m2).get
    assert(freshHit.contains(KeyIndex.norm(dest.toURI.toString)),
      s"post-union file must be found: $freshHit")
    assert(KeyIndex.lastShardsRead <= 3,
      s"covered union-negative shards must stay skipped " +
        s"(read ${KeyIndex.lastShardsRead})")

    // without the unions file the lookup reads every shard and can only
    // ADD per-file-bloom false positives
    java.nio.file.Files.delete(KeyIndex.path(dir).resolve("_unions.bin"))
    val full = KeyIndex.affectedPaths(spark, dir, hashes, manifest).get
    assert(KeyIndex.lastShardsRead >= shardsSkipped)
    assert(skipped.subsetOf(full),
      s"skipped lookup returned files the full lookup did not: " +
        s"${skipped -- full}")
    assert(truth.subsetOf(full))
  }
}
