package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contract of the degenerate-bucket star cap (DedupQueries round 10):
  * dormant at gate scale (capped == uncapped, bit-identical), and
  * connectivity-preserving within an oversized bucket (every member
  * pairs with the bucket root).
  */
class DedupCapSuite extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("caps are dormant at gate scale: q69 edges identical capped vs uncapped") {
    val dd = graft.Tables.load(spark, sf, "documents")
    def edges(cap: Boolean): Set[(Long, Long)] = {
      val toks = graft.runner.Materialize.track(DedupQueries.tokens(dd))
      val hashed = graft.runner.Materialize.track(DedupQueries.shingleHashesFrom(toks))
      val sh = graft.runner.Materialize.track(DedupQueries.simhashOf(toks))
      val (mb, sb) =
        if (cap) (DedupQueries.DegenerateBucketCap, DedupQueries.SimhashBandCap)
        else (Int.MaxValue, Int.MaxValue)
      val e = DedupQueries.simhashPairsOf(sh, None, sb).select(col("da"), col("db"))
        .unionAll(DedupQueries.verifiedByJaccard(
          DedupQueries.minhashCandidates(DedupQueries.minhashSigsOf(hashed), None, mb),
          hashed))
      val out = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.runner.Materialize.releaseAll()
      out
    }
    assert(edges(cap = true) == edges(cap = false))
  }

  test("an oversized bucket emits head all-pairs + star candidates covering every member") {
    import spark.implicits._
    // 100 identical docs: every minhash bucket holds all 100 (> cap=8
    // here via the tiny test cap), so the head keeps all-pairs among
    // ids 1..8 and the tail stars to the root
    val docs = (1L to 100L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val toks = DedupQueries.tokens(docs)
    val hashed = DedupQueries.shingleHashesFrom(toks)
    val cand = DedupQueries.minhashCandidates(
      DedupQueries.minhashSigsOf(hashed), None, 8)
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for (i <- 1L to 8L; j <- (i + 1) to 8L) yield (i, j)).toSet ++
      (9L to 100L).map(x => (1L, x)).toSet
    assert(pairs == expected)
    // and the full cluster still forms: CC over the star = one component
    val comps = graft.operators.ConnectedComponents
      .run(cand.toDF("da", "db"))
      .select(col("component")).distinct().collect()
    graft.runner.Materialize.releaseAll()
    assert(comps.length == 1)
  }

  test("newFlag star keeps only pairs with a new side, roots stay append-stable") {
    import spark.implicits._
    val docs = (1L to 50L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta", i > 45))
      .toDF("doc_id", "text", "__new")
    val toks = docs.select(col("doc_id"),
      graft.text.TextFunctions.words(col("text")).as("ws"))
    val hashed = DedupQueries.shingleHashesFrom(toks)
    val sigs = DedupQueries.minhashSigsOf(hashed)
      .join(docs.select("doc_id", "__new"), "doc_id")
    val pairs = DedupQueries.minhashCandidates(sigs, Some("__new"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // star to the bucket min (doc 1, old): only the flagged tails survive
    assert(pairs == (46L to 50L).map(x => (1L, x)).toSet)
    graft.runner.Materialize.releaseAll()
  }
}
