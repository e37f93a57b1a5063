package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class InvertedIndexSuite extends SparkTestBase {

  private def corpus = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, "hash join hash join scan"),
      (2L, "the hash  JOIN is slow"), // double space + case folding
      (3L, "join hash"),              // reversed — no phrase hit
      (4L, "x x x y"),                // overlapping phrase positions
      (5L, "hash")                    // shorter than the phrase
    ).toDF("doc_id", "text")
  }

  test("postings: 1-based positions, lower-cased, whitespace-run split") {
    val p = InvertedIndex.postings(corpus, "doc_id", "text")
      .filter(col("doc_id") === 2L)
      .orderBy(col("pos"))
      .collect().map(r => (r.getString(0), r.getInt(2)))
    assert(p.toSeq === Seq(("the", 1), ("hash", 2), ("join", 3),
      ("is", 4), ("slow", 5)))
  }

  test("phraseHits counts overlapping occurrences; regex would not") {
    val hits = InvertedIndex.phraseHits(corpus, "doc_id", "text",
        Seq("hash", "join"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq === Seq((1L, 2L, 1L), (2L, 1L, 2L)))

    // "x x x" holds TWO overlapping "x x" starts (1 and 2); a regex with
    // a consumed trailing boundary finds only one
    val xx = InvertedIndex.phraseHits(corpus, "doc_id", "text", Seq("x", "x"))
      .filter(col("doc_id") === 4L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(xx.toSeq === Seq((2L, 1L)))
  }

  test("bigrams keep multiplicity and order; single-token docs drop out") {
    val bg = InvertedIndex.bigrams(corpus, "doc_id", "text")
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(bg.toSeq === Seq(("hash", "join"), ("join", "hash"),
      ("hash", "join"), ("join", "scan")))
    assert(InvertedIndex.bigrams(corpus, "doc_id", "text")
      .filter(col("doc_id") === 5L).count() === 0L)
  }

  test("bm25 matches a brute-force driver computation of the same formula") {
    val terms = Seq("hash", "join")
    val (k1, b) = (1.2, 0.75)
    val rows = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
    val toks = rows.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq }.toMap
    val n = toks.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val dfm = terms.map(t => t -> toks.values.count(_.contains(t))).toMap
    val want = toks.flatMap { case (id, ws) =>
      val score = terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0) *
          tf / (tf + k1 * (1 - b + b * ws.size / avgdl))
      }.sum
      if (score > 0) Some(id -> score) else None
    }
    val got = InvertedIndex.bm25(corpus, "doc_id", "text", terms, k1, b)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (id, s) => assert(math.abs(got(id) - s) < 1e-12) }
  }

  test("bigram cross-entropy matches a brute-force driver computation") {
    val k = 0.5
    val toks = corpus.collect().map(r => (r.getLong(0),
      r.getString(1).trim.toLowerCase.split("\\s+").toSeq)).toMap
    val bgs = toks.view.mapValues(ws => ws.zip(ws.drop(1))).toMap
    val c2 = bgs.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = toks.values.flatten.toSet.size
    val want = bgs.collect { case (id, bs) if bs.nonEmpty =>
      id -> (-bs.map(bg => math.log((c2(bg) + k) / (c1(bg._1) + k * v)))
        .sum / math.log(2.0) / bs.size)
    }
    val got = InvertedIndex.bigramCrossEntropy(corpus, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (id, x) =>
      assert(math.abs(got(id)._1 - x) < 1e-9, s"doc $id")
      assert(got(id)._2 === bgs(id).size.toLong)
    }
  }
}
