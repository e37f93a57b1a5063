package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions.words

/** Positional inverted index + ranked retrieval over a text column.
  * Greenfield (no reference counterpart) — the retrieval half of a
  * training-data pipeline: corpus search for curation debugging,
  * contamination auditing ("which training docs contain this eval
  * phrase"), and BM25-ranked quality probes.
  *
  * Scale design (the 100 TB lens):
  *  - [[postings]] is one narrow projection + `posexplode` — no shuffle
  *    of its own; every consumer aggregates it ON the term key, so the
  *    single shuffle each pipeline pays is the one that builds its
  *    per-term state. At warehouse scale you'd persist this frame
  *    bucketed by `term` and share it across queries (same pattern as
  *    the layout family's write-order manifests).
  *  - [[bm25]] filters the postings to the query's terms BEFORE any
  *    aggregation: tf/df state is O(docs containing a query term), not
  *    O(corpus). The only corpus-sized aggregates are the per-doc
  *    length frame and one scalar (N, avgdl) pass; the final score join
  *    keys on doc_id against the tiny tf side, so AQE broadcasts it.
  *  - [[phraseHits]] is the classic positional-index phrase join:
  *    filter postings to the phrase's terms, then m-1 self-equi-joins
  *    on (doc_id, pos+offset). Each join side is |postings of one
  *    term|, shuffled on (doc_id, pos) — never a cartesian, and never
  *    a corpus re-scan per term (one postings frame feeds all m sides).
  */
object InvertedIndex {

  /** Positional postings `(term, doc_id, pos)` — pos is 1-based (first
    * token = 1), matching SQL array indexing so oracles stay literal.
    */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(words(col(textCol))).as(Seq("p0", "term")))
      .select(col("term"), col("doc_id"), (col("p0") + 1).as("pos"))

  /** Per-doc token counts `(doc_id, dl)` — one pass, no explode. */
  def docLengths(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      size(words(col(textCol))).cast("long").as("dl"))

  /** BM25 scores for a bag of query terms: one row per doc containing at
    * least one term, `(doc_id, score)`, score = Σ_t idf(t) · tf / (tf +
    * k1·(1 − b + b·dl/avgdl)) with the Lucene-style non-negative idf
    * ln((N − df + ½)/(df + ½) + 1).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // ONE tokenize pass (r19, guide §2.3/§1.2): the old formulation ran
    // the regex tokenizer twice — a full positional posexplode for tf
    // (filtered to the query terms only afterwards) plus a second
    // words() pass for doc lengths. BM25 never uses positions, so one
    // narrow pass computes (doc_id, dl, query-term multiset) directly;
    // the cached frame is two longs + a few terms per doc, and both the
    // scalar stats and the tf branch read it. Plan effect at sf0.1: 2
    // corpus Generates -> 1 tiny explode, 2 corpus scans -> 1.
    val ws = words(col(textCol))
    val base = graft.runner.Materialize.trackLazy(
      df.select(col(idCol).as("doc_id"), ws.as("__ws"))
        .select(col("doc_id"), size(col("__ws")).cast("long").as("dl"),
          filter(col("__ws"), w => w.isin(terms: _*)).as("qws")))
    val dl = base.select(col("doc_id"), col("dl"))
    val post = base.select(col("doc_id"), explode(col("qws")).as("term"))
    bm25FromPostings(post, dl, k1, b)
  }

  /** BM25 off pre-built frames: `post` = term-filtered postings (only
    * the query's terms), `dl` = the full corpus `(doc_id, dl)`. Shared
    * by the inline path above and the persisted [[SearchIndex]], whose
    * postings arrive from a term-sorted zone-map table that already
    * skipped non-matching files.
    */
  private[operators] def bm25FromPostings(post: DataFrame, dl: DataFrame,
      k1: Double, b: Double): DataFrame = {
    val tf = post.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // docs-per-term off the tf frame: one row per (doc, term) already
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val idf = log(
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    tf.join(dft, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats)) // single-row frame
      .withColumn("term_score",
        idf * col("tf") /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score"))
  }

  /** Exact phrase occurrences via the positional index: `(doc_id,
    * n_hits, first_pos)` for every doc containing the consecutive-token
    * phrase. Counts overlapping occurrences ("x x x" has two hits of
    * "x x") — the regex formulation with consumed boundaries undercounts
    * exactly that case, which is why the suite pins it.
    */
  def phraseHits(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseHits: empty phrase")
    // tracked: the filtered postings (small — phrase terms only) feed
    // one join side per phrase token; without the persist each side
    // would re-scan and re-explode the whole corpus (runner releases it)
    val post = graft.runner.Materialize.track(postings(df, idCol, textCol)
      .filter(col("term").isin(phrase.distinct: _*)))
    phraseFromPostings(post, phrase)
  }

  /** Phrase matching off a pre-built postings frame (already filtered
    * or file-skipped to the phrase's terms): m−1 chained equi-joins on
    * (doc_id, start-anchored position).
    */
  private[operators] def phraseFromPostings(post: DataFrame,
      phrase: Seq[String]): DataFrame = {
    val anchored = phrase.zipWithIndex.map { case (t, i) =>
      post.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    val starts = anchored.reduce { (a, bdf) =>
      a.join(bdf, Seq("doc_id", "start"))
    }
    starts.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        min(col("start")).cast("long").as("first_pos"))
  }

  /** Bigram sequence `(doc_id, w1, w2)` — every adjacent token pair, in
    * order, duplicates kept (LM counts need multiplicity). One zip of
    * two array slices per row; no positional explode or self-join.
    */
  def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    df.select(col(idCol).as("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Token pairs WITH a per-token sentinel: every token w of every doc
    * yields exactly one row (doc_id, w1 = w, w2 = next token or NULL for
    * the doc's last token). Consequences that make one corpus pass serve
    * every n-gram statistic at once (r19, guide §2.3 "aggregate before
    * you shuffle" / §1.2 "remove passes"):
    *   - rows with w2 IS NOT NULL are exactly [[bigrams]];
    *   - count by w1 (sentinels included) is the exact unigram count;
    *   - distinct w1 (sentinels included) is the exact vocabulary.
    * An empty token array contributes one (null, null) row (zip_with
    * pads the shorter side), which every consumer ignores: w2-filtered
    * frames drop it, and countDistinct/count-by-w1 of NULL never joins
    * a real word.
    */
  def pairsWithSentinel(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    df.select(col(idCol).as("doc_id"), ws.as("ws"))
      .select(col("doc_id"), explode(zip_with(
        col("ws"),
        concat(slice(col("ws"), lit(2),
          greatest(size(col("ws")) - 1, lit(0))),
          array(lit(null).cast("string"))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Per-doc cross-entropy (bits/bigram) under an add-k smoothed bigram
    * LM trained on the corpus itself — the CCNet/FineWeb-style
    * perplexity quality filter, self-trained so it needs no external
    * model. `(doc_id, xent, n_bigrams)`; higher xent = less like the
    * corpus. P(w2|w1) = (C(w1,w2) + k) / (C(w1·) + k·V), V = unigram
    * vocabulary size.
    *
    * Two corpus passes (count bigrams; score docs) sharing one bigram
    * frame; the LM join keys on (w1,w2) — a vocabulary-sized frame that
    * AQE broadcasts when small and shuffles when not. Nothing is
    * driver-side except the two scalar stats.
    */
  def bigramCrossEntropy(df: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    // r19 single-tokenize formulation (guide §1.2/§2.3). Before: THREE
    // corpus tokenizations (bigrams for counting, bigrams for scoring —
    // shared via cache — plus a separate words() explode for the
    // vocabulary) and TWO corpus-sized shuffles off the cached bigrams
    // (cbg for the join, cbg again under cw). Now: ONE tokenize pass
    // (pairs with sentinel), ONE corpus-sized shuffle (the (w1,w2)
    // count); vocabulary and C(w1·) are vocab-sized re-aggregates of
    // that count — the sentinel row per token makes count-by-w1 the
    // exact unigram count and distinct-w1 the exact vocabulary.
    val ps = graft.runner.Materialize.trackLazy(
      pairsWithSentinel(df, idCol, textCol))
    val cAll = graft.runner.Materialize.trackLazy(
      ps.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2")))
    val cbg = cAll.filter(col("w2").isNotNull)
    val cw = cbg.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val voc = cAll.agg(countDistinct(col("w1")).as("v"))
    ps.filter(col("w2").isNotNull)
      .join(cbg, Seq("w1", "w2"))
      .join(cw, Seq("w1"))
      .crossJoin(broadcast(voc)) // single-row frame
      .groupBy(col("doc_id"))
      .agg(
        (-sum(log((col("c2") + lit(k)) / (col("c1") + lit(k) * col("v"))))
          / log(lit(2.0)) / count(lit(1))).as("xent"),
        count(lit(1)).as("n_bigrams"))
  }
}
