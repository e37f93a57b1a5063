package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.{Bpe, TextFunctions}

/** The distributed halves of the BPE tokenizer: corpus word counts in,
  * a broadcast (word → token count) map out.
  *
  * Scale shape (the standard BPE trainer shape — HF/sentencepiece train
  * the same way): the corpus-sized work is ONE hash aggregation to the
  * word-frequency vocabulary; the merge loop runs driver-side on a
  * BOUNDED dict — only the `maxVocab` most frequent words are ever
  * collected (heavy-tailed web corpora have 10^8+ distinct tokens; the
  * long tail of hapaxes contributes no repeated pairs, so capping it
  * changes no learned merge in practice — the same min-frequency bound
  * every production trainer applies). Encoding is NEVER capped: each
  * DISTINCT word is encoded once on executors (vocab-sized map pass
  * with the broadcast merge ranks) and the (word → n_tokens) frame
  * joins against the exploded corpus.
  */
object BpeTokenizer {

  /** Cap on driver-collected training words (most-frequent first):
    * bounds driver memory at ~hundreds of MB for the worst web-scale
    * vocabularies while leaving any gate-sized corpus untouched.
    */
  val DefaultMaxVocab: Int = 2 << 20

  /** Distributed word-frequency vocabulary `(w, cnt)`. */
  def vocabulary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** One vocabulary agg + the driver-side merge loop over the capped
    * most-frequent dict (deterministic cap: count desc, word asc).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = DefaultMaxVocab): Vector[Bpe.Merge] =
    Bpe.train(collectVocab(vocabulary(df, textCol), maxVocab), numMerges)

  private def collectVocab(vocab: DataFrame, maxVocab: Int): Seq[(String, Long)] =
    vocab.orderBy(col("cnt").desc, col("w")).limit(maxVocab).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq

  /** Per-group whitespace vs BPE token totals under a tokenizer trained
    * on THIS corpus: `(groupCol, n_docs, total_ws_tokens,
    * total_bpe_tokens)`. One corpus pass builds the vocabulary; the
    * merge loop runs on the capped driver dict; per-distinct-word
    * encoding runs distributed over the FULL vocabulary (broadcast merge
    * ranks — rare words beyond the training cap still encode exactly);
    * one more corpus pass joins the length map. `idCol` names the
    * document identity column for the per-doc rollup.
    */
  def tokenCounts(df: DataFrame, groupCol: String, textCol: String,
      numMerges: Int, idCol: String = "doc_id",
      maxVocab: Int = DefaultMaxVocab): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // one vocabulary agg feeds both the capped train collect and the
    // distributed encode pass
    val vocab = graft.runner.Materialize.track(vocabulary(df, textCol))
    val ranks = Bpe.train(collectVocab(vocab, maxVocab), numMerges)
      .zipWithIndex.toMap
    val ranksB = spark.sparkContext.broadcast(ranks)
    // vocab-sized (not corpus-sized) imperative pass: Bpe.encode has no
    // Catalyst form; AQE picks the join strategy (broadcast when small)
    val lensDf = vocab.select(col("w")).as[String]
      .mapPartitions(it => it.map(w =>
        (w, Bpe.encode(w, ranksB.value).length.toLong)))
      .toDF("w", "n_bpe")
    df.select(col(groupCol), col(idCol),
        explode(TextFunctions.words(col(textCol))).as("w"))
      .join(lensDf, "w")
      .groupBy(col(groupCol), col(idCol))
      .agg(count(lit(1)).as("n_ws"), sum(col("n_bpe")).as("n_bpe"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("total_ws_tokens"),
        sum(col("n_bpe")).as("total_bpe_tokens"))
      .orderBy(col(groupCol))
  }
}
