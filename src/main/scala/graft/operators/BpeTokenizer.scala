package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.{Bpe, TextFunctions}

/** The distributed halves of the BPE tokenizer: corpus word counts in,
  * a broadcast (word → token count) map out.
  *
  * Scale shape (the standard BPE trainer shape — HF/sentencepiece train
  * the same way): the corpus-sized work is ONE hash aggregation to the
  * word-frequency vocabulary; the merge loop runs on that dict
  * driver-side (|vocab| ≪ corpus — a few MB of (word, count) even for
  * web-scale text after the agg). Applying the tokenizer never encodes
  * per row: each DISTINCT word is encoded once on the driver and the
  * (word → n_tokens) map broadcast-joins against the exploded corpus.
  */
object BpeTokenizer {

  /** Distributed word-frequency vocabulary `(w, cnt)`. */
  def vocabulary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** One vocabulary agg + the driver-side merge loop. */
  def train(df: DataFrame, textCol: String, numMerges: Int): Vector[Bpe.Merge] =
    Bpe.train(collectVocab(df, textCol).map { case (w, c) => (w, c) }, numMerges)

  private def collectVocab(df: DataFrame, textCol: String): Seq[(String, Long)] =
    vocabulary(df, textCol).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq

  /** Per-group whitespace vs BPE token totals under a tokenizer trained
    * on THIS corpus: `(groupCol, n_docs, total_ws_tokens,
    * total_bpe_tokens)`. One corpus pass builds the vocabulary, the
    * merge loop and per-distinct-word encoding run on the dict, and one
    * more pass joins the broadcast length map. `idCol` names the
    * document identity column for the per-doc rollup.
    */
  def tokenCounts(df: DataFrame, groupCol: String, textCol: String,
      numMerges: Int, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    val vocab = collectVocab(df, textCol)
    val ranks = Bpe.train(vocab, numMerges).zipWithIndex.toMap
    val lens = vocab.map { case (w, _) =>
      (w, Bpe.encode(w, ranks).length.toLong) }
    val lensDf = spark.createDataFrame(lens).toDF("w", "n_bpe")
    df.select(col(groupCol), col(idCol),
        explode(TextFunctions.words(col(textCol))).as("w"))
      .join(broadcast(lensDf), "w")
      .groupBy(col(groupCol), col(idCol))
      .agg(count(lit(1)).as("n_ws"), sum(col("n_bpe")).as("n_bpe"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("total_ws_tokens"),
        sum(col("n_bpe")).as("total_bpe_tokens"))
      .orderBy(col(groupCol))
  }
}
