package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions._

/** The end-to-end training-data curation pipeline, as ONE composed
  * lazy plan: quality gate → exact dedup (keep min-id per content hash)
  * → near-dup CLUSTER dedup (union of verified-MinHash and SimHash
  * signals → connected components → keep each cluster's min-id
  * representative) → deterministic hash split → per-split/lang corpus
  * accounting. This is the composition a reference user would run
  * end-to-end; every stage is an operator already gated individually
  * (q24-q31, q69, q71), composed here the way a real corpus build
  * chains them.
  *
  * Scale shape: the quality gate and content hash are map-side; exact
  * dedup is one hash shuffle; the near-dup graph is banded (never
  * all-pairs) and its component step is the log-round
  * large-star/small-star operator; the split is a pure column
  * expression. Nothing is driver-side.
  */
object CurationQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.parallelized(Tables.load(s, d, "documents"))

  /** The curated corpus: input docs reduced to quality-gated,
    * exact-deduped, cluster-deduped survivors, each with its
    * deterministic split and token count attached. The CLI writes this
    * frame; q72 rolls it up.
    */
  def curate(dd: DataFrame, minChars: Long = 100): DataFrame = {
    // 1. quality gate (deterministic min-length floor)
    val base = dd.filter(col("n_chars") >= minChars)
    // 2. exact dedup: keep the smallest doc_id per content hash
    val hashed = base.withColumn("__h", md5(col("text")))
    val keepIds = hashed.groupBy(col("__h")).agg(min(col("doc_id")).as("doc_id"))
    // kept feeds three downstream consumers (simhash signatures,
    // shingle index, final projection) — materialize once per run
    val kept = graft.runner.Materialize.track(
      hashed.join(keepIds, Seq("__h", "doc_id")).drop("__h"))
    // 3. near-dup cluster dedup: union signal edges, CC, keep each
    //    component's min (== the component label itself)
    val dropIds = graft.operators.ConnectedComponents.run(DedupQueries.nearDupEdges(kept))
      .filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    // no broadcast hint: on a dup-heavy corpus the drop set is
    // corpus-scale; AQE broadcasts it while it is actually small
    val uniq = kept.join(dropIds, Seq("doc_id"), "left_anti")
    // 4. deterministic split + token count
    withSplitAndTokens(uniq)
  }

  /** Deterministic hash split (80/10/10 on md5 of the doc id — stable
    * under corpus growth, so incremental curation assigns the same
    * split a from-scratch build would) plus the token count. Shared by
    * [[curate]] and [[IncrementalCuration.corpus]].
    */
  private[queries] def withSplitAndTokens(df: DataFrame): DataFrame = {
    val bucket = conv(substring(
      md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 4),
      16, 10).cast("long") % 100
    df
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .withColumn("n_tok", size(words(col("text"))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_curation_pipeline" -> ((s, d) =>
      curate(docs(s, d))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
        .orderBy(col("split"), col("lang")))
  )

  val oracles: Map[String, String] = Map(
    "q72_curation_pipeline" ->
      s"""WITH RECURSIVE
         |base AS (SELECT * FROM documents WHERE n_chars >= 100),
         |keep1 AS (SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)),
         |kept AS (SELECT b.* FROM base b JOIN keep1 USING (doc_id)),
         |${DedupQueries.shingleCteFrom("kept")},
         |${DedupQueries.nearDupEdgeCtes("kept")},
         |${DedupQueries.ccCtes},
         |uniq AS (
         |  SELECT * FROM kept
         |  WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component))
         |SELECT split, lang, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS total_tokens
         |FROM (SELECT lang,
         |        CASE WHEN b < 80 THEN 'train'
         |             WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
         |        len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok
         |      FROM (SELECT lang, text,
         |              ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
         |                % 100 AS b
         |            FROM uniq))
         |GROUP BY split, lang ORDER BY split, lang""".stripMargin
  )
}
