package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, heuristic language ID, canonical fingerprinting.
  * Greenfield (no reference counterpart) — the text half of a
  * training-data pipeline. All per-row expressions + one hash agg: scale
  * is linear in rows with no shuffle beyond the final groupBy.
  */
object TextQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** GPT-2-shaped pre-tokenizer regex, restricted to constructs RE2 also
    * supports (no lookahead): contraction suffixes, optionally
    * space-prefixed letter / digit / punctuation runs, whitespace runs.
    */
  private val BpeIshPattern =
    "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9']+|\\s+"

  // Stopword marker sets for the language-ID heuristic. Fixed priority
  // order (en > zh > es > de > fr) breaks score ties deterministically.
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "zh" -> Seq("de", "le", "shi", "bu", "zai"),
    "es" -> Seq("el", "la", "que", "en", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting per language: whitespace tokens AND a BPE-style
    // pre-tokenizer count (GPT-2-shaped regex, lookahead-free so the
    // same pattern runs in Java regex and DuckDB's RE2: contractions,
    // space-prefixed word/number/punctuation runs, residual whitespace).
    "q24_token_count" -> ((s, d) => {
      docs(s, d)
        .withColumn("n_tok", size(words(col("text"))))
        .withColumn("n_bpe",
          size(regexp_extract_all(col("text"), lit(BpeIshPattern), lit(0))))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          round(avg(col("n_tok")), 6).as("avg_tokens"),
          max(col("n_tok")).as("max_tokens"),
          sum(col("n_bpe")).as("total_bpe_tokens"),
          round(avg(col("n_bpe")), 6).as("avg_bpe_tokens"))
        .orderBy(col("lang"))
    }),

    // Quality scoring: chars/token, stopword ratio, digit ratio, per source.
    "q25_text_quality" -> ((s, d) => {
      val ws = words(col("text"))
      val stops = Seq("the", "a", "of", "and", "to")
      docs(s, d)
        .withColumn("n_tok", size(ws))
        .withColumn("char_per_tok", length(col("text")).cast("double") / col("n_tok"))
        .withColumn("stop_ratio",
          size(filter(ws, w => w.isin(stops: _*))).cast("double") / col("n_tok"))
        .withColumn("digit_ratio",
          (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
            .cast("double") / length(col("text")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("char_per_tok")), 6).as("avg_char_per_tok"),
          round(avg(col("stop_ratio")), 6).as("avg_stop_ratio"),
          round(avg(col("digit_ratio")), 6).as("avg_digit_ratio"))
        .orderBy(col("source"))
    }),

    // Heuristic language ID: marker-stopword votes, fixed-priority argmax;
    // output is the (labeled lang, predicted lang) confusion matrix.
    // All 5 marker counts come from ONE codegen'd traversal of the words
    // array (markerScores) — the previous 5 interpreted-HOF filter terms
    // each re-evaluated the split (round-3 VERDICT #2, 5.1 s at sf0.1).
    "q26_lang_id" -> ((s, d) => {
      val scored = docs(s, d)
        .withColumn("sc", markerScores(words(col("text")), markers.map(_._2)))
      val Seq(en, zh, es, de, fr) = markers.indices.map(i => col("sc")(i))
      val predicted = when(en >= greatest(zh, es, de, fr), "en")
        .when(zh >= greatest(es, de, fr), "zh")
        .when(es >= greatest(de, fr), "es")
        .when(de >= fr, "de")
        .otherwise("fr")
      scored
        .withColumn("predicted", predicted)
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"), col("predicted"))
    }),

    // Canonical fingerprint dedup accounting per source.
    "q27_fingerprint" -> ((s, d) => {
      docs(s, d)
        .withColumn("fp", fingerprint(col("text")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_dup"))
        .orderBy(col("source"))
    }),

    // Deterministic hash split: the train/val/test assignment a training
    // pipeline needs must be a pure function of a stable document key —
    // never rand() — so re-runs, late-arriving shards, and incremental
    // appends land every doc in the same split on every engine. Bucket =
    // first 4 hex digits of md5("split|" + doc_id) mod 100; 80/10/10.
    // Pure map-side expression: one shuffle total (the final rollup).
    // Gopher-style repetition quality gate (Rae et al. 2021 §A1.1): drop
    // docs whose most frequent word dominates (> 12% of tokens) or whose
    // duplicate-2-gram fraction exceeds 5%. All three raw counts come
    // from ONE codegen'd traversal (repetitionStats) — the HOF
    // formulation is O(distinct x n) interpreted work per row. Per-row
    // map + one rollup shuffle: linear at 100 TB.
    "q75_repetition_filter" -> ((s, d) => {
      val st = repetitionStats(words(col("text")))
      val kept = docs(s, d)
        .withColumn("n_tok", size(words(col("text"))))
        .withColumn("top_frac", st(0).cast("double") / col("n_tok"))
        .withColumn("dup2_frac",
          when(col("n_tok") > 1,
            lit(1.0) - st(2).cast("double") / (col("n_tok") - 1))
            .otherwise(lit(0.0)))
        .withColumn("keep", col("top_frac") <= 0.12 && col("dup2_frac") <= 0.05)
      kept.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          round(avg(col("top_frac")), 6).as("avg_top_word_frac"),
          round(avg(col("dup2_frac")), 6).as("avg_dup_2gram_frac"))
        .orderBy(col("lang"))
    }),

    "q71_hash_split" -> ((s, d) => {
      val bucket = conv(substring(
        md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 4),
        16, 10).cast("long") % 100
      docs(s, d)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"), col("lang"))
    })
  )

  private val markerSql: Map[String, String] =
    markers.toMap.map { case (k, v) =>
      k -> v.map(w => s"'$w'").mkString("(", ",", ")")
    }

  val oracles: Map[String, String] = Map(
    "q24_token_count" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        | round(avg(n_tok),6) AS avg_tokens,
        | CAST(max(n_tok) AS INTEGER) AS max_tokens,
        | CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
        | round(avg(n_bpe),6) AS avg_bpe_tokens
        |FROM (SELECT lang,
        |        len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok,
        |        len(regexp_extract_all(text,
        |          '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9'']+|\s+')) AS n_bpe
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q25_text_quality" ->
      """SELECT source, count(*) AS n_docs,
        | round(avg(length(text)*1.0/n_tok),6) AS avg_char_per_tok,
        | round(avg(n_stop*1.0/n_tok),6) AS avg_stop_ratio,
        | round(avg((length(text)-length(regexp_replace(text,'[0-9]','','g')))*1.0
        |           /length(text)),6) AS avg_digit_ratio
        |FROM (SELECT source, text,
        |        len(ws) AS n_tok,
        |        len(list_filter(ws, w -> w IN ('the','a','of','and','to'))) AS n_stop
        |      FROM (SELECT source, text,
        |              string_split_regex(lower(trim(text)), '\s+') AS ws
        |            FROM documents))
        |GROUP BY source ORDER BY source""".stripMargin,
    "q26_lang_id" -> {
      val scoreCols = markers.map { case (code, _) =>
        s"len(list_filter(ws, w -> w IN ${markerSql(code)})) AS s_$code"
      }.mkString(",\n        ")
      s"""SELECT lang, predicted, count(*) AS cnt
         |FROM (SELECT lang,
         |        CASE WHEN s_en >= greatest(s_zh, s_es, s_de, s_fr) THEN 'en'
         |             WHEN s_zh >= greatest(s_es, s_de, s_fr) THEN 'zh'
         |             WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
         |             WHEN s_de >= s_fr THEN 'de'
         |             ELSE 'fr' END AS predicted
         |      FROM (SELECT lang,
         |        $scoreCols
         |        FROM (SELECT lang, string_split_regex(lower(trim(text)), '\\s+') AS ws
         |              FROM documents)))
         |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
    },
    "q27_fingerprint" ->
      """SELECT source, count(*) AS n_docs,
        | count(DISTINCT fp) AS n_unique,
        | count(*) - count(DISTINCT fp) AS n_dup
        |FROM (SELECT source,
        |        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |      FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin,
    "q75_repetition_filter" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(CASE WHEN top_frac <= 0.12 AND dup2_frac <= 0.05
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | round(avg(top_frac),6) AS avg_top_word_frac,
        | round(avg(dup2_frac),6) AS avg_dup_2gram_frac
        |FROM (SELECT lang,
        |        max_wc*1.0/n_tok AS top_frac,
        |        CASE WHEN n_tok > 1
        |          THEN 1.0 - d2g*1.0/(n_tok-1) ELSE 0.0 END AS dup2_frac
        |      FROM (SELECT lang, len(ws) AS n_tok,
        |              list_max(list_transform(list_distinct(ws),
        |                x -> len(list_filter(ws, y -> y = x)))) AS max_wc,
        |              len(list_distinct(list_transform(
        |                generate_series(1, greatest(len(ws)-1,0)),
        |                i -> ws[i] || ' ' || ws[i+1]))) AS d2g
        |            FROM (SELECT lang,
        |                    string_split_regex(lower(trim(text)), '\s+') AS ws
        |                  FROM documents)))
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q71_hash_split" ->
      """SELECT split, lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM (SELECT lang, n_chars,
        |        CASE WHEN b < 80 THEN 'train'
        |             WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |      FROM (SELECT lang, n_chars,
        |              ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
        |                % 100 AS b
        |            FROM documents))
        |GROUP BY split, lang ORDER BY split, lang""".stripMargin
  )
}
