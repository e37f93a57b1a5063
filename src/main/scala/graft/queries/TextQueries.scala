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

    // Unigram-LM surprisal (the CCNet/DataComp "LM quality" signal with
    // a corpus-trained unigram model standing in for the external LM —
    // fully self-contained and distributed): per-doc cross-entropy
    // avg(-ln p(word)) under the corpus word distribution; high = rare/
    // garbled vocabulary, low = repetitive boilerplate. The exploded
    // (doc_id, word) frame feeds BOTH the frequency table and the
    // scoring join — materialized once per run. Frequency join strategy
    // is AQE's choice: vocab-sized (broadcast at test SF, shuffle join
    // when a 100 TB Zipf vocabulary outgrows the threshold). Per-doc
    // scores are rounded to 6 dp BEFORE the flag compare so both
    // engines threshold identical values.
    "q79_unigram_surprisal" -> ((s, d) => {
      val w = graft.runner.Materialize.track(
        docs(s, d).select(col("doc_id"), col("lang"),
          explode(words(col("text"))).as("word")))
      val f = w.groupBy(col("word")).agg(count(lit(1)).as("c"))
      val n = f.agg(sum(col("c")).as("total"))
      val scored = w.join(f, "word").crossJoin(broadcast(n))
        .groupBy(col("doc_id"))
        .agg(first(col("lang")).as("lang"),
          round(avg(-log(col("c") / col("total"))), 6).as("sur"))
      scored.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("sur")), 6).as("avg_surprisal"),
          sum(when(col("sur") > 3.43, 1L).otherwise(0L)).as("n_flagged"))
        .orderBy(col("lang"))
    }),

    // Distinctive terms per language ("keyness"): relative-frequency
    // ratio p(w|lang)/p(w|corpus), top 5 per language at min support
    // tf >= 5. Deliberately log-free — pure rational arithmetic, so
    // both engines compute bit-identical scores. Top-k runs as the
    // TopKByScore AGGREGATE (k-bounded heap, map-side partials), not a
    // `row_number` window: a window over few groups caps parallelism at
    // #groups and shuffles the whole vocab-sized input, where the
    // aggregate shuffles at most k rows per (group, partition). Ties
    // break on the ROUNDED score then word — a total order, so the
    // result is partitioning-independent. tf is re-attached by joining
    // the 25-row top-k frame back to the cached (lang, word) counts.
    "q80_keyness_terms" -> ((s, d) => {
      val w = docs(s, d).select(col("lang"),
        explode(words(col("text"))).as("word"))
      val lw = graft.runner.Materialize.track(
        w.groupBy(col("lang"), col("word")).agg(count(lit(1)).as("tf")))
      val lt = lw.groupBy(col("lang")).agg(sum(col("tf")).as("lt"))
      val cw = lw.groupBy(col("word")).agg(sum(col("tf")).as("cf"))
      val ct = cw.agg(sum(col("cf")).as("n"))
      val sc = lw.filter(col("tf") >= 5)
        .join(broadcast(lt), "lang")
        .join(cw, "word")
        .crossJoin(broadcast(ct))
        .withColumn("keyness",
          round((col("tf") / col("lt")) / (col("cf") / col("n")), 6))
      val top = sc.groupBy(col("lang"))
        .agg(graft.operators.TopKAgg
          .topKByScore(col("keyness"), col("word"), 5).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("int").as("rk"),
          col("col.payload").as("word"), col("col.score").as("keyness"))
      // the k x #groups frame is the broadcast side; lw stays vocab-sized
      lw.join(broadcast(top), Seq("lang", "word"))
        .select(col("lang"), col("rk"), col("word"), col("tf"), col("keyness"))
        .orderBy(col("lang"), col("rk"))
    }),

    // Document chunking for embedding/context windows: overlapping
    // 64-word chunks at stride 48 (16-word overlap), the split an
    // embedding model's bounded context imposes before any similarity
    // indexing. Pure per-row array math (sequence + slice — chunk COUNT
    // and lengths here; the chunk text itself is the same slice joined)
    // + one rollup: linear, no shuffle before the final groupBy.
    "q81_chunking" -> ((s, d) => {
      val n = size(col("ws"))
      val starts = sequence(lit(0), ceil(n.cast("double") / 48).cast("long") - 1)
      docs(s, d)
        .select(col("doc_id"), col("lang"), words(col("text")).as("ws"))
        .select(col("doc_id"), col("lang"),
          explode(transform(starts,
            i => size(slice(col("ws"), (i * 48 + 1).cast("int"), lit(64))))).as("chunk_len"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(when(col("chunk_len") === 64, 1L).otherwise(0L)).as("n_full"),
          round(avg(col("chunk_len")), 6).as("avg_chunk_tokens"))
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
    }),

    // TRAINED BPE token counting: learn 24 merges from this corpus's
    // word-frequency dict (Sennrich et al. 2016), then count per-lang
    // BPE tokens via a broadcast word→length map — a real trainable
    // tokenizer beside q24's fixed-regex approximation. Oracle: the
    // merge loop replayed as a DuckDB recursive CTE (see oracles below);
    // BpeSuite additionally pins classic-example merges, the
    // encode==trainer-segmentation invariant, and a driver brute-force
    // parity run of this exact query shape.
    "q92_bpe_tokens" -> ((s, d) =>
      graft.operators.BpeTokenizer.tokenCounts(docs(s, d), "lang", "text", 24))
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
    "q79_unigram_surprisal" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents),
        |f AS (SELECT word, count(*) AS c FROM w GROUP BY word),
        |n AS (SELECT sum(c) AS total FROM f),
        |d AS (
        |  SELECT doc_id, any_value(lang) AS lang,
        |    round(avg(-ln(c*1.0/total)), 6) AS sur
        |  FROM w JOIN f USING (word), n GROUP BY doc_id)
        |SELECT lang, count(*) AS n_docs,
        |  round(avg(sur), 6) AS avg_surprisal,
        |  CAST(sum(CASE WHEN sur > 3.43 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "q80_keyness_terms" ->
      """WITH w AS (
        |  SELECT lang,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents),
        |lw AS (SELECT lang, word, count(*) AS tf FROM w GROUP BY lang, word),
        |lt AS (SELECT lang, sum(tf) AS lt FROM lw GROUP BY lang),
        |cw AS (SELECT word, sum(tf) AS cf FROM lw GROUP BY word),
        |ct AS (SELECT sum(cf) AS n FROM cw),
        |sc AS (
        |  SELECT lw.lang, lw.word, lw.tf,
        |    round((lw.tf*1.0/lt.lt)/(cw.cf*1.0/ct.n), 6) AS keyness
        |  FROM lw JOIN lt USING (lang) JOIN cw USING (word), ct
        |  WHERE lw.tf >= 5),
        |rk AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY lang ORDER BY keyness DESC, word) AS rk
        |  FROM sc)
        |SELECT lang, CAST(rk AS INTEGER) AS rk, word,
        |  CAST(tf AS BIGINT) AS tf, keyness
        |FROM rk WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,
    "q81_chunking" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(lower(trim(text)), '\s+') AS ws
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(
        |      generate_series(0, CAST(ceil(len(ws)*1.0/48) AS BIGINT)-1),
        |      i -> len(ws[i*48+1:i*48+64]))) AS chunk_len
        |  FROM w)
        |SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN chunk_len = 64 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_full,
        |  round(avg(chunk_len),6) AS avg_chunk_tokens
        |FROM ch GROUP BY lang ORDER BY lang""".stripMargin,
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
        |GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    // Trained-BPE replay: the sequential-greedy merge loop becomes a
    // recursive CTE (the q93 PageRank replay pattern) — `state` carries
    // every vocab word's current segmentation as a delimited string
    // (chr(1) tok chr(2) per token, so replace() on a pair is exactly
    // the trainer's left-to-right non-overlapping mergePair), and each
    // recursion step joins the one argmax pair (count desc, left, right
    // — Bpe.train's tie-break) computed over the working table, for 24
    // steps or until no pair repeats. Per-word BPE length then reads
    // off the FINAL segmentation — valid because encode() over merge
    // ranks reproduces the trainer's final segmentation for every
    // trained word (the invariant BpeSuite pins), and at gate scale the
    // whole vocabulary trains (no maxVocab cap reached).
    "q92_bpe_tokens" ->
      """WITH RECURSIVE
        |vocab AS (
        |  SELECT w, count(*)::BIGINT AS cnt
        |  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |        FROM documents)
        |  GROUP BY w),
        |state(it, w, cnt, s) AS (
        |  SELECT 0, w, cnt,
        |    array_to_string(list_transform(string_split(w, ''),
        |      c -> chr(1) || c || chr(2)), '') || chr(1) || '</w>' || chr(2)
        |  FROM vocab
        |  UNION ALL
        |  SELECT st.it + 1, st.w, st.cnt,
        |    replace(st.s, chr(1)||b.l||chr(2)||chr(1)||b.r||chr(2),
        |                  chr(1)||b.l||b.r||chr(2))
        |  FROM state st
        |  JOIN (
        |    SELECT it, l, r FROM (
        |      SELECT it, l, r,
        |        row_number() OVER (PARTITION BY it
        |          ORDER BY sum(m) DESC, l, r) AS rn
        |      FROM (
        |        SELECT p.it, p.m, p.toks[i.i] AS l, p.toks[i.i + 1] AS r
        |        FROM (SELECT it, cnt AS m,
        |                string_split(trim(s, chr(1)||chr(2)), chr(2)||chr(1)) AS toks
        |              FROM state) p,
        |             unnest(generate_series(1, len(p.toks) - 1)) AS i(i))
        |      GROUP BY it, l, r
        |      HAVING sum(m) >= 2)
        |    WHERE rn = 1) b ON b.it = st.it
        |  WHERE st.it < 24),
        |fin AS (
        |  SELECT w,
        |    len(string_split(trim(s, chr(1)||chr(2)), chr(2)||chr(1)))::BIGINT AS n_bpe
        |  FROM state WHERE it = (SELECT max(it) FROM state)),
        |corpus AS (
        |  SELECT lang, doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |perdoc AS (
        |  SELECT lang, doc_id, count(*) AS n_ws, sum(n_bpe) AS n_bpe
        |  FROM corpus JOIN fin USING (w)
        |  GROUP BY lang, doc_id)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_ws) AS BIGINT) AS total_ws_tokens,
        |  CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens
        |FROM perdoc GROUP BY lang ORDER BY lang""".stripMargin
  )
}
