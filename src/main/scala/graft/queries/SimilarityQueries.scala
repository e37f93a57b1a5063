package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.text.TextFunctions._
import graft.text.VectorExpressions.vecDot

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the correctness baseline, plus
  * random-hyperplane LSH bucketing as the approximate scale path.
  * Greenfield training-data-pipeline operators.
  *
  * Scale design: q32 broadcasts the (small) query set against the corpus
  * — one scan, no shuffle until the per-query top-k. q34's signature is a
  * per-row expression (16 broadcast-literal hyperplane dots); bucketing
  * an N-vector corpus is a single hash agg. q33 is the only quadratic
  * query (all-pairs top-20) — kept as the small-scale oracle baseline;
  * at 100 TB one uses q34's buckets to restrict q33's pair generation.
  */
object SimilarityQueries {

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")

  // Cosine via the codegen'd FloatVecDot kernel with norms precomputed
  // once per vector (bit-identical to computing them per pair — same
  // double ops in the same order — but O(n) instead of O(n^2) norm work,
  // and ~10x cheaper pair dot products than the zip_with/aggregate HOFs).
  private def withNorm(df: DataFrame, v: String, n: String): DataFrame =
    df.withColumn(n, sqrt(vecDot(col(v), col(v))))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-5 neighbors for the 10 query vectors.
    "q32_knn_cosine" -> ((s, d) => {
      val e = emb(s, d)
      val q = withNorm(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb")), "qemb", "qn")
      val c = withNorm(e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")), "cemb", "cn")
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("cid"))
      c.join(broadcast(q))
        .withColumn("sim",
          round(vecDot(col("qemb"), col("cemb")) / (col("qn") * col("cn")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("cid"), col("sim"))
        .orderBy(col("qid"), col("rank"))
    }),

    // Global top-20 most-similar pairs (embedding near-dup detection).
    "q33_emb_top_pairs" -> ((s, d) => {
      // spread the STREAMED side of the nested-loop join: the corpus
      // file is one split, and a 1-partition stream serializes the O(n^2)
      // dot products (measured 1.9 s single-task at sf0.1)
      val a = withNorm(Tables.parallelized(emb(s, d))
        .select(col("vec_id").as("va"), col("embedding").as("ea")), "ea", "na")
      val b = withNorm(emb(s, d)
        .select(col("vec_id").as("vb"), col("embedding").as("eb")), "eb", "nb")
      a.join(b, col("va") < col("vb"))
        .select(col("va"), col("vb"),
          round(vecDot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("sim"))
        .orderBy(col("sim").desc, col("va"), col("vb"))
        .limit(20)
    }),

    // Top-20 most-similar pairs restricted to LSH band buckets — the
    // linear-ish scale twin of q33 (round-3 VERDICT #6). The 16-bit
    // hyperplane signature splits into 4 bands of 4 bits; only pairs
    // sharing a full band are scored, so pair generation is bounded by
    // bucket sizes instead of O(n^2). The banding is part of the
    // operator's DEFINED semantics and the DuckDB oracle applies the
    // identical banding — verification is exact by construction and does
    // not hinge on recall. Recall itself is the usual LSH tradeoff:
    // measured 16/20 vs brute-force q33 at sf0.1 on THIS corpus, whose
    // top pairs are only cos~0.5-0.6 (the synthetic embeddings contain
    // no true near-dups; at cos>=0.95, 4x4 banding retrieves ~96% —
    // 1-(1-(1-theta/pi)^4)^4). More planes sharpen both recall and
    // bucket granularity at scale.
    // The hot-bucket guard (maxBucket=256, mirrored in the oracle) drops
    // any band bucket exceeding the cap before the self-join; it does not
    // bind on this corpus (max band bucket: 46 at sf0.01, 185 at sf0.1)
    // but bounds the worst case at scale — see EmbeddingLsh's object doc.
    "q33b_emb_top_pairs_lsh" -> ((s, d) => {
      graft.operators.EmbeddingLsh.candidatePairs(emb(s, d), 16, 4, maxBucket = 256)
        .distinct() // a pair can share several bands
        .orderBy(col("sim").desc, col("va"), col("vb"))
        .limit(20)
    }),

    // Embedding-cosine near-dup REMOVAL: drop every vector that has a
    // smaller-id LSH-band neighbor at cosine >= 0.5 — the dedup
    // (keep-one-representative) step over an embedding column. Candidate
    // generation is q33b's banding (bounded buckets, never all-pairs);
    // the banding is part of the operator's defined semantics and the
    // oracle applies it identically, so verification is exact.
    "q33c_emb_neardup_dedup" -> ((s, d) => {
      val e = emb(s, d)
      val dropped = graft.operators.EmbeddingLsh.candidatePairs(e, 16, 4, maxBucket = 256)
        .filter(col("sim") >= 0.5)
        .select(col("vb").as("vec_id"))
        .distinct()
      e.join(broadcast(dropped), Seq("vec_id"), "left_anti")
        .agg(count(lit(1)).as("n_retained"))
        .crossJoin(broadcast(e.agg(count(lit(1)).as("n_total"))))
        .select(col("n_total"), (col("n_total") - col("n_retained")).as("n_dropped"),
          col("n_retained"))
    }),

    // IVF coarse quantization: assign every vector to its nearest of 16
    // data-derived centroids (vec_id 0..15) by cosine; per-centroid
    // population + mean similarity. This is the partition-assignment
    // step of an IVF index — at scale each centroid's posting list is a
    // separate partition and queries probe only the nearest lists.
    "q35b_ivf_assign" -> ((s, d) => {
      val e = emb(s, d)
      val cents = withNorm(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")), "cemb", "cn")
      val vecs = withNorm(e.select(col("vec_id"), col("embedding")), "embedding", "vn")
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("sim").desc, col("cid"))
      vecs.join(broadcast(cents))
        .withColumn("sim",
          round(vecDot(col("embedding"), col("cemb")) / (col("vn") * col("cn")), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("cid"))
        // avg over doubles is summation-order-dependent (round-2 hash
        // mismatch): sum exactly in DECIMAL, divide once as a double
        .agg(count(lit(1)).as("n_assigned"),
          round(sum(col("sim").cast("decimal(16,6)")).cast("double")
            / count(lit(1)), 6).as("avg_sim"))
        .orderBy(col("cid"))
    }),

    // IVF SEARCH — the probe half of the index q35b builds: each query
    // vector ranks the 16 centroids, probes the nProbe=4 nearest lists,
    // and scores ONLY corpus vectors assigned to those lists (exact
    // cosine within candidates). At scale each list is a partition and
    // the probe touches nProbe/nLists of the corpus. The probe set is
    // part of the operator's defined semantics, so the DuckDB oracle is
    // exact — recall vs brute force is the usual IVF tradeoff (measured
    // vs q32's brute top-5 at sf0.1: 50/50 with nProbe=4 of 16 lists).
    "q35c_ivf_search" -> ((s, d) => {
      val e = emb(s, d)
      val cents = withNorm(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")), "cemb", "cn")
      // corpus assignment: nearest centroid per vector (q35b semantics)
      val corpus = withNorm(e.filter(col("vec_id") >= 16)
        .select(col("vec_id").as("vid"), col("embedding").as("vemb")), "vemb", "vn")
      val wAssign = Window.partitionBy(col("vid"))
        .orderBy(col("csim").desc, col("cid"))
      val assigned = corpus.join(broadcast(cents))
        .withColumn("csim",
          round(vecDot(col("vemb"), col("cemb")) / (col("vn") * col("cn")), 6))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vid"), col("vemb"), col("vn"), col("cid"))
      // query probes: 4 nearest centroids per query vector
      val queries = withNorm(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb")), "qemb", "qn")
      val wProbe = Window.partitionBy(col("qid"))
        .orderBy(col("psim").desc, col("cid"))
      val probes = queries.join(broadcast(cents))
        .withColumn("psim",
          round(vecDot(col("qemb"), col("cemb")) / (col("qn") * col("cn")), 6))
        .withColumn("prn", row_number().over(wProbe))
        .filter(col("prn") <= 4)
        .select(col("qid"), col("qemb"), col("qn"), col("cid"))
      // exact top-5 within the probed lists
      val wRank = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vid"))
      assigned.join(broadcast(probes), Seq("cid"))
        .withColumn("sim",
          round(vecDot(col("qemb"), col("vemb")) / (col("qn") * col("vn")), 6))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vid"), col("sim"))
        .orderBy(col("qid"), col("rank"))
    }),

    // SemDeDup (Abbas et al. 2023): semantic dedup with CLUSTER-bounded
    // pair generation — assign every vector to its nearest of 16
    // centroids (q35b semantics), then drop any vector with a
    // smaller-id same-cluster neighbor at cosine >= 0.3 (the synthetic
    // embeddings are near-uniform — max corpus pair cosine is ~0.51 —
    // so the production-typical 0.95 would gate a no-op). The cluster
    // bucketing is what makes it scale: pair candidates are
    // |cluster|^2, never corpus^2, and clusters shard the shuffle key.
    // Complements q33c, which buckets by LSH band instead of semantics.
    "q88_semdedup" -> ((s, d) => {
      val e = emb(s, d)
      val cents = withNorm(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")), "cemb", "cn")
      val vecs = withNorm(e.select(col("vec_id"), col("embedding")), "embedding", "vn")
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("sim").desc, col("cid"))
      // tracked: the assignment feeds both pair sides and the rollup
      val assigned = graft.runner.Materialize.track(
        vecs.join(broadcast(cents))
          .withColumn("sim",
            round(vecDot(col("embedding"), col("cemb")) / (col("vn") * col("cn")), 6))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("cid"), col("embedding"), col("vn")))
      val a = assigned.select(col("cid"), col("vec_id").as("va"),
        col("embedding").as("ea"), col("vn").as("na"))
      val b = assigned.select(col("cid"), col("vec_id").as("vb"),
        col("embedding").as("eb"), col("vn").as("nb"))
      val dropped = a.join(b, Seq("cid"))
        .filter(col("va") < col("vb"))
        .filter(round(vecDot(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
          >= 0.3)
        .select(col("cid"), col("vb")).distinct()
      assigned.groupBy(col("cid")).agg(count(lit(1)).as("n_assigned"))
        .join(dropped.groupBy(col("cid")).agg(count(lit(1)).as("nd")), Seq("cid"), "left")
        .select(col("cid"), col("n_assigned"),
          coalesce(col("nd"), lit(0L)).as("n_dropped"),
          (col("n_assigned") - coalesce(col("nd"), lit(0L))).as("n_kept"))
        .orderBy(col("cid"))
    }),

    // PRODUCT QUANTIZATION + ADC search (Jégou et al. 2011, "Product
    // Quantization for Nearest Neighbor Search") — the missing rung of
    // the similarity-search scale ladder (brute q32 → LSH q33b/q34 →
    // IVF q35b/c → PQ): at 100 TB the raw float vectors don't fit
    // anywhere, so the corpus is stored as m small codes per vector and
    // queries scan CODES, never vectors. Defined semantics (the oracle
    // applies them identically, so the gate is exact):
    //  - m=8 subspaces of 8 dims over the 64-dim embeddings;
    //  - the per-subspace codebook is DATA-DERIVED like q35b's
    //    centroids: the 16 vectors with vec_id < 16, sliced per
    //    subspace (k=16 ⇒ a 4-bit code; 8 subspaces ⇒ a 4-BYTE index
    //    entry vs 256 raw bytes, the 64x compression PQ exists for);
    //  - encode: per (vector, subspace), the L2-nearest codebook entry
    //    (tie → smaller cid) — argmin over exact doubles;
    //  - ADC (asymmetric distance): dist(q,x) ≈ Σ_j ||q_j − cb_j[code_j(x)]||²
    //    — the query side stays UNquantized; per query only m×k=128
    //    exact subspace distances are computed, then every corpus
    //    vector is scored by 8 table lookups.
    // Scale shape: codes are the persisted index (computed once, one
    // broadcast join + partial-agg argmin); the 1280-row query distance
    // table broadcasts; scoring joins codes map-side and the only
    // O(corpus) shuffle is the (qid, vid) partial-agg sum of 8 terms.
    // Recall vs exact top-5 (measured, this corpus): 11/50 at sf0.001,
    // 8/50 at sf0.1 — the synthetic embeddings are near-uniform RANDOM
    // vectors, PQ's adversarial case (no cluster structure for the
    // codebooks to exploit, all neighbors at cos≈0.4-0.5); the same
    // caveat as q33b's LSH recall note. q97b adds the production fix:
    // ADC shortlist + exact re-rank (30-45/50 at depth 50).
    "q97_pq_adc_search" -> ((s, d) => {
      val m = 8; val subDim = 8
      val e = emb(s, d)
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      // per (row, subspace, cid) distance — one codegen'd FloatVecSubL2
      // instance per subspace, literal slice bounds
      def subDists(v: Column, c: Column): Column = array(
        (0 until m).map(j => struct(lit(j).as("j"),
          graft.text.VectorExpressions.vecSubL2(v, c, j * subDim, subDim)
            .as("dist"))): _*)
      // encode the corpus: argmin codebook entry per (vector, subspace)
      val codes = e.filter(col("vec_id") >= 16)
        .select(col("vec_id").as("vid"), col("embedding").as("vemb"))
        .join(broadcast(cents))
        .select(col("vid"), col("cid"),
          explode(subDists(col("vemb"), col("cemb"))).as("sd"))
        .select(col("vid"), col("sd.j").as("j"), col("cid"), col("sd.dist").as("dist"))
        .groupBy(col("vid"), col("j"))
        // lexicographic struct min == ORDER BY dist, cid LIMIT 1
        .agg(min(struct(col("dist"), col("cid"))).as("best"))
        .select(col("vid"), col("j"), col("best.cid").as("cid"))
      // query-side subspace distance table: 10 queries x 8 subspaces x
      // 16 entries = 1280 rows, broadcast
      val qd = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        .join(broadcast(cents))
        .select(col("qid"), col("cid"),
          explode(subDists(col("qemb"), col("cemb"))).as("sd"))
        .select(col("qid"), col("sd.j").as("j"), col("cid"), col("sd.dist").as("qd"))
      // ADC: 8 table lookups per (query, corpus vector); DECIMAL sum
      // (order-independent — the 8-term double sum would be
      // summation-order-dependent across engines)
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("adc_dist").asc, col("vid"))
      codes.join(broadcast(qd), Seq("j", "cid"))
        .groupBy(col("qid"), col("vid"))
        .agg(round(sum(col("qd").cast("decimal(27,12)")).cast("double"), 6)
          .as("adc_dist"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vid"), col("adc_dist"))
        .orderBy(col("qid"), col("rank"))
    }),

    // PQ + EXACT RE-RANK — the production IVF-PQ pattern: ADC (q97
    // semantics) produces a cheap shortlist of 50 per query from CODES
    // alone; only the shortlist's raw vectors are fetched and re-scored
    // with exact cosine for the final top-5. At 100 TB this is the
    // recall fix that costs O(shortlist) vector reads instead of
    // O(corpus). Measured recall@5 vs exact KNN on this (near-uniform
    // random, PQ-adversarial) corpus: raw ADC 11/50 at sf0.001 and
    // 8/50 at sf0.1; with the 50-deep shortlist (2.5% of the sf0.1
    // corpus = a 40x vector-read reduction) 45/50 and 30/50. The
    // shortlist depth is part of the defined semantics; the oracle
    // applies it identically, so the gate is exact.
    "q97b_pq_rerank" -> ((s, d) => {
      val m = 8; val subDim = 8; val shortlist = 50
      val e = emb(s, d)
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      def subDists(v: Column, c: Column): Column = array(
        (0 until m).map(j => struct(lit(j).as("j"),
          graft.text.VectorExpressions.vecSubL2(v, c, j * subDim, subDim)
            .as("dist"))): _*)
      val codes = e.filter(col("vec_id") >= 16)
        .select(col("vec_id").as("vid"), col("embedding").as("vemb"))
        .join(broadcast(cents))
        .select(col("vid"), col("cid"),
          explode(subDists(col("vemb"), col("cemb"))).as("sd"))
        .select(col("vid"), col("sd.j").as("j"), col("cid"), col("sd.dist").as("dist"))
        .groupBy(col("vid"), col("j"))
        .agg(min(struct(col("dist"), col("cid"))).as("best"))
        .select(col("vid"), col("j"), col("best.cid").as("cid"))
      val queries = withNorm(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb")), "qemb", "qn")
      val qd = queries.select(col("qid"), col("qemb"))
        .join(broadcast(cents))
        .select(col("qid"), col("cid"),
          explode(subDists(col("qemb"), col("cemb"))).as("sd"))
        .select(col("qid"), col("sd.j").as("j"), col("cid"), col("sd.dist").as("qd"))
      val wAdc = Window.partitionBy(col("qid"))
        .orderBy(col("adc_dist").asc, col("vid"))
      val short = codes.join(broadcast(qd), Seq("j", "cid"))
        .groupBy(col("qid"), col("vid"))
        .agg(round(sum(col("qd").cast("decimal(27,12)")).cast("double"), 6)
          .as("adc_dist"))
        .withColumn("arank", row_number().over(wAdc))
        .filter(col("arank") <= shortlist)
        .select(col("qid"), col("vid"))
      // fetch + exact cosine ONLY for the shortlist
      val corpus = withNorm(e.select(col("vec_id").as("vid"),
        col("embedding").as("vemb")), "vemb", "vn")
      val wExact = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vid"))
      short.join(corpus, Seq("vid"))
        .join(broadcast(queries), Seq("qid"))
        .withColumn("sim",
          round(vecDot(col("qemb"), col("vemb")) / (col("qn") * col("vn")), 6))
        .withColumn("rank", row_number().over(wExact))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vid"), col("sim"))
        .orderBy(col("qid"), col("rank"))
    }),

    // PACKED k=256 PQ gate (round-18): q97's ADC semantics at the
    // retrieval-grade 8-bit width, THROUGH the scale kernels — the
    // corpus encodes via the map-only PqEncodeWord (whole code word in
    // one BIGINT, zero shuffle) and scores via the codegen PqAdcScore
    // at bits=8 against per-query 2048-double foldable tables. q97
    // gates the join formulation and PqSuite pins packed==join
    // driver-side; this closes the loop CROSS-ENGINE on the packed
    // path itself (the oracle recomputes argmin + table lookup in SQL).
    // The kernel sums plain doubles (ascending j) vs the oracle's
    // order-independent DECIMAL sum — ≤8 ulps apart, inside the gate's
    // float tolerance, and ties (equal-code candidates) are exact in
    // both engines so ranks agree.
    "q98_pq256_packed" -> ((s, d) => {
      val e = emb(s, d)
      val cents = e.filter(col("vec_id") < 256)
        .select(col("vec_id"), col("embedding")).orderBy("vec_id")
        .collect().map(_.getSeq[Float](1).toArray).toIndexedSeq
      val corpus = e.filter(col("vec_id") >= 256)
        .select(col("vec_id").as("vid"), col("embedding").as("vemb"))
      val qRows = e.filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding")).orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val sp = s
      import sp.implicits._
      val qTabs = qRows.toSeq
        .map { case (qid, q) => (qid, graft.operators.Pq.adcTable(q, cents).toSeq) }
        .toDF("qid", "tab")
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("adc_dist").asc, col("vid"))
      corpus.select(col("vid"),
          graft.operators.Pq.encodeWord(col("vemb"), cents).as("codes"))
        .join(broadcast(qTabs))
        .select(col("qid"), col("vid"),
          round(graft.operators.Pq.adcScore(col("codes"), col("tab"), 8), 6)
            .as("adc_dist"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vid"), col("adc_dist"))
        .orderBy(col("qid"), col("rank"))
    }),

    // RESIDUAL IVF-PQ gate (round-19; Jégou et al. 2011 §IV, "IVFADC"):
    // the full production index shape, cross-engine. Defined semantics
    // (the oracle applies them identically, so the gate is exact):
    //  - coarse quantizer: 4 lists, centroids = embeddings vec_id < 4,
    //    full-vector squared-L2 argmin (tie → smaller lid);
    //  - residual: r = x − coarse_centroid(x), element-wise in double
    //    then rounded to FLOAT (the IEEE value both engines produce);
    //  - PQ codebook: 16 entries = embeddings vec_id in [4, 20), sliced
    //    per subspace (m=8 × 8 dims); codes = per-subspace L2 argmin
    //    over the RESIDUAL (q97 encode semantics on r, not x);
    //  - query side: probe the 2 nearest lists (full-vector L2, tie →
    //    smaller lid); per probed list the ADC table is built from the
    //    QUERY residual q − list_centroid — the per-list table rebuild
    //    residual encoding costs at search time;
    //  - ADC: Σ_j table_l[j][code_j(x)] over vectors in probed lists
    //    only; top-5 per query (tie → smaller vid).
    // Scale shape: corpus side is ONE map-only pass (coarseAssign +
    // encodeWord∘residual, both codegen'd, zero shuffle — the list id
    // becomes a hive partition at scale so probing = partition pruning);
    // query side broadcasts (qid, list, 128-double table) rows and
    // scores code words via the codegen PqAdcScore. The kernel sums
    // plain doubles vs the oracle's order-independent DECIMAL sum —
    // ≤8 quantization ulps, inside the gate's float tolerance (the q98
    // precedent).
    "q99_ivfpq_residual" -> ((s, d) => {
      val e = emb(s, d)
      def collectVecs(f: Column): IndexedSeq[Array[Float]] =
        e.filter(f).orderBy("vec_id").select(col("embedding"))
          .collect().map(_.getSeq[Float](0).toArray).toIndexedSeq
      val coarse = collectVecs(col("vec_id") < 4)
      val cb = collectVecs(col("vec_id") >= 4 && col("vec_id") < 20)
      val corpus = e.filter(col("vec_id") >= 20)
        .select(col("vec_id").as("vid"), col("embedding").as("vemb"))
      // one map-only pass: (vid, list, residual codes)
      val codes = corpus.select(col("vid"),
        graft.operators.Pq.coarseAssign(col("vemb"), coarse).cast("int").as("list"),
        graft.operators.Pq.encodeWord(
          graft.operators.Pq.residual(col("vemb"), coarse), cb).as("codes"))
      def l2Full(a: Array[Float], b: Array[Float]): Double = {
        var acc = 0.0; var i = 0
        while (i < 64) { val x = a(i).toDouble - b(i).toDouble; acc += x * x; i += 1 }
        acc
      }
      val qRows = e.filter(col("vec_id") < 10).orderBy("vec_id")
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val probeRows = qRows.toSeq.flatMap { case (qid, q) =>
        coarse.indices.sortBy(l => (l2Full(q, coarse(l)), l)).take(2).map { l =>
          val rq = Array.tabulate(64)(i => (q(i).toDouble - coarse(l)(i).toDouble).toFloat)
          (qid, l, graft.operators.Pq.adcTable(rq, cb).toSeq)
        }
      }
      val sp = s
      import sp.implicits._
      val qTabs = probeRows.toDF("qid", "list", "tab")
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("adc_dist").asc, col("vid"))
      codes.join(broadcast(qTabs), Seq("list"))
        .select(col("qid"), col("vid"),
          round(graft.operators.Pq.adcScore(col("codes"), col("tab"), 4), 6)
            .as("adc_dist"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vid"), col("adc_dist"))
        .orderBy(col("qid"), col("rank"))
    }),

    // Random-hyperplane LSH: 16-bit signature from sign(dot(x, plane_j)),
    // planes = embeddings of vec_id 0..15 (deterministic, data-derived).
    // Output: the 10 most-populated buckets.
    "q34_ann_lsh_buckets" -> ((s, d) => {
      val e = emb(s, d)
      e.select(graft.operators.EmbeddingLsh.signature(e, 16).as("signature"))
        .groupBy(col("signature"))
        .agg(count(lit(1)).as("n_vecs"))
        .orderBy(col("n_vecs").desc, col("signature"))
        .limit(10)
    }),

    // Per-label centroids + cohesion spread (mean-pool embedding
    // aggregation — the "cluster quality / diversity" readout a corpus
    // embedding index needs). Scale shape: the mean-pool explodes to
    // (label, pos) but PARTIAL aggregation compresses each map task's
    // output to labels x dim rows before the shuffle; the labels x dim
    // centroid table is then broadcast and every vector scores against
    // its centroid map-side (index-ordered HOF dot — same order as the
    // DuckDB list_sum oracle). min/max cohesion, not avg: on unit-norm
    // vectors avg cos to the centroid IS the centroid norm (identity),
    // min/max actually measure spread.
    "q82_label_centroids" -> ((s, d) => {
      val e = emb(s, d)
      val c = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "vf")))
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("vf").cast("double")).as("cv"))
      val cArr = c.groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pc"))
        .select(col("label"), transform(col("pc"), x => x("cv")).as("centroid"))
      val scored = e.join(broadcast(cArr), "label")
        .withColumn("d", dot(col("embedding"), col("centroid")))
        .withColumn("vn", sqrt(vecDot(col("embedding"), col("embedding"))))
        .withColumn("nrm", sqrt(dot(col("centroid"), col("centroid"))))
        .withColumn("cos", col("d") / (col("vn") * col("nrm")))
      scored.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          round(first(col("nrm")), 6).as("centroid_norm"),
          round(min(col("cos")), 6).as("min_cos_to_centroid"),
          round(max(col("cos")), 6).as("max_cos_to_centroid"))
        .orderBy(col("label"))
    })
  )

  private val dotSql = (x: String, p: String) =>
    s"list_sum(list_transform(generate_series(1, 64), i -> CAST($x[i] AS DOUBLE) * CAST($p[i] AS DOUBLE)))"
  // squared L2 over subspace j (0-based) of width 8 — ascending index
  // order, the same double ops as VecKernels.subL2FF
  private val subL2Sql = (x: String, c: String, j: String) =>
    s"list_sum(list_transform(generate_series($j*8+1, $j*8+8), " +
      s"i -> (CAST($x[i] AS DOUBLE) - CAST($c[i] AS DOUBLE)) * " +
      s"(CAST($x[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))))"
  // full-vector squared L2 (coarse assignment) — same double ops,
  // ascending index, as the PqEncodeWord m=1 kernel
  private val fullL2Sql = (x: String, c: String) =>
    s"list_sum(list_transform(generate_series(1, 64), " +
      s"i -> (CAST($x[i] AS DOUBLE) - CAST($c[i] AS DOUBLE)) * " +
      s"(CAST($x[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))))"
  // coarse residual rounded to FLOAT — the IEEE value PqResidual produces
  private val residualSql = (x: String, c: String) =>
    s"list_transform(generate_series(1, 64), " +
      s"i -> CAST(CAST($x[i] AS DOUBLE) - CAST($c[i] AS DOUBLE) AS FLOAT))"
  private val normSql = (x: String) =>
    s"sqrt(list_sum(list_transform($x, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"
  private val cosSql = (x: String, p: String) =>
    s"round(${dotSql(x, p)} / (${normSql(x)} * ${normSql(p)}), 6)"

  val oracles: Map[String, String] = Map(
    "q32_knn_cosine" ->
      s"""SELECT qid, rank, cid, sim FROM (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    ${cosSql("q.embedding", "c.embedding")} AS sim,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${cosSql("q.embedding", "c.embedding")} DESC, c.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id >= 10)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "q33_emb_top_pairs" ->
      s"""SELECT a.vec_id AS va, b.vec_id AS vb,
         |  ${cosSql("a.embedding", "b.embedding")} AS sim
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |ORDER BY sim DESC, va, vb LIMIT 20""".stripMargin,
    "q33b_emb_top_pairs_lsh" ->
      s"""WITH planes AS (
         |  SELECT vec_id AS pid, embedding AS pemb FROM embeddings WHERE vec_id < 16),
         |bits AS (
         |  SELECT x.vec_id,
         |    CASE WHEN ${dotSql("x.embedding", "p.pemb")} > 0
         |         THEN (1::BIGINT << p.pid) ELSE 0::BIGINT END AS bit
         |  FROM embeddings x CROSS JOIN planes p),
         |sigs AS (SELECT vec_id, CAST(sum(bit) AS BIGINT) AS signature
         |         FROM bits GROUP BY vec_id),
         |bands0 AS (
         |  SELECT vec_id, band, (signature >> (4 * band)) & 15 AS bv
         |  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) AS bx),
         |bands AS (
         |  SELECT * FROM bands0 WHERE (band, bv) NOT IN (
         |    SELECT (band, bv) FROM bands0 GROUP BY band, bv HAVING count(*) > 256)),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id)
         |SELECT va, vb, ${cosSql("ea.embedding", "eb.embedding")} AS sim
         |FROM cand
         |JOIN embeddings ea ON va = ea.vec_id
         |JOIN embeddings eb ON vb = eb.vec_id
         |ORDER BY sim DESC, va, vb LIMIT 20""".stripMargin,
    "q33c_emb_neardup_dedup" ->
      s"""WITH planes AS (
         |  SELECT vec_id AS pid, embedding AS pemb FROM embeddings WHERE vec_id < 16),
         |bits AS (
         |  SELECT x.vec_id,
         |    CASE WHEN ${dotSql("x.embedding", "p.pemb")} > 0
         |         THEN (1::BIGINT << p.pid) ELSE 0::BIGINT END AS bit
         |  FROM embeddings x CROSS JOIN planes p),
         |sigs AS (SELECT vec_id, CAST(sum(bit) AS BIGINT) AS signature
         |         FROM bits GROUP BY vec_id),
         |bands0 AS (
         |  SELECT vec_id, band, (signature >> (4 * band)) & 15 AS bv
         |  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) AS bx),
         |bands AS (
         |  SELECT * FROM bands0 WHERE (band, bv) NOT IN (
         |    SELECT (band, bv) FROM bands0 GROUP BY band, bv HAVING count(*) > 256)),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id
         |  JOIN embeddings ea ON a.vec_id = ea.vec_id
         |  JOIN embeddings eb ON b.vec_id = eb.vec_id
         |  WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.5)
         |SELECT (SELECT count(*) FROM embeddings) AS n_total,
         |  (SELECT count(*) FROM dropped) AS n_dropped,
         |  (SELECT count(*) FROM embeddings) - (SELECT count(*) FROM dropped)
         |    AS n_retained""".stripMargin,
    "q88_semdedup" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT v.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${cosSql("v.embedding", "c.cemb")} DESC, c.cid) AS rn
         |    FROM embeddings v CROSS JOIN cents c)
         |  WHERE rn = 1),
         |dropped AS (
         |  SELECT DISTINCT a2.cid, b2.vec_id AS vb
         |  FROM assigned a2 JOIN assigned b2
         |    ON a2.cid = b2.cid AND a2.vec_id < b2.vec_id
         |  JOIN embeddings ea ON a2.vec_id = ea.vec_id
         |  JOIN embeddings eb ON b2.vec_id = eb.vec_id
         |  WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.3)
         |SELECT ag.cid, ag.n_assigned,
         |  CAST(coalesce(dg.nd, 0) AS BIGINT) AS n_dropped,
         |  ag.n_assigned - CAST(coalesce(dg.nd, 0) AS BIGINT) AS n_kept
         |FROM (SELECT cid, count(*) AS n_assigned FROM assigned GROUP BY cid) ag
         |LEFT JOIN (SELECT cid, count(*) AS nd FROM dropped GROUP BY cid) dg
         |  USING (cid)
         |ORDER BY ag.cid""".stripMargin,

    "q35b_ivf_assign" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < 16),
         |scored AS (
         |  SELECT v.vec_id, c.cid,
         |    ${cosSql("v.embedding", "c.cemb")} AS sim,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${cosSql("v.embedding", "c.cemb")} DESC, c.cid) AS rn
         |  FROM embeddings v CROSS JOIN cents c)
         |SELECT cid, count(*) AS n_assigned,
         |  round(CAST(sum(CAST(sim AS DECIMAL(16,6))) AS DOUBLE)
         |    / count(*), 6) AS avg_sim
         |FROM scored WHERE rn = 1
         |GROUP BY cid ORDER BY cid""".stripMargin,
    "q35c_ivf_search" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < 16),
         |assigned AS (
         |  SELECT vid, vemb, cid FROM (
         |    SELECT v.vec_id AS vid, v.embedding AS vemb, c.cid,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${cosSql("v.embedding", "c.cemb")} DESC, c.cid) AS rn
         |    FROM embeddings v CROSS JOIN cents c WHERE v.vec_id >= 16)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT qid, qemb, cid FROM (
         |    SELECT q.vec_id AS qid, q.embedding AS qemb, c.cid,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.embedding", "c.cemb")} DESC, c.cid) AS prn
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 10)
         |  WHERE prn <= 4)
         |SELECT qid, rank, vid, sim FROM (
         |  SELECT p.qid, a.vid, ${cosSql("p.qemb", "a.vemb")} AS sim,
         |    row_number() OVER (PARTITION BY p.qid
         |      ORDER BY ${cosSql("p.qemb", "a.vemb")} DESC, a.vid) AS rank
         |  FROM probes p JOIN assigned a ON p.cid = a.cid)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "q97_pq_adc_search" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < 16),
         |sub AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS j),
         |codes AS (
         |  SELECT vid, j, cid FROM (
         |    SELECT v.vec_id AS vid, s.j, c.cid,
         |      row_number() OVER (PARTITION BY v.vec_id, s.j
         |        ORDER BY ${subL2Sql("v.embedding", "c.cemb", "s.j")}, c.cid) AS rn
         |    FROM embeddings v CROSS JOIN cents c CROSS JOIN sub s
         |    WHERE v.vec_id >= 16)
         |  WHERE rn = 1),
         |qd AS (
         |  SELECT q.vec_id AS qid, s.j, c.cid,
         |    ${subL2Sql("q.embedding", "c.cemb", "s.j")} AS qd
         |  FROM embeddings q CROSS JOIN cents c CROSS JOIN sub s
         |  WHERE q.vec_id < 10),
         |adc AS (
         |  SELECT qd.qid, codes.vid,
         |    round(CAST(sum(CAST(qd.qd AS DECIMAL(27,12))) AS DOUBLE), 6)
         |      AS adc_dist
         |  FROM codes JOIN qd ON codes.j = qd.j AND codes.cid = qd.cid
         |  GROUP BY qd.qid, codes.vid)
         |SELECT qid, rank, vid, adc_dist FROM (
         |  SELECT qid, vid, adc_dist,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY adc_dist, vid) AS rank
         |  FROM adc)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "q98_pq256_packed" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < 256),
         |sub AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS j),
         |codes AS (
         |  SELECT vid, j, cid FROM (
         |    SELECT v.vec_id AS vid, s.j, c.cid,
         |      row_number() OVER (PARTITION BY v.vec_id, s.j
         |        ORDER BY ${subL2Sql("v.embedding", "c.cemb", "s.j")}, c.cid) AS rn
         |    FROM embeddings v CROSS JOIN cents c CROSS JOIN sub s
         |    WHERE v.vec_id >= 256)
         |  WHERE rn = 1),
         |qd AS (
         |  SELECT q.vec_id AS qid, s.j, c.cid,
         |    ${subL2Sql("q.embedding", "c.cemb", "s.j")} AS qd
         |  FROM embeddings q CROSS JOIN cents c CROSS JOIN sub s
         |  WHERE q.vec_id < 10),
         |adc AS (
         |  SELECT qd.qid, codes.vid,
         |    round(CAST(sum(CAST(qd.qd AS DECIMAL(27,12))) AS DOUBLE), 6)
         |      AS adc_dist
         |  FROM codes JOIN qd ON codes.j = qd.j AND codes.cid = qd.cid
         |  GROUP BY qd.qid, codes.vid)
         |SELECT qid, rank, vid, adc_dist FROM (
         |  SELECT qid, vid, adc_dist,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY adc_dist, vid) AS rank
         |  FROM adc)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "q99_ivfpq_residual" ->
      s"""WITH coarse AS (
         |  SELECT vec_id AS lid, embedding AS lemb
         |  FROM embeddings WHERE vec_id < 4),
         |cb AS (
         |  SELECT vec_id - 4 AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id >= 4 AND vec_id < 20),
         |sub AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS j),
         |assigned AS (
         |  SELECT vid, lid, remb FROM (
         |    SELECT v.vec_id AS vid, l.lid,
         |      ${residualSql("v.embedding", "l.lemb")} AS remb,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${fullL2Sql("v.embedding", "l.lemb")}, l.lid) AS rn
         |    FROM embeddings v CROSS JOIN coarse l WHERE v.vec_id >= 20)
         |  WHERE rn = 1),
         |codes AS (
         |  SELECT vid, lid, j, cid FROM (
         |    SELECT a.vid, a.lid, s.j, c.cid,
         |      row_number() OVER (PARTITION BY a.vid, s.j
         |        ORDER BY ${subL2Sql("a.remb", "c.cemb", "s.j")}, c.cid) AS rn
         |    FROM assigned a CROSS JOIN cb c CROSS JOIN sub s)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT qid, lid, qremb FROM (
         |    SELECT q.vec_id AS qid, l.lid,
         |      ${residualSql("q.embedding", "l.lemb")} AS qremb,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${fullL2Sql("q.embedding", "l.lemb")}, l.lid) AS prn
         |    FROM embeddings q CROSS JOIN coarse l WHERE q.vec_id < 10)
         |  WHERE prn <= 2),
         |qd AS (
         |  SELECT p.qid, p.lid, s.j, c.cid,
         |    ${subL2Sql("p.qremb", "c.cemb", "s.j")} AS qd
         |  FROM probes p CROSS JOIN cb c CROSS JOIN sub s),
         |adc AS (
         |  SELECT qd.qid, codes.vid,
         |    round(CAST(sum(CAST(qd.qd AS DECIMAL(27,12))) AS DOUBLE), 6)
         |      AS adc_dist
         |  FROM codes JOIN qd ON codes.lid = qd.lid AND codes.j = qd.j
         |    AND codes.cid = qd.cid
         |  GROUP BY qd.qid, codes.vid)
         |SELECT qid, rank, vid, adc_dist FROM (
         |  SELECT qid, vid, adc_dist,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY adc_dist, vid) AS rank
         |  FROM adc)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "q97b_pq_rerank" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < 16),
         |sub AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS j),
         |codes AS (
         |  SELECT vid, j, cid FROM (
         |    SELECT v.vec_id AS vid, s.j, c.cid,
         |      row_number() OVER (PARTITION BY v.vec_id, s.j
         |        ORDER BY ${subL2Sql("v.embedding", "c.cemb", "s.j")}, c.cid) AS rn
         |    FROM embeddings v CROSS JOIN cents c CROSS JOIN sub s
         |    WHERE v.vec_id >= 16)
         |  WHERE rn = 1),
         |qd AS (
         |  SELECT q.vec_id AS qid, s.j, c.cid,
         |    ${subL2Sql("q.embedding", "c.cemb", "s.j")} AS qd
         |  FROM embeddings q CROSS JOIN cents c CROSS JOIN sub s
         |  WHERE q.vec_id < 10),
         |short AS (
         |  SELECT qid, vid FROM (
         |    SELECT qd.qid, codes.vid,
         |      round(CAST(sum(CAST(qd.qd AS DECIMAL(27,12))) AS DOUBLE), 6)
         |        AS adc_dist
         |    FROM codes JOIN qd ON codes.j = qd.j AND codes.cid = qd.cid
         |    GROUP BY qd.qid, codes.vid
         |    QUALIFY row_number() OVER (PARTITION BY qd.qid
         |      ORDER BY adc_dist, codes.vid) <= 50))
         |SELECT qid, rank, vid, sim FROM (
         |  SELECT sh.qid, v.vec_id AS vid,
         |    ${cosSql("q.embedding", "v.embedding")} AS sim,
         |    row_number() OVER (PARTITION BY sh.qid
         |      ORDER BY ${cosSql("q.embedding", "v.embedding")} DESC, v.vec_id)
         |      AS rank
         |  FROM short sh
         |  JOIN embeddings v ON sh.vid = v.vec_id
         |  JOIN embeddings q ON sh.qid = q.vec_id)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "q34_ann_lsh_buckets" ->
      s"""WITH planes AS (
         |  SELECT vec_id AS pid, embedding AS pemb FROM embeddings WHERE vec_id < 16),
         |bits AS (
         |  SELECT x.vec_id,
         |    CASE WHEN ${dotSql("x.embedding", "p.pemb")} > 0
         |         THEN (1::BIGINT << p.pid) ELSE 0::BIGINT END AS bit
         |  FROM embeddings x CROSS JOIN planes p),
         |sigs AS (SELECT vec_id, CAST(sum(bit) AS BIGINT) AS signature
         |         FROM bits GROUP BY vec_id)
         |SELECT signature, count(*) AS n_vecs FROM sigs
         |GROUP BY signature ORDER BY n_vecs DESC, signature LIMIT 10""".stripMargin,
    "q82_label_centroids" ->
      s"""WITH x AS (
         |  SELECT label, pos, avg(CAST(v AS DOUBLE)) AS cv
         |  FROM (SELECT label, unnest(embedding) AS v,
         |          generate_subscripts(embedding, 1) AS pos
         |        FROM embeddings)
         |  GROUP BY label, pos),
         |c AS (SELECT label, list(cv ORDER BY pos) AS centroid FROM x GROUP BY label),
         |sc AS (
         |  SELECT e.label,
         |    ${dotSql("e.embedding", "c.centroid")} AS d,
         |    ${normSql("e.embedding")} AS vn,
         |    ${normSql("c.centroid")} AS nrm
         |  FROM embeddings e JOIN c USING (label))
         |SELECT label, count(*) AS n_vecs,
         |  round(any_value(nrm), 6) AS centroid_norm,
         |  round(min(d/(vn*nrm)), 6) AS min_cos_to_centroid,
         |  round(max(d/(vn*nrm)), 6) AS max_cos_to_centroid
         |FROM sc GROUP BY label ORDER BY label""".stripMargin
  )
}
