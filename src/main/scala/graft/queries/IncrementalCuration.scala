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
  /** `nHint`: exact kept-row count when the bounded exact-dedup branch
    * computed it for free (keepIds.length); None for over-limit batches
    * — callers sizing appends fall back to natural partitioning there.
    */
  case class BatchPrep(rows: DataFrame, nHint: Option[Long] = None)

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

  def prepareBatch(state: DataFrame, batch: DataFrame, minChars: Long = 100,
      docsDir: Option[String] = None): BatchPrep = {
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
    // __hh rides along in the SAME collect: the bloom probe below needs
    // xxhash64(__h) and computing it here costs nothing extra
    val hashRows = bh.groupBy(col("__h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("__h"), col("doc_id"), xxhash64(col("__h")).as("__hh"))
      .limit(BatchHashLimit + 1).collect()
    var nKeptHint: Option[Long] = None
    val bKept = if (hashRows.length > BatchHashLimit) {
      val keepIds = bh.groupBy(col("__h")).agg(min(col("doc_id")).as("doc_id"))
      // no distinct on the state side: state docs are exact-deduped by
      // construction, so __h is already unique — the anti join semantics
      // are identical and the fold skips a corpus-wide aggregate exchange
      Materialize.trackLazy(
        bh.join(keepIds, Seq("__h", "doc_id"))
          .join(state.select(col("__h")), Seq("__h"), "left_anti"))
    } else {
      // which batch hashes already exist in the state: __h is a random
      // md5, so neither zones nor parquet range pushdown can scope this
      // probe — the secondary __h BLOOM sidecar can (round-15: the
      // 50-batch soak measured the un-scoped probe growing with the
      // store). Bloom-positive files only; no positives means no scan
      // job at all. Fail-safes: no sidecar -> full scan (pre-r15
      // states); files committed after the sidecar's generation are
      // included by affectedPaths.
      val hProbe: Either[Set[String], DataFrame] = docsDir match {
        case Some(d) if hashRows.nonEmpty && graft.layout.KeyIndex.exists(
            d, graft.layout.KeyIndex.indexName(Seq("__h"))) =>
          val manifest = graft.layout.ZoneMap.read(d)
          // null text → md5 null → xxhash64 null: getLong would NPE on
          // the null-__h group's row. Skip it in the probe array only —
          // the group still flows through matched/keepIds below
          // (getString(0)=null, Set.contains(null) is fine), preserving
          // the pre-r15 null-text semantics (r15 ADVICE).
          graft.layout.KeyIndex.affectedPaths(state.sparkSession, d,
              hashRows.iterator.filterNot(_.isNullAt(2))
                .map(_.getLong(2)).toSeq, manifest, Seq("__h")) match {
            case Some(paths) =>
              val files = manifest.files.filter(f =>
                paths.contains(graft.layout.KeyIndex.norm(f.path)))
              System.err.println(s"[curate.add]   hash_bloom_prune " +
                s"${files.length}/${manifest.files.length} files")
              if (files.isEmpty) Left(Set.empty[String])
              else Right(graft.layout.StagedRewrite.readFiles(
                  state.sparkSession, d, files.map(_.path),
                  manifest.hivePartitions.nonEmpty, Some(state.schema))
                .select(col("__h")))
            case None => Right(state.select(col("__h")))
          }
        case _ => Right(state.select(col("__h")))
      }
      val matched =
        if (hashRows.isEmpty) Set.empty[String]
        else hProbe match {
          case Left(none) => none
          case Right(stateH) => stateH
            .filter(org.apache.spark.sql.graftbridge.Bridge.inSetString(
              col("__h"), hashRows.map(_.getString(0))))
            .collect().map(_.getString(0)).toSet
        }
      val keepIds = hashRows.collect {
        case r if !matched(r.getString(0)) => r.getLong(1)
      }.toSeq
      nKeptHint = Some(keepIds.length.toLong)
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
    BatchPrep(nHint = nKeptHint, rows =
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
  def edgesDerived(state: DataFrame, prep: BatchPrep,
      docsDir: Option[String] = None): DataFrame = {
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
      DedupQueries.verifiedBySets(cand, verifySets(state, prep, cand, docsDir)))
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
      cand: DataFrame, docsDir: Option[String] = None): DataFrame = {
    val tv0 = System.nanoTime()
    val idRows = cand
      .select(explode(array(col("da"), col("db"))).as("doc_id"))
      .distinct().limit(CandIdLimit + 1).collect()
    System.err.println(f"[curate.add]   edges/cand_ids ${(System.nanoTime() - tv0) / 1e9}%.2fs")
    val overLimit = idRows.length > CandIdLimit
    val ids = if (overLimit) Array.empty[Long] else idRows.map(_.getLong(0))
    // candidate-file prune (round-15: the 50-batch soak measured this
    // lookup growing O(state) — an InSet over ids that span the id
    // domain degrades to a min/max range no row group can fail, so the
    // scan decompressed the WHOLE hs column every fold). The docs
    // store's doc_id zones are tight (linear build layout + id-monotone
    // appends), so NumIn keeps O(candidate) files; batch-side ids
    // exceed every zone and prune to nothing, their rows come from
    // prep.rows below.
    val stateSets = docsDir match {
      case Some(d) if !overLimit =>
        val scan = graft.layout.PrunedScan.read(state.sparkSession, d,
          Seq(graft.layout.NumIn("doc_id", ids.map(_.toDouble).toSeq)),
          schema = Some(state.schema))
        System.err.println(s"[curate.add]   verify_docs_prune " +
          s"${scan.filesKept}/${scan.filesTotal} files")
        scan.df.select(col("doc_id"), col("hs"))
      case _ => state.select(col("doc_id"), col("hs"))
    }
    val sets0 = stateSets
      .unionByName(prep.rows.select(col("doc_id"), col("hs")))
    val sets =
      if (overLimit) sets0
      else sets0.filter(org.apache.spark.sql.graftbridge.Bridge.inSetLong(
        col("doc_id"), ids))
    System.err.println(s"[curate.add] verify_sets candidate_ids=" +
      (if (overLimit) "over_limit(full scan)" else ids.length.toString))
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
    sys.props.get("graft.curate.touchedCompLimit").map(_.toInt).getOrElse(1000000)
  /** changedLimit stays low deliberately: beyond ~200k changed labels
    * the keyed delta rewrites most of the store anyway (scattered ids
    * touch every file zone), so the FullRelabel whole-store rewrite is
    * the same bytes with less bookkeeping — measured at sf10 (round 13:
    * 1.38x via FullRelabel vs 1.17x via a 200k-row keyed delta).
    */
  def changedLimit: Int =
    sys.props.get("graft.curate.changedLimit").map(_.toInt).getOrElse(200000)

  /** Edge-set size up to which the batch-bounded subgraph's CC runs on
    * the driver (a collect of an already-cached frame; 4M edges ≈
    * 400 MB transient Rows in an 8 GB JVM, matching
    * [[graft.operators.ConnectedComponents.SmallGraphEdges]]).
    */
  def EdgeCollectLimit: Int =
    sys.props.get("graft.curate.edgeCollectLimit").map(_.toInt).getOrElse(4 << 20)

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
    // Subgraph CC runs on the DRIVER when the (cached, already fully
    // materialized by the endpoint collect) edge set fits
    // [[EdgeCollectLimit]]: one cache-read collect + in-memory
    // union-find replaces the distributed run's canonicalize-distinct
    // shuffle, count job, single-task job and label collect — with
    // endpoints capped at [[touchedCompLimit]] the subgraph is always
    // driver-sized. The distributed run stays as the over-limit path.
    val edgeRows = e.limit(EdgeCollectLimit + 1).collect()
    val newLabel: Map[Long, Long] =
      if (edgeRows.length <= EdgeCollectLimit)
        graft.operators.ConnectedComponents.local(
          edgeRows.iterator.map(r => (r.getLong(0), r.getLong(1))) ++
            tStars.iterator)
      else {
        // edge set beyond the driver bound: distributed star rounds,
        // with the changed-label collect bounded as before (an overflow
        // reuses the checkpoint-backed frame, never a full collect)
        val ccInput = e.unionAll(
          spark.createDataFrame(tStars).toDF("da", "db"))
        val distDf = graft.operators.ConnectedComponents.run(ccInput)
          .withColumnRenamed("id", "doc_id")
        val labelRows = distDf.limit(changedLimit + 1).collect()
        lap("cc_labels (distributed)")
        if (labelRows.length > changedLimit)
          return FullRelabel(overrideMapping(stateComps, prep, distDf))
        labelRows.map(r => (r.getLong(0), r.getLong(1))).toMap
      }
    lap(s"cc_labels (${newLabel.size})")
    // old label of every doc that can change; a doc can be both an
    // endpoint and a touched member — the map write dedups (the value
    // is unique per doc)
    val oldOf: Map[Long, Long] =
      (tRows.iterator ++ endpointsOld.iterator)
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val changed = oldOf.iterator.flatMap { case (id, old) =>
      newLabel.get(id).filter(_ != old).map(ChangedLabel(id, _, old))
    }.toSeq
    // CHANGED count — not subgraph size — decides the keyed-delta vs
    // whole-store-rewrite branch: a dup-dense corpus yields a large
    // touched subgraph whose labels almost all stay put (sf10: 377k
    // subgraph labels, ~200 changed), and the keyed delta only writes
    // the changed rows
    if (changed.length > changedLimit)
      return FullRelabel(overrideMapping(stateComps, prep,
        spark.createDataFrame(newLabel.toSeq).toDF("doc_id", "component")))
    // batch-side labels only (state-side changes ride in `changed`):
    // the broadcast build stays batch-sized even when the touched
    // subgraph is corpus-scale. Batch ids cannot be recognized as
    // "absent from oldOf" alone — mid-retry their labels were already
    // stored before the crash — so collect them (batch-bounded)
    val batchIdSet: Set[Long] = prep.rows.select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val batchLocal = newLabel.iterator
      .filter(kv => batchIdSet.contains(kv._1) || !oldOf.contains(kv._1)).toSeq
    val batchLabels = prep.rows.select(col("doc_id"))
      .join(broadcast(spark.createDataFrame(batchLocal)
        .toDF("doc_id", "component")), Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
    CompDelta(batchLabels, changed)
  }

  // ---- driver-local fold (round-13): for the micro/small-batch regime
  // the whole near-dup subgraph is batch-bounded by construction, so the
  // pair generation, hamming verification and CC run on the DRIVER over
  // two bounded collects — no census job, no band-join broadcasts, no
  // per-consumer broadcast builds. Every bound is guarded; exceeding any
  // returns None and the caller takes the distributed path.

  /** Collected head/new band-row bound and generated-pair bound for the
    * local path (each row ~150 B on the driver; 4M ≈ 600 MB transient
    * in the 8 GB bench JVM — measured surviving comfortably at sf10,
    * where the adversarial dup-dense fold collects 1.32M head rows and
    * the local path beats the distributed one 7.2 s vs 13.3 s).
    */
  def LocalRowLimit: Int =
    sys.props.get("graft.curate.localRowLimit").map(_.toInt).getOrElse(4 << 20)
  def LocalPairLimit: Int =
    sys.props.get("graft.curate.localPairLimit").map(_.toInt).getOrElse(4 << 20)

  /** Above this many batch band rows (~8k docs) the local path is
    * skipped up front: a batch that size amortizes the distributed
    * path's fixed costs anyway, and on a dup-dense corpus its touched
    * head rows would blow [[LocalRowLimit]] only after paying the
    * window-scan, making the local attempt pure overhead.
    */
  def LocalBatchRowLimit: Int =
    sys.props.get("graft.curate.localBatchRowLimit").map(_.toInt).getOrElse(65536)

  /** The batch-bounded component delta computed driver-locally, or None
    * when any bound is exceeded (bulk batches, degenerate corpora).
    *
    * Pair-set parity with the distributed path (pinned by the fold ==
    * rebuild suites and IncBench outputs_identical at three scales):
    *
    *  - Per (fam, band, bucket) the candidate set is the bucket HEAD
    *    (smallest `cap` ids) all-pairs plus root→tail stars, with at
    *    least one batch side — exactly [[DedupQueries]]'s head/tail
    *    split. Batch ids exceed all state ids, so the head's state part
    *    is the per-bucket rank <= cap of STATE rows (the distributed
    *    window below) and the batch part completes locally; old tail
    *    members are never collected because their only candidate pair
    *    (with the old root) fails the >=1-new condition.
    *  - The census-driven all-pairs vs head/tail branch of the
    *    distributed path emits the same set either way for buckets at
    *    or under the cap (pure head), so computing head/tail uniformly
    *    here cannot diverge.
    *  - SimHash pairs are hamming<=3-verified on the collected sh
    *    payloads; MinHash candidates are Jaccard-verified by the SAME
    *    [[DedupQueries.verifiedBySets]] join over the stored hs arrays.
    *  - CC over (verified edges ∪ touched old stars) runs as the same
    *    min-label union-find [[graft.operators.ConnectedComponents]]
    *    uses for small graphs.
    *
    * Crash-retry: the postings store may already hold this batch's rows
    * (appended before the crash). State rows with batch ids are dropped
    * locally and re-added from the batch's own band rows — identical
    * membership, idempotent result.
    */
  def componentsDeltaFast(spark: org.apache.spark.sql.SparkSession,
      state: DataFrame, stateComps: DataFrame, prep: BatchPrep,
      postingsDir: Option[String],
      docsDir: Option[String] = None): Option[DeltaResult] = {
    import org.apache.spark.sql.graftbridge.Bridge.inSetLong
    var tl = System.nanoTime()
    def lap(s: String): Unit = {
      val t = System.nanoTime()
      System.err.println(f"[curate.add]   local/$s ${(t - tl) / 1e9}%.2fs")
      tl = t
    }
    val batchRows = postingsAll(prep.rows).limit(LocalBatchRowLimit + 1).collect()
    lap(s"batch_rows (${batchRows.length})")
    if (batchRows.length > LocalBatchRowLimit) return None
    val batchIds = batchRows.map(_.getLong(1)).toSet
    val selfLabels = () => CompDelta(
      prep.rows.select(col("doc_id"))
        .withColumn("component", col("doc_id")), Nil)
    if (batchRows.isEmpty) return Some(selfLabels())
    val touched = batchRows.map(_.getLong(5)).toSet
    // state-side head rows of the touched buckets: zone-pruned postings
    // read when a store exists, derived from the doc store otherwise;
    // rank <= cap per bucket bounds the collect (a bh collision only
    // admits rows of foreign buckets, which pair with nothing below)
    val src = postingsDir match {
      case Some(dir) =>
        val scan = graft.layout.PrunedScan.read(spark, dir,
          Seq(graft.layout.NumIn("bh", touched.map(_.toDouble).toSeq)),
          schema = Some(PostingsSchema))
        // free driver-only gate: the manifest's kept-file row counts
        // upper-bound the head collect BEFORE any job runs. On a
        // dup-dense store where the batch touches every file (the
        // adversarial ScaleUp corpus) the bound is the whole store and
        // the local attempt would only discover the overflow after
        // paying the window-scan — skip it here for free instead. The
        // 2x slack is the measured post-cap survival fraction (~0.3-0.4
        // of kept rows survive the touched-bucket InSet + rank filter at
        // sf1 AND on the dup-dense sf10 store), so kept > 2x limit means
        // the collect would overflow with high confidence.
        if (scan.rowsKeptBound > 2L * LocalRowLimit) {
          lap(s"kept_bound_gate (${scan.rowsKeptBound} rows kept, skip)")
          return None
        }
        scan.df
      case None => postingsAll(state)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fam"), col("band"), col("bucket"))
      .orderBy(col("doc_id"))
    val headRows = src
      .filter(inSetLong(col("bh"), touched))
      .withColumn("__r", row_number().over(w))
      .filter((col("fam") === 0 && col("__r") <= DedupQueries.SimhashBandCap) ||
        (col("fam") === 1 && col("__r") <= DedupQueries.DegenerateBucketCap))
      // postingsAll column order — `add` below reads both row kinds
      .select(col("fam"), col("doc_id"), col("band"), col("bucket"), col("sh"))
      .limit(LocalRowLimit + 1).collect()
    lap(s"head_rows (${headRows.length})")
    if (headRows.length > LocalRowLimit) return None

    // ---- driver pair generation (exact head/tail semantics)
    case class M(id: Long, sh: Long, isNew: Boolean)
    val byBucket = new scala.collection.mutable.HashMap[(Int, Int, String),
      scala.collection.mutable.ArrayBuffer[M]]()
    def add(r: org.apache.spark.sql.Row, isNew: Boolean): Unit = {
      val key = (r.getInt(0), r.getInt(2), r.getString(3))
      val sh = if (r.isNullAt(4)) 0L else r.getLong(4)
      byBucket.getOrElseUpdate(key,
        new scala.collection.mutable.ArrayBuffer[M]()) += M(r.getLong(1), sh, isNew)
    }
    // retry leftovers: state-side rows carrying batch ids are this
    // batch's half-appended postings — the batch rows re-add them
    headRows.foreach(r => if (!batchIds.contains(r.getLong(1))) add(r, isNew = false))
    batchRows.foreach(add(_, isNew = true))
    val simPairs = new scala.collection.mutable.HashSet[(Long, Long)]()
    val mhPairs = new scala.collection.mutable.HashSet[(Long, Long)]()
    var overflow = false
    byBucket.foreach { case ((fam, _, _), ms0) =>
      if (!overflow && ms0.exists(_.isNew)) {
        val ms = ms0.sortBy(_.id)
        val cap = if (fam == 0) DedupQueries.SimhashBandCap
          else DedupQueries.DegenerateBucketCap
        val head = ms.take(cap)
        val root = ms.head
        def emit(a: M, b: M): Unit = {
          val p = (math.min(a.id, b.id), math.max(a.id, b.id))
          if (fam == 0) {
            if (java.lang.Long.bitCount(a.sh ^ b.sh) <= 3) simPairs += p
          } else mhPairs += p
          if (simPairs.size + mhPairs.size > LocalPairLimit) overflow = true
        }
        // head pairs with >=1 new side: iterate each NEW head member
        // against all strictly-smaller head members — old ids are always
        // smaller than new ids, so old x new is covered once from the new
        // side and new x new once from the larger side; old x old never
        var i = 0
        while (i < head.length && !overflow) {
          val n = head(i)
          if (n.isNew) {
            var j = 0
            while (j < i && !overflow) { emit(head(j), n); j += 1 }
          }
          i += 1
        }
        // root -> tail stars with >=1 new side: old tail members only
        // pair with the (old) root, so only NEW tail members emit
        var k = cap
        while (k < ms.length && !overflow) {
          val m = ms(k)
          if (m.isNew && m.id != root.id) emit(root, m)
          k += 1
        }
      }
    }
    if (overflow) return None
    lap(s"pairs (sim=${simPairs.size} mh_cand=${mhPairs.size})")

    // ---- Jaccard verification of MinHash candidates (distributed: the
    // hs arrays stay in the store; the candidate frame is local)
    val mhEdges: Seq[(Long, Long)] =
      if (mhPairs.isEmpty) Nil
      else {
        val candDf = spark.createDataFrame(mhPairs.toSeq).toDF("da", "db")
        val ids = mhPairs.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
        // candidate-file prune (round-15 soak: this lookup grew
        // 0.5 s -> 3.2 s over 50 sf1 folds — scattered ids defeat
        // parquet's In->range pushdown, so the un-pruned scan
        // decompressed the whole hs column of the growing store every
        // fold). Tight doc_id zones keep O(candidate) files; batch ids
        // prune to nothing and come from prep.rows.
        val stateSets = docsDir match {
          case Some(d) if ids.size <= CandIdLimit =>
            val scan = graft.layout.PrunedScan.read(spark, d,
              Seq(graft.layout.NumIn("doc_id", ids.iterator.map(_.toDouble).toSeq)),
              schema = Some(state.schema))
            lap(s"verify_docs_prune (${scan.filesKept}/${scan.filesTotal} files)")
            scan.df.select(col("doc_id"), col("hs"))
          case _ => state.select(col("doc_id"), col("hs"))
        }
        val sets0 = stateSets
          .unionByName(prep.rows.select(col("doc_id"), col("hs")))
        val sets =
          if (ids.size > CandIdLimit) sets0
          else sets0.filter(inSetLong(col("doc_id"), ids))
        DedupQueries.verifiedBySets(candDf, sets)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      }
    lap(s"mh_verify (${mhEdges.length})")
    val edges = simPairs.toSeq ++ mhEdges
    if (edges.isEmpty) return Some(selfLabels())

    // ---- touched old components + local CC (mirrors componentsDelta)
    val endpointIds = edges.iterator
      .flatMap(p => Iterator(p._1, p._2)).toSet
    if (endpointIds.size > touchedCompLimit) return None
    val endpointsOld = stateComps
      .filter(inSetLong(col("doc_id"), endpointIds))
      .select(col("doc_id"), col("component"))
      .limit(touchedCompLimit + 1).collect()
    if (endpointsOld.length > touchedCompLimit) return None
    val cs = endpointsOld.map(_.getLong(1)).distinct
    val tRows =
      if (cs.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else stateComps.filter(inSetLong(col("component"), cs))
        .select(col("doc_id"), col("component"))
        .limit(touchedCompLimit + 1).collect()
    if (tRows.length > touchedCompLimit) return None
    lap(s"touched (${endpointsOld.length}+${tRows.length})")
    val tStars = tRows.iterator
      .map(r => (r.getLong(0), r.getLong(1))).filter(e => e._1 != e._2)
    val labels = graft.operators.ConnectedComponents.local(
      edges.iterator ++ tStars)
    val oldOf: Map[Long, Long] =
      (tRows.iterator ++ endpointsOld.iterator)
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val changed = oldOf.iterator.flatMap { case (id, old) =>
      labels.get(id).filter(_ != old).map(ChangedLabel(id, _, old))
    }.toSeq
    // changed-count overflow: whole-store rewrite straight from the
    // already-computed local labels — falling back to the distributed
    // path would redo the whole subgraph for the same answer
    if (changed.length > changedLimit)
      return Some(FullRelabel(overrideMapping(stateComps, prep,
        spark.createDataFrame(labels.toSeq).toDF("doc_id", "component"))))
    // batch-side labels only — see componentsDelta: the broadcast build
    // stays batch-sized even when the touched subgraph is corpus-scale.
    // Mid-retry batch ids ALSO appear in oldOf (their labels were
    // stored before the crash) — keep them by id, never by oldOf alone
    val batchLocal = labels.iterator
      .filter(kv => batchIds.contains(kv._1) || !oldOf.contains(kv._1)).toSeq
    val batchLabels = prep.rows.select(col("doc_id"))
      .join(broadcast(spark.createDataFrame(batchLocal)
        .toDF("doc_id", "component")), Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
    lap("cc_labels")
    Some(CompDelta(batchLabels, changed))
  }

  /** Full (state ∪ batch) mapping from an ALREADY-COMPUTED subgraph
    * label frame: stored labels overridden where the subgraph relabeled
    * them, self-labels for new docs — no second CC run.
    */
  private def overrideMapping(stateComps: DataFrame, prep: BatchPrep,
      labelsDf: DataFrame): DataFrame =
    stateComps.select(col("doc_id"), col("component").as("__old"))
      .unionByName(prep.rows
        .select(col("doc_id"), col("doc_id").as("__old")))
      // mid-retry the store may already hold batch rows — dedup (their
      // stored label equals the recomputed one, so min is exact)
      .groupBy(col("doc_id")).agg(min(col("__old")).as("__old"))
      .join(labelsDf, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("__old")))
      .select(col("doc_id"), col("component"))

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
      state: DataFrame, prep: BatchPrep, postingsDir: String,
      docsDir: Option[String] = None): DataFrame = {
    val tp0 = System.nanoTime()
    val batchRows = postingsAll(prep.rows).withColumn("__new", lit(true))
    // one batch-sized job collects the touched bucket keys (both
    // families share the key space — a cross-family bh collision only
    // lets a few extra untouched rows through the row filter, which the
    // >=1-new pair condition then ignores)
    val touchedRows = batchRows.select(col("bh"))
      .distinct().limit(TouchedKeyLimit + 1).collect()
    System.err.println(f"[curate.add]   edges/touched_keys " +
      f"${(System.nanoTime() - tp0) / 1e9}%.2fs (${touchedRows.length})")
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
    val tc0 = System.nanoTime()
    val c = DedupQueries.bandCensusRows(simAll, mhAll)
    System.err.println(f"[curate.add]   edges/census " +
      f"${(System.nanoTime() - tc0) / 1e9}%.2fs")
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
      DedupQueries.verifiedBySets(cand, verifySets(state, prep, cand, docsDir)))
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
