package graft.advisor

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._

/** Layout advisor — the reference's sql_layout_toolkit (V1–V5;
  * reference: notebooks/sql_layout_toolkit.py:140-1205), with the
  * hand-rolled SQL tokenizer replaced by Catalyst's parser
  * (`sessionState.sqlParser.parsePlan`) and a plan walk — robust against
  * everything the regex scanner fumbles (nesting, quoting, subqueries).
  *
  * Scoring weights follow the reference: predicate-type weights eq 5.0 /
  * in 4.0 / range 3.0 / like 2.0 / null 1.0, halved under OR
  * (toolkit:31-41,464-477); anchor formula 1003-1041; combo scoring
  * 1043-1148.
  */
object Advisor {

  sealed trait PredType { def weight: Double }
  case object EqPred extends PredType { val weight = 5.0 }
  case object InPred extends PredType { val weight = 4.0 }
  case object RangePred extends PredType { val weight = 3.0 }
  case object LikePred extends PredType { val weight = 2.0 }
  case object NullPred extends PredType { val weight = 1.0 }
  case object JoinPred extends PredType { val weight = 0.0 }

  case class PredEvent(column: String, ptype: PredType, inOr: Boolean, queryId: Int,
      table: String = "")

  /** V1: parse one SQL text and collect classified predicate events.
    * Each event carries its table attribution (qualified refs via the
    * alias map; unqualified refs attributed when the query reads exactly
    * one relation — the reference's alias-map heuristic,
    * sql_layout_toolkit.py:328-376).
    */
  def extract(spark: SparkSession, sql: String, queryId: Int = 0): Seq[PredEvent] = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    val events = scala.collection.mutable.ArrayBuffer.empty[PredEvent]

    val aliases = scala.collection.mutable.Map.empty[String, String]
    val relations = scala.collection.mutable.ArrayBuffer.empty[String]
    plan.foreach {
      case SubqueryAlias(ident, child: UnresolvedRelation) =>
        aliases(ident.name.toLowerCase) = child.multipartIdentifier.last.toLowerCase
      case r: UnresolvedRelation =>
        relations += r.multipartIdentifier.last.toLowerCase
      case _ =>
    }
    val singleTable = relations.distinct match {
      case scala.collection.mutable.ArrayBuffer(only) => Some(only)
      case _ => None
    }
    def tableOf(a: UnresolvedAttribute): String =
      if (a.nameParts.length > 1) {
        val q = a.nameParts(a.nameParts.length - 2).toLowerCase
        aliases.getOrElse(q, q)
      } else singleTable.getOrElse("")

    def colName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last.toLowerCase)
      case Cast(c, _, _, _) => colName(c)
      case _ => None
    }
    def colTable(e: Expression): String = e match {
      case a: UnresolvedAttribute => tableOf(a)
      case Cast(c, _, _, _) => colTable(c)
      case _ => ""
    }
    def isLit(e: Expression): Boolean = e match {
      case _: Literal => true
      case Cast(c, _, _, _) => isLit(c)
      case _ => e.foldable
    }

    def classify(e: Expression, inOr: Boolean): Unit = e match {
      case And(l, r) => classify(l, inOr); classify(r, inOr)
      case Or(l, r) => classify(l, inOr = true); classify(r, inOr = true)
      case Not(c) => classify(c, inOr)
      case EqualTo(l, r) if colName(l).isDefined && isLit(r) =>
        events += PredEvent(colName(l).get, EqPred, inOr, queryId, colTable(l))
      case EqualTo(l, r) if colName(r).isDefined && isLit(l) =>
        events += PredEvent(colName(r).get, EqPred, inOr, queryId, colTable(r))
      case EqualTo(l, r) if colName(l).isDefined && colName(r).isDefined =>
        events += PredEvent(colName(l).get, JoinPred, inOr, queryId, colTable(l))
        events += PredEvent(colName(r).get, JoinPred, inOr, queryId, colTable(r))
      case In(v, _) if colName(v).isDefined =>
        events += PredEvent(colName(v).get, InPred, inOr, queryId, colTable(v))
      case b @ (_: GreaterThan | _: GreaterThanOrEqual |
          _: LessThan | _: LessThanOrEqual) =>
        val bc = b.asInstanceOf[BinaryComparison]
        val side = if (colName(bc.left).isDefined) bc.left else bc.right
        colName(side).foreach(c =>
          events += PredEvent(c, RangePred, inOr, queryId, colTable(side)))
      // Spark 4 parses `x BETWEEN lo AND hi` as an unresolved 'between'
      // function call, not And(>=, <=)
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.last.equalsIgnoreCase("between") &&
            f.arguments.headOption.flatMap(colName).isDefined =>
        val c = f.arguments.head
        events += PredEvent(colName(c).get, RangePred, inOr, queryId, colTable(c))
      case l: Like =>
        colName(l.left).foreach(c =>
          events += PredEvent(c, LikePred, inOr, queryId, colTable(l.left)))
      case IsNull(c) =>
        colName(c).foreach(cc =>
          events += PredEvent(cc, NullPred, inOr, queryId, colTable(c)))
      case IsNotNull(c) =>
        colName(c).foreach(cc =>
          events += PredEvent(cc, NullPred, inOr, queryId, colTable(c)))
      case _ => // other expressions carry no layout signal
    }

    plan.foreach {
      case f: Filter => classify(f.condition, inOr = false)
      case j: Join => j.condition.foreach(classify(_, inOr = false))
      case _ =>
    }
    events.toSeq
  }

  case class ColumnScore(column: String, score: Double,
      filters: Int, joins: Int, ranges: Int, eqs: Int, ins: Int)

  /** V2+V3: per-column anchor scores over a workload of queries.
    * `kinds` (column → numeric|datetime|categorical) and `uniqueRatio`
    * feed the reference's multipliers and cardinality penalties.
    */
  def scoreColumns(
      events: Seq[PredEvent],
      kinds: Map[String, String] = Map.empty,
      uniqueRatio: Map[String, Double] = Map.empty): Seq[ColumnScore] = {
    events.groupBy(_.column).map { case (col, evs) =>
      val w = evs.map(e =>
        e.ptype.weight * (if (e.inOr) 0.5 else 1.0)).sum
      val filters = evs.count(_.ptype != JoinPred)
      val joins = evs.count(_.ptype == JoinPred)
      val ranges = evs.count(_.ptype == RangePred)
      val eqs = evs.count(_.ptype == EqPred)
      val ins = evs.count(_.ptype == InPred)
      var score = w + 0.5 * filters + 0.25 * joins +
        0.4 * ranges + 0.2 * eqs + 0.2 * ins
      kinds.get(col) match {
        case Some("datetime") => score *= 1.15
        case Some("numeric") => score *= 1.05
        case _ =>
      }
      uniqueRatio.get(col).foreach { ur =>
        if (ur < 1e-4) score *= 0.55
        else if (ur > 0.95 && joins == 0) score *= 0.75
      }
      ColumnScore(col, score, filters, joins, ranges, eqs, ins)
    }.toSeq.sortBy(-_.score)
  }

  case class ComboScore(columns: Seq[String], score: Double, coverage: Double)

  /** V4: score k-column layout-key combinations: anchor sum + 1.25 ×
    * pair co-occurrence + 0.75 × query coverage + 0.15 × leading
    * strength (toolkit:1043-1148). Returns best-first with the suggested
    * column order (strongest anchor leads).
    */
  def recommendCombos(
      events: Seq[PredEvent],
      k: Int,
      kinds: Map[String, String] = Map.empty,
      uniqueRatio: Map[String, Double] = Map.empty,
      top: Int = 5): Seq[ComboScore] = {
    val scores = scoreColumns(events, kinds, uniqueRatio)
    val byCol = scores.map(s => s.column -> s.score).toMap
    val queries = events.groupBy(_.queryId).view
      .mapValues(_.map(_.column).toSet).toMap
    val nQueries = math.max(1, queries.size)
    val candidates = scores.take(8).map(_.column)

    candidates.combinations(k).map { combo =>
      val set = combo.toSet
      val anchors = combo.map(byCol).sum
      val cooc = queries.values.count(q => set.subsetOf(q)).toDouble
      val coverage = queries.values.count(q => q.intersect(set).nonEmpty).toDouble / nQueries
      val ordered = combo.sortBy(c => -byCol(c))
      val leading = byCol(ordered.head)
      ComboScore(ordered,
        anchors + 1.25 * cooc + 0.75 * coverage + 0.15 * leading, coverage)
    }.toSeq.sortBy(-_.score).take(top)
  }

  case class TableRecommendation(
      table: String,
      layoutOpportunityScore: Double,
      totalScore: Double,
      filterEvents: Int,
      joinEvents: Int,
      candidateColumns: Int,
      cooccurPairSum: Double,
      cooccurPairMax: Double,
      queryCoverage: Int,
      topColumns: Seq[String],
      eligibleForMultiColLayout: Boolean)

  /** V5: rank TABLES by expected layout-tuning payoff (the reference's
    * stacked per-table recommendation, sql_layout_toolkit.py:910-1001):
    * per-table column-score totals + filter/join event counts + in-query
    * column co-occurrence, with an explicit multi-column-eligibility
    * flag that leads the sort. Candidate columns are those with filter
    * or join usage, dropping unique-like filter-only columns (weak
    * anchors; join keys are kept even when unique).
    */
  def recommendTables(
      events: Seq[PredEvent],
      kinds: Map[String, String] = Map.empty,
      uniqueRatio: Map[String, Double] = Map.empty,
      minCandidateColumns: Int = 2,
      top: Int = 8): Seq[TableRecommendation] = {
    val attributed = events.filter(_.table.nonEmpty)
    attributed.groupBy(_.table).map { case (table, evs) =>
      val cols = scoreColumns(evs, kinds, uniqueRatio)
      val candidates = cols.filter { c =>
        val used = c.filters > 0 || c.joins > 0
        val uniqueLike = uniqueRatio.get(c.column).exists(_ > 0.95)
        used && (!uniqueLike || c.joins > 0)
      }
      // co-occurrence: unordered column pairs of THIS table appearing in
      // the same query, counted across the workload
      val pairCounts = evs.groupBy(_.queryId).values.toSeq
        .flatMap(q => q.map(_.column).distinct.sorted.combinations(2).map(_.mkString("|")))
        .groupBy(identity).map(_._2.size.toDouble).toSeq
      val pairSum = pairCounts.sum
      val pairMax = if (pairCounts.isEmpty) 0.0 else pairCounts.max
      val filterEvents = evs.count(_.ptype != JoinPred)
      val joinEvents = evs.count(_.ptype == JoinPred)
      val totalScore = cols.map(_.score).sum
      TableRecommendation(
        table = table,
        layoutOpportunityScore = totalScore + 0.25 * filterEvents +
          0.10 * joinEvents + 0.75 * pairSum + 1.50 * pairMax,
        totalScore = totalScore,
        filterEvents = filterEvents,
        joinEvents = joinEvents,
        candidateColumns = candidates.length,
        cooccurPairSum = pairSum,
        cooccurPairMax = pairMax,
        queryCoverage = evs.map(_.queryId).distinct.length,
        topColumns = candidates.take(5).map(_.column),
        eligibleForMultiColLayout = candidates.length >= minCandidateColumns)
    }.toSeq.sortBy(r => (!r.eligibleForMultiColLayout,
      -r.layoutOpportunityScore, -r.candidateColumns, -r.queryCoverage))
      .take(top)
  }

  // ---- band-aware layout-family advice (round-13, VERDICT "Next #4")

  /** One range band a query constrains `column` to: the conjunction of
    * its >=/<= literals within a single query. Open sides are None.
    */
  case class RangeBand(column: String, table: String, queryId: Int,
      lo: Option[Double], hi: Option[Double])

  /** Collect the per-query numeric range bands of every filtered
    * column — the width signal [[recommendLayout]] turns into a
    * selectivity estimate. Non-numeric literals are skipped.
    */
  def extractRanges(spark: SparkSession, sql: String, queryId: Int = 0): Seq[RangeBand] = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    def colName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last.toLowerCase)
      case Cast(c, _, _, _) => colName(c)
      case _ => None
    }
    def litNum(e: Expression): Option[Double] = e match {
      // datetime literals normalize to the Profiler.numView convention
      // (TIMESTAMP 'x' parses to Long MICROS; the profiler's colRanges
      // carry unix_timestamp SECONDS — without the 1e6 the band
      // fraction of every timestamp predicate clamps to nonsense).
      // DATE 'x' parses to Int epoch DAYS, which already matches.
      case Literal(v, dt) => (v, dt) match {
        case (n: Number, org.apache.spark.sql.types.TimestampType |
            org.apache.spark.sql.types.TimestampNTZType) =>
          Some(n.doubleValue() / 1e6)
        case (n: Number, _) => Some(n.doubleValue())
        // fractional literals (BETWEEN 35.81 AND 37.37) parse as
        // Decimal, which is NOT a java.lang.Number — without this arm
        // every decimal band vanished and a fully-prunable workload
        // read as "no prunable predicate" (round-19; the same gap
        // ZoneTranslator closed in round 3)
        case (d: org.apache.spark.sql.types.Decimal, _) => Some(d.toDouble)
        case _ => None
      }
      case Cast(c, _, _, _) => litNum(c)
      case _ => None
    }
    // (col -> (lo, hi)) per query: tightest bounds win under AND
    val bounds = scala.collection.mutable
      .Map.empty[String, (Option[Double], Option[Double])]
    def note(c: String, lo: Option[Double], hi: Option[Double]): Unit = {
      val (l0, h0) = bounds.getOrElse(c, (None, None))
      bounds(c) = (
        Seq(l0, lo).flatten.maxOption,
        Seq(h0, hi).flatten.minOption)
    }
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case GreaterThan(l, r) =>
        (colName(l), litNum(r)) match {
          case (Some(c), Some(v)) => note(c, Some(v), None)
          case _ => (colName(r), litNum(l)) match {
            case (Some(c), Some(v)) => note(c, None, Some(v))
            case _ =>
          }
        }
      case GreaterThanOrEqual(l, r) => walk(GreaterThan(l, r))
      case LessThan(l, r) =>
        (colName(l), litNum(r)) match {
          case (Some(c), Some(v)) => note(c, None, Some(v))
          case _ => (colName(r), litNum(l)) match {
            case (Some(c), Some(v)) => note(c, Some(v), None)
            case _ =>
          }
        }
      case LessThanOrEqual(l, r) => walk(LessThan(l, r))
      case EqualTo(l, r) =>
        (colName(l), litNum(r)) match {
          case (Some(c), Some(v)) => note(c, Some(v), Some(v))
          case _ =>
        }
      // Spark 4 parses BETWEEN as an unresolved 'between' function call
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.last.equalsIgnoreCase("between") &&
            f.arguments.length == 3 =>
        (colName(f.arguments(0)), litNum(f.arguments(1)),
            litNum(f.arguments(2))) match {
          case (Some(c), lo, hi) if lo.isDefined || hi.isDefined =>
            note(c, lo, hi)
          case _ =>
        }
      case _ => // OR/NOT/other: no conjunctive band signal
    }
    plan.foreach {
      case f: Filter => walk(f.condition)
      case _ =>
    }
    bounds.toSeq.map { case (c, (lo, hi)) => RangeBand(c, "", queryId, lo, hi) }
  }

  /** Per-dimension band fraction above which the LINEAR layout wins
    * wall time: rq1 at sf10/sf16 measured linear beating curves by
    * ~40% at the S3/S4 bands (>=22% per dimension — surviving pages
    * are contiguous runs on the leading sort column, while a curve
    * file interleaves its matches across most of its pages) even
    * though curves keep fewer files at every band
    * (results/rq1_sf10/README.md, results/rq1_sf16/). 0.15 sits
    * between S2's ~7% per-dim and S3's ~22%.
    */
  val CoarseBandThreshold: Double = 0.15

  /** The secondary column must carry at least this fraction of the
    * leading anchor score — and co-occur in at least
    * [[MinPairCoverage]] of the queries — for a multi-column curve to
    * beat sorting on the dominant column alone.
    */
  val MinSecondaryAnchor: Double = 0.3
  val MinPairCoverage: Double = 0.3

  /** Mean per-dimension band fraction at or under which HILBERT is
    * recommended over zorder: the rq1 S1 band is ~2.2% per dimension
    * (tools/LayoutDecay.scala:73, the rq1 protocol's finest band) and
    * there sf16 measured hilbert 5.64x vs zorder 5.28x wall speedup at
    * identical 32x file pruning (results/rq1_sf16/geomean_speedup.csv)
    * — Hilbert's adjacent cells are spatially adjacent, so the finest
    * boxes stay contiguous. By S2 (~7% per dim) zorder already edges it
    * (4.10x vs 3.89x), so the branch stops just above S1.
    */
  val FinestBandThreshold: Double = 0.03

  /** A range band at or above this fraction of the column's profiled
    * domain no longer prunes meaningfully — TPC-H Q1's l_shipdate <=
    * '1998-09-02' covers ~98% of the domain and reads ~everything
    * regardless of layout (results/rq6_sf10: 37% fewer RECORDS via
    * page-level skipping, yet 0.70x WALL on hilbert from per-row read
    * overhead + file-size skew).
    */
  val FullScanBandFraction: Double = 0.5

  /** Minimum fraction of workload queries carrying a prunable
    * predicate for a sorted layout to be recommended at all. RQ6's
    * sf10 stream mix sits at ~0.27 prunable (6/22: Q6/Q12/Q14/Q15/Q20
    * band under half the domain; the rest filter nothing selective on
    * lineitem) and measured hilbert 0.97x OVERALL with the full-scan
    * queries regressing (Q1 0.70x, Q18 0.81x) — a workload below a
    * third coverage pays the curve's full-scan tax on most queries to
    * serve few.
    */
  val MinPruneCoverage: Double = 0.34

  case class LayoutAdvice(layout: String, cols: Seq[String],
      meanBandFraction: Option[Double], reason: String,
      pruneCoverage: Double = 1.0)

  /** V5+ (beyond the reference): pick the layout FAMILY, not only the
    * columns. The reference's toolkit stops at column ranking; the rq1
    * matrix at sf10/sf16 shows the family should follow predicate
    * selectivity — multi-dimensional curves win fine bands (S1/S2) and
    * always win file-level skipping, but leading-column linear order
    * wins coarse-band (S3/S4) WALL time by ~40% via page contiguity
    * (results/rq1_sf10/README.md "Ordering" table). Decision:
    *
    *  - effectively single-column workloads (no secondary anchor, or no
    *    pair co-occurrence) → `linear` on the dominant column;
    *  - multi-column with mean per-dimension band fraction >=
    *    [[CoarseBandThreshold]] → `linear` on the leading column (the
    *    measured S3/S4 inversion);
    *  - multi-column fine bands → `zorder` (use `hilbert` for the very
    *    finest bands at scale: sf16 S1 measured hilbert 5.64x vs zorder
    *    5.28x).
    *
    * `colRanges` maps columns to their profiled (min, max) — the
    * profiler's F-family stats — so query bands normalize to
    * per-dimension selectivity; columns without stats contribute no
    * band signal (equality/IN predicates count as fine).
    *
    * STRING key columns (round-17): deep-common-prefix id pools (ASINs
    * "B0...", tenant-prefixed UUIDs) are NOT a reason to steer away
    * from curves anymore — the writer strips the column's common
    * prefix before the curve code ([[graft.layout.StringCode]];
    * measured recovery in results/rq1_amazon "DEEP diagnostic":
    * curves 1x -> 7.6x/12x files-ratio, matching the raw pool). The
    * residual caveat is ids distinguished only past skip+6 code
    * points, which no fixed-width code can order; those pools want
    * `linear` (full lexicographic sort) on the id.
    */
  def recommendLayout(
      spark: SparkSession,
      sqls: Seq[String],
      colRanges: Map[String, (Double, Double)],
      kinds: Map[String, String] = Map.empty,
      uniqueRatio: Map[String, Double] = Map.empty,
      k: Int = 2): LayoutAdvice = {
    // scope every signal to the PROFILED table's columns when the
    // caller supplied `kinds` (Advise profiles exactly the target
    // table): a multi-table query's predicates on OTHER tables must not
    // count toward this table's layout scores or prune coverage — Q3's
    // c_mktsegment equality says nothing about whether a lineitem
    // layout can skip files. Without kinds (column-scoped unit calls)
    // all columns stay in scope.
    val inScope: String => Boolean =
      if (kinds.nonEmpty) kinds.keySet else (_: String) => true
    val events = sqls.zipWithIndex.flatMap { case (q, i) => extract(spark, q, i) }
      .filter(e => inScope(e.column))
    val scores = scoreColumns(
      events.filter(_.ptype != JoinPred), kinds, uniqueRatio)

    val bands = sqls.zipWithIndex
      .flatMap { case (q, i) => extractRanges(spark, q, i) }
      .filter(b => inScope(b.column))
    def fractionOf(b: RangeBand): Option[Double] =
      colRanges.get(b.column).flatMap { case (mn, mx) =>
        val w = mx - mn
        if (w <= 0) None
        else {
          // datetime literals arrive in the LITERAL's unit (DATE →
          // epoch days, TIMESTAMP → epoch seconds); the profiled
          // domain is in the COLUMN's unit. TPC-H-style texts compare
          // DATE literals against timestamp columns, landing ~86400×
          // below the domain and clamping the band to nonsense —
          // rescale a clearly-off edge by the day↔second factor when
          // (and only when) the column is known datetime and the
          // rescale lands inside the domain.
          // None = the literal lands outside the padded domain in EVERY
          // unit — treat that band edge as OPEN (fall back to mn/mx). A
          // beyond-domain bound in the wrong unit (date '2030-01-01' as
          // 21915 days against a seconds-profiled column, ×86400 also
          // past mx+w) would otherwise clamp the band to ~0 and classify
          // a full-scan query as maximally prunable (r18 ADVICE #4).
          def align(v: Double): Option[Double] =
            if (!kinds.get(b.column).contains("datetime")) Some(v)
            else if (v >= mn - w && v <= mx + w) Some(v)
            else if (v * 86400.0 >= mn - w && v * 86400.0 <= mx + w) Some(v * 86400.0)
            else if (v / 86400.0 >= mn - w && v / 86400.0 <= mx + w) Some(v / 86400.0)
            else None
          val lo = b.lo.flatMap(align).getOrElse(mn).max(mn)
          val hi = b.hi.flatMap(align).getOrElse(mx).min(mx)
          Some(((hi - lo) / w).max(0.0).min(1.0))
        }
      }

    // prune coverage (r17 VERDICT Next #6): the fraction of workload
    // queries that could actually SKIP data under ANY sorted layout —
    // an equality/IN filter, or a range band narrower than
    // [[FullScanBandFraction]] of the profiled domain (bands on columns
    // without stats get the benefit of the doubt). Queries outside this
    // set (no filter, join-only, or Q1-style ~full-domain ranges) pay a
    // sorted layout's costs — byte-skewed files, worse page locality —
    // and collect none of its pruning.
    val filterEvsByQ = events.filter(_.ptype != JoinPred).groupBy(_.queryId)
    val bandsByQ = bands.groupBy(_.queryId)
    val nQueries0 = math.max(1, sqls.size)
    val prunableQ = sqls.indices.count { i =>
      val eqIn = filterEvsByQ.getOrElse(i, Nil)
        .exists(e => e.ptype == EqPred || e.ptype == InPred)
      eqIn || bandsByQ.getOrElse(i, Nil)
        .exists(b => fractionOf(b).forall(_ < FullScanBandFraction))
    }
    val pruneCoverage = prunableQ.toDouble / nQueries0

    if (scores.isEmpty || pruneCoverage == 0.0)
      return LayoutAdvice("baseline", Nil, None,
        "no query in the workload carries a prunable predicate — any " +
          "sorted layout only adds full-scan cost (byte-skewed files, " +
          "per-row read overhead: results/rq6_sf10 Q1 0.70x, Q18 0.81x " +
          "on hilbert); keep the uniform baseline layout", 0.0)

    val byCol = scores.map(s => s.column -> s.score).toMap
    val lead = scores.head.column
    val secondary = scores.drop(1).take(k - 1).map(_.column)
      .filter(c => byCol(c) >= MinSecondaryAnchor * byCol(lead))

    val queries = events.groupBy(_.queryId).view
      .mapValues(_.map(_.column).toSet).toMap
    val nQueries = math.max(1, sqls.size)
    val pairCoverage =
      if (secondary.isEmpty) 0.0
      else queries.values.count(q =>
        q.contains(lead) && secondary.exists(q.contains)).toDouble / nQueries

    val keyCols = lead +: secondary
    val fractions = bands.filter(b => keyCols.contains(b.column)).flatMap(fractionOf)
    val meanFraction =
      if (fractions.isEmpty) None else Some(fractions.sum / fractions.size)

    if (pruneCoverage < MinPruneCoverage)
      LayoutAdvice("linear", Seq(lead), meanFraction,
        f"only $pruneCoverage%.2f of queries carry a prunable predicate " +
          f"(< $MinPruneCoverage%.2f): a full-scan-dominated workload " +
          "pays a curve's scan tax on most queries to serve few " +
          "(results/rq6_sf10: hilbert total 0.97x with Q1 0.70x/Q18 " +
          f"0.81x); linear on '$lead' keeps the minority's pruning at " +
          "near-uniform full-scan cost", pruneCoverage)
    else if (secondary.isEmpty || pairCoverage < MinPairCoverage)
      LayoutAdvice("linear", Seq(lead), meanFraction,
        s"single dominant filter column '$lead' " +
          f"(pair coverage $pairCoverage%.2f) — sort linearly on it",
        pruneCoverage)
    else if (meanFraction.exists(_ >= CoarseBandThreshold))
      LayoutAdvice("linear", keyCols, meanFraction,
        f"coarse bands (mean per-dim fraction ${meanFraction.get}%.2f >= " +
          f"$CoarseBandThreshold%.2f ~ S3/S4): linear on '$lead' wins wall " +
          "by ~40% via page contiguity (results/rq1_sf10/README.md)",
        pruneCoverage)
    else if (meanFraction.exists(_ <= FinestBandThreshold))
      LayoutAdvice("hilbert", keyCols, meanFraction,
        f"multi-column S1-width bands (mean per-dim fraction " +
          f"${meanFraction.get}%.3f <= $FinestBandThreshold%.2f): hilbert " +
          "measured 5.64x vs zorder 5.28x at sf16 S1, same 32x file " +
          "pruning (results/rq1_sf16/geomean_speedup.csv)", pruneCoverage)
    else
      LayoutAdvice("zorder", keyCols, meanFraction,
        f"multi-column fine bands (pair coverage $pairCoverage%.2f, " +
          s"mean per-dim fraction ${meanFraction.map(f => f"$f%.2f").getOrElse("n/a")}): " +
          "curves win files at every band and wall at S1/S2 " +
          "(results/rq1_sf10/README.md; hilbert edges zorder only at S1 " +
          "widths, handled above)", pruneCoverage)
  }
}
