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
}
