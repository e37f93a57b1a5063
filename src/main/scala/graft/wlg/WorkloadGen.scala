package graft.wlg

import graft.profile.{Profiler, UniDist}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.util.Random

/** Workload generation: spec → parameterized SQL instances with
  * controlled selectivity (the reference's `wlg.cli fill` pipeline, G4–G8;
  * reference: wlg/cli/main.py:75-561, templates wlg/templates/sql.py,
  * emit wlg/emit/yaml_emit.py + sql_emit.py). Pure driver-side;
  * deterministic under a seed
  * (every reference spec pins seed 42).
  */
object WorkloadGen {

  // ---- Spec model (the subset the reference specs actually use) -------

  sealed trait ParamRule
  /** G1-style range param pair producing :<name>_lo / :<name>_hi. */
  case class RangeParam(name: String, column: String, selectivity: Double) extends ParamRule
  /** G5 interval rule: width = ratio × domain span, uniform placement.
    * `widthRatioHi` turns the fixed ratio into a sampled range (the
    * reference's `ratio_range: [lo, hi]`, wlg/cli/main.py:324-464).
    * `outFmt = "timestamp"` renders the bounds as UTC timestamp strings
    * for `TIMESTAMP ':p_lo'`-style templates (the Amazon spec family,
    * workload_spec/spec_amazon_Q1.yaml:12-16); constraints still see
    * the numeric epoch-seconds values.
    */
  case class IntervalParam(name: String, column: String, widthRatio: Double,
      intAlign: Boolean = false, widthRatioHi: Option[Double] = None,
      outFmt: String = "num") extends ParamRule
  /** Uniform integer scalar — the reference's `type: int, range: [a, b]`
    * params (HAVING thresholds, IN-list members, point predicates).
    */
  case class UniformIntParam(name: String, lo: Int, hi: Int) extends ParamRule
  /** G2 point param from top-k frequencies. */
  case class EqParam(name: String, column: String) extends ParamRule
  /** G5 date window anchored to another param's window: starts
    * `lagDays` after the anchor's lo (± a uniform gap up to
    * `maxStartGapDays`), spans `widthDays`, clipped to the column
    * domain (reference: wlg/cli/main.py:324-464, spec_tpch_Q1.yaml
    * interval_rules).
    */
  case class DateLagParam(name: String, column: String, anchor: String,
      lagDays: Int, widthDays: Int, maxStartGapDays: Int = 0) extends ParamRule
  /** G5 categorical window over the sorted top-k (size k). */
  case class CatWindowParam(name: String, column: String, k: Int) extends ParamRule

  case class TemplateSpec(
      name: String,
      sql: String, // with {{tbl}} and :param placeholders
      params: Seq[ParamRule],
      constraints: Seq[String] = Nil,
      n: Int = 10,
      mode: String = "random", // random | grid | lhs | copula (over range params)
      seed: Long = 42L,
      rho: Double = 0.4) // copula equicorrelation (predicates.py:51 default)

  case class QueryInstance(template: String, sql: String, params: Map[String, String])

  // ---- Fill ----------------------------------------------------------

  /** Distribution for a column from profiled stats (histogram if present,
    * quantile fallback otherwise — reference cli/main.py:1313-1337).
    */
  def distFor(stats: Profiler.TableStats, column: String): UniDist = {
    val c = stats.columns.find(_.name == column)
      .getOrElse(throw new IllegalArgumentException(s"no stats for $column"))
    c.histogram match {
      case Some((edges, counts)) => UniDist(edges, counts)
      case None =>
        UniDist.fromQuantiles(
          c.min.getOrElse(0.0), c.max.getOrElse(1.0),
          c.quantiles.toSeq.map { case (p, v) => p.toDouble -> v })
    }
  }

  def fill(spec: TemplateSpec, stats: Profiler.TableStats, table: String): Seq[QueryInstance] = {
    val rnd = new Random(spec.seed)
    val rangeRules = spec.params.collect { case r: RangeParam => r }
    val out = scala.collection.mutable.ArrayBuffer.empty[QueryInstance]
    var attempts = 0
    val maxAttempts = spec.n * 50

    // grid/lhs pre-plan CDF offsets for the range params (G4)
    val planned: Option[Seq[Seq[Double]]] = spec.mode match {
      case "grid" if rangeRules.nonEmpty =>
        Some(Samplers.gridPoints(rangeRules.length, spec.n))
      case "lhs" if rangeRules.nonEmpty =>
        Some(Samplers.lhsPoints(rangeRules.length, spec.n, rnd))
      case "copula" if rangeRules.nonEmpty =>
        Some(Samplers.copulaPoints(rangeRules.length, spec.n, spec.rho, rnd))
      case _ => None
    }

    while (out.length < spec.n && attempts < maxAttempts) {
      attempts += 1
      val idx = out.length
      val params = scala.collection.mutable.Map.empty[String, String]
      val evalParams = scala.collection.mutable.Map.empty[String, ConstraintEval.V]

      var rangeIdx = 0
      spec.params.foreach {
        case RangeParam(name, column, sel) =>
          val dist = distFor(stats, column)
          val (lo, hi) = planned match {
            case Some(points) if idx < points.length =>
              val u = points(idx)(rangeIdx) * (1.0 - sel)
              (dist.invCdf(u), dist.invCdf(u + sel))
            case _ => Samplers.sampleBetween(dist, sel, rnd)
          }
          rangeIdx += 1
          params(s"${name}_lo") = fmt(lo); params(s"${name}_hi") = fmt(hi)
          evalParams(s"${name}_lo") = ConstraintEval.Num(lo)
          evalParams(s"${name}_hi") = ConstraintEval.Num(hi)
        case IntervalParam(name, column, ratio0, intAlign, ratioHi, outFmt) =>
          val c = stats.columns.find(_.name == column).get
          val (mn, mx) = (c.min.getOrElse(0.0), c.max.getOrElse(1.0))
          val ratio = ratioHi
            .map(rh => ratio0 + rnd.nextDouble() * math.max(0.0, rh - ratio0))
            .getOrElse(ratio0)
          val width = ratio * (mx - mn)
          var lo = mn + rnd.nextDouble() * math.max(0.0, (mx - mn) - width)
          var hi = lo + width
          if (intAlign) { lo = math.floor(lo); hi = math.ceil(hi) }
          // floor lo / ceil hi: whole-second TIMESTAMP literals must
          // CONTAIN the numeric window the constraints evaluated (plain
          // truncation would shave up to 1s off each bound)
          val (sLo, sHi) =
            if (outFmt == "timestamp") (fmtTs(math.floor(lo)), fmtTs(math.ceil(hi)))
            else (fmt(lo), fmt(hi))
          params(s"${name}_lo") = sLo; params(s"${name}_hi") = sHi
          evalParams(s"${name}_lo") = ConstraintEval.Num(lo)
          evalParams(s"${name}_hi") = ConstraintEval.Num(hi)
        case UniformIntParam(name, lo, hi) =>
          val v = lo + rnd.nextInt(math.max(1, hi - lo + 1))
          params(name) = v.toString
          evalParams(name) = ConstraintEval.Num(v.toDouble)
        case EqParam(name, column) =>
          val c = stats.columns.find(_.name == column).get
          val v = Samplers.sampleEqFromTopk(c.topk, rnd)
          params(name) = v
          evalParams(name) = ConstraintEval.Str(v)
        case DateLagParam(name, column, anchor, lagDays, widthDays, maxGap) =>
          // anchor param must have been produced earlier in the rule list
          val anchorLo = evalParams.get(s"${anchor}_lo") match {
            case Some(ConstraintEval.Num(v)) => v
            case _ => throw new IllegalArgumentException(
              s"DateLagParam $name: anchor ${anchor}_lo not sampled yet")
          }
          val c = stats.columns.find(_.name == column).get
          val (dMin, dMax) = (c.min.getOrElse(0.0), c.max.getOrElse(0.0))
          val day = 86400.0 // stats domain is epoch seconds
          val gap = if (maxGap > 0) rnd.nextDouble() * maxGap * day else 0.0
          var lo = anchorLo + lagDays * day + gap
          var hi = lo + widthDays * day
          // clip_to_domain
          lo = math.max(dMin, math.min(lo, dMax))
          hi = math.max(lo, math.min(hi, dMax))
          params(s"${name}_lo") = fmt(lo); params(s"${name}_hi") = fmt(hi)
          evalParams(s"${name}_lo") = ConstraintEval.Num(lo)
          evalParams(s"${name}_hi") = ConstraintEval.Num(hi)
        case CatWindowParam(name, column, k) =>
          val values = stats.columns.find(_.name == column).get.topk.map(_._1).sorted
          val start = rnd.nextInt(math.max(1, values.length - k + 1))
          val window = values.slice(start, start + k)
          params(name) = window.map(v => s"'${v.replace("'", "''")}'").mkString(", ")
          evalParams(name) = ConstraintEval.Str(window.mkString(","))
      }

      val ok = spec.constraints.forall(c =>
        ConstraintEval.evaluate(c, evalParams.toMap))
      if (ok) {
        val sql = render(spec.sql, params.toMap + ("tbl" -> table))
        out += QueryInstance(spec.name, sql, params.toMap)
      }
    }
    require(out.length == spec.n,
      s"rejection sampling exhausted: ${out.length}/${spec.n} after $attempts tries")
    out.toSeq
  }

  private def fmt(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else f"$v%.6f"

  /** Epoch-seconds → UTC 'yyyy-MM-dd HH:mm:ss' (stats keep time columns
    * in epoch seconds; templates splice this into TIMESTAMP literals).
    */
  private def fmtTs(epochSec: Double): String =
    java.time.LocalDateTime.ofEpochSecond(epochSec.toLong, 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** G7: longest-name-first :param replacement + {{tbl}} substitution
    * (reference: wlg/cli/main.py:539-551).
    */
  def render(template: String, params: Map[String, String]): String = {
    var sql = template.replace("{{tbl}}", params.getOrElse("tbl", "{{tbl}}"))
    params.toSeq.filter(_._1 != "tbl").sortBy(-_._1.length).foreach { case (k, v) =>
      sql = sql.replace(s":$k", v)
    }
    sql
  }

  /** G8: emit numbered .sql files + a JSON workload doc. */
  def emit(outDir: String, instances: Seq[QueryInstance]): Unit = {
    Files.createDirectories(Paths.get(outDir))
    instances.zipWithIndex.foreach { case (q, i) =>
      Files.write(Paths.get(outDir, f"query_$i%04d.sql"),
        q.sql.getBytes(StandardCharsets.UTF_8))
    }
    val json = instances.map { q =>
      val ps = q.params.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${k}": "${v.replace("\"", "\\\"")}"""" }
        .mkString("{", ", ", "}")
      s"""{"tpl": "${q.template}", "sql": ${jstr(q.sql)}, "params": $ps}"""
    }.mkString("{\"workload\": [\n", ",\n", "\n]}")
    Files.write(Paths.get(outDir, "workload.json"),
      json.getBytes(StandardCharsets.UTF_8))
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** G10: dialect hook (identity, like the reference's
    * wlg/templates/dialect.py:6-16).
    */
  def formatSql(sql: String, dialect: String = "spark"): String = sql
}
