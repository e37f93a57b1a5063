package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.curve.{HilbertValueExpr, ZValueExpr}

/** Session-extension packaging: `--conf spark.sql.extensions=
  * graft.GraftExtensions` (or `builder.withExtensions(new
  * GraftExtensions)`) injects the curve functions into every session
  * created from that builder — the idiomatic way a library ships
  * Catalyst additions (same hook Delta/Iceberg use). The imperative
  * alternative for an existing session is
  * [[graft.curve.CurveExpressions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def builder(make: (Seq[Expression], Int) => Expression)
      : Seq[Expression] => Expression = {
    case Literal(b: Int, IntegerType) +: coords if coords.nonEmpty =>
      make(coords, b)
    case _ =>
      throw new IllegalArgumentException(
        "usage: f(bits INT literal, coord BIGINT, ...)")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    // scale guard: equi-join sides over big tables must not
    // broadcast (see FactBroadcastGuard's doc for the SF1 numbers)
    e.injectPlannerStrategy(_ => graft.plans.FactBroadcastGuard)
    // manifest-stats CBO: zone-provably-small filtered dims broadcast
    // even where Spark's naive full-table sizing would shuffle
    e.injectPreCBORule(_ => graft.plans.StatsBroadcastHint)
    e.injectFunction((
      FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(classOf[ZValueExpr].getName, "graft_zvalue"),
      builder(ZValueExpr(_, _))))
    e.injectFunction((
      FunctionIdentifier("graft_hilbertvalue"),
      new ExpressionInfo(classOf[HilbertValueExpr].getName, "graft_hilbertvalue"),
      builder(HilbertValueExpr(_, _))))
    // text kernels, SQL-facing: graft_simhash60(ARRAY<STRING>) -> BIGINT,
    // graft_shingles(ARRAY<STRING>, n INT literal) -> ARRAY<STRING>
    e.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[graft.text.SimHash60].getName, "graft_simhash60"),
      {
        case Seq(ws) => graft.text.SimHash60(ws)
        case _ => throw new IllegalArgumentException(
          "usage: graft_simhash60(words ARRAY<STRING>)")
      }))
    e.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[graft.text.DistinctShingles].getName, "graft_shingles"),
      {
        case Seq(ws, Literal(n: Int, IntegerType)) =>
          graft.text.DistinctShingles(ws, n)
        case _ => throw new IllegalArgumentException(
          "usage: graft_shingles(words ARRAY<STRING>, n INT literal)")
      }))
  }
}
