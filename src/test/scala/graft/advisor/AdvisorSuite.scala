package graft.advisor

import graft.SparkTestBase

class AdvisorSuite extends SparkTestBase {

  private val workload = Seq(
    "SELECT count(*) FROM lineitem WHERE l_shipdate BETWEEN DATE '1994-01-01' AND DATE '1994-06-30' AND l_quantity >= 10",
    "SELECT * FROM lineitem WHERE l_shipdate = DATE '1995-03-15'",
    "SELECT l_returnflag, count(*) FROM lineitem WHERE l_shipdate >= DATE '1994-01-01' OR l_discount < 0.05 GROUP BY 1",
    "SELECT * FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey WHERE p.p_size IN (10, 20, 30)",
    "SELECT count(*) FROM lineitem WHERE l_comment LIKE '%special%' AND l_shipdate < DATE '1996-01-01'")

  private def events = workload.zipWithIndex.flatMap { case (q, i) =>
    Advisor.extract(spark, q, i)
  }

  test("extract classifies eq/in/range/like/join predicates") {
    import Advisor._
    val evs = events
    assert(evs.exists(e => e.column == "l_shipdate" && e.ptype == RangePred))
    assert(evs.exists(e => e.column == "l_shipdate" && e.ptype == EqPred))
    assert(evs.exists(e => e.column == "p_size" && e.ptype == InPred))
    assert(evs.exists(e => e.column == "l_comment" && e.ptype == LikePred))
    assert(evs.exists(e => e.column == "l_partkey" && e.ptype == JoinPred))
    assert(evs.exists(e => e.column == "p_partkey" && e.ptype == JoinPred))
  }

  test("OR context halves predicate weight") {
    val evs = Advisor.extract(spark,
      "SELECT 1 FROM t WHERE a = 1 OR b = 2")
    assert(evs.forall(_.inOr))
    val scored = Advisor.scoreColumns(evs)
    val plain = Advisor.scoreColumns(
      Advisor.extract(spark, "SELECT 1 FROM t WHERE a = 1 AND b = 2"))
    val orA = scored.find(_.column == "a").get.score
    val andA = plain.find(_.column == "a").get.score
    assert(orA < andA, s"or=$orA and=$andA")
  }

  test("l_shipdate dominates the single-column ranking for this workload") {
    val ranked = Advisor.scoreColumns(events,
      kinds = Map("l_shipdate" -> "datetime", "l_quantity" -> "numeric"))
    assert(ranked.head.column == "l_shipdate", ranked.take(3).toString)
  }

  test("cardinality penalties demote degenerate columns") {
    val evs = events
    val without = Advisor.scoreColumns(evs).find(_.column == "l_quantity").get.score
    val withPenalty = Advisor.scoreColumns(evs,
      uniqueRatio = Map("l_quantity" -> 1e-5)).find(_.column == "l_quantity").get.score
    assert(withPenalty < without)
  }

  test("combo recommendation pairs co-occurring columns, leader first") {
    val combos = Advisor.recommendCombos(events, k = 2,
      kinds = Map("l_shipdate" -> "datetime"))
    assert(combos.nonEmpty)
    val best = combos.head
    assert(best.columns.length == 2)
    // l_shipdate is the strongest anchor and must lead its combo
    assert(best.columns.contains("l_shipdate"))
    assert(best.columns.head == "l_shipdate")
    assert(best.coverage > 0.0 && best.coverage <= 1.0)
  }
}
