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

  test("table attribution: aliases, qualifiers, single-table fallback") {
    val evs = Advisor.extract(spark,
      """SELECT * FROM lineitem l JOIN orders ON l.l_orderkey = orders.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND orders.o_totalprice > 100""".stripMargin)
    assert(evs.find(_.column == "l_shipdate").get.table == "lineitem",
      "alias l must resolve to lineitem")
    assert(evs.find(_.column == "o_totalprice").get.table == "orders")
    assert(evs.find(_.column == "l_orderkey").get.table == "lineitem")
    // unqualified single-table query attributes to the only relation
    val single = Advisor.extract(spark,
      "SELECT * FROM part WHERE p_size BETWEEN 1 AND 5")
    assert(single.forall(_.table == "part"))
    // unqualified ref in a two-table query stays unattributed, not guessed
    val ambiguous = Advisor.extract(spark,
      "SELECT * FROM a JOIN b ON a.k = b.k WHERE x > 1")
    assert(ambiguous.find(_.column == "x").get.table == "")
  }

  test("table recommendation ranks filter-rich tables first with eligibility") {
    val workload = Seq(
      "SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_quantity < 24",
      "SELECT * FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00' AND l_discount BETWEEN 0.03 AND 0.07",
      "SELECT * FROM lineitem l JOIN nation n ON l.l_suppkey = n.n_nationkey WHERE l.l_quantity > 10")
    val evs = workload.zipWithIndex.flatMap { case (q, i) => Advisor.extract(spark, q, i) }
    val recs = Advisor.recommendTables(evs)
    assert(recs.head.table == "lineitem", recs.toString)
    assert(recs.head.eligibleForMultiColLayout,
      "lineitem has 3+ filter columns — multi-col eligible")
    assert(recs.head.topColumns.nonEmpty && recs.head.topColumns.length <= 5)
    assert(recs.head.queryCoverage == 3)
    assert(recs.head.cooccurPairSum > 0, "co-filtered columns must count as pairs")
    val nation = recs.find(_.table == "nation").get
    assert(!nation.eligibleForMultiColLayout,
      "join key only (one usable column) is not multi-col")
    assert(nation.candidateColumns == 1)
    // unique-like filter-only columns are dropped; unique join keys kept
    val uniq = Advisor.recommendTables(evs,
      uniqueRatio = Map("l_shipdate" -> 0.99, "l_suppkey" -> 0.99))
    val li = uniq.find(_.table == "lineitem").get
    assert(!li.topColumns.contains("l_shipdate"), "unique-like filter col dropped")
    assert(li.topColumns.contains("l_suppkey"), "unique join key kept")
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

  // band-aware layout-family advice (round-13): the rq1 sf10/sf16
  // matrix's S3/S4 wall inversion feeds the linear-vs-curve decision
  // (results/rq1_sf10/README.md — linear wins coarse bands by ~40%,
  // curves win fine bands and always win file counts)
  private val quantPriceRanges = Map(
    "l_quantity" -> (1.0, 50.0), "l_extendedprice" -> (900.0, 105000.0))

  test("layout advice: S4-heavy single-column workload yields linear") {
    // ~40% of l_quantity's [1,50] domain per query, one dominant column
    val workload = Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 10 AND 30",
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 20 AND 40",
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 5 AND 25")
    val a = Advisor.recommendLayout(spark, workload, quantPriceRanges)
    assert(a.layout == "linear", a.toString)
    assert(a.cols == Seq("l_quantity"))
    assert(a.meanBandFraction.exists(_ > 0.3), a.toString)
  }

  test("layout advice: S1-width two-column workload yields hilbert (measured 5.64x vs 5.28x)") {
    // ~2% of each dimension, both columns in every query (the rq1 S1 band,
    // where sf16 measured hilbert 5.64x vs zorder 5.28x —
    // results/rq1_sf16/geomean_speedup.csv)
    val workload = Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 24 AND 25 AND l_extendedprice BETWEEN 30000 AND 32000",
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 10 AND 11 AND l_extendedprice BETWEEN 50000 AND 52000",
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 40 AND 41 AND l_extendedprice BETWEEN 10000 AND 12000")
    val a = Advisor.recommendLayout(spark, workload, quantPriceRanges)
    assert(a.layout == "hilbert", a.toString)
    assert(a.cols.toSet == Set("l_quantity", "l_extendedprice"))
    assert(a.meanBandFraction.exists(_ <= Advisor.FinestBandThreshold), a.toString)
    assert(a.reason.contains("5.64x"), "advice must cite the measured sf16 S1 data")
  }

  test("layout advice: S2-width two-column workload yields zorder (zorder edges hilbert by S2)") {
    // ~6-7% of each dimension — the rq1 S2 band, where zorder already
    // beats hilbert (4.10x vs 3.89x at sf16)
    val workload = Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 10 AND 13 AND l_extendedprice BETWEEN 30000 AND 37000",
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 30 AND 33 AND l_extendedprice BETWEEN 50000 AND 57000")
    val a = Advisor.recommendLayout(spark, workload, quantPriceRanges)
    assert(a.layout == "zorder", a.toString)
    assert(a.cols.toSet == Set("l_quantity", "l_extendedprice"))
    assert(a.meanBandFraction.exists(f =>
      f > Advisor.FinestBandThreshold && f < Advisor.CoarseBandThreshold), a.toString)
  }

  test("layout advice: coarse two-column workload still yields linear (the S3/S4 inversion)") {
    val workload = Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 10 AND 30 AND l_extendedprice BETWEEN 20000 AND 70000",
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 20 AND 45 AND l_extendedprice BETWEEN 10000 AND 60000")
    val a = Advisor.recommendLayout(spark, workload, quantPriceRanges)
    assert(a.layout == "linear", a.toString)
    assert(a.cols.length == 2 && a.cols.head == a.cols.head, a.toString)
    assert(a.meanBandFraction.exists(_ >= Advisor.CoarseBandThreshold), a.toString)
    assert(a.reason.contains("rq1"), "advice must cite the measured rq1 data")
  }

  // prune-coverage steering (r17 VERDICT Next #6): RQ6 sf10 measured a
  // full-scan-dominated stream at hilbert 0.97x overall with Q1 0.70x /
  // Q18 0.81x — workloads where most queries cannot prune should not
  // get a curve at all
  test("layout advice: zero prunable queries yields baseline") {
    // Q1-shape: a range band covering ~98% of the domain + no-filter
    // aggregates — nothing can skip, any sort order only costs
    val workload = Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity <= 49",
      "SELECT l_returnflag, count(*) FROM lineitem GROUP BY l_returnflag",
      "SELECT max(l_extendedprice) FROM lineitem")
    val a = Advisor.recommendLayout(spark, workload, quantPriceRanges)
    assert(a.layout == "baseline", a.toString)
    assert(a.pruneCoverage == 0.0, a.toString)
    assert(a.cols.isEmpty)
    assert(a.reason.contains("rq6"), "advice must cite the measured rq6 data")
  }

  test("layout advice: low prune coverage steers to linear (the RQ6 Q1 finding)") {
    // 1 prunable of 4 (coverage 0.25 < 0.34): the fine-band minority
    // would have earned a curve, but the full-scan majority pays for it
    val workload = Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 24 AND 25 AND l_extendedprice BETWEEN 30000 AND 32000",
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity <= 49",
      "SELECT l_returnflag, count(*) FROM lineitem GROUP BY l_returnflag",
      "SELECT avg(l_extendedprice) FROM lineitem WHERE l_quantity >= 2")
    val a = Advisor.recommendLayout(spark, workload, quantPriceRanges)
    assert(a.layout == "linear", a.toString)
    assert(a.pruneCoverage == 0.25, a.toString)
    assert(a.cols.length == 1, a.toString)
    assert(a.reason.contains("rq6_sf10"), "advice must cite the measured rq6 data")
    // the same fine-band query at full coverage WOULD have earned a
    // curve — the steering is the coverage signal, not the bands
    val fine = Advisor.recommendLayout(spark, Seq(workload.head), quantPriceRanges)
    assert(fine.layout == "hilbert" || fine.layout == "zorder", fine.toString)
    assert(fine.pruneCoverage == 1.0)
  }

  test("layout advice: timestamp bands normalize to profiler epoch seconds") {
    // domain = 1992..1998 in epoch seconds (the Profiler.numView
    // convention for TIMESTAMP columns); a one-year band must read ~16%,
    // not clamp to ~100% (TIMESTAMP literals parse to MICROS)
    val lo = java.time.Instant.parse("1992-01-01T00:00:00Z").getEpochSecond.toDouble
    val hi = java.time.Instant.parse("1998-12-01T00:00:00Z").getEpochSecond.toDouble
    val ranges = Map("l_shipdate" -> (lo, hi))
    val workload = Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'")
    val a = Advisor.recommendLayout(spark, workload, ranges)
    assert(a.layout == "linear" && a.cols == Seq("l_shipdate"), a.toString)
    assert(a.meanBandFraction.exists(f => f > 0.10 && f < 0.20),
      s"one-year band should be ~0.145 of the domain: $a")
    assert(a.pruneCoverage == 1.0, a.toString)
    // Q1-shape near-full band on the same column: NOT prunable
    val q1 = Advisor.recommendLayout(spark, Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"), ranges)
    assert(q1.layout == "baseline" && q1.pruneCoverage == 0.0, q1.toString)
  }

  test("layout advice: DATE literals on a timestamp column rescale to the domain unit") {
    // TPC-H texts mix `date 'x'` (epoch DAYS) against timestamp columns
    // (profiled in epoch SECONDS) — without the day<->second alignment
    // the band clamps to ~0 and a full-scan query looks S1-prunable
    val lo = java.time.Instant.parse("1992-01-01T00:00:00Z").getEpochSecond.toDouble
    val hi = java.time.Instant.parse("1998-12-01T00:00:00Z").getEpochSecond.toDouble
    val ranges = Map("l_shipdate" -> (lo, hi))
    val kinds = Map("l_shipdate" -> "datetime")
    val a = Advisor.recommendLayout(spark, Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_shipdate >= date '1994-01-01' AND l_shipdate < date '1995-01-01'"),
      ranges, kinds)
    assert(a.meanBandFraction.exists(f => f > 0.10 && f < 0.20),
      s"one-year DATE band should be ~0.145 of the seconds domain: $a")
    // Q1-shape ~full-domain DATE band: correctly non-prunable
    val q1 = Advisor.recommendLayout(spark, Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_shipdate <= date '1998-09-02'"),
      ranges, kinds)
    assert(q1.layout == "baseline" && q1.pruneCoverage == 0.0, q1.toString)
    // a literal BEYOND the domain in EVERY unit (date '2030-01-01' =
    // 21915 days is under the seconds domain's lo, and ×86400 overshoots
    // mx+w): the band edge is OPEN, so this full-scan query must NOT be
    // classified maximally prunable (r18 ADVICE #4 — the raw mis-unit
    // value used to clamp the band to ~0)
    val beyond = Advisor.recommendLayout(spark, Seq(
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_shipdate <= date '2030-01-01'"),
      ranges, kinds)
    assert(beyond.layout == "baseline" && beyond.pruneCoverage == 0.0,
      beyond.toString)
  }

  test("layout advice: out-of-scope tables' predicates don't count when kinds are supplied") {
    // Q3-shape: the customer equality must not make the no-lineitem-
    // filter query look prunable for the LINEITEM layout
    val kinds = Map("l_quantity" -> "numeric", "l_extendedprice" -> "numeric")
    val workload = Seq(
      "SELECT o_orderkey FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey JOIN lineitem l ON l.l_orderkey = o.o_orderkey WHERE c.c_mktsegment = 'BUILDING'",
      "SELECT sum(l_orderkey) FROM lineitem WHERE l_quantity BETWEEN 10 AND 12")
    val a = Advisor.recommendLayout(spark, workload, quantPriceRanges, kinds)
    assert(a.pruneCoverage == 0.5, a.toString)
    val unscoped = Advisor.recommendLayout(spark, workload, quantPriceRanges)
    assert(unscoped.pruneCoverage == 1.0, unscoped.toString)
  }

  test("extractRanges: conjunctive bounds tighten, open sides stay open") {
    val bands = Advisor.extractRanges(spark,
      "SELECT * FROM t WHERE a >= 5 AND a < 15 AND a >= 7 AND b > 100")
    val a = bands.find(_.column == "a").get
    assert(a.lo.contains(7.0) && a.hi.contains(15.0))
    val b = bands.find(_.column == "b").get
    assert(b.lo.contains(100.0) && b.hi.isEmpty)
  }
}
