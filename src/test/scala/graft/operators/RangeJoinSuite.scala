package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class RangeJoinSuite extends SparkTestBase {
  import spark.implicits._

  private def brute(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)]) =
    (for {
      (pid, ts) <- points
      (iid, lo, hi) <- ivs
      if ts >= lo && ts < hi
    } yield (pid, iid)).sorted

  test("random points x intervals match brute force, negatives and boundaries included") {
    val rnd = new scala.util.Random(11)
    val points = (0L until 400L).map(i => (i, rnd.nextLong() % 10000L))
    val ivs = (0L until 60L).map { i =>
      val lo = rnd.nextLong() % 9000L
      (i, lo, lo + rnd.nextInt(900).toLong) // includes empty (len 0)
    } ++ Seq((100L, -500L, -500L + 250L)) // fully negative interval
    for (w <- Seq(7L, 100L, 5000L)) {
      val got = RangeJoin.pointInInterval(
        points.toDF("pid", "ts"), "ts",
        ivs.toDF("iid", "lo", "hi"), "lo", "hi", binWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      assert(got == brute(points, ivs), s"w=$w")
    }
  }

  test("half-open semantics: lo included, hi excluded, exactly once") {
    val points = Seq((1L, 100L), (2L, 199L), (3L, 200L)).toDF("pid", "ts")
    val ivs = Seq((9L, 100L, 200L)).toDF("iid", "lo", "hi")
    // bin width smaller than the interval: matching pair must appear ONCE
    val got = RangeJoin.pointInInterval(points, "ts", ivs, "lo", "hi", 30L)
      .select("pid").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("auto bin width is the median interval length and joins identically") {
    val rnd = new scala.util.Random(23)
    val points = (0L until 300L).map(i => (i, rnd.nextLong() % 8000L))
    // lengths 10..990 step 10 (99 intervals): exact median length = 500
    val ivs = (1L to 99L).map { i =>
      val lo = rnd.nextLong() % 7000L
      (i, lo, lo + i * 10L)
    }
    val ivDf = ivs.toDF("iid", "lo", "hi")
    val w = RangeJoin.autoBinWidth(ivDf, "lo", "hi")
    assert(math.abs(w - 500L) <= 50L, s"auto width $w should approximate the median 500")
    val auto = RangeJoin.pointInIntervalAuto(
      points.toDF("pid", "ts"), "ts", ivDf, "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    val explicit = RangeJoin.pointInInterval(
      points.toDF("pid", "ts"), "ts", ivDf, "lo", "hi", binWidth = w)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    assert(auto == explicit && auto == brute(points, ivs))
  }

  test("plans as an equi-join, not BroadcastNestedLoop/cartesian") {
    val points = (0L until 2000L).map(i => (i, i * 13 % 5000)).toDF("pid", "ts")
    val ivs = (0L until 200L).map(i => (i, i * 25, i * 25 + 40)).toDF("iid", "lo", "hi")
    val df = RangeJoin.pointInInterval(points, "ts", ivs, "lo", "hi", 50L)
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"range join degenerated to a product:\n$plan")
  }

  test("replication guard trips on an interval spanning too many bins") {
    val points = Seq((1L, 5L)).toDF("pid", "ts")
    val ivs = Seq((1L, 0L, 1000000L)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "ts", ivs, "lo", "hi",
        binWidth = 10L, maxBinsPerInterval = 100).count()
    }
    assert(e.getMessage != null)
  }
}
