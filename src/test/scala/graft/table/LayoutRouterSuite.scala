package graft.table

import graft.SparkTestBase
import graft.layout.LayoutWriter
import graft.layout.LayoutWriter.LayoutSpec

/** Per-query layout routing (round-19): each query goes to the variant
  * whose zone maps prune the most bytes — pinned on a Q6-shaped query
  * (tight range on the sort column → the matching curve variant wins)
  * and a Q16/Q1-shaped one (no prunable predicate → ties → first
  * variant, by convention the baseline).
  */
class LayoutRouterSuite extends SparkTestBase {

  private lazy val dirs: Seq[String] = {
    val spark2 = spark
    import spark2.implicits._
    // a × b decorrelated: sorting by one scatters the other
    val df = (1 to 20000).map { i =>
      (i.toLong, i.toDouble, ((i * 7919) % 20000).toDouble, s"p$i")
    }.toDF("k", "a", "b", "payload")
    val byA = tmpDir("graft_route_a")
    val byB = tmpDir("graft_route_b")
    val flat = tmpDir("graft_route_flat")
    LayoutWriter.write(df, flat,
      LayoutSpec("baseline", Nil, numFiles = Some(8)),
      extraStatsCols = Seq("a", "b"))
    LayoutWriter.write(df, byA,
      LayoutSpec("linear", Seq("a"), numFiles = Some(8)),
      extraStatsCols = Seq("b"))
    LayoutWriter.write(df, byB,
      LayoutSpec("linear", Seq("b"), numFiles = Some(8)),
      extraStatsCols = Seq("a"))
    Seq(flat, byA, byB)
  }

  private def register(): Unit =
    SfcTable.open(spark, dirs.head).createOrReplaceTempView("rt")

  test("a tight range on `a` routes to the a-sorted variant and prunes") {
    register()
    val c = LayoutRouter.route(spark, dirs,
      "SELECT sum(b) AS s FROM rt WHERE a BETWEEN 100 AND 600")
    assert(c.dir == dirs(1), s"expected the a-sorted variant: $c")
    assert(c.filesKept == 1 && c.filesTotal == 8, c.toString)
    // the routed scan returns the same rows as the registered view
    val expected = spark.sql(
      "SELECT count(*) FROM rt WHERE a BETWEEN 100 AND 600").collect()(0).getLong(0)
    val got = SfcTable.open(spark, c.dir)
      .filter("a BETWEEN 100 AND 600").count()
    assert(got == expected && got == 501L)
  }

  test("a tight range on `b` routes to the b-sorted variant") {
    register()
    val c = LayoutRouter.route(spark, dirs,
      "SELECT sum(a) AS s FROM rt WHERE b BETWEEN 100 AND 600")
    assert(c.dir == dirs(2), s"expected the b-sorted variant: $c")
    assert(c.filesKept == 1 && c.filesTotal == 8, c.toString)
  }

  test("no prunable predicate ties every variant and falls to the first") {
    register()
    // Q1/Q16-shape: aggregate-only, nothing for zone maps to cut
    val c = LayoutRouter.route(spark, dirs, "SELECT count(*) AS n FROM rt")
    assert(c.dir == dirs.head, s"ties must fall to the first variant: $c")
    assert(c.filesKept == c.filesTotal)
  }

  test("script statements that cannot plan contribute no predicates") {
    register()
    val preds = LayoutRouter.zonePreds(spark,
      "SELECT * FROM view_that_does_not_exist WHERE a < 5",
      spark.read.parquet(dirs.head).schema)
    assert(preds.isEmpty)
  }
}
