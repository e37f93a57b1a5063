package graft.table

import graft.SparkTestBase
import graft.layout.LayoutWriter
import graft.layout.LayoutWriter.LayoutSpec

/** Per-query layout routing (round-19): each query goes to the variant
  * whose zone maps keep the fewest ABSOLUTE bytes — pinned on a
  * Q6-shaped query (tight range on the sort column → the matching
  * curve variant wins) and a Q16/Q1-shaped one (no prunable predicate
  * → all files kept → the byte-cheapest variant wins; exact ties fall
  * to the first variant).
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

  test("no prunable predicate keeps all files and routes to fewest bytes") {
    register()
    // Q1/Q16-shape: aggregate-only, nothing for zone maps to cut — the
    // router follows ABSOLUTE bytes (sorted variants delta-encode their
    // sort columns into genuinely fewer bytes; a fraction metric would
    // tie all variants at 1.0 and misroute full scans to the fattest)
    val c = LayoutRouter.route(spark, dirs, "SELECT count(*) AS n FROM rt")
    assert(c.filesKept == c.filesTotal)
    val cs = LayoutRouter.choices(dirs, Nil)
    assert(cs.forall(_.bytesTotal > 0), cs.toString)
    // semantic pin of the rule: the choice is within the 2% byte band
    // of the minimum, and no in-band variant has fewer files
    val minB = cs.map(_.bytesKept).min
    assert(c.bytesKept <= minB + math.max(minB / 50, 1L),
      s"routed outside the byte band: $c vs min $minB")
    val band = cs.filter(_.bytesKept <= minB + math.max(minB / 50, 1L))
    assert(band.forall(_.filesKept >= c.filesKept),
      s"an in-band variant has fewer files than the choice: $band vs $c")
  }

  test("identical estimates fall to the first variant (stable ordering)") {
    register()
    val c = LayoutRouter.route(spark, Seq(dirs.head, dirs.head, dirs(1)),
      "SELECT count(*) AS n FROM rt")
    // the duplicated head ties itself exactly; minBy keeps the first,
    // so a baseline-first variant ordering is a real convention
    assert(c.dir == dirs.head || c.dir == dirs(1))
    val csDup = LayoutRouter.choices(Seq(dirs.head, dirs.head), Nil)
    assert(csDup(0).bytesKept == csDup(1).bytesKept)
  }

  test("script statements that cannot plan contribute no predicates") {
    register()
    val preds = LayoutRouter.zonePreds(spark,
      "SELECT * FROM view_that_does_not_exist WHERE a < 5",
      spark.read.parquet(dirs.head).schema)
    assert(preds.isEmpty)
  }
}
