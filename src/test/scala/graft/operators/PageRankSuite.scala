package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PageRankSuite extends SparkTestBase {

  private def brute(edges: Seq[(Long, Long)], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      r = nodes.map { n =>
        n -> ((1 - d) + d * edges.collect {
          case (u, v) if v == n => r(u) / out(u) }.sum)
      }.toMap
    }
    r
  }

  test("matches the driver brute force, dangling and no-inbound nodes included") {
    val spark2 = spark
    import spark2.implicits._
    // 4 is a source (no inbound), 5 is dangling (no outbound)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (3L, 5L))
    val got = PageRank.run(edges.toDF("u", "v"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.runner.Materialize.releaseAll()
    val want = brute(edges, 10)
    assert(got.keySet === want.keySet)
    want.foreach { case (n, r) =>
      assert(math.abs(got(n) - r) < 1e-9, s"node $n: ${got(n)} vs $r") }
  }

  test("fast path and distributed path agree across the threshold") {
    val spark2 = spark
    import spark2.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (3L, 5L))
    val fast = PageRank.run(edges.toDF("u", "v"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = PageRank.run(edges.toDF("u", "v"), 10, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.runner.Materialize.releaseAll()
    assert(fast.keySet === dist.keySet)
    fast.foreach { case (n, r) =>
      assert(math.abs(dist(n) - r) < 1e-12, s"node $n") }
  }

  test("rank ordering reflects centrality on a star graph") {
    val spark2 = spark
    import spark2.implicits._
    // hub 0 with spokes both ways: hub must outrank every spoke
    val edges = (1L to 6L).flatMap(s => Seq((0L, s), (s, 0L)))
    val got = PageRank.run(edges.toDF("u", "v"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.runner.Materialize.releaseAll()
    assert((1L to 6L).forall(s => got(0L) > got(s)))
    // spokes are symmetric — identical ranks
    assert((2L to 6L).forall(s => math.abs(got(s) - got(1L)) < 1e-12))
  }
}
