package graft.operators

import graft.SparkTestBase

class ConnectedComponentsSuite extends SparkTestBase {
  import spark.implicits._

  /** Brute-force union-find with min-id labels — the oracle. */
  private def bruteCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // second pass: full path compression to the root
    val roots = nodes.map(n => n -> find(n)).toMap
    // relabel roots to the component MIN (union by min above already
    // guarantees root == min, but recompute defensively)
    val minOf = roots.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    roots.map { case (n, r) => n -> minOf(r) }
  }

  private def runCC(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by a bridge, duplicate + reversed edges") {
    val c1 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val c2 = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (b, a) // reversed
    val edges = c1 ++ c2 ++ Seq((4L, 10L), (10L, 4L), (2L, 2L)) // bridge dup + self-loop
    val got = runCC(edges)
    assert(got == bruteCC(edges.filter(e => e._1 != e._2)))
    assert(got.values.toSet == Set(0L)) // one component, min id 0
  }

  test("long path converges well under the naive-propagation round count") {
    // a 600-node path needs 600 rounds of min-label propagation;
    // large-star/small-star must finish in <= 20 (O(log^2 n))
    val edges = (0L until 599L).map(i => (i, i + 1))
    // threshold 0 forces the star rounds (the default would union-find)
    val got = ConnectedComponents
      .run(edges.toDF("src", "dst"), maxIter = 20, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 600 && got.values.forall(_ == 0L))
  }

  test("random graphs match brute-force union-find across densities") {
    val rnd = new scala.util.Random(42)
    for (nEdges <- Seq(30, 150, 600)) {
      val edges = Seq.fill(nEdges)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter(e => e._1 != e._2)
      assert(runCC(edges) == bruteCC(edges), s"nEdges=$nEdges")
    }
  }

  test("child-with-two-parents edge sets must not be declared converged") {
    // Regression: {(1,10),(3,10),(3,20),(2,20)} is ONE component, but one
    // large/small-star round yields {(1,3),(1,10),(2,3),(2,20)} — parent
    // and child sets disjoint (the old convergence test's only criterion)
    // yet node 3 sits under two parents. Declaring convergence there
    // labels 3 twice and splits the component in two.
    val edges = Seq((1L, 10L), (3L, 10L), (3L, 20L), (2L, 20L))
    val rows = ConnectedComponents.run(edges.toDF("src", "dst")).collect()
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "a node was labeled twice")
    assert(runCC(edges) == bruteCC(edges))
    assert(rows.map(_.getLong(1)).toSet == Set(1L), "must be one component rooted at 1")
  }

  test("parallel path and small-graph fast path produce identical labels") {
    // Pin the fast-path boundary: the same graph run just ABOVE the
    // threshold (parallel 32-way rounds) and at the default (1-partition
    // fast path) must agree edge-for-edge with the union-find oracle.
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(400)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter(e => e._1 != e._2)
    val oracle = bruteCC(edges)
    val slow = ConnectedComponents.run(edges.toDF("src", "dst"), smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(slow == oracle, "parallel path diverged from union-find")
    assert(runCC(edges) == oracle, "fast path diverged from union-find")
  }

  test("empty and single-edge graphs") {
    assert(runCC(Seq.empty) == Map.empty)
    assert(runCC(Seq((7L, 3L))) == Map(7L -> 3L, 3L -> 3L))
  }

  test("checkpoint blocks are fully released after Materialize.releaseAll") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = (0L until 50L).map(i => (i, i + 1))
    ConnectedComponents.run(edges.toDF("src", "dst")).count()
    graft.runner.Materialize.releaseAll()
    // non-blocking unpersist: give the block manager a moment
    val deadline = System.currentTimeMillis() + 10000
    def fresh = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (fresh.nonEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(fresh.isEmpty,
      s"CC leaked persisted RDDs ${fresh.mkString(",")} past releaseAll")
  }

  test("labels are component minima and ids are unique") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
      .filter(e => e._1 != e._2)
    val rows = ConnectedComponents.run(edges.toDF("x", "y")).collect()
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "each node labeled exactly once")
    val byComp = rows.groupBy(_.getLong(1))
    byComp.foreach { case (comp, members) =>
      assert(members.map(_.getLong(0)).min == comp, s"component $comp not labeled by its min")
    }
  }
}
