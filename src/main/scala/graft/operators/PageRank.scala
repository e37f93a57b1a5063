package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over a directed edge frame — GraphX
  * semantics: r₀ = 1.0 per node, r_{t+1}(n) = (1−d) + d ·
  * Σ_{u→n} r_t(u)/outdeg(u), dangling mass evaporates. Used as the
  * centrality readout over the near-dup graph (q93): within a duplicate
  * family, the highest-rank member is the best keep-one representative.
  *
  * Scale shape: K iterations = K contribution shuffles (groupBy
  * destination), each over a node-sized rank frame joined against the
  * out-degree-annotated edges (computed ONCE, cached). Every round's
  * ranks localCheckpoint so the plan stays O(1) deep regardless of K —
  * the [[ConnectedComponents]] pattern, including the hand-tracked
  * RDD-block release (Dataset.unpersist cannot free checkpoint blocks;
  * the final round's blocks pass to Materialize.releaseAll ownership).
  */
object PageRank {

  /** Below this many edges the K iterative rounds cost more in fixed
    * per-job scheduling than one task computing the whole thing (the
    * same boundary argument as ConnectedComponents.SmallGraphEdges:
    * a ≤4M-edge set is ≤64 MB of longs — single-task memory, and the
    * measured sf0.1 near-dup graph spent ~0.9s/round on scheduling).
    */
  val SmallGraphEdges: Long = 4L * 1024 * 1024

  def run(edges: DataFrame, iterations: Int, damping: Double = 0.85,
      smallGraphThreshold: Long = SmallGraphEdges): DataFrame = {
    require(edges.columns.length >= 2,
      s"edge frame needs two endpoint columns, got ${edges.columns.mkString(",")}")
    val ec = edges.columns
    val e = graft.runner.Materialize.track(edges
      .select(col(ec(0)).cast("long").as("u"), col(ec(1)).cast("long").as("v")))
    if (e.count() <= smallGraphThreshold) {
      // Small-graph fast path: ONE executor task runs the K iterations
      // over the cached edge array — no per-round jobs. Edges sort by
      // (u,v) first so contribution-summation order is deterministic.
      import org.apache.spark.sql.{Encoders, Row}
      import org.apache.spark.sql.types._
      val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      val outSchema = StructType(Seq(StructField("node", LongType, false),
        StructField("rank", DoubleType, false)))
      val rows = e.as[(Long, Long)](enc).coalesce(1).rdd
        .mapPartitions(localPageRank(iterations, damping))
        .map { case (n, r) => Row(n, r) }
      return e.sparkSession.createDataFrame(rows, outSchema)
    }
    val outd = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
    // (u, v, d) — the static per-iteration join side, cached once
    val withD = graft.runner.Materialize.track(e.join(outd, "u"))
    val nodes = graft.runner.Materialize.track(
      e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
        .distinct())

    val bridge = org.apache.spark.sql.graftbridge.Bridge
    var ranks = nodes.withColumn("rank", lit(1.0))
      .localCheckpoint(eager = true)
    var prevRdds = bridge.checkpointRdd(ranks)
    var i = 0
    while (i < iterations) {
      val contribs = withD
        .join(ranks, col("u") === col("node"))
        .select(col("v").as("node"), (col("rank") / col("d")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1 - damping) + lit(damping) * coalesce(col("s"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(eager = true)
      val nextRdds = bridge.checkpointRdd(next)
      prevRdds.foreach(_.unpersist(blocking = false))
      ranks = next; prevRdds = nextRdds; i += 1
    }
    prevRdds.foreach(graft.runner.Materialize.trackRdd)
    ranks
  }

  /** The in-task iteration: identical math to the distributed loop
    * ((1−d) + d·Σ r/outdeg, dangling mass evaporates), edges processed
    * in sorted (u, v) order for a deterministic summation order.
    */
  private def localPageRank(iterations: Int, damping: Double)(
      it: Iterator[(Long, Long)]): Iterator[(Long, Double)] = {
    val edges = it.toArray
    scala.util.Sorting.quickSort(edges)
    val out = new java.util.HashMap[Long, Long]()
    edges.foreach { case (u, _) =>
      out.merge(u, 1L, (a, b) => a + b) }
    val nodes = edges.flatMap(e => Array(e._1, e._2)).distinct.sorted
    var r = new java.util.HashMap[Long, Double]()
    nodes.foreach(n => r.put(n, 1.0))
    var i = 0
    while (i < iterations) {
      val s = new java.util.HashMap[Long, Double]()
      edges.foreach { case (u, v) =>
        s.merge(v, r.get(u) / out.get(u), (a, b) => a + b) }
      val next = new java.util.HashMap[Long, Double]()
      nodes.foreach { n =>
        val c = s.getOrDefault(n, 0.0)
        next.put(n, (1 - damping) + damping * c)
      }
      r = next; i += 1
    }
    nodes.iterator.map(n => n -> r.get(n))
  }
}
