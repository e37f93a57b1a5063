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

  def run(edges: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(edges.columns.length >= 2,
      s"edge frame needs two endpoint columns, got ${edges.columns.mkString(",")}")
    val ec = edges.columns
    val e = graft.runner.Materialize.track(edges
      .select(col(ec(0)).cast("long").as("u"), col(ec(1)).cast("long").as("v")))
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
}
