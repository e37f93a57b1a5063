package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import scala.jdk.CollectionConverters._

/** Physical-plan audits: the optimizations the 100 TB design depends on
  * must be visible in the plan, not assumed. Each assertion here is one
  * of the scale guarantees from the build plan — filter pushdown to the
  * scan, column pruning, broadcast of small sides, partial aggregation,
  * whole-stage codegen.
  */
class PlanAuditSuite extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q2 range filter is pushed down to the parquet scan") {
    val p = plan("q2_date_range")
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.matches("(?s).*PushedFilters:.*l_shipdate.*"),
      "l_shipdate range must reach the scan:\n" + p.take(1200))
  }

  test("q2 reads only the referenced columns (pruned ReadSchema)") {
    val p = plan("q2_date_range")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("l_shipdate") && read.contains("l_extendedprice"))
    assert(!read.contains("l_comment") && !read.contains("l_partkey"),
      s"scan reads unneeded columns: $read")
  }

  test("dimension joins broadcast the small side") {
    assert(plan("q6_join_dim").contains("BroadcastHashJoin"))
    val p7 = plan("q7_multijoin")
    assert(p7.contains("BroadcastHashJoin"), "nation/region must broadcast")
  }

  test("group-by aggregates use partial (map-side) aggregation") {
    val p = plan("q1_agg")
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate, got $aggs")
  }

  /** AQE only materializes codegen stages at execution — run the plan,
    * then inspect the final nodes.
    */
  private def executedNodes(df: DataFrame): Seq[String] = {
    df.queryExecution.toRdd.count()
    graft.runner.QueryRunner.allNodes(df.queryExecution.executedPlan)
      .map(_.nodeName)
  }

  test("hot paths stay inside whole-stage codegen") {
    for (q <- Seq("q1_agg", "q2_date_range", "q6_join_dim", "q24_token_count")) {
      val nodes = executedNodes(graft.SparkEntry.queries(q)(spark, sf))
      assert(nodes.exists(_.contains("WholeStageCodegen")),
        s"$q broke codegen: $nodes")
    }
  }

  test("curve expressions do not break codegen in the layout write path") {
    import graft.curve.CurveExpressions
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("plan_audit_curve")
    (1 to 100).map(i => (i.toLong % 32, i.toLong % 16)).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(CurveExpressions.zvalue(5, col("a"), col("b")).as("z"))
    val nodes = executedNodes(df)
    assert(nodes.exists(_.contains("WholeStageCodegen")), nodes.toString)
  }

  test("TPC-H streams: dims broadcast, aggs are partial+final, no cartesians") {
    // the heaviest new streams: multi-way joins (Q7/Q8/Q9), the
    // EXISTS/NOT EXISTS pair (Q21), and the left-join distribution (Q13)
    for (q <- Seq("q55_tpch7", "q56_tpch8", "q57_tpch9", "q59_tpch13", "q63_tpch21")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q: small dims must broadcast\n" + p.take(600))
      assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
        s"$q: expected partial+final aggregation")
      assert(!p.contains("CartesianProduct"), s"$q plans a CartesianProduct")
    }
  }

  test("Q21 runs as ONE fact pass: no self-joins, single lineitem scan + window") {
    // round 11: the Spark-side Q21 is the unique-latest-supplier
    // reformulation (TpchQueries.q21spark) — the canonical EXISTS/NOT
    // EXISTS text planned as a semi + anti SELF-join scanning lineitem
    // three times (the sf10 audit's 6.9x decade outlier). The oracle
    // still runs the canonical text; this pins the executed shape.
    val p = plan("q63_tpch21")
    // formatted explain prints one "Location: ...lineitem.parquet" line
    // per scan node
    val lineitemScans = p.linesIterator
      .count(l => l.contains("Location") && l.contains("lineitem.parquet"))
    assert(lineitemScans == 1,
      s"Q21 must scan the fact exactly once, saw $lineitemScans:\n" + p.take(800))
    assert(p.contains("Window"), "per-order supplier ranking must be a window")
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"),
      "the rewrite must not reintroduce fact self-joins")
  }

  test("simhash/shingle kernels stay inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    import graft.text.TextFunctions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sh = docs.select(simhash60(words(col("text"))).as("h"))
    val nodes = executedNodes(sh)
    assert(nodes.exists(_.contains("WholeStageCodegen")),
      s"SimHash60 broke codegen: $nodes")
    val shingled = docs.select(explode(shinglesDistinct(words(col("text")), 3)).as("s"))
    val n2 = executedNodes(shingled)
    assert(n2.exists(_.contains("WholeStageCodegen")),
      s"DistinctShingles broke codegen: $n2")
  }

  test("semi/anti build sides over big tables shuffle; small ones still broadcast") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("plan_audit_semi")
    // "fact": ~5 MB of parquet; "dim": a few KB
    (1L to 400000L).map(i => (i, i % 1000, s"payload_$i"))
      .toDF("k", "g", "pay").write.mode("overwrite").parquet(s"$dir/fact")
    (1L to 50L).toDF("k").write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // threshold below the fact's file size but above the dim's: the
      // guard judges by UNPRUNED file bytes, so a 2-column projection of
      // the fact must still shuffle while the dim build side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
      val vsFact = dim.join(fact.select(col("k")), Seq("k"), "left_semi")
      val pFact = vsFact.queryExecution.executedPlan.toString
      assert(!pFact.contains("BroadcastHashJoin"),
        "big semi build side must not broadcast:\n" + pFact.take(800))
      val vsDim = fact.join(dim, Seq("k"), "left_anti")
      val pDim = vsDim.queryExecution.executedPlan.toString
      assert(pDim.contains("BroadcastHashJoin"),
        "small anti build side must still broadcast:\n" + pDim.take(800))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("broadcast demotion sticks through AQE re-planning (row-cost term)") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("plan_audit_aqe")
    // the q41 pathology in miniature: a fat payload column makes the
    // FILE big, but the join projects only the key — so the shuffled
    // bytes are small while the row count (the hash-build cost) is not.
    // The payload must not compress away: unique hex noise per row.
    def noise(i: Long): String =
      (1 to 8).map(j => ((i * 2654435761L + j * 40503L) * 2654435761L).toHexString).mkString
    (1L to 200000L).map(i => (i % 50000, noise(i)))
      .toDF("k", "pay").coalesce(2).write.mode("overwrite").parquet(s"$dir/fact")
    val fileBytes = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/fact"))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .asScala.filter(_.toString.endsWith(".parquet"))
      .map(java.nio.file.Files.size).sum
    assert(fileBytes > 6L * 1024 * 1024,
      s"test precondition: fact file ($fileBytes B) must exceed the threshold")
    val fact = spark.read.parquet(s"$dir/fact")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // window: shuffled key bytes < threshold < rows * 48 (and < file)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (6L * 1024 * 1024).toString)
      val a = fact.select(col("k"))
      val b = fact.select(col("k").as("k2"))
      val joined = a.join(b, col("k") === col("k2")).agg(count(lit(1)))
      val nodes = executedNodes(joined)
      assert(!nodes.exists(_.contains("BroadcastHashJoin")),
        s"200k-row side must stay demoted through AQE re-plan: $nodes")
      // control: a genuinely small filtered side SHOULD end up broadcast —
      // the initial demotion (file bytes) is conservative, and AQE's
      // re-plan promotes it once the completed stage shows few rows
      val small = fact.filter(col("k") < 100).select(col("k").as("k2"))
      val j2 = fact.select(col("k")).join(small, col("k") === col("k2")).agg(count(lit(1)))
      val n2 = executedNodes(j2)
      assert(n2.exists(_.contains("BroadcastHashJoin")),
        s"AQE must still promote a truly small completed stage: $n2")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q70 interval join: event_type filters push to the scan, no nested loop") {
    val p = plan("q70_interval_join")
    assert(p.matches("(?s).*PushedFilters:.*event_type.*"),
      "event_type filter must reach the events scan:\n" + p.take(1200))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"q70 degenerated to a product join:\n${p.take(1200)}")
  }

  test("q72 curation pipeline: no cartesians, partial aggregation, codegen rollup") {
    val p = plan("q72_curation_pipeline")
    assert(!p.contains("CartesianProduct"), "q72 plans a CartesianProduct")
    assert(p.contains("HashAggregate"), "final rollup should hash-aggregate")
  }

  test("retrieval family: tf/df joins hash or broadcast, no plain cartesians") {
    for (q <- Seq("q85_bm25", "q86_bigram_lm", "q87_phrase_search",
        "q91_collocations")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a CartesianProduct")
      graft.runner.Materialize.releaseAll()
    }
    // the single-row stats frames join as broadcast nested loops — that
    // IS the intended scalar-broadcast shape; assert the score join
    // itself is a hash join
    val bm = plan("q85_bm25")
    assert(bm.contains("BroadcastHashJoin") || bm.contains("SortMergeJoin"),
      "q85's tf/dl join must be a hash/merge join:\n" + bm.take(1200))
    graft.runner.Materialize.releaseAll()
  }

  test("q90 cube stays one Expand + partial/final aggregation, one shuffle") {
    val p = plan("q90_cube")
    assert(p.contains("Expand"), "cube should plan an Expand")
    // formatted explain mentions each node twice (tree + detail header);
    // count only the numbered detail headers
    val shuffles = p.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(shuffles <= 2, // one agg exchange + the final orderBy range
      s"q90 should shuffle once for the agg (plus the sort), got $shuffles:\n${p.take(1200)}")
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate, got $aggs")
  }

  test("no accidental cartesian products in the relational queries") {
    // q14/q33-style broadcast nested loop joins are intentional
    // (scalar-subquery cross and non-equi pair join); plain
    // CartesianProduct with both sides large is never acceptable.
    for ((name, _) <- graft.queries.RelationalQueries.queries) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }
}
