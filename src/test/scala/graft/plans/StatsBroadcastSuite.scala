package graft.plans

import graft.SparkTestBase
import graft.layout.LayoutWriter
import graft.layout.LayoutWriter.LayoutSpec
import graft.table.SfcTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The join-regime split (round-15): ESTIMATED sizes obey the static
  * 50 MB threshold; PROVEN sizes — manifest zone stats at planning time,
  * AQE-measured stages at runtime — may broadcast up to the
  * memory-derived `spark.graft.broadcastBudget`. These tests reproduce
  * the q57/TPC-H-Q9 sf32 cliff shape at test scale: a filtered dim whose
  * naive estimate exceeds the static threshold but whose true size is
  * tiny, joined to a larger fact.
  */
class StatsBroadcastSuite extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private lazy val layoutDir: String = {
    val dir = tmpDir("graft_sbh_")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    LayoutWriter.write(li, dir,
      LayoutSpec("linear", Seq("l_orderkey"), numFiles = Some(8)))
    dir
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("manifest zone stats promote a provably-small filtered dim to broadcast " +
      "below the static threshold (static plan, no AQE)") {
    // static threshold 1 KB: Spark's naive sizing broadcasts NOTHING;
    // the zone estimate of the orderkey-range filter is what must act
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "1024",
      "spark.graft.broadcastBudget" -> (10L * 1024 * 1024).toString,
      "spark.sql.adaptive.enabled" -> "false") {
      val fact = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey").as("f_orderkey"), col("l_quantity"))
      val dim = SfcTable.open(spark, layoutDir)
        .filter(col("l_orderkey") <= 50)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val j = fact.join(dim, col("f_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"zone-provably-small dim must broadcast:\n$plan")
      // and the result is the same rows as the shuffle plan would give
      assert(j.count() ==
        fact.join(
          spark.read.parquet(layoutDir).filter(col("l_orderkey") <= 50)
            .select(col("l_orderkey"), col("l_extendedprice")),
          col("f_orderkey") === col("l_orderkey")).count())
    }
  }

  test("no zone-translatable filter -> no promotion (Spark's sizing stands)") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "1024",
      "spark.graft.broadcastBudget" -> (10L * 1024 * 1024).toString,
      "spark.sql.adaptive.enabled" -> "false") {
      val fact = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey").as("f_orderkey"), col("l_quantity"))
      // modulo is not a zone predicate: the estimate stays at full size,
      // which exceeds the 1 KB static threshold -> shuffle join
      val dim = SfcTable.open(spark, layoutDir)
        .filter(col("l_orderkey") % 97 === 0)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val plan = fact.join(dim, col("f_orderkey") === col("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"unprovable filter must not promote:\n$plan")
    }
  }

  test("zone estimate above the budget -> no promotion") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "1024",
      "spark.graft.broadcastBudget" -> "2048", // 2 KB: nothing fits
      "spark.sql.adaptive.enabled" -> "false") {
      val fact = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey").as("f_orderkey"), col("l_quantity"))
      val dim = SfcTable.open(spark, layoutDir)
        .filter(col("l_orderkey") <= 50)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val plan = fact.join(dim, col("f_orderkey") === col("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"over-budget estimate must not promote:\n$plan")
    }
  }

  test("sf32-shaped regime: AQE promotes a filtered plain-parquet dim at the " +
      "measured size, static threshold unchanged") {
    // the q57 shape: dim's NAIVE estimate (full file bytes) exceeds the
    // static threshold, its TRUE filtered size fits the budget. Static
    // plan must be a shuffle join; the final adaptive plan must have
    // converted it to broadcast WITHOUT touching the static threshold.
    val partBytes = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$sf/part.parquet"))
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> (partBytes / 2).toString,
      "spark.graft.broadcastBudget" -> (10L * 1024 * 1024).toString,
      "spark.sql.adaptive.autoBroadcastJoinThreshold" ->
        (10L * 1024 * 1024).toString,
      "spark.sql.adaptive.enabled" -> "true") {
      val fact = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_partkey"), col("l_quantity"))
      val dim = spark.read.parquet(s"$sf/part.parquet")
        .filter(col("p_name").contains("green"))
        .select(col("p_partkey"), col("p_brand"))
      val j = fact.join(dim, col("l_partkey") === col("p_partkey"))
      val initial = j.queryExecution.executedPlan.toString
      assert(!initial.contains("BroadcastHashJoinExec"),
        s"naive estimate must not broadcast statically:\n$initial")
      val after = finalPlan(j)
      assert(after.contains("BroadcastHashJoin"),
        s"AQE must promote at the measured size:\n$after")
    }
  }

  test("FactBroadcastGuard still pins oversized sides: AQE cannot promote " +
      "past the budget") {
    val partBytes = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$sf/part.parquet"))
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> (partBytes / 2).toString,
      // budget BELOW the dim bytes: the guard stamps NO_BROADCAST_HASH,
      // so even a huge adaptive threshold must not broadcast
      "spark.graft.broadcastBudget" -> (partBytes / 2).toString,
      "spark.sql.adaptive.autoBroadcastJoinThreshold" ->
        (100L * 1024 * 1024).toString,
      "spark.sql.adaptive.enabled" -> "true") {
      val fact = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_partkey"), col("l_quantity"))
      val dim = spark.read.parquet(s"$sf/part.parquet")
        .filter(col("p_name").contains("green"))
        .select(col("p_partkey"), col("p_brand"))
      val after = finalPlan(fact.join(dim, col("l_partkey") === col("p_partkey")))
      assert(!after.contains("BroadcastHashJoin"),
        s"guard-stamped side must never broadcast:\n$after")
    }
  }

  test("memoized estimate: two joins over the same relation+filters walk the " +
      "manifest ONCE per apply") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "1024",
      "spark.graft.broadcastBudget" -> (10L * 1024 * 1024).toString) {
      val fact = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey").as("f_orderkey"), col("l_quantity"))
      // the SAME DataFrame referenced twice: a 3-way self-join shape, the
      // J-joins-over-one-zone-mapped-relation pattern of r15's finding
      val dim = SfcTable.open(spark, layoutDir)
        .filter(col("l_orderkey") <= 50)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val dim2 = dim.select(col("l_orderkey").as("o2"),
        col("l_extendedprice").as("e2"))
      val j = fact.join(dim, col("f_orderkey") === col("l_orderkey"))
        .join(dim2, col("f_orderkey") === col("o2"))
      // count during the REAL optimizer run (the rule sits post-folding,
      // pre-CBO; applying it to the analyzed plan would see an unfolded
      // cast literal and translate nothing)
      StatsBroadcastHint.manifestPasses.set(0L)
      j.queryExecution.optimizedPlan
      assert(StatsBroadcastHint.manifestPasses.get == 1L,
        s"expected 1 manifest pass for 2 identical sides, got " +
          s"${StatsBroadcastHint.manifestPasses.get}")
    }
  }

  test("file-count cap: above spark.graft.statsHintMaxFiles the walk is " +
      "skipped and Spark's sizing stands") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "1024",
      "spark.graft.broadcastBudget" -> (10L * 1024 * 1024).toString,
      StatsBroadcastHint.FileCapKey -> "4", // layoutDir has 8 files
      "spark.sql.adaptive.enabled" -> "false") {
      val fact = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey").as("f_orderkey"), col("l_quantity"))
      val dim = SfcTable.open(spark, layoutDir)
        .filter(col("l_orderkey") <= 50)
        .select(col("l_orderkey"), col("l_extendedprice"))
      StatsBroadcastHint.manifestPasses.set(0L)
      val plan = fact.join(dim, col("f_orderkey") === col("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"capped estimate must not promote:\n$plan")
      assert(StatsBroadcastHint.manifestPasses.get == 0L,
        "above the cap the per-file walk must not run")
    }
  }

  test("200k-file manifest: the default cap short-circuits planning") {
    // inflate a real layout table's manifest to production file counts;
    // the default statsHintMaxFiles (100k) must skip the per-file walk
    val dir = tmpDir("graft_sbh_big")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    LayoutWriter.write(li, dir,
      LayoutSpec("linear", Seq("l_orderkey"), numFiles = Some(4)))
    val m = graft.layout.ZoneMap.read(dir)
    val fake = (1 to 200000).map(i => m.files.head.copy(
      path = s"file:///graft/fake/sbh-part-$i.parquet"))
    graft.layout.ZoneMap.write(dir, m.copy(files = m.files ++ fake))
    val fact = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("f_orderkey"), col("l_quantity"))
    val dim = SfcTable.open(spark, dir)
      .filter(col("l_orderkey") <= 50)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val j = fact.join(dim, col("f_orderkey") === col("l_orderkey"))
    StatsBroadcastHint.manifestPasses.set(0L)
    val t0 = System.nanoTime()
    j.queryExecution.optimizedPlan
    val ms = (System.nanoTime() - t0) / 1e6
    assert(StatsBroadcastHint.manifestPasses.get == 0L,
      "200k files exceed the default cap: the walk must not run")
    assert(ms < 5000, s"capped planning took ${ms} ms")
  }

  test("guard is manifest-row-aware: a well-compressed table whose BYTES " +
      "sit under the budget but whose ROWS are hash-build-huge is demoted " +
      "(RQ6 sf10 q22: sorted orders broadcast 15M keys, 3.6x regression)") {
    // tiny real table, manifest rows inflated to fact scale: byte-based
    // costing sees a broadcastable relation, row-based costing must not
    val dir = tmpDir("graft_sbh_rows")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    LayoutWriter.write(li, dir,
      LayoutSpec("linear", Seq("l_orderkey"), numFiles = Some(4)))
    val m = graft.layout.ZoneMap.read(dir)
    graft.layout.ZoneMap.write(dir,
      m.copy(files = m.files.map(f => f.copy(rows = f.rows * 100000L))))
    withConfs(
      // static threshold far ABOVE the table's real bytes: naive byte
      // sizing would broadcast both sides of the self-join
      "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString,
      "spark.graft.broadcastBudget" -> (64L * 1024 * 1024).toString,
      "spark.sql.adaptive.enabled" -> "false") {
      val a = SfcTable.open(spark, dir)
        .select(col("l_orderkey").as("a_key"), col("l_quantity"))
      val b = SfcTable.open(spark, dir)
        .select(col("l_orderkey").as("b_key"), col("l_extendedprice"))
      val j = a.join(b, col("a_key") === col("b_key"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"row-huge manifest sides must not broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected shuffle join:\n$plan")
    }
  }
}
