package graft.layout

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-18: byte-balanced curve file cuts. Row-count cuts on
  * curve-sorted data compress unevenly (RQ6 sf10 hilbert lineitem:
  * 2.4–7 MB from equal-row cuts), straggling full-scan task waves —
  * LayoutWriter now splits oversized files at snapped curve cuts and
  * merges runs of adjacent undersized files after the write.
  */
class ByteBalanceSuite extends SparkTestBase {

  import LayoutWriter.{BalanceGroup, LayoutSpec}

  // ---- pure planner -------------------------------------------------

  test("balancePlan: balanced input rewrites nothing") {
    val files = (0 until 10).map(i => (s"f$i", 100L))
    assert(LayoutWriter.balancePlan(files, 100L).isEmpty)
  }

  test("balancePlan: oversized file splits into ~bytes/target pieces") {
    val files = Seq(("a", 100L), ("big", 320L), ("b", 100L))
    val plan = LayoutWriter.balancePlan(files, 100L)
    assert(plan == Seq(BalanceGroup(Seq("big"), 320L, 3)))
    // just over the band still splits in two (never a 1-piece "split")
    val plan2 = LayoutWriter.balancePlan(Seq(("big", 140L)), 100L)
    assert(plan2 == Seq(BalanceGroup(Seq("big"), 140L, 2)))
  }

  test("balancePlan: runs of adjacent undersized files merge in curve order") {
    val files = Seq(("a", 30L), ("b", 30L), ("c", 35L), ("d", 100L), ("e", 30L))
    val plan = LayoutWriter.balancePlan(files, 100L)
    // a+b+c reach 0.9*target and merge to ONE piece; d in band; e is a
    // trailing single — left alone
    assert(plan == Seq(BalanceGroup(Seq("a", "b", "c"), 95L, 1)))
  }

  test("balancePlan: a run that grew past the band re-splits; in-band file breaks runs") {
    // two 0.69t files flush at 1.38t -> TWO pieces (1.38t > the 1.2t
    // piece ceiling; one merged 1.38t file is the max/median overshoot
    // the sf10 spread measured)
    val plan = LayoutWriter.balancePlan(
      Seq(("a", 69L), ("b", 69L), ("c", 69L), ("d", 69L)), 100L)
    assert(plan.head.paths == Seq("a", "b") && plan.head.pieces == 2)
    // an in-band file between two smalls breaks adjacency: singles stay
    val plan2 = LayoutWriter.balancePlan(
      Seq(("a", 30L), ("mid", 100L), ("b", 30L)), 100L)
    assert(plan2.isEmpty)
    // trailing run of >=2 smalls merges even under the flush threshold
    val plan3 = LayoutWriter.balancePlan(
      Seq(("mid", 100L), ("a", 20L), ("b", 20L)), 100L)
    assert(plan3 == Seq(BalanceGroup(Seq("a", "b"), 40L, 1)))
  }

  test("snapCutsIn: cuts stay inside the group range and prefer aligned boundaries") {
    val totalBits = 20
    // single cut mid-file: must land strictly inside (lo, hi] — the
    // global snapCuts' mirrored window could escape the range and
    // collapse the split (the bug this variant exists to fix)
    val one = LayoutWriter.snapCutsIn(Array(700000L), totalBits, 650000L, 750000L)
    assert(one.length == 1 && one(0) > 650000L && one(0) <= 750000L)
    // the chosen boundary is the coarsest power-of-two in the window
    val c = one(0)
    val align = java.lang.Long.numberOfTrailingZeros(c)
    // window is ±25000 around 700000 → 2^15=32768-aligned 688128 fits...
    // assert at least 2^12 alignment (any finer means it missed a
    // coarser admissible boundary)
    assert(align >= 12, s"cut $c only 2^$align-aligned")
    // multiple cuts: ordered, distinct, in range
    val many = LayoutWriter.snapCutsIn(
      Array(100000L, 200000L, 300000L), totalBits, 50000L, 350000L)
    assert(many.toSeq == many.sorted.distinct.toSeq)
    assert(many.forall(x => x > 50000L && x <= 350000L))
    // degenerate range yields no cuts rather than nonsense
    assert(LayoutWriter.snapCutsIn(Array(10L), totalBits, 10L, 10L).isEmpty)
  }

  // ---- end-to-end ----------------------------------------------------

  /** Corpus whose compressibility varies along the sort key: low-key
    * rows carry a constant payload (RLE-friendly), high-key rows a
    * unique hex payload — equal-row cuts give byte-skewed files.
    */
  private def skewed(n: Int) = {
    val spark2 = spark
    import spark2.implicits._
    (0 until n).map { i =>
      val pay =
        if (i < n / 2) "A" * 96
        else f"${i * 2654435761L}%016x" * 6
      (i.toLong, i, (i % 97).toDouble, pay)
    }.toDF("id", "x", "y", "payload")
  }

  private def sizes(m: TableManifest): Seq[Long] = m.files.flatMap(_.bytes)

  private def spread(s: Seq[Long]): Double = {
    val sorted = s.sorted
    sorted.max.toDouble / sorted(sorted.length / 2)
  }

  test("curve write byte-balances skew-compressible data (spread <= 1.5)") {
    val df = skewed(60000)
    val raw = LayoutWriter.write(df, tmpDir("bb_raw"),
      LayoutSpec("zorder", Seq("x", "y"), numFiles = Some(12),
        byteBalance = false))
    val bal = LayoutWriter.write(df, tmpDir("bb_bal"),
      LayoutSpec("zorder", Seq("x", "y"), numFiles = Some(12)))
    val rawSpread = spread(sizes(raw))
    val balSpread = spread(sizes(bal))
    info(f"spread raw $rawSpread%.2f -> balanced $balSpread%.2f " +
      s"(files ${raw.files.length} -> ${bal.files.length})")
    info(s"raw sizes: ${sizes(raw).sorted.mkString(",")}")
    info(s"bal sizes: ${sizes(bal).sorted.mkString(",")}")
    assert(rawSpread > 1.5, s"fixture not skewed enough: $rawSpread")
    assert(balSpread <= 1.5, s"still skewed after balance: $balSpread")
    assert(bal.totalRows == 60000L)
  }

  test("balanced files keep curve order: 1-D key ranges stay disjoint and prunable") {
    val df = skewed(60000)
    val dir = tmpDir("bb_order")
    val m = LayoutWriter.write(df, dir,
      LayoutSpec("zorder", Seq("x"), numFiles = Some(12)))
    // content preserved exactly
    val back = spark.read.parquet(dir)
    assert(back.count() == 60000L)
    assert(back.agg(sum("id")).collect()(0).getLong(0) ==
      (0L until 60000L).sum)
    // with a single sort column the curve order is the column order:
    // zone ranges of distinct files must not properly overlap
    val ranges = m.files
      .map(f => f.ranges("x"))
      .map(r => (r.min.get, r.max.get)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(lo2 >= hi1, s"file ranges overlap: hi=$hi1 lo=$lo2")
      case _ =>
    }
    // zone pruning still skips most files for a narrow range
    val kept = m.prune(Seq(NumBetween("x", 100, 200))).length
    assert(kept <= math.max(2, m.files.length / 3),
      s"pruning degraded: $kept of ${m.files.length}")
  }

  test("hive-partitioned curve write balances within each partition dir") {
    val spark2 = spark
    import spark2.implicits._
    val df = skewed(60000).withColumn("p", (col("id") % 2).cast("int"))
    val dir = tmpDir("bb_hive")
    val m = LayoutWriter.write(df, dir,
      LayoutSpec("zorder", Seq("x", "y"), numFiles = Some(8),
        partitionBy = Seq("p")))
    assert(m.totalRows == 60000L)
    val back = spark.read.parquet(dir)
    assert(back.count() == 60000L && back.columns.contains("p"))
    // per-dir spread within band
    for (p <- Seq(0, 1)) {
      val inDir = m.files.filter(_.path.contains(s"p=$p")).flatMap(_.bytes)
      assert(inDir.nonEmpty)
      val s = spread(inDir)
      assert(s <= 1.6, f"p=$p spread $s%.2f")
    }
  }
}
