package graft.layout

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The ONE string prefix code (round-17): Spark column == driver twin,
  * bit for bit, over representative pools — and the common-prefix strip
  * restores curve pruning on deep-prefix id pools end to end.
  */
class StringCodeSuite extends SparkTestBase {

  test("codeColumn == code driver twin, bit-identical, over ascii / " +
      "empty / deep-prefix / >255 code points / surrogate pairs") {
    val spark2 = spark
    import spark2.implicits._
    val g = new String(Character.toChars(0x1D11E)) // U+1D11E, 2 UTF-16 units
    val pools: Seq[(String, Seq[String], Int)] = Seq(
      ("ascii", Seq("", "a", "abc", "zzzzzzzzzz", "B07XJ8C8F5", "b0aA!~ %"), 0),
      ("deep", (1 to 40).map(i => f"B000000000$i%04d"), 10),
      ("latin1+", Seq("€uro", "naïve", "Ωmega", "ascii", "€€€€€€€€"), 0),
      ("surrogate", Seq(g + "abc", g + g, "x" + g + "y", g), 0),
      ("skip-into-surrogate", Seq(g + "abc", g + "axy", g + "b"), 1))
    for ((label, pool, skip) <- pools) {
      val sparkSide = pool.toDF("s")
        .select(StringCode.codeColumn(col("s"), skip).as("c"))
        .collect().map(_.getDouble(0)).toSeq
      val twin = pool.map(StringCode.code(_, skip))
      assert(sparkSide == twin,
        s"pool '$label' skip=$skip diverged\n spark=$sparkSide\n twin =$twin")
    }
  }

  test("offsets derives the min/max common prefix per string column only") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 50)
      .map(i => (f"B0TENANT$i%05d", s"u$i", i.toLong))
      .toDF("asin", "uid", "k")
    // min "B0TENANT00001" / max "B0TENANT00050" share "B0TENANT000"
    val offs = StringCode.offsets(df, Seq("asin", "uid", "k"))
    assert(offs == Map("asin" -> 11, "uid" -> 1)) // numeric k: no entry
    // all-null string column: skip 0, no crash
    val nulls = Seq((null: String, 1L), (null, 2L)).toDF("s", "k")
    assert(StringCode.offsets(nulls, Seq("s")) == Map("s" -> 0))
  }

  test("zorder curve pruning survives a deep common prefix end to end " +
      "(pre-strip this measured 1x files-ratio, rq1_amazon C1deep)") {
    val spark2 = spark
    import spark2.implicits._
    def pruneRatio(prefix: String): (Double, Map[String, Int]) = {
      val dir = tmpDir(s"graft_strcode_${prefix.length}")
      // two independent string dims, both under the same deep prefix
      val rnd = new scala.util.Random(7)
      val df = (1 to 4000).map { i =>
        val a = prefix + f"${rnd.nextInt(100000)}%05d"
        val u = prefix + f"${rnd.nextInt(100000)}%05d"
        (a, u, i.toLong)
      }.toDF("asin", "user_id", "k")
      val m = LayoutWriter.write(df, dir,
        LayoutWriter.LayoutSpec("zorder", Seq("asin", "user_id"),
          numFiles = Some(16)))
      // point-ish band on the LEADING dim: a curve table should keep a
      // small fraction of files
      val lo = prefix + "20000"; val hi = prefix + "29999"
      val kept = m.prune(Seq(StrBetween("asin", lo, hi))).length
      // offsets must survive the manifest JSON round-trip, not just the
      // write's in-memory return value
      assert(ZoneMap.read(dir).strOffsets == m.strOffsets,
        "strOffsets lost in manifest round-trip")
      (kept.toDouble / m.files.length, m.strOffsets.getOrElse(Map.empty))
    }
    val (rawRatio, rawOffs) = pruneRatio("")
    val (deepRatio, deepOffs) = pruneRatio("B000000000")
    assert(rawOffs.isEmpty, s"no strip expected on varying ids: $rawOffs")
    assert(deepOffs == Map("asin" -> 10, "user_id" -> 10), s"offs $deepOffs")
    // the deep pool prunes AS WELL as the raw pool (identical data
    // geometry under the strip); both must keep well under half the files
    assert(rawRatio <= 0.5, s"raw pool kept $rawRatio")
    assert(deepRatio <= rawRatio + 0.13,
      s"deep pool pruning collapsed: $deepRatio vs raw $rawRatio")
  }
}
