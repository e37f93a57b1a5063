package graft.cli

import graft.SparkTestBase
import graft.layout.PrunedScan
import graft.tools.AmazonGen

/** The Amazon RQ1 matrix pieces (results/rq1_amazon is the full-scale
  * artifact): deterministic query-instance generation, the keyed +
  * partitioned layout write, and StrIn zone pruning on the lead string
  * sort column — pinned at test scale so the scenario main can't rot.
  */
class AmazonScenarioSuite extends SparkTestBase {

  test("query instances are deterministic and parameter-complete") {
    val a = AmazonScenario.queries(spark, nUsers = 2000, nAsins = 500, nInst = 2)
    val b = AmazonScenario.queries(spark, nUsers = 2000, nAsins = 500, nInst = 2)
    assert(a.map(q => (q.name, q.where)) == b.map(q => (q.name, q.where)))
    assert(a.map(_.name).distinct.length == a.length, "names must be unique")
    // every family present: ts bands, both id points, the 2-col shapes
    val fams = a.map(_.name.split("_[0-9]+$").head).toSet
    Seq("ts_S1", "ts_S4", "asin_f1", "asin_f16", "user_id_f1",
      "cat_ts_S3", "ts_rating_S3").foreach(f =>
      assert(fams.exists(_.startsWith(f)), s"missing family $f in $fams"))
    assert(a.forall(q => q.preds.nonEmpty && !q.where.contains(":")))
  }

  test("layout write + lead-column StrIn pruning, pruned result exact") {
    val df = AmazonGen.reviews(spark, 100000, nUsers = 2000, nAsins = 500)
    val dir = tmpDir("amz_scn")
    AmazonScenario.writeLayout(df, dir, "linear",
      Seq("asin", "parent_asin"), numFiles = 4)
    val q = AmazonScenario.queries(spark, 2000, 500, 2)
      .find(_.name.startsWith("asin_f1_")).get
    val scan = PrunedScan.read(spark, dir, q.preds)
    assert(scan.filesKept < scan.filesTotal,
      s"lead-column point must prune: ${scan.filesKept}/${scan.filesTotal}")
    scan.df.createOrReplaceTempView("amz_pruned_t")
    df.createOrReplaceTempView("amz_full_t")
    val pruned = spark.sql(
      s"SELECT count(*) AS c FROM amz_pruned_t WHERE ${q.where}")
      .collect()(0).getLong(0)
    val full = spark.sql(
      s"SELECT count(*) AS c FROM amz_full_t WHERE ${q.where}")
      .collect()(0).getLong(0)
    assert(pruned == full && full > 0,
      s"pruned scan must lose no rows: $pruned vs $full")
  }

  test("deep-pool probe asins exist in the deep-prefix table") {
    // regression (r17 review): the DEEP diagnostic's f1 probes sampled
    // with the parent_asin salt (22) instead of the deep pool's asin
    // salt (20), so every probe matched ZERO rows — and nonexistent-key
    // lookups prune unrealistically well, inflating the prefix-strip
    // recovery story. Pin that ALL deep probes (f4 and f1 families use
    // the same salt-20 sampler the generator codes with) hit real keys.
    val nAsins = 500L
    val deep = AmazonGen.reviews(spark, 50000, nUsers = 2000,
      nAsins = nAsins, deepPrefixAsin = true)
    deep.createOrReplaceTempView("amz_deep_t")
    val probes =
      (0 until 2).flatMap(i => AmazonGen.sampleCodes(
        spark, nAsins, 4, 20, "B0000000", 4, seed = 8100 + i)) ++
      (0 until 2).flatMap(i => AmazonGen.sampleCodes(
        spark, nAsins, 1, 20, "B0000000", 4, seed = 8200 + i))
    probes.foreach { v =>
      val n = spark.sql(
        s"SELECT count(*) AS c FROM amz_deep_t WHERE asin = '$v'")
        .collect()(0).getLong(0)
      assert(n > 0, s"deep probe asin '$v' matches no rows — salt drift " +
        "between AmazonGen.reviews(deepPrefixAsin) and the probe sampler")
    }
  }
}
