package graft.profile

import graft.SparkTestBase
import scala.util.Random

class ProfilerSuite extends SparkTestBase {

  test("profiler: kinds, counts, nulls, minmax, topk, histogram, corr") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(3)
    val df = (1 to 5000).map { i =>
      (i.toLong, rnd.nextDouble() * 100,
        if (i % 10 == 0) null else s"c${i % 7}",
        i % 2 == 0,
        java.sql.Date.valueOf(f"2024-${1 + i % 12}%02d-${1 + i % 28}%02d"))
    }.toDF("id", "x", "cat", "flag", "d")

    val ts = Profiler.profile(df)
    assert(ts.rows == 5000)
    val byName = ts.columns.map(c => c.name -> c).toMap

    assert(byName("id").kind == "numeric")
    assert(byName("cat").kind == "categorical")
    assert(byName("flag").kind == "boolean")
    assert(byName("d").kind == "datetime")

    assert(byName("cat").nulls == 500)
    assert(byName("id").min.contains(1.0) && byName("id").max.contains(5000.0))
    // top-k of cat: 7 distinct minus none; counts sum to non-null count
    assert(byName("cat").topk.map(_._2).sum == 4500)
    assert(byName("cat").topk.length <= Profiler.TopK)
    // histogram covers all non-null values
    val hist = byName("x").histogram.get
    assert(hist._2.sum == 5000)
    assert(hist._1.length == hist._2.length + 1)
    // quantiles are monotone
    val qs = Profiler.QuantileProbes.map(p => byName("x").quantiles(p.toString))
    assert(qs == qs.sorted)
    // id vs x correlation pair exists (numeric pairs incl. date)
    assert(ts.correlations.nonEmpty)
    assert(ts.correlations.forall { case (_, _, c) => c >= -1.0001 && c <= 1.0001 })
  }

  test("stats JSON round-trip") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 100).map(i => (i, s"v${i % 3}")).toDF("n", "s")
    val ts = Profiler.profile(df)
    val p = tmpDir("graft_stats") + "/stats.json"
    StatsIO.write(p, ts)
    val back = StatsIO.read(p)
    assert(back.rows == ts.rows)
    assert(back.columns.map(_.name) == ts.columns.map(_.name))
    assert(back.columns.map(_.cardinality) == ts.columns.map(_.cardinality))
  }

  test("stats YAML round-trip (dist_store stats.yaml shape) is exact") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 200).map(i => (i, i * 0.5, s"it's v${i % 3}")).toDF("n", "x", "s")
    val ts = Profiler.profile(df)
    val p = tmpDir("graft_stats_yaml") + "/stats.yaml"
    StatsIO.writeYaml(p, ts)
    val back = StatsIO.readYaml(p)
    assert(back == ts, "YAML stats round-trip must be lossless")
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), "UTF-8")
    assert(text.startsWith("columns:"), "reference stats.yaml shape")
    assert(text.contains("metadata:"))
  }

  test("UniDist: invCdf/cdf round-trip and monotonicity") {
    val dist = UniDist(Seq(0.0, 10.0, 20.0, 40.0), Seq(100L, 200L, 100L))
    assert(dist.invCdf(0.0) == 0.0)
    assert(dist.invCdf(1.0) == 40.0)
    assert(math.abs(dist.invCdf(0.25) - 10.0) < 1e-9) // 100/400 mass at 10
    val ps = (0 to 20).map(_ / 20.0)
    val vs = ps.map(dist.invCdf)
    assert(vs == vs.sorted, "invCdf must be monotone")
    // cdf(invCdf(p)) == p inside the support
    for (p <- Seq(0.1, 0.3, 0.5, 0.77, 0.9))
      assert(math.abs(dist.cdf(dist.invCdf(p)) - p) < 1e-9, s"p=$p")
  }

  test("UniDist.fromQuantiles synthesizes a usable distribution") {
    val d = UniDist.fromQuantiles(0.0, 100.0,
      Seq(0.25 -> 10.0, 0.5 -> 30.0, 0.75 -> 60.0))
    assert(d.invCdf(0.0) == 0.0 && d.invCdf(1.0) == 100.0)
    assert(math.abs(d.invCdf(0.5) - 30.0) < 1e-6)
    val vs = (0 to 10).map(i => d.invCdf(i / 10.0))
    assert(vs == vs.sorted)
  }
}
