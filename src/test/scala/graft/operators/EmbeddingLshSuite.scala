package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import scala.util.Random

class EmbeddingLshSuite extends SparkTestBase {

  /** Corpus with a DEGENERATE region: `nHot` near-identical vectors
    * (same signature → same bucket in every band) plus `nSpread`
    * well-spread random vectors.
    */
  private def corpus(nHot: Int, nSpread: Int) = {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(42)
    val hot = (0 until nHot).map { i =>
      // tiny jitter keeps vectors distinct but on the same side of
      // every hyperplane with overwhelming probability
      (i.toLong + 1000, Array.tabulate(64)(j => 1.0f + (rnd.nextFloat() - 0.5f) * 1e-4f))
    }
    val spread = (0 until nSpread).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f))
    }
    (spread ++ hot).toDF("vec_id", "embedding")
  }

  test("hot-bucket cap bounds candidate output; uncapped join is quadratic") {
    val e = corpus(nHot = 120, nSpread = 40)
    try {
      val uncapped = EmbeddingLsh.candidatePairs(e, 16, 4).count()
      // 120 near-identical vectors share all 4 band buckets:
      // >= 4 * C(120,2) candidate rows before dedup
      assert(uncapped >= 4L * (120L * 119 / 2), s"uncapped=$uncapped")
      val capped = EmbeddingLsh.candidatePairs(e, 16, 4, maxBucket = 50).count()
      // every bucket the hot clique shares exceeds the cap and is
      // dropped; what survives is bounded by the spread vectors'
      // collisions: sum over kept buckets of C(pop<=50, 2) per band
      assert(capped < uncapped / 10, s"capped=$capped uncapped=$uncapped")
      assert(capped <= 4L * 16 * 50 * 49 / 2, s"capped=$capped exceeds bound")
    } finally graft.runner.Materialize.releaseAll()
  }

  test("cap that does not bind leaves results identical") {
    val e = corpus(nHot = 0, nSpread = 60)
    try {
      val free = EmbeddingLsh.candidatePairs(e, 16, 4)
        .orderBy("va", "vb").collect().toSeq
      val capped = EmbeddingLsh.candidatePairs(e, 16, 4, maxBucket = 1000)
        .orderBy("va", "vb").collect().toSeq
      assert(free == capped)
    } finally graft.runner.Materialize.releaseAll()
  }

  test("defaultNumPlanes derives the gate width and scales with log2(N)") {
    // the sf0.01 correctness-gate corpus (500 rows) derives exactly the
    // pinned gate width; larger corpora widen with log2(N)
    assert(EmbeddingLsh.defaultNumPlanes(500) == 16)
    assert(EmbeddingLsh.defaultNumPlanes(2000) == 24)
    // expected bucket population N / 2^(planes/bands) stays <= target
    // until the 15-bit/band packing cap (a 64-bit signature) saturates
    // at N ~ 1e6; past that, widening stops and the maxBucket guard is
    // the remaining protection (the two guards are a pair by design)
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L)) {
      val planes = EmbeddingLsh.defaultNumPlanes(n)
      val expectedBucket = n.toDouble / math.pow(2.0, planes / 4.0)
      assert(planes <= 60, s"n=$n planes=$planes overflows a long signature")
      assert(expectedBucket <= 32.0 || planes == 60,
        s"n=$n planes=$planes bucket=$expectedBucket")
    }
    // monotone in N
    val widths = Seq(100L, 10000L, 1000000L, 100000000L)
      .map(EmbeddingLsh.defaultNumPlanes(_))
    assert(widths == widths.sorted)
  }

  test("auto width matches the rule at 2k/20k/60k rows") {
    def ruleWidth(n: Long): Int =
      4 * math.min(15, math.max(1,
        math.ceil(math.log(math.max(2.0, n / 32.0)) / math.log(2.0)).toInt))
    for (n <- Seq(2000L, 20000L, 60000L)) {
      assert(EmbeddingLsh.defaultNumPlanes(n) == ruleWidth(n),
        s"n=$n derived=${EmbeddingLsh.defaultNumPlanes(n)} rule=${ruleWidth(n)}")
    }
    assert(EmbeddingLsh.defaultNumPlanes(2000L) == 24)
    assert(EmbeddingLsh.defaultNumPlanes(20000L) == 40)
    assert(EmbeddingLsh.defaultNumPlanes(60000L) == 44)
  }

  test("candidatePairsAuto returns the same pairs as the explicit width") {
    val e = corpus(nHot = 0, nSpread = 80)
    try {
      val rows = 80L
      val planes = EmbeddingLsh.defaultNumPlanes(rows)
      val explicitPairs = EmbeddingLsh.candidatePairs(e, planes, 4, maxBucket = 256)
        .orderBy("va", "vb").collect().toSeq
      val autoPairs = EmbeddingLsh.candidatePairsAuto(e, rows)
        .orderBy("va", "vb").collect().toSeq
      assert(autoPairs == explicitPairs)
    } finally graft.runner.Materialize.releaseAll()
  }

  test("manifest-backed auto mode derives the width from totalRows, no scan") {
    import graft.layout.{LayoutWriter, ZoneMap}
    val dir = java.nio.file.Files.createTempDirectory("lsh_auto").toString
    try {
      val e = corpus(nHot = 0, nSpread = 80)
      LayoutWriter.write(e, dir,
        LayoutWriter.LayoutSpec("baseline", Nil, numFiles = Some(2)))
      assert(ZoneMap.read(dir).totalRows == 80L)
      val fromManifest = EmbeddingLsh.candidatePairsAuto(spark, dir)
        .orderBy("va", "vb").collect().toSeq
      graft.runner.Materialize.releaseAll()
      val explicitPairs = EmbeddingLsh
        .candidatePairs(e, EmbeddingLsh.defaultNumPlanes(80L), 4, maxBucket = 256)
        .orderBy("va", "vb").collect().toSeq
      assert(fromManifest == explicitPairs)
    } finally {
      graft.runner.Materialize.releaseAll()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
