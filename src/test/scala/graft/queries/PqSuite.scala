package graft.queries

import graft.SparkTestBase
import graft.text.VectorExpressions.vecSubL2
import org.apache.spark.sql.functions._
import scala.util.Random

/** Product quantization (q97): the FloatVecSubL2 subspace kernel vs a
  * plain-Scala reference, and the full ADC search vs an independent
  * driver-side PQ implementation on the real sf0.001 embeddings — the
  * end-to-end exactness the DuckDB gate also checks, plus the recall
  * readout vs exact KNN.
  */
class PqSuite extends SparkTestBase {

  private def refSubL2(a: Array[Float], b: Array[Float], off: Int, len: Int): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(math.min(a.length, b.length) - off, len)
    while (i < n) {
      val d = a(off + i).toDouble - b(off + i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  test("vecSubL2 matches the reference on slices, short arrays, nulls") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(7)
    val rows = (0 until 50).map { i =>
      val la = if (i % 7 == 3) 5 else 64 // some arrays shorter than the slice
      (i, Array.fill(la)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("i", "a", "b")
    for ((off, len) <- Seq((0, 8), (8, 8), (56, 8), (0, 64), (60, 8))) {
      val got = df.select(col("i"), vecSubL2(col("a"), col("b"), off, len).as("d"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      rows.foreach { case (i, a, b) =>
        assert(got(i) == refSubL2(a, b, off, len), s"i=$i off=$off len=$len")
      }
    }
    // null inputs yield null
    val n = Seq((1, null: Array[Float], Array.fill(64)(0f))).toDF("i", "a", "b")
      .select(vecSubL2(col("a"), col("b"), 0, 8)).collect()(0)
    assert(n.isNullAt(0))
  }

  test("q97 ADC search equals an independent driver-side PQ on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val m = 8; val subDim = 8
    val cents = (0L until 16L).map(rows)
    // encode: argmin codebook entry per (corpus vector, subspace)
    val corpus = rows.keys.filter(_ >= 16).toSeq.sorted
    def code(v: Array[Float], j: Int): Int =
      cents.indices.minBy(c =>
        (refSubL2(v, cents(c), j * subDim, subDim), c))
    // ADC per (query, corpus vector): DECIMAL(27,12) sum then round(6),
    // the exact arithmetic the query and the DuckDB oracle use
    def adc(q: Array[Float], v: Array[Float]): Double = {
      val s = (0 until m).map { j =>
        BigDecimal(refSubL2(q, cents(code(v, j)), j * subDim, subDim))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      s.toDouble // exact decimal sum, then one double conversion
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (0L until 10L).flatMap { qid =>
      val q = rows(qid)
      corpus.map(vid => (qid, vid, round6(adc(q, rows(vid)))))
        .sortBy { case (_, vid, dist) => (dist, vid) }
        .take(5).zipWithIndex
        .map { case ((_, vid, dist), r) => (qid, r + 1, vid, dist) }
    }
    val got = SimilarityQueries.queries("q97_pq_adc_search")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got.map(t => (t._1, t._2, t._3)) ==
      expected.map(t => (t._1, t._2, t._3)).toList,
      "ADC top-5 (qid, rank, vid) mismatch vs driver-side PQ")
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-6, s"adc mismatch at $g vs $e")
    }
    // recall readout vs exact cosine KNN (q32): PQ is approximate by
    // design — assert a sane floor, not equality
    // q32's corpus is vec_id >= 10; q97's is >= 16 (the codebook ids are
    // excluded) — compare on the shared corpus only
    val exact = SimilarityQueries.queries("q32_knn_cosine")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .filter(_._2 >= 16).toSet
    val approx = got.map(t => (t._1, t._3)).toSet
    // measured 11/50 on this corpus (near-uniform random vectors — PQ's
    // adversarial case; see the q97 scaladoc); the floor only guards
    // against a broken encode, not the data-dependent recall level
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"PQ ADC recall@5 vs exact KNN at sf0.001: $recall%.2f")
    assert(recall >= 0.1, f"recall collapsed: $recall%.2f")
  }

  test("packed-code index (Pq.encode + PqAdcScore) matches the join formulation") {
    import graft.operators.Pq
    val d = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val rows = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cents = (0L until 16L).map(rows)
    def code(v: Array[Float], j: Int): Int =
      cents.indices.minBy(c => (refSubL2(v, cents(c), j * 8, 8), c))
    // packed codes match a driver-side pack of the q97 argmin semantics
    val centsDf = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("long").as("cid"), col("embedding").as("cemb"))
    val got = Pq.encode(e.filter(col("vec_id") >= 16)
        .select(col("vec_id").as("vid"), col("embedding").as("vemb")), centsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.keys.filter(_ >= 16).foreach { vid =>
      val expected = (0 until 8).map(j => code(rows(vid), j).toLong << (4 * j)).sum
      assert(got(vid) == expected, s"packed codes differ for vid=$vid")
    }
    // PqAdcScore over the packed word == driver-side plain-double ADC
    // (ascending-j sum; q97's gate quantizes each term to DECIMAL first,
    // so compare against the raw-double reference here)
    val spark2 = spark
    import spark2.implicits._
    val q = rows(0L)
    val tab = Pq.adcTable(q, cents)
    val scored = Pq.encode(e.filter(col("vec_id") >= 16)
        .select(col("vec_id").as("vid"), col("embedding").as("vemb")), centsDf)
      .join(broadcast(Seq((0L, tab)).toDF("qid", "table")))
      .select(col("vid"), Pq.adcScore(col("codes"), col("table")).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.keys.filter(_ >= 16).foreach { vid =>
      var ref = 0.0
      (0 until 8).foreach(j => ref += tab(j * 16 + code(rows(vid), j)))
      assert(scored(vid) == ref, s"ADC differs for vid=$vid")
    }
  }

  test("map-only PqEncodeWord is bit-identical to the join-formulation encode") {
    import graft.operators.Pq
    val d = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val cents = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray).toIndexedSeq
    val centsDf = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("long").as("cid"), col("embedding").as("cemb"))
    val corpus = e.filter(col("vec_id") >= 16)
      .select(col("vec_id").as("vid"), col("embedding").as("vemb"))
    val viaJoin = Pq.encode(corpus, centsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaWord = corpus
      .select(col("vid"), Pq.encodeWord(col("vemb"), cents).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaWord == viaJoin, "map-only encoder drifted from the join formulation")
    // the map-only plan is shuffle-free: scan -> project, single stage
    val plan = corpus
      .select(col("vid"), Pq.encodeWord(col("vemb"), cents).as("codes"))
      .queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, "PqEncodeWord plan should not shuffle")
  }

  test("8-bit codes (k=256): pack, ADC lookup, coarse assign match driver refs") {
    import graft.operators.Pq
    val d = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val rows = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cents = (0L until 256L).map(rows)
    val corpus = e.filter(col("vec_id") >= 256)
      .select(col("vec_id").as("vid"), col("embedding").as("vemb"))
    def code(v: Array[Float], j: Int): Int =
      cents.indices.minBy(c => (refSubL2(v, cents(c), j * 8, 8), c))
    val got = corpus
      .select(col("vid"), Pq.encodeWord(col("vemb"), cents).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.keys.filter(_ >= 256).foreach { vid =>
      var expected = 0L
      (0 until 8).foreach(j => expected |= code(rows(vid), j).toLong << (8 * j))
      assert(got(vid) == expected, s"8-bit packed codes differ for vid=$vid")
    }
    // some vector must use a code >= 16 or the test wouldn't separate
    // the widths (the top nibble of at least one byte field nonzero)
    assert(got.values.exists(w => (0 until 8).exists(j => ((w >>> (8 * j)) & 255L) >= 16L)),
      "corpus never used a code >= 16 — widen the corpus")
    // ADC at bits=8 == driver-side table lookup over the same word
    val spark2 = spark
    import spark2.implicits._
    val q = rows(0L)
    val tab = Pq.adcTable(q, cents)
    assert(tab.length == 8 * 256)
    val scored = corpus
      .select(col("vid"), Pq.encodeWord(col("vemb"), cents).as("codes"))
      .join(broadcast(Seq((0L, tab)).toDF("qid", "table")))
      .select(col("vid"), Pq.adcScore(col("codes"), col("table"), bits = 8).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.keys.filter(_ >= 256).foreach { vid =>
      var ref = 0.0
      (0 until 8).foreach(j => ref += tab(j * 256 + code(rows(vid), j)))
      assert(scored(vid) == ref, s"8-bit ADC differs for vid=$vid")
    }
    // coarse assign (m=1, subDim=64) == full-vector L2 argmin
    val coarse = (0L until 16L).map(rows)
    val gotList = corpus
      .select(col("vid"), Pq.coarseAssign(col("vemb"), coarse).as("list"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.keys.filter(_ >= 256).foreach { vid =>
      val expected = coarse.indices
        .minBy(c => (refSubL2(rows(vid), coarse(c), 0, 64), c)).toLong
      assert(gotList(vid) == expected, s"coarse list differs for vid=$vid")
    }
  }

  test("PqResidual: residual floats + residual codes match driver refs; map-only") {
    import graft.operators.Pq
    val d = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val rows = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val coarse = (0L until 4L).map(rows)
    val cb = (4L until 20L).map(rows)
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("vid"), col("embedding").as("vemb"))
    def assignOf(v: Array[Float]): Int =
      coarse.indices.minBy(c => (refSubL2(v, coarse(c), 0, 64), c))
    def residOf(v: Array[Float]): Array[Float] = {
      val c = coarse(assignOf(v))
      Array.tabulate(64)(i => (v(i).toDouble - c(i).toDouble).toFloat)
    }
    // residual floats: exact IEEE double-subtract-then-round-to-float
    val gotResid = corpus
      .select(col("vid"), Pq.residual(col("vemb"), coarse).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.keys.filter(_ >= 20).foreach { vid =>
      assert(gotResid(vid).sameElements(residOf(rows(vid))),
        s"residual differs for vid=$vid")
    }
    // residual codes (the q99 IVFADC corpus side) == driver reference
    def codeOf(v: Array[Float], j: Int): Int = {
      val r = residOf(v)
      cb.indices.minBy(c => (refSubL2(r, cb(c), j * 8, 8), c))
    }
    val gotCodes = corpus.select(col("vid"),
        Pq.encodeWord(Pq.residual(col("vemb"), coarse), cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.keys.filter(_ >= 20).foreach { vid =>
      var expected = 0L
      (0 until 8).foreach(j => expected |= codeOf(rows(vid), j).toLong << (4 * j))
      assert(gotCodes(vid) == expected, s"residual codes differ for vid=$vid")
    }
    // residualAt (argmin precomputed as a column) is bit-identical to
    // residual (internal argmin) — the index-build fast path
    val viaAt = corpus
      .select(col("vid"), col("vemb"),
        Pq.coarseAssign(col("vemb"), coarse).cast("int").as("list"))
      .select(col("vid"),
        Pq.residualAt(col("vemb"), col("list"), coarse).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.keys.filter(_ >= 20).foreach { vid =>
      assert(viaAt(vid).sameElements(gotResid(vid)),
        s"residualAt drifted from residual for vid=$vid")
    }
    // the composed (list, residual codes) build stays shuffle-free —
    // the one-pass index-build shape q99's scaladoc claims
    val plan = corpus.select(col("vid"),
        Pq.coarseAssign(col("vemb"), coarse).cast("int").as("list"),
        Pq.encodeWord(Pq.residual(col("vemb"), coarse), cb).as("codes"))
      .queryExecution.executedPlan
    assert(plan.collect {
      case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => x
    }.isEmpty, "residual index build should not shuffle")
  }

  test("Lloyd codebook training decreases the quantization objective") {
    import graft.operators.Pq
    val d = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id").as("vid"), col("embedding").as("vemb"))
    val init = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray).toIndexedSeq
    val e0 = Pq.quantizationError(e, init)
    val t1 = Pq.trainCodebooks(e, init, iters = 1)
    val e1 = Pq.quantizationError(e, t1)
    val t3 = Pq.trainCodebooks(e, init, iters = 3)
    val e3 = Pq.quantizationError(e, t3)
    info(f"quantization error: init $e0%.4f -> 1 iter $e1%.4f -> 3 iters $e3%.4f")
    // Lloyd is monotone non-increasing on its objective — up to the
    // float rounding trainCodebooks applies when storing centroid means
    // (relative tolerance, not absolute: r17 ADVICE #2)
    assert(e1 <= e0 * (1 + 1e-6) && e3 <= e1 * (1 + 1e-6),
      s"objective rose: $e0 -> $e1 -> $e3")
    // centroid shape preserved: 16 full-width vectors
    assert(t3.length == 16 && t3.forall(_.length == 64))
    // deterministic
    val t3b = Pq.trainCodebooks(e, init, iters = 3)
    assert(t3.zip(t3b).forall { case (a, b) => a.sameElements(b) })
  }
}
