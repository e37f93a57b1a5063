package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Pq, TopKAgg}

/** ANN at scale: brute-force exact L2 vs the packed-code PQ index
  * ([[graft.operators.Pq]]) on a deterministic CLUSTERED corpus of
  * millions of 64-dim vectors, with k-means-trained codebooks and
  * PLANTED near-duplicate queries — the measured version of the q97
  * scaladoc's scale claims → results/ann_scale.json.
  *
  * Corpus: 4096 deterministic cluster centers + per-vector noise (the
  * structure real embedding corpora have; a UNIFORM random corpus was
  * measured first and is the honest negative control — distance
  * concentration makes the exact top-5 of 2M near-equidistant points
  * unresolvable from 4-byte codes, recall ~0 for ANY 32-bit quantizer.
  * PQ's contract is cluster-structured data). Queries are jittered
  * COPIES of 10 corpus vectors — the embedding near-dup probe a
  * training pipeline actually runs — so `planted@1` measures "does
  * the index surface the true source".
  *
  * What it times (each min-of-2 after a warmup):
  *  - `brute`: exact L2 of 10 queries × N vectors over the raw float
  *    corpus (top-5 via the bounded-heap [[TopKAgg]] aggregate — no
  *    window over Q×N rows);
  *  - `train`: 3 Lloyd iterations per subspace on a deterministic 10%
  *    sample ([[Pq.trainCodebooks]]);
  *  - `encode`: building the packed PQ index (one shuffle) + writing
  *    it as parquet — at 100 TB this is the one-time index build;
  *  - `adc`: 10 queries × N code words, 8 table lookups per row
  *    ([[graft.operators.PqAdcScore]]), top-5 via the same aggregate —
  *    the steady-state query path that reads CODES only;
  *  - `rerank`: ADC shortlist (50/query) joined back to raw vectors
  *    for exact L2 — O(shortlist) vector reads;
  *  - `ivfpq`: the full production index — a 16-way coarse quantizer
  *    as a HIVE PARTITION of the code table; probing nProbe=4 lists is
  *    Spark partition pruning at planning time (the zone-map
  *    file-skipping mechanism composed with the ANN index), so each
  *    query scans 4/16 of the codes.
  * Plus the storage story (parquet bytes of vectors vs codes), recall
  * vs the brute top-5, and planted-source hit rates.
  *
  * Usage: runMain graft.cli.AnnBench [nVectors] [outJson]
  */
object AnnBench {

  val Centers = 4096
  val Noise = 0.3

  /** Deterministic clustered corpus: vector i = center[h(i) % 4096] +
    * 0.3×noise, every value a pure xxhash64 function of (id, dim) —
    * reproducible at any row count, no RNG state.
    */
  def synth(spark: SparkSession, n: Long): DataFrame = {
    def u(seed: Int, key: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      pmod(xxhash64(key, d, lit(seed)), lit(2000001L)).cast("double") /
        lit(1000000.0) - lit(1.0)
    val cIdx = pmod(xxhash64(col("id"), lit(7)), lit(Centers.toLong))
    spark.range(0L, n, 1L, 64).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        (u(11, cIdx, d) + u(13, col("id"), d) * lit(Noise)).cast("float"))
        .as("embedding"))
  }

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def minOf2(body: => Unit): Double = { time(body); math.min(time(body), time(body)) }

  /** Data bytes only — _SUCCESS/.crc sidecars would inflate the tiny
    * code table proportionally more and understate the compression
    * ratio (r17 ADVICE #3).
    */
  private def dirBytes(p: String): Long = {
    val f = new java.io.File(p)
    Option(f.listFiles)
      .map(_.filter(x => x.isFile && x.getName.endsWith(".parquet"))
        .map(_.length).sum)
      .getOrElse(0L)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val out = args.lift(1).getOrElse("results/ann_scale.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("graft_ann").toString
    // everything below runs under try/finally: a mid-bench failure must
    // not leak the multi-GB work dir in /tmp (r17 ADVICE #4)
    try {
    val vecDir = s"$work/vectors"
    val codeDir = s"$work/codes"
    synth(spark, n).write.parquet(vecDir)
    // size the shuffle width from the CORPUS we just wrote (it didn't
    // exist at session-build time, so the 3-arg tuned() couldn't)
    spark.conf.set("spark.sql.shuffle.partitions",
      graft.runner.Sessions.shufflePartitionsFor(vecDir, cpus.toInt).toString)
    val corpusAll = spark.read.parquet(vecDir)
    // codebook: init from 16 corpus vectors, then 3 Lloyd iterations on
    // a deterministic 10% sample (hash-mod, not .sample — bit-stable
    // across partitionings)
    val init = corpusAll.filter(col("vec_id") < Pq.K).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray).toIndexedSeq
    val trainSample = corpusAll
      .filter(pmod(xxhash64(col("vec_id"), lit(17)), lit(10L)) === 0)
      .select(col("vec_id").as("vid"), col("embedding").as("vemb"))
    var centRows: IndexedSeq[Array[Float]] = null
    val secTrain = time {
      centRows = Pq.trainCodebooks(trainSample, init, iters = 3)
    }
    val cents = {
      val spark2 = spark; import spark2.implicits._
      centRows.zipWithIndex.map { case (v, c) => (c.toLong, v) }
        .toDF("cid", "cemb")
    }
    // queries: jittered COPIES of corpus vectors 100..109 (planted
    // near-dups; jitter ±0.02/dim, well inside the 0.3 cluster noise),
    // qid = the planted source's vec_id
    val qRows = corpusAll.filter(col("vec_id").between(100, 109))
      .select(col("vec_id"), col("embedding")).orderBy("vec_id").collect()
      .map { r =>
        val src = r.getLong(0)
        val v = r.getSeq[Float](1).toArray
        val rnd = new scala.util.Random(src)
        src -> v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.04f)
      }

    def topk(scored: DataFrame, k: Int): DataFrame = scored
      .groupBy(col("qid"))
      .agg(TopKAgg.topKByScore(col("score"), col("vid").cast("string"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("r", "e")))
      .select(col("qid"), (col("r") + 1).as("rank"),
        col("e.payload").cast("long").as("vid"), col("e.score").as("score"))

    // ---- brute force over raw vectors (exact L2, negated so the
    // bounded-heap top-k's best-first == nearest-first) ---------------
    val queriesDf = qRows.toSeq.toDF("qid", "qemb")
    def bruteDf = {
      val c = corpusAll.filter(col("vec_id") >= Pq.K)
        .select(col("vec_id").as("vid"), col("embedding").as("vemb"))
      topk(c.join(broadcast(queriesDf))
        .select(col("qid"), col("vid"),
          negate(graft.text.VectorExpressions.vecSubL2(
            col("qemb"), col("vemb"), 0, 64)).as("score")), 5)
    }
    var bruteRanked: Array[(Long, Long, Long)] = null // (qid, rank, vid)
    val secBrute = minOf2 {
      bruteRanked = bruteDf.collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    }
    val bruteRows = bruteRanked.map(t => t._1 -> t._3)

    // ---- encode: build + persist the packed-code index ---------------
    val secEncode = time {
      Pq.encode(corpusAll.filter(col("vec_id") >= Pq.K)
          .select(col("vec_id").as("vid"), col("embedding").as("vemb")), cents)
        .write.parquet(codeDir)
    }
    val codes = spark.read.parquet(codeDir)

    // ---- ADC over codes only ------------------------------------------
    // Q is small, so the scale shape is ONE pass over the codes with Q
    // bounded-heap aggregates (each query's 128-double table rides in as
    // a FOLDABLE literal inside the codegen'd PqAdcScore) — no Q×N row
    // multiplication, no explode, no shuffle beyond Q×k heap rows per
    // partition. (A large query batch would flip to the broadcast-join
    // shape instead.)
    def adcTopK(k: Int): Map[Long, Seq[Long]] = {
      val aggs = qRows.map { case (qid, q) =>
        TopKAgg.topKByScore(
          negate(Pq.adcScore(col("codes"), typedLit(Pq.adcTable(q, centRows).toSeq))),
          col("vid").cast("string"), k).as(s"q$qid")
      }
      val row = codes.agg(aggs.head, aggs.tail: _*).collect()(0)
      qRows.zipWithIndex.map { case ((qid, _), i) =>
        qid -> row.getSeq[org.apache.spark.sql.Row](i)
          .map(_.getString(0).toLong).toSeq
      }.toMap
    }
    var adcRows: Set[(Long, Long)] = null
    val secAdc = minOf2 {
      adcRows = adcTopK(5).flatMap { case (q, vs) => vs.map(q -> _) }.toSet
    }

    // ---- IVF-PQ: codes hive-partitioned by coarse list ----------------
    // The full production index: a 16-way coarse quantizer (full-vector
    // L2 argmin) becomes a HIVE PARTITION of the code table, so probing
    // nProbe=4 lists is Spark PARTITION PRUNING at planning time — the
    // same file-skipping mechanism the zone maps use, composed with the
    // ANN index. Each query scans 4/16 of the codes.
    val ivfDir = s"$work/ivfpq"
    val secIvfBuild = time {
      // the IVF table is the ALREADY-ENCODED code table (so its codes
      // are exactly the suite-pinned Pq.encode output — no second
      // encode pipeline to drift) joined with the coarse assignment.
      // struct ordering is lexicographic by FIELD POSITION: dist first,
      // cid as the tie-break — array_min == argmin by distance
      val coarse = (0 until Pq.K).map(c => struct(
        graft.text.VectorExpressions.vecSubL2(col("vemb"),
          typedLit(centRows(c).toSeq), 0, 64).as("dist"), lit(c).as("cid")))
      val lists = corpusAll.filter(col("vec_id") >= Pq.K)
        .select(col("vec_id").as("vid"), col("embedding").as("vemb"))
        .select(col("vid"),
          array_min(array(coarse: _*)).getField("cid").as("list"))
      codes.join(lists, Seq("vid"))
        .write.partitionBy("list").parquet(ivfDir)
    }
    val ivf = spark.read.parquet(ivfDir)
    def nearestLists(q: Array[Float], nProbe: Int): Seq[Int] = {
      def l2(a: Array[Float], b: Array[Float]): Double = {
        var acc = 0.0; var i = 0
        while (i < 64) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
        acc
      }
      centRows.indices.sortBy(c => (l2(q, centRows(c)), c)).take(nProbe)
    }
    var ivfRows: Map[Long, Long] = null
    val secIvfpq = minOf2 {
      ivfRows = qRows.map { case (qid, q) =>
        val tab = Pq.adcTable(q, centRows)
        val top = ivf.filter(col("list").isin(nearestLists(q, 4): _*))
          .agg(TopKAgg.topKByScore(
            negate(Pq.adcScore(col("codes"), typedLit(tab.toSeq))),
            col("vid").cast("string"), 1))
          .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        qid -> top.head.getString(0).toLong
      }.toMap
    }
    val plantedIvf = qRows.count { case (q, _) => ivfRows.get(q).contains(q) }
      .toDouble / qRows.length
    // partition-pruning proof, in-artifact: files a probe READS vs the
    // whole index (planning-time pruning on the hive `list` column;
    // counted via input_file_name over executed rows — DataFrame
    // .inputFiles reports the PRE-pruning leaf listing and would show
    // no effect)
    val ivfFilesTotal = ivf
      .select(input_file_name()).distinct().count()
    val ivfFilesProbed = ivf
      .filter(col("list").isin(nearestLists(qRows.head._2, 4): _*))
      .select(input_file_name()).distinct().count()

    // ---- ADC shortlist + exact re-rank --------------------------------
    var rerankRows: Set[(Long, Long)] = null
    val secRerank = minOf2 {
      val spark2 = spark; import spark2.implicits._
      val short = adcTopK(50).toSeq
        .flatMap { case (q, vs) => vs.map(q -> _) }.toDF("qid", "vid")
      val fetched = corpusAll.select(col("vec_id").as("vid"),
          col("embedding").as("vemb"))
        .join(broadcast(short), Seq("vid"))
      rerankRows = topk(fetched.join(broadcast(queriesDf), Seq("qid"))
          .select(col("qid"), col("vid"),
            negate(graft.text.VectorExpressions.vecSubL2(
              col("qemb"), col("vemb"), 0, 64)).as("score")), 5)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toSet
    }

    val bruteSet = bruteRows.toSet
    val recallAdc = (bruteSet & adcRows).size.toDouble / bruteSet.size
    val recallRr = (bruteSet & rerankRows).size.toDouble / bruteSet.size
    // planted-source hit: the jittered probe's TRUE nearest neighbor is
    // its source vector — does each stage's top-1 surface it?
    val bruteTop1 = bruteRanked.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    val adcTop1 = adcTopK(1).map { case (q, vs) => q -> vs.head }
    val plantedBrute = qRows.count { case (q, _) => bruteTop1.get(q).contains(q) }
      .toDouble / qRows.length
    val plantedAdc = qRows.count { case (q, _) => adcTop1.get(q).contains(q) }
      .toDouble / qRows.length
    val bv = dirBytes(vecDir); val bc = dirBytes(codeDir)
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val json = s"""{"n":$n,"dims":64,"m":${Pq.M},"k":${Pq.K},""" +
      s""""centers":$Centers,"bytes_vectors":$bv,"bytes_codes":$bc,""" +
      s""""compression":${f3(bv.toDouble / math.max(bc, 1))},""" +
      s""""sec_brute":${f3(secBrute)},"sec_train":${f3(secTrain)},""" +
      s""""sec_encode":${f3(secEncode)},""" +
      s""""sec_adc":${f3(secAdc)},"sec_rerank":${f3(secRerank)},""" +
      s""""sec_ivf_build":${f3(secIvfBuild)},"sec_ivfpq_at1":${f3(secIvfpq)},""" +
      s""""ivf_files_probed":$ivfFilesProbed,"ivf_files_total":$ivfFilesTotal,""" +
      s""""recall_adc_at5":${f3(recallAdc)},"recall_rerank50_at5":${f3(recallRr)},""" +
      s""""planted_at1_brute":${f3(plantedBrute)},"planted_at1_adc":${f3(plantedAdc)},""" +
      s""""planted_at1_ivfpq":${f3(plantedIvf)}}"""
    val op = java.nio.file.Paths.get(out)
    if (op.getParent != null) java.nio.file.Files.createDirectories(op.getParent)
    java.nio.file.Files.writeString(op, json + "\n")
    println(json)
    } finally {
      Scenario.deleteRec(new java.io.File(work))
      spark.stop()
    }
  }
}
