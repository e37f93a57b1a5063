package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.VectorExpressions.vecDot

/** Random-hyperplane LSH over an embedding column, the candidate
  * generator behind approximate top-pairs (q33b), embedding near-dup
  * removal (q33c) and bucket profiling (q34).
  *
  * Parameterization IS the scale story: `numPlanes` planes give a
  * 2^numPlanes signature space and `numBands` bands of
  * numPlanes/numBands bits each, so a corpus of N vectors lands
  * ~N / 2^(numPlanes/numBands) vectors per band bucket and the pair
  * join emits sum(bucket^2) candidates. Fixed width means bucket
  * population — and the join — grows linearly with N (measured 10x
  * corpus: 1.1 s -> ~12 s); production keeps buckets bounded by
  * deriving the width from the corpus size ([[defaultNumPlanes]]:
  * planes grow with log2(N), which sharpens recall at the same time).
  * The gate pins 16 planes / 4 bands so the DuckDB oracle (which
  * applies the identical construction) and the measured recall stay
  * fixed — 16 is what [[defaultNumPlanes]] derives for the sf0.01
  * correctness-gate corpus (500 rows; at sf0.1's 2000 it derives 24).
  *
  * Two guards make the band join safe at 100 TB:
  *   1. the width rule above keeps the EXPECTED bucket near
  *      `targetBucket` regardless of N;
  *   2. `maxBucket` drops band buckets whose population exceeds the
  *      cap — a degenerate signature region (e.g. near-zero vectors
  *      all landing on the same side of every plane) would otherwise
  *      produce an unbounded quadratic bucket. Same design as the
  *      n-gram dedup's stop-shingle MaxDf cap: an over-populated
  *      bucket is an UNINFORMATIVE band (it says "these vectors are
  *      not distinguished by these bits", not "these are near-dups"),
  *      so dropping it is defined operator semantics, mirrored in the
  *      DuckDB oracle — verification stays exact, and candidate output
  *      is bounded by numBands * 2^bits * maxBucket^2 / 2.
  *
  * Planes are data-derived (the first `numPlanes` vectors by id):
  * deterministic, broadcast as literals, no driver state.
  */
object EmbeddingLsh {

  /** Production width rule: the smallest per-band bit width that keeps
    * the expected band-bucket population at or below `targetBucket`
    * for an N-row corpus — bits = ceil(log2(N / targetBucket)),
    * planes = numBands * bits. Capped at 15 bits/band so a 4-band
    * signature stays within a 64-bit long, which saturates around
    * N ~ targetBucket * 2^15 ≈ 1e6 rows; past that the width rule
    * alone can't bound expected population and the `maxBucket` guard
    * in [[candidatePairs]] carries the invariant (the two are a pair
    * by design — a wider scheme would hash each band's bits into an
    * unpacked band key instead of packing one long). Row count comes
    * for free from the zone-map manifest or a count scan.
    */
  def defaultNumPlanes(rows: Long, numBands: Int = 4, targetBucket: Long = 32): Int = {
    val ratio = math.max(2.0, rows.toDouble / targetBucket)
    val bits = math.ceil(math.log(ratio) / math.log(2.0)).toInt
    numBands * math.min(15, math.max(1, bits))
  }

  /** Sign-bit signature column: bit j = [dot(embedding, plane_j) > 0]. */
  def signature(e: DataFrame, numPlanes: Int): Column = {
    val planes: Array[Seq[Float]] = e.filter(col("vec_id") < numPlanes)
      .orderBy(col("vec_id"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").toSeq)
    (0 until numPlanes).map { j =>
      val p = typedlit(planes(j)).cast("array<float>")
      when(vecDot(col("embedding"), p) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  private def signatureFrame(e: DataFrame, numPlanes: Int): DataFrame =
    e.select(col("vec_id"), col("embedding"))
      .withColumn("n", sqrt(vecDot(col("embedding"), col("embedding"))))
      .withColumn("signature", signature(e, numPlanes))

  /** (vec_id, embedding, n = l2-norm, signature), runner-materialized:
    * the signature costs numPlanes broadcast dots per vector and feeds
    * both sides of the band join.
    */
  def signatures(e: DataFrame, numPlanes: Int): DataFrame =
    graft.runner.Materialize.track(signatureFrame(e, numPlanes))

  /** Candidate pairs sharing at least one band, exact cosine attached.
    * The explicit-width repartition on the band key spreads the
    * CPU-bound bucket join even when the tiny cached signature frame
    * coalesces to one partition. Band buckets holding more than
    * `maxBucket` vectors are dropped before the self-join (hot-bucket
    * guard — see the object doc). The census runs over the cached
    * signature frame alone (band keys re-derived from the packed long —
    * no embedding payload, no shuffle) and the hot set is collected
    * eagerly: when it is empty — the common, healthy-corpus case — the
    * guard costs one narrow aggregate and the plan is IDENTICAL to the
    * unguarded one; when buckets are hot, rows are dropped by a codegen
    * isInCollection filter BEFORE the band repartition, so dropped rows
    * never shuffle. Either way the kept-row semantics match the
    * census-then-anti-join formulation the DuckDB oracle mirrors.
    */
  def candidatePairs(e: DataFrame, numPlanes: Int, numBands: Int,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(numPlanes % numBands == 0, "bands must split the planes evenly")
    val bits = numPlanes / numBands
    val mask = (1L << bits) - 1
    // With the guard on, the census aggregate (a full scan of the
    // signature frame) doubles as the eager materializing action —
    // trackLazy skips track's count(), saving one job per query.
    val sigs =
      if (maxBucket == Int.MaxValue) signatures(e, numPlanes)
      else graft.runner.Materialize.trackLazy(signatureFrame(e, numPlanes))
    // packed (band, bv) key: band * 2^bits + bv — one long per band row
    def bandKeys(sig: Column): Column = array((0 until numBands).map(j =>
      lit(j.toLong * (mask + 1)) +
        shiftright(sig, bits * j).bitwiseAND(lit(mask))): _*)
    val raw = sigs.select(col("vec_id"), col("embedding"), col("n"),
      explode(array((0 until numBands).map(j =>
        struct(lit(j).as("band"),
          shiftright(col("signature"), bits * j).bitwiseAND(lit(mask)).as("bv"))): _*)).as("b"))
    val kept =
      if (maxBucket == Int.MaxValue) raw
      else {
        val hotKeys = sigs
          .select(explode(bandKeys(col("signature"))).as("bk"))
          .groupBy(col("bk")).agg(count(lit(1)).as("bn"))
          .filter(col("bn") > maxBucket)
          .collect().map(_.getLong(0))
        if (hotKeys.isEmpty) raw
        else raw.filter(!(col("b.band").cast("long") * lit(mask + 1) + col("b.bv"))
          .isInCollection(hotKeys))
      }
    val bandRows = kept
      .repartition(e.sparkSession.sparkContext.defaultParallelism, col("b"))
    val a = bandRows.select(col("b").as("ba"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("n").as("na"))
    val b2 = bandRows.select(col("b").as("bb"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("n").as("nb"))
    a.join(b2, col("ba") === col("bb") && col("va") < col("vb"))
      .select(col("va"), col("vb"),
        round(vecDot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("sim"))
  }

  /** [[candidatePairs]] with the width derived from the corpus row count
    * via [[defaultNumPlanes]] — the scale-safe default: a caller states
    * how big the corpus is and gets the band width that keeps expected
    * bucket population at `targetBucket`, with the `maxBucket` hard cap
    * as the second line of defense. Gate queries keep pinning an explicit
    * width so the DuckDB oracle construction stays fixed.
    */
  def candidatePairsAuto(e: DataFrame, rows: Long, numBands: Int = 4,
      targetBucket: Long = 32, maxBucket: Int = 256): DataFrame =
    candidatePairs(e, defaultNumPlanes(rows, numBands, targetBucket),
      numBands, maxBucket)

  /** Manifest-backed auto width for a graft-managed table: the row count
    * comes for free from the zone-map manifest
    * ([[graft.layout.TableManifest.totalRows]]) — no count scan over the
    * corpus before the width is known, which is the 100 TB story: the
    * manifest is a few KB regardless of table size.
    */
  def candidatePairsAuto(spark: SparkSession, tableDir: String): DataFrame = {
    val m = graft.layout.ZoneMap.read(tableDir)
    val e = spark.read.option("basePath", tableDir).parquet(m.files.map(_.path): _*)
    candidatePairsAuto(e, m.totalRows)
  }
}
