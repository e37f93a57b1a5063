package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handles sort-merge
  * skew automatically (enabled in our session profile), but when one
  * side is small enough to replicate and the hot keys are extreme,
  * salting bounds the largest partition deterministically:
  *
  *  - fact rows get `salt = pmod(hash(rand-ish cols), k)`;
  *  - the small side is replicated k times (explode of 0..k-1);
  *  - the join key becomes (key, salt) — hot keys spread over k tasks.
  *
  * Result equality with the plain join is exact (every fact row still
  * meets every matching dim row exactly once).
  */
object SkewJoin {

  /** Inner equi-join of `fact` (large, possibly skewed on `key`) with
    * `dim` (replicable), salted k ways.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      k: Int,
      factCols: Option[Seq[String]] = None): DataFrame = {
    require(k >= 1, "salt factor must be >= 1")
    // deterministic per-row salt: hash of the whole fact row modulo k
    // (monotonically_increasing_id would break on retries; a column hash
    // is stable under recomputation)
    val cols = factCols.getOrElse(fact.columns.toSeq)
    val salt = pmod(hash(cols.map(col): _*), lit(k))
    val saltedFact = fact.withColumn("__salt", salt)
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(k - 1))))
    saltedFact
      .join(saltedDim,
        saltedFact(key) === saltedDim(key) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop(saltedDim(key))
      .drop("__salt")
  }
}
