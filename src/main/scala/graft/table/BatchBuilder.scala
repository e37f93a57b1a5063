package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Update-batch builder — the reference's L10 (shuffle the source with
  * rand(seed), split into B equal batches with ntile, write each batch;
  * reference: lakehouse_op/build_tpch_update_batches.py:58-74).
  */
object BatchBuilder {

  /** Reference-parity split: `ntile(B) OVER (ORDER BY rand(seed))`.
    * The global window funnels all rows through one task — fine for the
    * reference's one-shot use, wrong at 100 TB; prefer [[splitHash]].
    */
  def splitNtile(df: DataFrame, batches: Int, seed: Long): DataFrame =
    df.withColumn("batch_id",
      ntile(batches).over(Window.orderBy(rand(seed))) - 1)

  /** Scalable split: deterministic hash of the key column mixed with the
    * seed, mod B. Fully parallel, identical batch membership on re-runs,
    * near-equal sizes (multinomial). This is the 100 TB path.
    */
  def splitHash(df: DataFrame, batches: Int, seed: Long, keyCol: String): DataFrame =
    df.withColumn("batch_id",
      pmod(hash(col(keyCol), lit(seed)), lit(batches)))

  /** Write each batch to `<outDir>/batch_<i>` (reference S8: plain
    * parquet per batch dir). Single pass via partitionBy.
    */
  def writeBatches(withBatchId: DataFrame, outDir: String): Unit =
    withBatchId.write.mode("overwrite")
      .partitionBy("batch_id").parquet(outDir)
}
