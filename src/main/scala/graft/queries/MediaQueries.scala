package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.media.Multimodal

/** Multimodal pipeline surface in the gate. The decode kernel is a
  * deterministic stub (no codecs in this container — see
  * graft.media.Multimodal), so there is no DuckDB oracle; the driver
  * records the weaker rows-only check. What this query proves end to
  * end: binary-column schema, mapPartitions batch decode, frame-sample
  * explode, and the aggregation over extracted features — the plumbing
  * a real codec would drop into.
  */
object MediaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_media_features" -> ((s, _) => {
      val media = Multimodal.synthetic(s, 600)
      val feats = Multimodal.decodeStub(media).toDF()
      val frames = Multimodal.sampleFrames(media, everyMs = 500)
        .groupBy().agg(count(lit(1)).as("n_frames"))
      feats
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_media"),
          round(avg(element_at(col("feature"), 1)), 6).as("avg_f0"),
          sum(when(col("decodeOk"), 1L).otherwise(0L)).as("n_ok"))
        .join(broadcast(frames))
        .orderBy(col("kind"))
    })
  )

  /** No oracle — stubbed decode has no SQL equivalent; rows-only check. */
  val oracles: Map[String, String] = Map.empty
}
