package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.media.Multimodal

/** Multimodal pipeline surface in the gate, built on REAL decoders:
  * the JDK bundles actual image (ImageIO PNG/BMP/JPEG) and audio
  * (javax.sound PCM WAV) codecs, so every gate query here decodes
  * genuine container bytes on the executors. The corpora are
  * closed-form (pixel/sample values are index arithmetic) and the
  * codecs lossless, so DuckDB verifies the decoded features
  * arithmetically — real codec in the loop, exact oracle. Only video
  * lacks a JDK codec; its stand-in ([[Multimodal.decodeStub]]) stays
  * suite-tested but out of the gate, while the video rows' metadata
  * pipeline (frame sampling) is still verified here exactly.
  */
object MediaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Mixed-media feature extraction: one corpus with image and audio
    // rows, each decoded by its real JDK codec, pooled to a per-kind
    // leading feature (mean red channel / mean amplitude), plus the
    // video frame-sample count from the metadata pipeline. Per-row
    // features are rounded to 6dp then DECIMAL-averaged so the group
    // aggregate is order-independent (parallel-sum-safe).
    "q52_media_features" -> ((s, _) => {
      val img = Multimodal.decodeImages(Multimodal.syntheticImages(s, 300)).toDF()
        .select(lit("image").as("kind"), col("decodeOk"), col("mean_r").as("f0"))
      val aud = Multimodal.decodeWavs(Multimodal.syntheticWavs(s, 300)).toDF()
        .select(lit("audio").as("kind"), col("decodeOk"), col("mean").as("f0"))
      val frames = Multimodal.sampleFrames(Multimodal.synthetic(s, 600), everyMs = 500)
        .groupBy().agg(count(lit(1)).as("n_frames"))
      img.unionByName(aud)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_media"),
          sum(when(col("decodeOk"), 1L).otherwise(0L)).as("n_ok"),
          round(sum(round(col("f0"), 6).cast("decimal(18,6)")).cast("double")
            / count(lit(1)), 6).as("avg_f0"))
        .join(broadcast(frames))
        .orderBy(col("kind"))
    }),

    // REAL decode, oracle-checked: the JDK bundles actual image codecs
    // (ImageIO PNG/BMP/JPEG), so this pipeline decodes genuine PNG
    // bytes on the executors and pools per-channel means. The corpus
    // pattern is closed-form ((i+x)%256 etc.) and PNG is lossless, so
    // DuckDB verifies the decoded features arithmetically — real codec
    // in the loop, exact oracle. Per-image means are rounded to 6dp
    // then DECIMAL-averaged so the group aggregate is order-independent.
    "q52c_image_decode" -> ((s, _) => {
      val feats = Multimodal.decodeImages(Multimodal.syntheticImages(s, 400)).toDF()
      def decAvg(c: String) =
        round(sum(round(col(c), 6).cast("decimal(16,6)")).cast("double")
          / count(lit(1)), 6).as(s"avg$c".replace("avgmean_", "avg_"))
      feats.groupBy(col("width"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("decodeOk"), 1L).otherwise(0L)).as("n_ok"),
          decAvg("mean_r"), decAvg("mean_g"), decAvg("mean_b"))
        .orderBy(col("width"))
    }),

    // REAL audio decode, oracle-checked: javax.sound.sampled parses
    // hand-written PCM WAV containers; mean/RMS amplitude verified
    // arithmetically (same closed-form-corpus trick as q52c).
    "q52d_audio_decode" -> ((s, _) => {
      val feats = Multimodal.decodeWavs(Multimodal.syntheticWavs(s, 400)).toDF()
      def decAvg(c: String, out: String) =
        round(sum(round(col(c), 6).cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as(out)
      feats.groupBy(col("nSamples").as("n_samples"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("decodeOk") && col("sampleRate") === 8000, 1L)
            .otherwise(0L)).as("n_ok"),
          decAvg("mean", "avg_mean"), decAvg("rms", "avg_rms"))
        .orderBy(col("n_samples"))
    }),

    // REAL video decode (round-16: the last stub retired): MJPEG-in-AVI
    // clips are RIFF-parsed and every frame JPEG-decoded by ImageIO on
    // the executors. JPEG is lossy, so the oracle pins the EXACT decode
    // outputs — frame count, dimensions, fps, decode success; the
    // near-exact solid-color channel-mean checks (±3 intensity units)
    // live in MultimodalSuite.
    "q52e_video_decode" -> ((s, _) => {
      val feats = Multimodal.decodeVideos(Multimodal.syntheticMjpegAvis(s, 200)).toDF()
      feats.groupBy(col("nFrames").as("n_frames"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("decodeOk") && col("width") === 32 &&
            col("height") === 24 && abs(col("fps") - 10.0) < lit(0.001),
            1L).otherwise(0L)).as("n_ok"))
        .orderBy(col("n_frames"))
    }),

    // The oracle-checked sibling: metadata + frame-sampling + resize-plan
    // aggregation per kind — every non-stub stage of the multimodal
    // pipeline, verified exactly (the synthetic corpus metadata is pure
    // index arithmetic both engines can compute).
    "q52b_media_meta" -> ((s, _) => {
      val ds = Multimodal.synthetic(s, 600)
      val base = ds.toDF().groupBy(col("kind")).agg(
        count(lit(1)).as("n_media"),
        sum(length(col("bytes"))).cast("long").as("sum_bytes"))
      val fr = Multimodal.sampleFrames(ds, everyMs = 500)
        .groupBy(col("kind")).agg(count(lit(1)).as("n_frames"))
      val rz = Multimodal.resizePlan(ds, maxSide = 96)
        .groupBy(col("kind")).agg(
          sum(col("out_w")).cast("long").as("sum_out_w"),
          sum(col("out_h")).cast("long").as("sum_out_h"))
      base.join(fr, Seq("kind"), "left").join(rz, Seq("kind"), "left")
        .select(col("kind"), col("n_media"), col("sum_bytes"),
          coalesce(col("n_frames"), lit(0L)).as("n_frames"),
          coalesce(col("sum_out_w"), lit(0L)).as("sum_out_w"),
          coalesce(col("sum_out_h"), lit(0L)).as("sum_out_h"))
        .orderBy(col("kind"))
    })
  )

  /** Every media query is oracle-checked: DuckDB reconstructs the
    * closed-form corpora from the same index arithmetic
    * (Multimodal.scala: syntheticImages pixel pattern, syntheticWavs
    * sample pattern, synthetic() metadata) via generate_series, so the
    * real ImageIO/javax.sound decode paths are verified exactly.
    */
  val oracles: Map[String, String] = Map(
    "q52_media_features" ->
      """WITH img AS (
        |  SELECT 'image' AS kind,
        |    round(list_avg(list_transform(
        |      generate_series(0, 15 + (i % 8)), x -> (i + x) % 256)), 6) AS f0
        |  FROM range(300) t(i)),
        |aud AS (
        |  SELECT 'audio' AS kind,
        |    round(list_avg(list_transform(
        |      generate_series(0, 799 + (i % 5) * 100),
        |      k -> ((i * 31 + k * 7) % 2003) - 1001)), 6) AS f0
        |  FROM range(300) t(i)),
        |feats AS (SELECT * FROM img UNION ALL SELECT * FROM aud),
        |fr AS (
        |  SELECT CAST(sum((1000 + (i % 10) * 500) // 500 + 1) AS BIGINT) AS n_frames
        |  FROM range(600) t(i) WHERE i % 3 = 2)
        |SELECT kind, count(*) AS n_media, count(*) AS n_ok,
        |  round(CAST(sum(CAST(f0 AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_f0,
        |  n_frames
        |FROM feats, fr GROUP BY kind, n_frames ORDER BY kind""".stripMargin,
    "q52d_audio_decode" ->
      """WITH m AS (
        |  SELECT i, CAST(800 + (i % 5) * 100 AS INT) AS n_samples,
        |    round(list_avg(list_transform(
        |      generate_series(0, 799 + (i % 5) * 100),
        |      k -> ((i * 31 + k * 7) % 2003) - 1001)), 6) AS mean,
        |    round(sqrt(list_avg(list_transform(
        |      generate_series(0, 799 + (i % 5) * 100),
        |      k -> CAST(((i * 31 + k * 7) % 2003) - 1001 AS DOUBLE)
        |        * (((i * 31 + k * 7) % 2003) - 1001)))), 6) AS rms
        |  FROM range(400) t(i))
        |SELECT n_samples, count(*) AS n, count(*) AS n_ok,
        |  round(CAST(sum(CAST(mean AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_mean,
        |  round(CAST(sum(CAST(rms AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_rms
        |FROM m GROUP BY n_samples ORDER BY n_samples""".stripMargin,
    "q52c_image_decode" ->
      """WITH m AS (
        |  SELECT i, CAST(16 + (i % 8) AS INT) AS width,
        |    round(list_avg(list_transform(
        |      generate_series(0, 15 + (i % 8)), x -> (i + x) % 256)), 6) AS mean_r,
        |    round(list_avg(list_transform(
        |      generate_series(0, 15), y -> (i + y) % 256)), 6) AS mean_g,
        |    round(list_avg(flatten(list_transform(
        |      generate_series(0, 15 + (i % 8)), x ->
        |        list_transform(generate_series(0, 15),
        |          y -> (i + x + y) % 256)))), 6) AS mean_b
        |  FROM range(400) t(i))
        |SELECT width, count(*) AS n, count(*) AS n_ok,
        |  round(CAST(sum(CAST(mean_r AS DECIMAL(16,6))) AS DOUBLE) / count(*), 6) AS avg_r,
        |  round(CAST(sum(CAST(mean_g AS DECIMAL(16,6))) AS DOUBLE) / count(*), 6) AS avg_g,
        |  round(CAST(sum(CAST(mean_b AS DECIMAL(16,6))) AS DOUBLE) / count(*), 6) AS avg_b
        |FROM m GROUP BY width ORDER BY width""".stripMargin,
    "q52e_video_decode" ->
      """SELECT CAST(4 + (i % 3) AS INT) AS n_frames,
        |  count(*) AS n, count(*) AS n_ok
        |FROM range(200) t(i) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q52b_media_meta" ->
      """WITH m AS (
        |  SELECT i AS media_id,
        |    CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CASE WHEN i % 3 <> 1 THEN 64 + (i % 4) * 32 ELSE 0 END AS width,
        |    CASE WHEN i % 3 <> 1 THEN 64 ELSE 0 END AS height,
        |    CASE WHEN i % 3 = 0 THEN 0 ELSE 1000 + (i % 10) * 500 END AS duration_ms,
        |    256 + (i % 512) AS n_bytes
        |  FROM range(600) t(i)),
        |base AS (
        |  SELECT kind, count(*) AS n_media,
        |    CAST(sum(n_bytes) AS BIGINT) AS sum_bytes
        |  FROM m GROUP BY kind),
        |fr AS (
        |  SELECT kind, CAST(sum(duration_ms // 500 + 1) AS BIGINT) AS n_frames
        |  FROM m WHERE kind = 'video' GROUP BY kind),
        |rz AS (
        |  SELECT kind,
        |    CAST(sum(CAST(ceil(width * least(1.0, 96.0 / greatest(width, height))) AS INT)) AS BIGINT) AS sum_out_w,
        |    CAST(sum(CAST(ceil(height * least(1.0, 96.0 / greatest(width, height))) AS INT)) AS BIGINT) AS sum_out_h
        |  FROM m WHERE kind IN ('image', 'video') GROUP BY kind)
        |SELECT base.kind, n_media, sum_bytes,
        |  coalesce(n_frames, 0) AS n_frames,
        |  coalesce(sum_out_w, 0) AS sum_out_w,
        |  coalesce(sum_out_h, 0) AS sum_out_h
        |FROM base
        |LEFT JOIN fr ON base.kind = fr.kind
        |LEFT JOIN rz ON base.kind = rz.kind
        |ORDER BY base.kind""".stripMargin)
}
