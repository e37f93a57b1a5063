package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

/** Streaming demo main: treat the events parquet as a file stream,
  * run the watermarked hourly aggregation, and cross-check the result
  * against the equivalent batch query.
  *
  * Usage: runMain graft.cli.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master("local[4]"), "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batch = graft.Tables.load(spark, sfDir, "events")
    // file streams need a directory — stage the single-file table behind
    // a symlink (testdata stays untouched)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
      .parquet(streamDir.toString)

    val agg = EventStream.hourlyCounts(
      if (stream.schema("ts").dataType.typeName == "long")
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream,
      watermark = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("hourly")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly")
    val nStream = streamed.count()
    val nBatch = batch
      .groupBy(date_trunc("hour", col("ts")), col("event_type")).count().count()
    println(s"[stream-demo] stream groups=$nStream batch groups=$nBatch " +
      s"match=${nStream == nBatch}")
    streamed.orderBy(col("cnt").desc).show(5, truncate = false)

    // streaming dedup cross-check
    val stream2 = spark.readStream
      .schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
      .parquet(streamDir.toString)
    val normalized =
      if (stream2.schema("ts").dataType.typeName == "long")
        stream2.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream2
    val dq = EventStream.dedupeStream(normalized, "event_id")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    dq.awaitTermination(120000)
    val nDedup = spark.table("deduped").count()
    val nBatchDedup = batch.dropDuplicates("event_id", "ts").count()
    println(s"[stream-demo] dedup stream=$nDedup batch=$nBatchDedup " +
      s"match=${nDedup == nBatchDedup}")
    spark.stop()
  }
}
