package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.layout.LayoutWriter
import graft.layout.LayoutWriter.LayoutSpec
import graft.table.Upserter

/** Incremental-maintenance surface: keyed upsert into a layout table
  * (reference RQ7 scenario: build update batches, upsert each, re-query;
  * scripts/run_RQ_7_matrix.sh + lakehouse_op/hudi_upsert.py). The oracle
  * states the MERGE semantics declaratively; the Spark side actually
  * performs the copy-on-write upsert on disk and queries the result —
  * matching numbers prove the physical upsert implements the logical
  * merge.
  */
object MaintenanceQueries {

  private val cache = scala.collection.concurrent.TrieMap[String, String]()

  /** orders laid out linear on o_orderkey with a record key, upserted
    * once per JVM with a deterministic batch (idempotent: re-upserting
    * the same batch is a no-op because incoming wins ties).
    */
  private def upsertedDir(s: SparkSession, d: String): String =
    cache.getOrElseUpdate(d, {
      val dir = java.nio.file.Files.createTempDirectory("graft_upsert_").toString
      val orders = Tables.load(s, d, "orders")
      LayoutWriter.write(orders, dir,
        LayoutSpec("linear", Seq("o_orderkey"), numFiles = Some(8),
          recordKey = Some("o_orderkey")))
      Upserter.upsert(s, dir, batchOf(s, d))
      dir
    })

  /** Updates (10% of keys, price * 1.1) + inserts (new keys at +10M). */
  private def batchOf(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.load(s, d, "orders")
    val upd = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 1.1)
    val ins = orders.filter(col("o_orderkey") % 1000 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_totalprice", lit(100.0))
    upd.unionByName(ins)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_upsert_merge" -> ((s, d) => {
      val dir = upsertedDir(s, d)
      s.read.parquet(dir).agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q38_upsert_merge" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_totalprice*1.1 AS p FROM orders WHERE o_orderkey % 10 = 0),
        |ins AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey, 100.0 AS p
        |  FROM orders WHERE o_orderkey % 1000 = 0),
        |batch AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |merged AS (
        |  SELECT o_orderkey, p FROM batch
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch))
        |SELECT count(*) AS cnt, count(DISTINCT o_orderkey) AS n_keys,
        |  round(sum(p),2) AS sum_price
        |FROM merged""".stripMargin
  )
}
