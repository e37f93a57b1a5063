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

  /** lineitem under the reference's OWN keyed config — composite
    * record_key [l_orderkey, l_linenumber] + ComplexKeyGenerator
    * (tpch_all_schemas.py:84, tpch_all_loader.py:141-148) — laid out
    * linear on the key tuple, upserted once per JVM.
    */
  /** Tuple-unique lineitem base: the synthetic generator does NOT
    * enforce the (l_orderkey, l_linenumber) PK (sf0.01: 60000 rows,
    * 45832 distinct tuples), so the keyed table is built from a
    * deterministic per-tuple rollup both sides can state.
    */
  private def compositeBase(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "lineitem")
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(max(col("l_quantity")).as("l_quantity"),
        max(col("l_extendedprice")).as("l_extendedprice"))

  private def compositeDir(s: SparkSession, d: String): String =
    cache.getOrElseUpdate(d + "#composite", {
      val dir = java.nio.file.Files.createTempDirectory("graft_upsert_c_").toString
      LayoutWriter.write(compositeBase(s, d), dir,
        LayoutSpec("linear", Seq("l_orderkey", "l_linenumber"),
          numFiles = Some(8), recordKeys = Seq("l_orderkey", "l_linenumber")))
      Upserter.upsert(s, dir, compositeBatchOf(s, d))
      dir
    })

  /** Tuple updates (10% of orders, price * 1.1) + tuple inserts (a new
    * line number for every 1000th order — same order key, so single-key
    * merge semantics would WRONGLY treat them as updates).
    */
  private def compositeBatchOf(s: SparkSession, d: String): DataFrame = {
    val li = compositeBase(s, d)
    val upd = li.filter(col("l_orderkey") % 10 === 0)
      .withColumn("l_extendedprice", col("l_extendedprice") * 1.1)
    val ins = li.filter(col("l_orderkey") % 1000 === 0 && col("l_linenumber") === 1)
      .withColumn("l_linenumber", col("l_linenumber") + 10)
      .withColumn("l_extendedprice", lit(100.0))
    upd.unionByName(ins)
  }

  /** Order-independent checksum: per-row round to integer cents, sum as
    * BIGINT. A `round(sum(double), 2)` over ~457k rows is numerically
    * fragile — the partial-sum order (partitioning, AQE, core count) can
    * perturb the hundredths digit when the true sum sits near a rounding
    * boundary (observed on q38b: 26 717 424 640.791 vs the .795 cut).
    * Rounding each row to a long BEFORE summing makes the aggregate an
    * exact integer sum, invariant under any reordering, and both engines
    * round identical IEEE doubles to identical longs (HALF_UP ==
    * half-away-from-zero for positive prices).
    */
  private def centsSum(c: org.apache.spark.sql.Column) =
    sum(round(c * 100).cast("long")).as("sum_cents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_upsert_merge" -> ((s, d) => {
      val dir = upsertedDir(s, d)
      s.read.parquet(dir).agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        centsSum(col("o_totalprice")))
    }),
    "q38b_composite_upsert" -> ((s, d) => {
      val dir = compositeDir(s, d)
      s.read.parquet(dir).agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_keys"),
        centsSum(col("l_extendedprice")))
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
        |  CAST(sum(cast(round(p*100) AS bigint)) AS BIGINT) AS sum_cents
        |FROM merged""".stripMargin,
    "q38b_composite_upsert" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, max(l_quantity) AS l_quantity,
        |    max(l_extendedprice) AS l_extendedprice
        |  FROM lineitem GROUP BY 1, 2),
        |upd AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice*1.1 AS p
        |  FROM li WHERE l_orderkey % 10 = 0),
        |ins AS (
        |  SELECT l_orderkey, l_linenumber + 10 AS l_linenumber, 100.0 AS p
        |  FROM li WHERE l_orderkey % 1000 = 0 AND l_linenumber = 1),
        |batch AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |merged AS (
        |  SELECT l_orderkey, l_linenumber, p FROM batch
        |  UNION ALL
        |  SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice
        |  FROM li l
        |  WHERE NOT EXISTS (SELECT 1 FROM batch b
        |    WHERE b.l_orderkey = l.l_orderkey
        |      AND b.l_linenumber = l.l_linenumber))
        |SELECT count(*) AS cnt,
        |  (SELECT count(*) FROM
        |    (SELECT DISTINCT l_orderkey, l_linenumber FROM merged)) AS n_keys,
        |  CAST(sum(cast(round(p*100) AS bigint)) AS BIGINT) AS sum_cents
        |FROM merged""".stripMargin
  )
}
