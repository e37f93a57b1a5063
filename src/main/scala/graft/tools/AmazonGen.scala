package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Amazon-reviews-shaped synthetic table — the schema the
  * reference's RQ1 Amazon matrix runs over (scripts/run_RQ_1_matrix.sh:
  * 160-224 scenarios; workload_spec/generate_amazon_rq1_specs.py:38-56
  * column configs; spec_amazon_Q1.yaml predicates): string product /
  * user identifiers with a shared literal prefix, a TIMESTAMP activity
  * column, small-domain numeric quality columns, and a low-cardinality
  * category used as the hive partition.
  *
  * Everything is a pure hash of `id` (xxhash64-seeded), so any two runs
  * at the same row count produce byte-identical logical content — the
  * matrix and the decay protocol sample query parameters from the same
  * functions without materializing the table twice.
  *
  * `deepPrefixAsin` swaps the realistic asin ("B0" + 8 varying base-36
  * chars) for a pathological one ("B0000000" + 4 varying chars): the
  * curve writers normalize strings through a 4-byte lexicographic
  * prefix code (LayoutWriter.doubleView), so an id pool whose first
  * four characters are CONSTANT collapses to a single curve coordinate
  * — the failure mode round-15's VERDICT asked to measure. Zone-map
  * stats keep full-string min/max either way, so `linear` layouts are
  * unaffected by construction.
  */
object AmazonGen {

  val Categories: Seq[String] = Seq(
    "All_Beauty", "Electronics", "Books", "Home_and_Kitchen",
    "Toys_and_Games", "Sports_and_Outdoors", "Pet_Supplies", "Automotive")

  val TsLo: Long = 1514764800L // 2018-01-01T00:00:00Z
  val TsHi: Long = 1703980800L // 2023-12-31T00:00:00Z

  private def h(salt: Int): Column = abs(xxhash64(col("id"), lit(salt)))

  /** Fixed-width varying base-36 code of an index column: the hash makes
    * the FIRST characters vary (realistic random-looking ids); the pool
    * has exactly `pool` distinct values because the code is a pure
    * function of `idx`.
    */
  private def code(idx: Column, salt: Int, len: Int): Column =
    substring(lpad(conv(abs(xxhash64(idx, lit(salt))).cast("string"),
      10, 36), 13, "0"), 1, len)

  /** `n` rows of reviews. Pools: `nUsers` users, `nAsins` products, 4
    * product variants per parent asin.
    */
  def reviews(spark: SparkSession, n: Long, nUsers: Long, nAsins: Long,
      deepPrefixAsin: Boolean = false): DataFrame = {
    val userIdx = pmod(h(1), lit(nUsers))
    val asinIdx = pmod(h(2), lit(nAsins))
    val parentIdx = floor(asinIdx / 4)
    val asinCol =
      if (deepPrefixAsin) concat(lit("B0000000"), code(asinIdx, 20, 4))
      else concat(lit("B0"), code(asinIdx, 21, 8))
    spark.range(0L, n, 1L, 32).select(
      concat(lit("AE"), code(userIdx, 10, 12)).as("user_id"),
      asinCol.as("asin"),
      concat(lit("B0"), code(parentIdx, 22, 8)).as("parent_asin"),
      timestamp_seconds(lit(TsLo) + pmod(h(3), lit(TsHi - TsLo)))
        .as("record_timestamp"),
      (lit(1) + pmod(h(4), lit(5))).cast("int").as("rating"),
      (pmod(h(5), lit(40)) * pmod(h(6), lit(25))).cast("int").as("helpful_vote"),
      element_at(
        array(Categories.map(lit): _*), (pmod(h(7), lit(8)) + 1).cast("int"))
        .as("category"),
      (pmod(h(8), lit(5)) > 0).as("verified_purchase"))
  }

  /** Deterministic sample of `k` distinct values from one generated
    * column (e.g. asin IN-lists for the point queries): re-derives the
    * value the same way `reviews` does, from fixed indices.
    */
  def sampleCodes(spark: SparkSession, pool: Long, k: Int, salt: Int,
      prefix: String, len: Int, seed: Int): Seq[String] = {
    import spark.implicits._
    // spread indices over the pool deterministically
    val idxs = (0 until k).map(i =>
      Math.floorMod(scala.util.hashing.MurmurHash3.productHash((seed, i)).toLong
        * 2654435761L, pool))
    idxs.toDF("idx")
      .select(concat(lit(prefix), code(col("idx"), salt, len)).as("v"))
      .as[String].collect().toSeq.distinct
  }
}
