package graft.tools

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The reviews-shaped generator behind the Amazon RQ1 matrix and the
  * string-key decay protocol: determinism and the pool/prefix contracts
  * the experiments' closed-form sampling relies on.
  */
class AmazonGenSuite extends SparkTestBase {

  test("deterministic, pooled, realistic prefixes") {
    val spark2 = spark
    import spark2.implicits._
    val a = AmazonGen.reviews(spark, 20000, nUsers = 500, nAsins = 100).cache()
    val b = AmazonGen.reviews(spark, 20000, nUsers = 500, nAsins = 100)
    // pure function of id: two invocations are row-identical
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // pools are exact (codes are injective wrt index at these sizes)
    assert(a.select("user_id").distinct().count() == 500)
    assert(a.select("asin").distinct().count() == 100)
    assert(a.select("parent_asin").distinct().count() == 25)
    // realistic ids vary within the curve writers' 4-byte prefix window
    val p4 = a.select(substring(col("asin"), 1, 4)).distinct().count()
    assert(p4 > 20, s"asin 4-char prefixes must vary (got $p4)")
    // domains
    assert(a.filter(col("rating") < 1 || col("rating") > 5).count() == 0)
    assert(a.filter(!col("asin").startsWith("B0") ||
      !col("user_id").startsWith("AE")).count() == 0)
    assert(a.select(countDistinct(col("category"))).as[Long].head() == 8)
    a.unpersist()
  }

  test("deep-prefix variant collapses the 4-byte prefix window") {
    val d = AmazonGen.reviews(spark, 5000, 500, 100, deepPrefixAsin = true)
    val p4 = d.select(substring(col("asin"), 1, 4)).distinct().count()
    assert(p4 == 1, s"deep asins must share their first 4 chars (got $p4)")
    assert(d.select("asin").distinct().count() > 1)
  }

  test("sampleCodes returns members of the generated pool") {
    val spark2 = spark
    import spark2.implicits._
    val pool = AmazonGen.reviews(spark, 20000, 500, 100)
      .select("asin").distinct().as[String].collect().toSet
    val sampled = AmazonGen.sampleCodes(spark, 100, 8, 21, "B0", 8, seed = 7)
    assert(sampled.nonEmpty && sampled.forall(pool.contains),
      s"sampled asins outside pool: ${sampled.filterNot(pool.contains)}")
  }
}
