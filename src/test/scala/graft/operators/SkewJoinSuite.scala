package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import scala.util.Random

class SkewJoinSuite extends SparkTestBase {

  test("salted join equals the plain join on heavily skewed keys") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(13)
    // 90% of fact rows hit one hot key
    val fact = (1 to 30000).map { i =>
      val k = if (rnd.nextDouble() < 0.9) 1 else 1 + rnd.nextInt(100)
      (i.toLong, k, rnd.nextDouble())
    }.toDF("id", "k", "v")
    val dim = (1 to 100).map(k => (k, s"name$k")).toDF("k", "name")

    val plain = fact.join(dim, "k")
      .agg(count(lit(1)), round(sum("v"), 4), countDistinct("name"))
      .collect()(0).toSeq
    val salted = SkewJoin.saltedJoin(fact, dim, "k", k = 8)
      .agg(count(lit(1)), round(sum("v"), 4), countDistinct("name"))
      .collect()(0).toSeq
    assert(salted == plain, s"salted=$salted plain=$plain")
  }

  test("salting spreads the hot key across partitions") {
    val spark2 = spark
    import spark2.implicits._
    val fact = (1 to 10000).map(i => (i.toLong, 7, i * 1.0)).toDF("id", "k", "v")
    val dim = Seq((7, "hot")).toDF("k", "name")
    val joined = SkewJoin.saltedJoin(fact, dim, "k", k = 8)
    assert(joined.count() == 10000)
    // the pre-join salted fact has ~8 distinct salt groups for the hot key
    val salts = fact
      .withColumn("__salt", pmod(hash(fact.columns.map(col): _*), lit(8)))
      .select(countDistinct("__salt")).collect()(0).getLong(0)
    assert(salts >= 6, s"expected the hot key spread over ~8 salts, got $salts")
  }
}
