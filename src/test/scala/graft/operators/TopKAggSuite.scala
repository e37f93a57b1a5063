package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** TopKByScore must equal the window formulation
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC, p ASC) <= k`
  * on any input — including score ties, duplicate (score, payload)
  * pairs, and multi-partition inputs that force the partial-merge and
  * serialize/deserialize paths.
  */
class TopKAggSuite extends SparkTestBase {

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .withColumn("rk", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("s").desc, col("p"))))
    .filter(col("rk") <= k)
    .select(col("g"), col("rk"), col("p"), col("s"))

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .groupBy(col("g"))
    .agg(TopKAgg.topKByScore(col("s"), col("p"), k).as("top"))
    .select(col("g"), posexplode(col("top")))
    .select(col("g"), (col("pos") + 1).cast("int").as("rk"),
      col("col.payload").as("p"), col("col.score").as("s"))

  test("topKByScore == window row_number on random tied data") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(31)
    // few groups, many rows, coarse scores → plenty of ties; 16
    // partitions force map-side partials + serialized merge
    val df = (1 to 20000).map { _ =>
      (s"g${rnd.nextInt(4)}", s"w${rnd.nextInt(500)}%04d", rnd.nextInt(50) / 10.0)
    }.toDF("g", "p", "s").repartition(16)
    for (k <- Seq(1, 5, 20)) {
      val w = windowTopK(df, k).orderBy(col("g"), col("rk")).collect().toSeq
      val a = aggTopK(df, k).orderBy(col("g"), col("rk")).collect().toSeq
      assert(a === w, s"k=$k mismatch")
    }
  }

  test("topKByScore: duplicate (score, payload) pairs each take a rank") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("g", "x", 1.0), ("g", "x", 1.0), ("g", "y", 0.5))
      .toDF("g", "p", "s").repartition(3)
    val got = aggTopK(df, 2).orderBy(col("rk"))
      .select(col("p"), col("s")).as[(String, Double)].collect().toSeq
    assert(got === Seq(("x", 1.0), ("x", 1.0)))
  }

  test("topKByScore: NaN scores rank first, like the window's DESC order") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("g", "a", 1.0), ("g", "b", Double.NaN), ("g", "c", 2.0),
      ("g", "d", Double.NaN)).toDF("g", "p", "s").repartition(4)
    val got = aggTopK(df, 3).orderBy(col("rk")).select(col("p"))
      .as[String].collect().toSeq
    val want = windowTopK(df, 3).orderBy(col("rk")).select(col("p"))
      .as[String].collect().toSeq
    assert(got === want)
    assert(got === Seq("b", "d", "c")) // NaN above every finite score
  }

  test("topKByScore: groups smaller than k emit all rows; null scores skipped") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("g", Some("a"), Some(2.0)), ("g", Some("b"), None),
      ("h", Some("c"), Some(1.0)))
      .toDF("g", "p", "s")
    val got = aggTopK(df, 5).orderBy(col("g"), col("rk"))
      .select(col("g"), col("p")).as[(String, String)].collect().toSeq
    assert(got === Seq(("g", "a"), ("h", "c")))
  }
}
