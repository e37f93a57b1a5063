package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

class GlobalRanksSuite extends SparkTestBase {

  test("averageRanks handles ties with the average-rank convention") {
    val spark2 = spark
    import spark2.implicits._
    // values: 5, 5, 7, 9, 9, 9 → avg ranks: 1.5, 1.5, 3, 5, 5, 5
    val df = Seq(5, 5, 7, 9, 9, 9).toDF("v")
    val ranks = GlobalRanks.averageRanks(df, "v", partitions = 2)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(ranks(5.0) == 1.5)
    assert(ranks(7.0) == 3.0)
    assert(ranks(9.0) == 5.0)
  }

  test("spearman: monotone transform gives 1, reversal gives -1") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(17)
    val xs = (1 to 5000).map(_ => rnd.nextDouble() * 100)
    val mono = xs.map(x => (x, x * x * x + 5)).toDF("a", "b")
    assert(math.abs(GlobalRanks.spearman(mono, "a", "b") - 1.0) < 1e-9)
    val anti = xs.map(x => (x, -x)).toDF("a", "b")
    assert(math.abs(GlobalRanks.spearman(anti, "a", "b") + 1.0) < 1e-9)
  }

  test("spearman matches the windowed formulation on tied data") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(19)
    val df = (1 to 4000).map(_ => (rnd.nextInt(20).toDouble, rnd.nextDouble()))
      .toDF("a", "b")
    val viaOps = GlobalRanks.spearman(df, "a", "b")
    val wA = Window.orderBy(col("a")); val wB = Window.orderBy(col("b"))
    val viaWindow = df
      .withColumn("r1", rank().over(wA) +
        (count(lit(1)).over(Window.partitionBy(col("a"))) - 1) / 2.0)
      .withColumn("r2", rank().over(wB) +
        (count(lit(1)).over(Window.partitionBy(col("b"))) - 1) / 2.0)
      .agg(corr(col("r1"), col("r2"))).collect()(0).getDouble(0)
    assert(math.abs(viaOps - viaWindow) < 1e-9, s"$viaOps vs $viaWindow")
  }

  test("ntileByRange matches window ntile on a unique key") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(23)
    val df = rnd.shuffle((1 to 10007).toList).map(i => (i.toLong, i * 2.0))
      .toDF("k", "v")
    val viaOps = GlobalRanks.ntileByRange(df, "k", 8, partitions = 4)
      .groupBy("bucket").count().collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("count")).toMap
    val viaWindow = df
      .withColumn("bucket", ntile(8).over(Window.orderBy(col("k"))))
      .groupBy("bucket").count().collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("count")).toMap
    assert(viaOps == viaWindow, s"$viaOps vs $viaWindow")
  }
}
