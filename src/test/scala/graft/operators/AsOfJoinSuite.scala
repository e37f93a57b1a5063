package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSuite extends SparkTestBase {

  private def frames = {
    val spark2 = spark
    import spark2.implicits._
    // left: (key, ts, lid); right: (key, ts, rid, v)
    val left = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
      (2L, 50L, "d"), (3L, 7L, "e")
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 10L, 100L, 1.0), (1L, 15L, 101L, 2.0), (1L, 1L, 102L, 3.0),
      (2L, 60L, 103L, 4.0), (4L, 1L, 104L, 5.0)
    ).toDF("k", "ts", "rid", "v")
    (left, right)
  }

  test("latest at-or-before row per key; null-extension; equal-ts inclusion") {
    val (left, right) = frames
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts",
        valueCols = Seq("v"), tieBreak = "rid")
      .orderBy("k", "ts")
      .select("k", "ts", "lid", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, 5L, "c", Some(3.0)),   // only ts=1 precedes
      (1L, 10L, "a", Some(1.0)),  // equal ts matches (>= semantics)
      (1L, 20L, "b", Some(2.0)),  // ts=15 is the latest prior
      (2L, 50L, "d", None),       // right row at 60 is in the future
      (3L, 7L, "e", None)         // key has no right rows at all
    ))
  }

  test("ties on the right timestamp break by max tieBreak, deterministically") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 1L, 1.0), (1L, 10L, 9L, 9.0), (1L, 10L, 5L, 5.0))
      .toDF("k", "ts", "rid", "v")
    for (_ <- 1 to 3) {
      val out = AsOfJoin.asOf(left, right, Seq("k"), "ts",
        valueCols = Seq("v"), tieBreak = "rid").collect()
      assert(out.map(_.getAs[Double]("v")).toSeq == Seq(9.0))
    }
  }

  test("matches a brute-force computation on a random corpus") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 500).map(i => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = (1 to 500).map(i => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong, rnd.nextInt(100).toDouble))
      .toDF("k", "ts", "rid", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts",
        valueCols = Seq("v"), tieBreak = "rid")
      .select("lid", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    val rightRows = right.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = left.collect().map { lr =>
      val (k, ts, lid) = (lr.getLong(0), lr.getLong(1), lr.getLong(2))
      val cands = rightRows.filter(r => r._1 == k && r._2 <= ts)
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._2, r._3))._4))
    }.toMap
    assert(got == expected)
  }

  test("forward direction matches brute force (nearest at-or-after)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(13)
    val left = (1 to 300).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = (1 to 300).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(500).toLong, i.toLong, rnd.nextInt(100).toDouble))
      .toDF("k", "ts", "rid", "v")
    val got = AsOfJoin.asOf(left, right.withColumnRenamed("ts", "rts"),
        Seq("k"), "ts", "rts", valueCols = Seq("v"), tieBreak = "rid",
        direction = "forward")
      .select("lid", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    val rightRows = right.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = left.collect().map { lr =>
      val (k, ts, lid) = (lr.getLong(0), lr.getLong(1), lr.getLong(2))
      val cands = rightRows.filter(r => r._1 == k && r._2 >= ts)
      // nearest FUTURE ts; among equal ts the max tieBreak wins
      lid -> (if (cands.isEmpty) None
              else Some(cands.minBy(r => (r._2, -r._3))._4))
    }.toMap
    assert(got == expected)
  }

  test("tolerance nulls out matches farther than the bound") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, 100L, "x"), (1L, 200L, "y")).toDF("k", "ts", "lid")
    val right = Seq((1L, 95L, 1L, 7.0)).toDF("k", "ts", "rid", "v")
    val out = AsOfJoin.asOf(left, right.withColumnRenamed("ts", "rts"),
        Seq("k"), "ts", "rts", valueCols = Seq("v"), tieBreak = "rid",
        tolerance = Some(lit(10L)))
      .orderBy("ts").select("lid", "v").collect()
      .map(r => (r.getString(0), Option(r.get(1))))
    // ts=100 is 5 away (within 10); ts=200 is 105 away (nulled)
    assert(out.toSeq == Seq(("x", Some(7.0)), ("y", None)))
  }

  test("the matched row is atomic: a null value column rides with ITS row") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq(
      (1L, 10L, 1L, Some(3.0), Some("old")),
      (1L, 50L, 2L, None, Some("new"))) // latest row has null v
      .toDF("k", "ts", "rid", "v", "tag")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts",
      valueCols = Seq("v", "tag"), tieBreak = "rid").collect()
    // merge_asof semantics: the ts=50 ROW matches; its null v must NOT
    // be patched from the older ts=10 row
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("v"))
      && out(0).getAs[String]("tag") == "new")
  }

  test("one shuffle: the executed plan has a single exchange") {
    val (left, right) = frames
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts",
      valueCols = Seq("v"), tieBreak = "rid")
    out.queryExecution.toRdd.count()
    val exchanges = graft.runner.QueryRunner.allNodes(out.queryExecution.executedPlan)
      .map(_.nodeName).count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges")
  }
}
