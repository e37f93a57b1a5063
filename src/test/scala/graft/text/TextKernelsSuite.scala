package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

/** Parity gates for the one-pass codegen kernels: each kernel must equal
  * its (slow, interpreted, DuckDB-matching) HOF formulation bit-for-bit —
  * that is what keeps the q26/q31 DuckDB oracles valid after the rewrite.
  */
class TextKernelsSuite extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def docsWords = {
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), words(col("text")).as("ws"))
  }

  test("hash60 kernel == conv(substring(md5,1,15),16,10) SQL expression") {
    val rows = docsWords
      .select(explode(col("ws")).as("w")).limit(2000)
      .select(col("w"), wordHash60(col("w")).as("sql_h")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getString(0)
      assert(TextKernels.hash60(w.getBytes("UTF-8")) === r.getLong(1),
        s"hash60 mismatch for word '$w'")
    }
  }

  test("SimHash60 expression == HOF formulation on real documents") {
    val diff = docsWords
      .select(simhash60(col("ws")).as("fast"), simhash60Hof(col("ws")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff === 0L)
  }

  test("SimHash60 handles empty arrays and nulls") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array('a','b','a')), (array('')), (CAST(NULL AS ARRAY<STRING>))
        |AS t(ws)""".stripMargin)
    val out = df.select(simhash60(col("ws")).as("h"),
      simhash60Hof(col("ws")).as("ref")).collect()
    out.filter(r => !r.isNullAt(0)).foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
    }
    // intended difference: SQL-standard null-in/null-out, where the HOF's
    // when(...).otherwise(0) chain collapses a NULL array to 0
    assert(out.count(_.isNullAt(0)) === 1)
    assert(out.count(_.isNullAt(1)) === 0)
  }

  test("repetitionStats == HOF formulation on real documents") {
    val st = repetitionStats(col("ws"))
    // HOF reference, term for term the DuckDB oracle's shape
    val maxWc = array_max(transform(array_distinct(col("ws")),
      x => size(filter(col("ws"), y => y === x)))).cast("long")
    val nDist = size(array_distinct(col("ws"))).cast("long")
    val d2g = size(array_distinct(shingles(col("ws"), 2))).cast("long")
    val diff = docsWords
      .select(st.as("fast"), array(maxWc, nDist, d2g).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff === 0L)
  }

  test("repetitionStats edge cases: single word, repeats, empty, null") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array('a')), (array('a','a')), (array('a','b','a','b')),
        |  (CAST(array() AS ARRAY<STRING>)), (CAST(NULL AS ARRAY<STRING>))
        |AS t(ws)""".stripMargin)
    val out = df.select(repetitionStats(col("ws")).as("st")).collect()
    assert(out(0).getSeq[Long](0) === Seq(1L, 1L, 0L)) // no 2-grams
    assert(out(1).getSeq[Long](0) === Seq(2L, 1L, 1L)) // 'a a'
    assert(out(2).getSeq[Long](0) === Seq(2L, 2L, 2L)) // grams 'a b','b a','a b' → 2 distinct
    assert(out(3).getSeq[Long](0) === Seq(0L, 0L, 0L))
    assert(out(4).isNullAt(0)) // null-in/null-out
  }

  test("shinglesDistinct == array_distinct(shingles(ws, n)) on real documents") {
    for (n <- Seq(2, 3, 5)) {
      val diff = docsWords
        .select(shinglesDistinct(col("ws"), n).as("fast"),
          array_distinct(shingles(col("ws"), n)).as("slow"))
        .filter(col("fast") =!= col("slow"))
        .count()
      assert(diff === 0L, s"shinglesDistinct mismatch at n=$n")
    }
  }

  test("shinglesDistinct edge cases: short, exact-width, null array") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array('a','b')), (array('a','b','c')), (array('a','a','a','a')),
        |  (array('')), (CAST(NULL AS ARRAY<STRING>))
        |AS t(ws)""".stripMargin)
    val rows = df.select(shinglesDistinct(col("ws"), 3).as("fast"),
      array_distinct(shingles(col("ws"), 3)).as("slow")).collect()
    rows.filter(r => !r.isNullAt(0)).foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
    // null-in/null-out vs the HOF's otherwise(array()) — same intended
    // difference as SimHash60; shingled() only ever sees non-null text
    assert(rows.count(_.isNullAt(0)) === 1)
  }

  test("sortedJoinCount == explode-join count, duplicates multiply") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(31)
    // small value domain forces matches AND within-array duplicates
    val rows = Seq.tabulate(60) { i =>
      (i.toLong,
        Seq.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong).sorted,
        Seq.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong).sorted)
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      graft.text.VectorExpressions.sortedJoinCount(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // oracle: literal join-count semantics (duplicate runs multiply)
    rows.foreach { case (id, a, b) =>
      val expected = a.map(v => b.count(_ == v).toLong).sum
      assert(got(id) == expected, s"id=$id a=$a b=$b")
    }
    // null propagation
    val n = Seq((1L, Seq(1L, 2L), null.asInstanceOf[Seq[Long]]))
      .toDF("id", "a", "b")
      .select(graft.text.VectorExpressions.sortedJoinCount(col("a"), col("b")))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("markerScores == per-set size(filter(isin)) terms") {
    val sets = Seq(Seq("the", "and", "of"), Seq("le", "la"), Seq("zzz_nohit"))
    val slow = sets.zipWithIndex.map { case (stops, i) =>
      size(filter(col("ws"), w => w.isin(stops: _*))).as(s"m$i")
    }
    val diff = docsWords
      .withColumn("sc", markerScores(col("ws"), sets))
      .select(col("sc"), struct(slow: _*).as("ref"))
      .filter(col("sc")(0) =!= col("ref.m0") ||
        col("sc")(1) =!= col("ref.m1") || col("sc")(2) =!= col("ref.m2"))
      .count()
    assert(diff === 0L)
  }
}
