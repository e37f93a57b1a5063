package graft.cli

import graft.SparkTestBase

class SearchCliSuite extends SparkTestBase {

  test("build → bm25/phrase → add → optimize round-trips and stays consistent") {
    val sf = "/root/testdata/sf0.001"
    val idx = tmpDir("search_cli_idx")
    assert(Search.run(spark, Seq("build", sf, idx)) === Seq(s"built $idx"))

    val bm = Search.run(spark, Seq("bm25", idx, "hash", "join"))
    assert(bm.nonEmpty && bm.size <= 20)
    // lines are "doc_id\tscore" with scores descending
    val scores = bm.map(_.split("\t")(1).toDouble)
    assert(scores === scores.sorted.reverse)

    val ph = Search.run(spark, Seq("phrase", idx, "hash", "join"))
    assert(ph.nonEmpty)
    assert(ph.forall(_.split("\t").length == 3))

    // add the same corpus shifted out of the id space, then optimize:
    // bm25 output must change consistently (doubled corpus) and still run
    val docs = graft.Tables.load(spark, sf, "documents")
    val shift = docs.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col("doc_id"))).collect()(0).getLong(0) + 1
    val b = tmpDir("search_cli_batch")
    docs.withColumn("doc_id",
        org.apache.spark.sql.functions.col("doc_id") + shift)
      .write.parquet(s"$b/documents.parquet")
    Search.run(spark, Seq("add", b, idx))
    Search.run(spark, Seq("optimize", idx))
    val bm2 = Search.run(spark, Seq("bm25", idx, "hash", "join"))
    assert(bm2.nonEmpty)
    // every original doc now has a shifted twin with identical text, so
    // the doubled index must surface twin pairs with equal scores
    val byScore = bm2.map(_.split("\t")).groupBy(_(1)).values
    assert(byScore.exists(_.length >= 2), s"expected twin scores in $bm2")
  }
}
