package graft.operators

import graft.SparkTestBase
import graft.runner.QueryRunner
import org.apache.spark.sql.functions._

class SearchIndexSuite extends SparkTestBase {

  private lazy val docsDf =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  private lazy val indexDir = {
    val d = tmpDir("search_index")
    SearchIndex.build(docsDf, "doc_id", "text", d, numFiles = 16)
    d
  }

  test("indexed bm25 matches the inline operator exactly") {
    val terms = Seq("hash", "join", "merge")
    val inline = InvertedIndex.bm25(docsDf, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val indexed = SearchIndex.bm25(spark, indexDir, terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.runner.Materialize.releaseAll()
    assert(indexed.keySet === inline.keySet)
    inline.foreach { case (id, s) =>
      assert(math.abs(indexed(id) - s) < 1e-12, s"doc $id") }
  }

  test("indexed phrase search matches the inline operator exactly") {
    val phrase = Seq("hash", "join")
    val inline = InvertedIndex.phraseHits(docsDf, "doc_id", "text", phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val indexed = SearchIndex.phraseHits(spark, indexDir, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    graft.runner.Materialize.releaseAll()
    assert(indexed.toSeq === inline.toSeq)
    assert(inline.nonEmpty) // the corpus really contains the phrase
  }

  test("add folds a batch in O(batch); optimize restores the global sort") {
    val m = docsDf.agg(expr("percentile_approx(doc_id, 0.5)"))
      .collect()(0).getLong(0)
    val d = tmpDir("search_index_inc")
    SearchIndex.build(docsDf.filter(col("doc_id") <= m),
      "doc_id", "text", d, numFiles = 8)
    SearchIndex.add(spark, docsDf.filter(col("doc_id") > m),
      "doc_id", "text", d)

    val terms = Seq("hash", "join", "merge")
    def scores(dir: String) = SearchIndex.bm25(spark, dir, terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val incremental = scores(d)
    val fromScratch = InvertedIndex.bm25(docsDf, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.runner.Materialize.releaseAll()
    assert(incremental.keySet === fromScratch.keySet)
    fromScratch.foreach { case (id, s) =>
      assert(math.abs(incremental(id) - s) < 1e-12, s"doc $id") }

    // batch files overlap old term ranges; the global re-sort restores
    // point-lookup skipping AND the same results
    SearchIndex.optimize(spark, d, targetFileBytes = 64L * 1024)
    val optimized = scores(d)
    graft.runner.Materialize.releaseAll()
    assert(optimized === incremental)
    val one = QueryRunner.run(spark,
      SearchIndex.postings(spark, d).filter(col("term") === "dup")
        .agg(count(lit(1)).as("c")), "one_term_opt", action = "collect")
    val total = graft.layout.ZoneMap.read(s"$d/postings").files.size
    assert(one.filesScanned < total,
      s"optimized index must skip on a point term: ${one.filesScanned} of $total")
  }

  test("term predicates skip postings files via the zone-map manifest") {
    val post = SearchIndex.postings(spark, indexDir)
    val one = QueryRunner.run(spark,
      post.filter(col("term") === "dup")
        .agg(count(lit(1)).as("c")), "one_term", action = "collect")
    val all = QueryRunner.run(spark,
      post.agg(count(lit(1)).as("c")), "all_terms", action = "collect")
    assert(all.filesScanned == 16, s"index should hold 16 files: ${all.filesScanned}")
    assert(one.filesScanned < all.filesScanned,
      s"a term point-lookup must skip files: ${one.filesScanned} of ${all.filesScanned}")
  }
}
