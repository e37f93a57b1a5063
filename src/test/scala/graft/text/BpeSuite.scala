package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSuite extends SparkTestBase {

  test("classic corpus learns the expected first merges") {
    // Sennrich et al. 2016's running example: es/est dominate
    val dict = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.train(dict, 5)
    assert(merges.take(3) ===
      Vector(("e", "s"), ("es", "t"), ("est", Bpe.Eow)))
    // both remaining merges keep building frequent prefixes
    assert(merges.length === 5)
  }

  test("count ties break lexicographically: deterministic merge order") {
    // "ab" and "cd" both occur twice; (a,b) < (c,d)
    val dict = Seq("ab" -> 2L, "cd" -> 2L)
    val merges = Bpe.train(dict, 1)
    assert(merges === Vector(("a", "b")))
  }

  test("encode reproduces the trainer's final segmentation for every word") {
    val dict = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "aaa" -> 4L, "aaaa" -> 2L, "banana" -> 3L)
    val merges = Bpe.train(dict, 12)
    val ranks = merges.zipWithIndex.toMap
    // trainer-side segmentation: replay merges in order over each word
    dict.foreach { case (w, _) =>
      val replayed = merges.foldLeft(Bpe.symbols(w))(Bpe.mergePair)
      assert(Bpe.encode(w, ranks) === replayed, s"word $w")
    }
  }

  test("overlapping pairs merge greedily left-to-right") {
    val ranks = Map(("a", "a") -> 0)
    assert(Bpe.encode("aaa", ranks) === Vector("aa", "a", Bpe.Eow))
    assert(Bpe.encode("aaaa", ranks) === Vector("aa", "aa", Bpe.Eow))
  }

  test("distributed tokenCounts matches a driver brute-force encode") {
    val dd = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = graft.operators.BpeTokenizer.tokenCounts(dd, "lang", "text", 24)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val rows = dd.select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = rows.flatMap(_._2.trim.toLowerCase.split("\\s+"))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val ranks = Bpe.train(vocab, 24).zipWithIndex.toMap
    val enc = vocab.keys.map(w => w -> Bpe.encode(w, ranks).length.toLong).toMap
    val want = rows.groupBy(_._1).map { case (lang, ds) =>
      val toks = ds.map(_._2.trim.toLowerCase.split("\\s+").toSeq)
      (lang, ds.length.toLong, toks.map(_.size.toLong).sum,
        toks.map(_.map(enc).sum).sum)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq === want)
  }
}
