package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus search CLI over the persisted inverted index — build once,
  * query many times without ever re-reading the text column.
  *
  * Usage:
  *   runMain graft.cli.Search build <sfDir> <indexDir> [numFiles]
  *     tokenize the documents table once; write term-sorted postings
  *     (zone-map layout — term predicates skip files) + doc lengths
  *   runMain graft.cli.Search add <batchDir> <indexDir>
  *     fold a new batch in, O(batch) (SearchIndex.add)
  *   runMain graft.cli.Search optimize <indexDir>
  *     global term re-sort after a run of adds (Compactor-backed)
  *   runMain graft.cli.Search bm25 <indexDir> <term> [term...]
  *     BM25 top-20 (doc_id, score)
  *   runMain graft.cli.Search phrase <indexDir> <term> <term> [term...]
  *     exact-phrase hits (doc_id, n_hits, first_pos)
  */
object Search {

  /** Dispatch, separated from main() so tests drive it with a shared
    * session; returns the printed lines.
    */
  def run(spark: SparkSession, args: Seq[String]): Seq[String] = {
    try {
      args match {
        case Seq("build", sfDir, indexDir, rest @ _*) =>
          val docs = graft.Tables.parallelized(
            graft.Tables.load(spark, sfDir, "documents"))
          graft.operators.SearchIndex.build(docs, "doc_id", "text", indexDir,
            rest.headOption.map(_.toInt).getOrElse(16))
          Seq(s"built $indexDir")
        case Seq("add", batchDir, indexDir) =>
          val batch = graft.Tables.parallelized(
            graft.Tables.load(spark, batchDir, "documents"))
          graft.operators.SearchIndex.add(spark, batch, "doc_id", "text", indexDir)
          Seq(s"added $batchDir into $indexDir")
        case Seq("optimize", indexDir) =>
          graft.operators.SearchIndex.optimize(spark, indexDir)
          Seq(s"optimized $indexDir")
        case Seq("bm25", indexDir, terms @ _*) if terms.nonEmpty =>
          graft.operators.SearchIndex.bm25(spark, indexDir, terms)
            .select(col("doc_id"), round(col("score"), 6).as("score"))
            .orderBy(col("score").desc, col("doc_id")).limit(20)
            .collect().map(r => s"${r.getLong(0)}\t${r.getDouble(1)}").toSeq
        case Seq("phrase", indexDir, terms @ _*) if terms.length >= 2 =>
          graft.operators.SearchIndex.phraseHits(spark, indexDir, terms)
            .orderBy(col("doc_id"))
            .collect().map(r => s"${r.getLong(0)}\t${r.getLong(1)}\t${r.getLong(2)}")
            .toSeq
        case _ => sys.error(
          "usage: Search build <sfDir> <indexDir> [numFiles] | " +
            "add <batchDir> <indexDir> | optimize <indexDir> | " +
            "bm25 <indexDir> <term>... | phrase <indexDir> <term> <term>...")
      }
    } finally graft.runner.Materialize.releaseAll()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args.toIndexedSeq).foreach(println)
    spark.stop()
  }
}
