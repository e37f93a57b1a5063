package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: phase timing for q69 (pair generation vs CC loop) at a
  * given SF dir. Not part of the gate.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n1 = graft.queries.DedupQueries.pairsForProbe(spark, sfDir, "simhash").count()
      val t1 = System.nanoTime()
      val n2 = graft.queries.DedupQueries.pairsForProbe(spark, sfDir, "minhash").count()
      val t2 = System.nanoTime()
      val edges = graft.queries.DedupQueries.pairsForProbe(spark, sfDir, "simhash")
        .select("da", "db")
        .unionAll(graft.queries.DedupQueries.pairsForProbe(spark, sfDir, "minhash"))
      val cc = graft.operators.ConnectedComponents.run(edges)
      val n3 = cc.count()
      val t3 = System.nanoTime()
      graft.runner.Materialize.releaseAll()
      println(f"rep$rep simhash=${(t1 - t0) / 1e9}%.2fs($n1) " +
        f"minhash=${(t2 - t1) / 1e9}%.2fs($n2) cc=${(t3 - t2) / 1e9}%.2fs($n3 nodes)")
    }
    spark.stop()
  }
}
