package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scale probe for the LSH band join: times
  * EmbeddingLsh.candidatePairs on deterministic unit-vector corpora of
  * growing size, with the width PINNED at the gate's 16 planes vs
  * DERIVED from the corpus size (defaultNumPlanes). Shows the fixed
  * width going quadratic-ish while the derived width stays near-linear
  * — the scaling rule the operator doc states, made measurable.
  * Usage: runMain graft.tools.LshScaleProbe [n1,n2,...]
  */
object LshScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args(0).split(",").map(_.trim.toInt).toSeq
      else Seq(2000, 20000, 60000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (n <- sizes) {
      val e = spark.range(n).map { i =>
        val rnd = new scala.util.Random(i)
        val v = Array.fill(64)(rnd.nextFloat() - 0.5f)
        val norm = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
        (i, v.map(_ / norm))
      }.toDF("vec_id", "embedding")
      val derived = graft.operators.EmbeddingLsh.defaultNumPlanes(n)
      for ((label, planes) <- Seq("pinned16" -> 16, s"derived$derived" -> derived)) {
        // one warmup + best-of-2, same protocol as Bench
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val c = graft.operators.EmbeddingLsh
            .candidatePairs(e, planes, 4, maxBucket = 256).count()
          graft.runner.Materialize.releaseAll()
          ((System.nanoTime() - t0) / 1e9, c)
        }
        once()
        val (t1, c) = once(); val (t2, _) = once()
        println(f"[lsh-scale] n=$n%6d $label%-10s pairs=$c%10d time=${math.min(t1, t2)}%.2f s")
      }
    }
    spark.stop()
  }
}
