package graft.tools

import org.apache.spark.sql.SparkSession
import graft.layout.LayoutWriter
import graft.layout.LayoutWriter.LayoutSpec

/** File-size spread evidence for the byte-balanced curve writer (r17
  * VERDICT Next #1 "Done" bar): lay out a table under the Rq6 lineitem
  * config (hive partitions + record keys) and report the DATA-file size
  * distribution — r17's row-count cuts landed 2.4–7 MB files on the
  * sf10 hilbert lineitem (max/median ≈ 2.9×), straggling full-scan
  * task waves; the byte-balance post-pass must hold max/median ≤ 1.5×.
  *
  * Usage: runMain graft.tools.SpreadCheck [srcParquet] [layout]
  *   [filesPerTable] [outJson]
  */
object SpreadCheck {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/sf10/lineitem.parquet")
    val layout = args.lift(1).getOrElse("hilbert")
    val numFiles = args.lift(2).map(_.toInt).getOrElse(64)
    val out = args.lift(3).getOrElse(s"results/spread_${layout}.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("graft_spread").toString
    try {
      // the Rq6 L1 lineitem scenario config (cli/Rq6.scala)
      LayoutWriter.write(spark.read.parquet(src), work,
        LayoutSpec(layout,
          if (layout == "baseline") Nil else Seq("l_shipdate", "l_discount"),
          numFiles = Some(numFiles),
          recordKeys = Seq("l_orderkey", "l_linenumber"),
          precombineCol = Some("l_shipdate"),
          partitionBy = Seq("l_returnflag", "l_linestatus")))
      val sizes = {
        def walk(f: java.io.File): Seq[java.io.File] =
          Option(f.listFiles).map(_.toSeq.flatMap(walk)).getOrElse(Seq(f))
        walk(new java.io.File(work))
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(_.length).sorted
      }
      require(sizes.nonEmpty, "no data files written")
      def mb(v: Double) = v / 1048576.0
      val median = sizes(sizes.length / 2).toDouble
      val p90 = sizes((sizes.length * 9) / 10).toDouble
      val mx = sizes.last.toDouble
      val f3 = (v: Double) => "%.3f".formatLocal(java.util.Locale.ROOT, v)
      val json = s"""{"src":"$src","layout":"$layout","files":${sizes.length},""" +
        s""""median_mb":${f3(mb(median))},"p90_mb":${f3(mb(p90))},""" +
        s""""max_mb":${f3(mb(mx))},"min_mb":${f3(mb(sizes.head.toDouble))},""" +
        s""""spread_max_over_median":${f3(mx / median)}}"""
      val op = java.nio.file.Paths.get(out)
      if (op.getParent != null) java.nio.file.Files.createDirectories(op.getParent)
      java.nio.file.Files.writeString(op, json + "\n")
      println(json)
    } finally {
      graft.cli.Scenario.deleteRec(new java.io.File(work))
      spark.stop()
    }
  }
}
