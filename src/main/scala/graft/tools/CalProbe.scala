package graft.tools
import org.apache.spark.sql.SparkSession
object CalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master("local[32]"), "32", sfDir).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      val p = graft.runner.Calibration.measure(spark, sfDir)
      println(s"CAL$i ${p.json}")
    }
    spark.stop()
  }
}
