package graft.tools
import org.apache.spark.sql.SparkSession
object MkIdx {
  def main(args: Array[String]): Unit = {
    val spark = graft.runner.Sessions.tuned(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.layout.KeyIndex.build(spark, args(0))
    println(f"[mkidx] built in ${(System.nanoTime()-t0)/1e9}%.1fs")
    spark.stop()
  }
}
