package graft.cli

import org.apache.spark.sql.SparkSession
import graft.layout.{Compactor, NumBetween, ZoneMap}

/** Compaction CLI — the OPTIMIZE entry point (reference: delta
  * `OPTIMIZE [WHERE]`, delta_write_layout.py:195-219).
  *
  * Usage: runMain graft.cli.Compact <tableDir> [col lo hi]
  *   no predicate  → whole-table bin-packing (L5)
  *   col lo hi     → zone-scoped compaction (L6)
  */
object Compact {
  def main(args: Array[String]): Unit = {
    require(args.length == 1 || args.length == 4,
      "usage: Compact <tableDir> [col lo hi]")
    val dir = args(0)
    val spark = graft.runner.Sessions
      .tuned(SparkSession.builder().master("local[8]"), "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val before = ZoneMap.read(dir)
    val after =
      if (args.length == 4)
        Compactor.compactWhere(spark, dir,
          Seq(NumBetween(args(1), args(2).toDouble, args(3).toDouble)))
      else Compactor.compact(spark, dir)
    println(s"[compact] layout=${before.layout} files ${before.files.length} " +
      s"-> ${after.files.length}, rows ${before.totalRows} -> ${after.totalRows}")
    spark.stop()
  }
}
