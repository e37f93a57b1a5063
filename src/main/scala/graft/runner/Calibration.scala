package graft.runner

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Host-drift calibration for the bench sweep (round-15 VERDICT Next #1).
  *
  * BENCH_r15 read +23 % over r14 with byte-identical plan shapes — pure
  * environment drift on a shared host (task deser 1.52x, task GC 1.31x,
  * scheduler delay 1.15x, all inflated uniformly), and proving that took
  * judge-side forensics. These two fixed probes make the drift a number
  * IN the artifact:
  *
  *  - `cpuProbe` — a deterministic codegen kernel (sum of xxhash64 over
  *    a fixed `range`) with no IO, no shuffle beyond the final 32->1
  *    partial-agg collect: it moves with CPU contention/steal and JVM
  *    pressure, the r15 drift signature.
  *  - `scanProbe` — a fixed parquet aggregate over the sweep's own
  *    lineitem table: it additionally moves with page cache and IO.
  *
  * The sweep runs both FIRST and LAST (drift within the run is visible,
  * not just across runs) and records raw seconds plus the ratio to the
  * reference constants below, measured on the dev host at a quiet
  * moment. `drift` = the mean cpu ratio; the printed headline carries
  * `total_normalized = total / drift` next to the raw total, so a
  * cross-round comparison (r16 vs r15) starts from drift-corrected
  * numbers automatically. The raw total remains the number graded
  * against BASELINE.md — normalization is triage metadata, not a
  * scoring rewrite.
  */
object Calibration {

  /** Reference probe seconds: local[32], this container, 2026-08-15,
    * sf0.1 lineitem (~600k rows). Measured as the settled value over
    * three consecutive measure() calls (0.355-0.388 cpu / 0.133-0.179
    * scan); the first call in a fresh JVM still reads ~8 % high after
    * its warmups, so ratios carry a ~±10 % noise floor — the r15-style
    * drift this exists to catch is +20-25 %. A different host/sf simply
    * yields a different stable ratio; only cross-round consistency
    * matters.
    */
  val CpuRefSec = 0.37
  val ScanRefSec = 0.155

  /** 2^31 xxhash64 evaluations across 32 partitions — ~1 s at the
    * reference; fully codegen'd, result deterministic.
    */
  private val CpuRows = 2147483648L

  /** Reference seconds for [[jobsOnce]]: pinned 2026-08-15 on the quiet
    * host (an end-of-sweep measure read 0.68 after external load
    * receded; measures under loadavg ~2 read 0.93–0.97 — that spread IS
    * the drift mode this probe detects). Per tiny job ~29 ms of
    * planning + dispatch — the fixed-latency tax every small query in
    * the sweep pays, which is exactly the component external host load
    * inflates. Only cross-round consistency of the ratio matters.
    */
  val JobsRefSec = 0.70

  /** Tiny jobs per [[jobsOnce]] batch. A saturating single-stage probe
    * misses the drift mode where a shared host's EXTERNAL load inflates
    * per-task scheduling/dispatch overhead while bulk CPU throughput
    * stays ~flat (observed: external loadavg ~6 read cpu_ratio 0.99
    * while the sweep's many-small-stage queries inflated 1.17x
    * uniformly, sched_ms/deser_ms up across the board). 24 two-task
    * jobs time exactly that dispatch path.
    */
  private val JobsN = 24

  case class Probe(cpuSec: Double, scanSec: Double, jobsSec: Double) {
    def cpuRatio: Double = if (CpuRefSec > 0) cpuSec / CpuRefSec else 1.0
    def scanRatio: Double = if (ScanRefSec > 0) scanSec / ScanRefSec else 1.0
    def jobsRatio: Double = if (JobsRefSec > 0) jobsSec / JobsRefSec else 1.0
    def json: String =
      f"""{"cpu_sec":$cpuSec%.3f,"scan_sec":$scanSec%.3f,""" +
        f""""jobs_sec":$jobsSec%.3f,"cpu_ratio":$cpuRatio%.3f,""" +
        f""""scan_ratio":$scanRatio%.3f,"jobs_ratio":$jobsRatio%.3f}"""
  }

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def cpuOnce(spark: SparkSession): Double = time {
    // double sum: the session runs ANSI mode and 2^31 hash longs
    // overflow a BIGINT accumulator
    spark.range(0L, CpuRows, 1L, 32)
      .select(sum(xxhash64(col("id")).cast("double"))).collect()
  }

  private def scanOnce(spark: SparkSession, sfDir: String): Double = time {
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice"))).collect()
  }

  private def jobsOnce(spark: SparkSession): Double = time {
    var i = 0
    while (i < JobsN) {
      spark.range(0L, 2048L, 1L, 2).select(sum(col("id"))).collect()
      i += 1
    }
  }

  /** Two warmups + min of three measured runs per probe: the FIRST
    * calibration fires on a cold session where one warmup still leaves
    * ~25 % of JIT warmup in the measurement (observed 0.53 vs 0.35 s),
    * which would masquerade as start-of-run drift.
    */
  def measure(spark: SparkSession, sfDir: String): Probe = {
    (1 to 4).foreach(_ => cpuOnce(spark))
    val cpu = Seq.fill(3)(cpuOnce(spark)).min
    val scan =
      try {
        (1 to 4).foreach(_ => scanOnce(spark, sfDir))
        Seq.fill(3)(scanOnce(spark, sfDir)).min
      } catch { case scala.util.control.NonFatal(_) => -1.0 }
    jobsOnce(spark); jobsOnce(spark)
    val jobs = Seq.fill(3)(jobsOnce(spark)).min
    Probe(cpu, scan, jobs)
  }
}
