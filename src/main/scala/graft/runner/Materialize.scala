package graft.runner

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
  */
object Materialize {

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist + eagerly materialize a frame consumed by multiple plan
    * branches; ownership passes to the next [[releaseAll]] caller.
    */
  def track(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(df)
    df.count()
    df
  }

  /** Persist + register a frame whose caller runs its own eager
    * materializing action immediately after (an action that scans every
    * partition, e.g. a full-frame aggregate) — one job instead of
    * [[track]]'s count plus the action. The caller owns the guarantee
    * that the action really touches all partitions before the frame
    * feeds multiple plan branches.
    */
  def trackLazy(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(df)
    df
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
    var df = tracked.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      df = tracked.poll()
    }
    var rdd = trackedRdds.poll()
    while (rdd != null) {
      try rdd.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      rdd = trackedRdds.poll()
    }
  }
}
