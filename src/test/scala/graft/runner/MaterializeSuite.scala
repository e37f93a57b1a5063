package graft.runner

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Attribution + eviction-safety contract of [[Materialize]] (round-9
  * ADVICE): frame bytes come from the frame's OWN cached-RDD id, so
  * interleaved caching/unpersisting of other frames cannot misattribute;
  * and budget eviction never touches frames of the live epoch.
  */
class MaterializeSuite extends SparkTestBase {

  test("per-frame bytes are attributed to the frame's own RDD id") {
    import spark.implicits._
    Materialize.releaseAll()
    Materialize.resetDiag()
    val a = Materialize.track(
      (1 to 50000).toDF("n").withColumn("s", md5(col("n").cast("string"))))
    // an unrelated frame cached OUTSIDE the tracker between track() calls
    val noise = (1 to 50000).toDF("n").withColumn("p", col("n") * 2).cache()
    noise.count()
    val b = Materialize.track(
      (1 to 1000).toDF("n").withColumn("s", md5(col("n").cast("string"))))
    // peak covers only tracked frames: a + b, NOT the noise cache.
    // a (50k md5 rows) dwarfs b (1k rows); if b had been sized by a
    // global delta it would have swallowed the noise frame's bytes too.
    val aBytes = storageOf(a)
    val bBytes = storageOf(b)
    assert(aBytes > 0L && bBytes > 0L)
    assert(aBytes > bBytes)
    assert(Materialize.peakTrackedBytes <= aBytes + bBytes)
    assert(Materialize.peakTrackedBytes >= aBytes)
    noise.unpersist(blocking = true)
    Materialize.releaseAll()
  }

  test("interleaved unpersist of a foreign frame does not disturb tracked sizing") {
    import spark.implicits._
    Materialize.releaseAll()
    Materialize.resetDiag()
    val noise = (1 to 50000).toDF("n").withColumn("s", md5(col("n").cast("string"))).cache()
    noise.count()
    // a concurrent unpersist between track()'s persist and its size read
    // made the old global-delta scheme record ~0 or negative bytes
    noise.unpersist(blocking = true)
    val a = Materialize.track(
      (1 to 20000).toDF("n").withColumn("s", md5(col("n").cast("string"))))
    assert(storageOf(a) > 0L)
    assert(Materialize.peakTrackedBytes > 0L)
    Materialize.releaseAll()
  }

  test("budget eviction never victimizes the current epoch") {
    import spark.implicits._
    Materialize.releaseAll()
    Materialize.resetDiag()
    // tiny frames: far under any budget — evictions must stay 0 and, by
    // the epoch rule, would stay 0 even over budget (all same-epoch)
    val a = Materialize.track((1 to 100).toDF("n"))
    val b = Materialize.track((1 to 100).toDF("n"))
    assert(Materialize.evictions == 0)
    assert(a.count() == 100 && b.count() == 100)
    Materialize.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  private def storageOf(df: org.apache.spark.sql.DataFrame): Long = {
    val sc = spark.sparkContext
    org.apache.spark.graftbridge.SparkBridge.drainListenerBus(sc)
    org.apache.spark.sql.graftbridge.Bridge.cachedRddId(df) match {
      case Some(id) => sc.getRDDStorageInfo.filter(_.id == id)
        .map(i => i.memSize + i.diskSize).sum
      case None => 0L
    }
  }
}
