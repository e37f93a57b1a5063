package graft.layout

import graft.SparkTestBase
import graft.cli.Incremental

/** RQ7 decay-then-recover invariants (reference
  * figures/rq7_tpch_summary_*.csv): upserted rows land in unclustered
  * files the probe's date-range prune cannot skip, so records read
  * climb with every batch; compaction restores the declared sort order
  * and the probe recovers.
  */
class IncrementalDecaySuite extends SparkTestBase {

  test("upsert batches decay the probe; recluster recovers it") {
    val steps = Incremental.run(spark, "/root/testdata/sf0.001", batches = 3)
    assert(steps.map(_.step) ==
      Seq("batch00", "batch01", "batch02", "batch03", "reclustered"))
    val batchRecs = steps.init.map(_.recordsRead)
    // decay: every upsert batch adds unclustered rows the probe must read
    assert(batchRecs == batchRecs.sorted, s"records not monotone: $batchRecs")
    assert(batchRecs.last > batchRecs.head,
      s"no decay observed: $batchRecs")
    // recovery: the reclustered probe reads less than the decayed one
    val recovered = steps.last.recordsRead
    assert(recovered < batchRecs.last,
      s"recluster did not recover: $recovered vs ${batchRecs.last}")
    // the probe's ANSWER never changes — decay is physical, not logical
    assert(steps.map(_.rows).distinct.size == 1)
  }
}
