package graft.layout

import graft.SparkTestBase
import graft.layout.LayoutWriter.LayoutSpec
import org.apache.spark.sql.functions._

/** [[Compactor.heal]]: the fold path compacts stores routinely
  * (round-15 amortized store compaction), so the compact swap's crash
  * windows must self-heal — rollback when the store vanished or holds
  * an uncommitted manifest, cleanup when only the backup lingered.
  */
class CompactorHealSuite extends SparkTestBase {

  private def mkTable(dir: String): Unit =
    LayoutWriter.write(
      spark.range(20000).withColumn("v", rand(3)).toDF(),
      dir, LayoutSpec("linear", Seq("id"), numFiles = Some(4)))

  private def rows(dir: String): Long = spark.read.parquet(dir).count()

  test("crash window (a): dir renamed away — heal rolls the backup home") {
    val dir = tmpDir("heal_a") + "/t"
    mkTable(dir)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".compact_old"))
    Compactor.heal(dir)
    assert(rows(dir) == 20000)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir + ".compact_old")))
  }

  test("crash window (b): manifest whose files are missing — heal rolls back wholesale") {
    val dir = tmpDir("heal_b") + "/t"
    mkTable(dir)
    // With rooted manifests the classic half-swap self-heals by rebase
    // (the tmp-written manifest rebases onto the renamed dir and is
    // then CORRECT — a roll-forward handled as window (c)). The
    // remaining rollback shape is a dir whose manifest references
    // files that do not exist here even after rebase, with the
    // pre-compact store intact under .compact_old.
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".compact_old"))
    val m = ZoneMap.read(dir + ".compact_old") // rebased to the backup
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    ZoneMap.write(dir, m.copy(files = m.files.map(f =>
      f.copy(path = f.path.replace(".compact_old", "") + ".missing"))))
    Compactor.heal(dir)
    assert(rows(dir) == 20000)
    assert(ZoneMap.read(dir).files.forall(f => java.nio.file.Files.exists(
      java.nio.file.Paths.get(new org.apache.hadoop.fs.Path(f.path).toUri.getPath))))
  }

  test("crash window (c): committed dir + stale backup — heal just cleans up") {
    val dir = tmpDir("heal_c") + "/t"
    mkTable(dir)
    val bak = java.nio.file.Paths.get(dir + ".compact_old")
    java.nio.file.Files.createDirectories(bak)
    java.nio.file.Files.writeString(bak.resolve("junk.parquet"), "x")
    Compactor.heal(dir)
    assert(rows(dir) == 20000)
    assert(!java.nio.file.Files.exists(bak))
    // and a real compact on the healed table still works end-to-end
    val m = Compactor.compact(spark, dir, 8L * 1024 * 1024)
    assert(m.totalRows == 20000)
  }
}
