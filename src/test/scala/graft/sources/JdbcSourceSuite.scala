package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** S12 JDBC source against the Derby engine Spark ships (embedded —
  * the only database available offline; the Spark-side code path is
  * the same DataSource jdbc relation Postgres would use).
  */
class JdbcSourceSuite extends SparkTestBase {

  private lazy val dbUrl: String = {
    val dir = tmpDir("graft_derby")
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE items (id INT NOT NULL, name VARCHAR(32), price DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?)")
      (1 to 500).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"item$i"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally conn.close()
    url
  }

  test("serial read: schema from driver metadata, rows exact") {
    val df = JdbcSource.read(spark, dbUrl, "items")
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "price"))
    assert(df.count() == 500)
    assert(df.agg(sum(col("price"))).collect()(0).getDouble(0)
      == (1 to 500).map(_ * 1.5).sum)
  }

  test("partitioned read fans out over range-bounded queries, same rows") {
    val df = JdbcSource.read(spark, dbUrl, "items",
      partitionColumn = Some("id"), numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4,
      s"expected 4 JDBC range partitions, got ${df.rdd.getNumPartitions}")
    assert(df.count() == 500)
    // partition bounds cover the whole domain: no row lost or doubled
    assert(df.select(countDistinct(col("id"))).collect()(0).getLong(0) == 500)
  }

  test("date partitionColumn: range fan-out over a DATE stride, rows exact") {
    // separate table with a date column (round-14 VERDICT Next #8: the
    // JDBC partitioner's date/timestamp stride path had no coverage)
    val dir = tmpDir("graft_derby_d")
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE orders_d (id INT NOT NULL, odate DATE, amt DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO orders_d VALUES (?, ?, ?)")
      val d0 = java.time.LocalDate.of(2024, 1, 1)
      (0 until 365).foreach { i =>
        ps.setInt(1, i)
        ps.setDate(2, java.sql.Date.valueOf(d0.plusDays(i)))
        ps.setDouble(3, i * 2.0)
        ps.addBatch()
      }
      ps.executeBatch(); st.close(); ps.close()
    } finally conn.close()
    val df = JdbcSource.read(spark, url, "orders_d",
      partitionColumn = Some("odate"), numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4,
      s"expected 4 date-range partitions, got ${df.rdd.getNumPartitions}")
    assert(df.count() == 365)
    assert(df.select(countDistinct(col("id"))).collect()(0).getLong(0) == 365)
    // a date filter still pushes into the per-partition WHERE
    // (2024 is a leap year: 365 rows from Jan 1 end at Dec 30 -> 30
    // December dates)
    assert(df.filter(col("odate") >= java.sql.Date.valueOf("2024-12-01"))
      .count() == 30)
  }

  test("filters push into the generated WHERE clause") {
    val df = JdbcSource.read(spark, dbUrl, "items")
      .filter(col("id") > 490)
    assert(df.count() == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"filter not pushed to the JDBC scan:\n$plan")
  }
}
