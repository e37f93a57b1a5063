package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query/oracle maps; each module pairs a
  * DataFrame implementation with an equivalent DuckDB SQL oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.LayoutQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.ProfileQueries.queries ++
      graft.queries.MaintenanceQueries.queries ++
      graft.queries.TpchQueries.queries ++
      graft.queries.MediaQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.SearchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
      graft.queries.LayoutQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.SimilarityQueries.oracles ++
      graft.queries.ProfileQueries.oracles ++
      graft.queries.MaintenanceQueries.oracles ++
      graft.queries.TpchQueries.oracles ++
      graft.queries.MediaQueries.oracles ++
      graft.queries.CurationQueries.oracles ++
      graft.queries.SearchQueries.oracles
}
