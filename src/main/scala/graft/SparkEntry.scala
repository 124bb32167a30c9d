package graft

import graft.queries.{ParityQueries, PipelineQueries, RelationalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the engine end-to-end: relations from parquet, a filter+join
    * expression, incremental stabilization, typed evaluation.
    */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.joinEqui(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (plus extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.all ++ RelationalQueries.all ++ PipelineQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * `dynamicOracles` holds SQL whose literals (seeded quantizer fits) are
    * captured while the corresponding query runs — this def is evaluated
    * by Verify AFTER all queries, so a full run always includes them.
    */
  def oracleSql: Map[String, String] =
    ParityQueries.oracles ++ RelationalQueries.oracles ++
      PipelineQueries.oracles ++ graft.queries.DynamicOracles.snapshot
}
