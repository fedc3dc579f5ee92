package graft

import graft.core.Tier
import graft.operators.Rollup
import graft.queries._
import graft.sources.TokenTable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Every query has a matching DuckDB oracle in [[oracleSql]] unless its
 * semantics are not SQL-expressible (then it gets a rows-only check plus a
 * ScalaTest golden/property suite).
 *
 * Oracle determinism discipline: all aggregates that cross rows are exact
 * (integer/long, or decimal for money columns; fixed-point for float
 * similarity); doubles only appear as final derived values, so Spark and
 * DuckDB hash identically regardless of aggregation order.
 */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
   * the 1-minute retention tier of the token rollup engine. */
  def entry(spark: SparkSession): DataFrame =
    Rollup.rollupFromPoints(
      TokenTable.points(spark, "/root/testdata/sf0.001"),
      Tier.OneMinute)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TokenRollupQueries.q ++
      TimeSeriesQueries.q ++
      RelationalQueries.q ++
      CodecQueries.q ++
      PipelineQueries.q ++
      EvalQueries.q ++
      MetricQueries.q ++
      StatQueries.q ++
      ResampleQueries.q ++
      IngestQueries.q

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
   * parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    TokenRollupQueries.oracle ++
      TimeSeriesQueries.oracle ++
      RelationalQueries.oracle ++
      CodecQueries.oracle ++
      PipelineQueries.oracle ++
      EvalQueries.oracle ++
      MetricQueries.oracle ++
      StatQueries.oracle ++
      ResampleQueries.oracle ++
      IngestQueries.oracle
}
