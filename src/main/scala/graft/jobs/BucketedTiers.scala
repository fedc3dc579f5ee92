package graft.jobs

import graft.operators.Rollup
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed tier storage: the co-partitioning discipline for the 100-TB
 * ladder. Tier tables are written `bucketBy(N, source, bucket)` and sorted
 * within buckets, so every downstream reaggregation — whose grouping keys
 * (source, bucket, window') are a SUPERSET of the bucketing keys — reads a
 * table whose HashPartitioning(source, bucket) already satisfies the
 * aggregation's ClusteredDistribution: Catalyst elides the exchange
 * entirely (PlanSpec asserts zero Exchange operators in the plan).
 *
 * At scale this turns the tier cascade 1m→5m→1h→1d into three shuffle-FREE
 * passes over progressively tiny inputs; only the raw→1m rollup ever
 * shuffles. Ancestor: the reference re-groups packed sequences by the same
 * (sample_id, variate_id) keys at every stage without re-packing
 * (module/packed_scaler.py, loss/packed/) — key stability across stages is
 * the whole point of its packed layout.
 */
object BucketedTiers {

  /** Write a tier as a bucketed, sorted table (external at `path`). */
  def writeBucketed(
      tier: DataFrame,
      tableName: String,
      path: String,
      numBuckets: Int): Unit =
    tier.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, "source", "bucket")
      .sortBy("source", "bucket", "window_start")
      .option("path", path)
      .saveAsTable(tableName)

  /** Reaggregate a coarser tier from a bucketed tier table — exchange-free
   * because bucketing keys ⊆ grouping keys. */
  def reaggregateFromTable(
      spark: SparkSession,
      tableName: String,
      toTier: String): DataFrame =
    Rollup.reaggregate(spark.table(tableName), toTier)
}
