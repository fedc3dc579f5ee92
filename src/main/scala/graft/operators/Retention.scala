package graft.operators

import graft.core.Tier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Retention enforcement — the third noun of the north rule's "rollup +
 * downsample + retention engine": each tier keeps a bounded window of
 * history, and expiry is COMPACT-THEN-EXPIRE (the TimescaleDB
 * retention-policy shape): a fine-tier row older than the horizon may be
 * dropped only where the coarser tier already aggregates its window —
 * rows whose coverage is missing (a cascade that has not caught up, a
 * backfilled source) are retained and flagged, never silently lost.
 *
 * Reference ancestor: the retention-tier ladder itself (SURVEY §2.4);
 * the expiry policy has no direct reference op (the reference keeps all
 * history) and is brief-level: a 100 TB/day tier store is unbounded
 * without it.
 *
 * Scale shape:
 *  - [[expire]] is a single comparison filter on `window_start` — it
 *    reaches the scan as a pushed-down predicate (PlanSpec), and on a
 *    date/window-partitioned tier table it prunes whole partitions, so
 *    expiry cost is proportional to the SURVIVING data read, not history.
 *  - [[safeExpire]] joins only the EXPIRED slice (bounded by the horizon,
 *    not by history) against the coarse tier restricted to the same
 *    range, keyed on (source, bucket, coarse window). Both sides shrink
 *    with the horizon; AQE picks broadcast when the pruned coarse side is
 *    small. No collect, no driver loop — the verdict is a join column.
 */
object Retention {

  /** Keep rows at or after `horizonStart` (tier windows are closed-open,
   * so a window starting at the horizon is entirely inside it). Pure
   * pushed-down filter. */
  def expire(tierDf: DataFrame, horizonStart: Long): DataFrame =
    tierDf.filter(col("window_start") >= horizonStart)

  /** Compact-then-expire: returns the surviving fine-tier rows with a
   * `retained_uncovered` flag — false for rows inside the horizon, true
   * for rows OLDER than the horizon kept because the coarse tier has no
   * aggregate for their (source, bucket, coarse window) yet. Covered
   * expired rows are dropped. */
  def safeExpire(
      fine: DataFrame,
      coarse: DataFrame,
      coarseTier: String,
      horizonStart: Long): DataFrame = {
    val w = Tier.widths(coarseTier)
    // coverage key set, pruned to the expired range before the join
    val cov = coarse
      .filter(col("window_start") < horizonStart)
      .select(
        col("source").as("_cs"),
        col("bucket").as("_cb"),
        col("window_start").as("_cw"))
    val live = fine
      .filter(col("window_start") >= horizonStart)
      .withColumn("retained_uncovered", lit(false))
    val uncovered = fine
      .filter(col("window_start") < horizonStart)
      .join(
        cov,
        // the coverage key keeps the column's own integer type (no INT
        // cast): an epoch-scale BIGINT window_start must not wrap into a
        // silently-mismatched coverage key
        col("source") === col("_cs") && col("bucket") === col("_cb") &&
          expr(s"window_start - window_start % $w") === col("_cw"),
        "left_anti")
      .withColumn("retained_uncovered", lit(true))
    live.unionByName(uncovered)
  }
}
