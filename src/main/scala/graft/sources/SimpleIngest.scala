package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Long/wide ingestion shapes — the engine's analogue of the reference's
 * `SimpleDatasetBuilder` dataframe conversions
 * (uni2ts/src/uni2ts/data/builder/simple.py: `_from_long_dataframe` 40-87,
 * `_from_wide_dataframe` 90-137): a LONG frame (one row per
 * (item, time, value)) folds into one series row per item, and a WIDE
 * frame (one column per item) melts back to long.
 *
 * Scale shape: long→series is ONE groupBy(item) with a row-local
 * sort_array (series length bounded by retention span); wide→long is
 * `unpivot`, a pure row-local generator (zero shuffle).
 */
object SimpleIngest {

  /** Fold a long frame into one row per item carrying the time-ordered
   * series as an array of (orderCols..., value) structs. The struct field
   * order makes `sort_array` the total time order (ties broken by the
   * later order columns, then — because `value` is the struct's trailing
   * field — by the value itself), so the fold is deterministic at any
   * parallelism EVEN when (orderCols) is not unique per item; an external
   * oracle must use the same final value tie-break (q_ingest_long's
   * row_number orders by ts, event_id, value for exactly this reason).
   * The reference gets this for free from its sorted dataframe index. */
  def longToSeries(
      df: DataFrame,
      itemCol: String,
      orderCols: Seq[Column],
      valueCol: Column): DataFrame =
    df.groupBy(col(itemCol))
      .agg(
        sort_array(
          collect_list(
            struct(orderCols.zipWithIndex.map { case (c, i) => c.as(s"o$i") } :+
              valueCol.as("value"): _*))).as("series"))

  /** Melt a wide frame (one value column per item) back to long rows —
   * `_from_wide_dataframe`'s inverse direction, Spark's built-in unpivot.
   * NULL cells (items absent at a time point) are dropped, matching the
   * long frame that produced the wide one. */
  def wideToLong(
      df: DataFrame,
      idCols: Seq[String],
      itemCols: Seq[String],
      itemName: String,
      valueName: String): DataFrame =
    df.unpivot(
        idCols.map(col).toArray,
        itemCols.map(col).toArray,
        itemName,
        valueName)
      .filter(col(valueName).isNotNull)
}
