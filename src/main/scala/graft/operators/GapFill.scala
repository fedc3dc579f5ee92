package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-fill: dense time spine + last-observation-carried-forward.
 *
 * Semantic ancestors in the reference:
 *  - dense spine: `AddTimeIndex` (0..T-1 index per series,
 *    uni2ts/src/uni2ts/transform/feature.py:74-104) + `EvalPad` NaN-padding
 *    (transform/pad.py:83-104);
 *  - LOCF: `LastValueImputation` forward-fill
 *    (transform/imputation.py:43-62).
 *
 * Scale design: the spine is GENERATED per key with `sequence()` + `explode`
 * from that key's own [min, max] window range — no cross join, no driver
 * loop; per-key spine length is bounded by retention-span/width. LOCF is a
 * running `last(_, ignoreNulls)` window, which is one shuffle on the series
 * key followed by an in-partition sort — fill never crosses a series
 * boundary because the window is partitioned by the key (the reference's
 * series-boundary rule, transform/precondition.py:269-274).
 */
object GapFill {

  /** Dense spine: one row per (keys, window) for every `width`-spaced window
   * between each key's min and max observed window value (inclusive). */
  def denseSpine(
      obs: DataFrame,
      keys: Seq[String],
      windowCol: String,
      width: Long): DataFrame = {
    val keyCols = keys.map(col)
    obs
      .groupBy(keyCols: _*)
      .agg(min(col(windowCol)).as("_w0"), max(col(windowCol)).as("_w1"))
      .select(
        keyCols :+ explode(sequence(col("_w0"), col("_w1"), lit(width)))
          .as(windowCol): _*)
  }

  /** Forward-fill every column in `fillCols` with the last non-null value
   * within the key partition ordered by `windowCol`. */
  def locf(
      df: DataFrame,
      keys: Seq[String],
      windowCol: String,
      fillCols: Seq[String]): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(windowCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Full gap-fill: spine ⟕ observations, then LOCF on `fillCols` and
   * constant defaults on `zeroCols` (the reference's DummyValueImputation
   * default for leading gaps, transform/imputation.py:32-40). */
  def gapFill(
      obs: DataFrame,
      keys: Seq[String],
      windowCol: String,
      width: Long,
      fillCols: Seq[String],
      zeroCols: Map[String, Column] = Map.empty): DataFrame = {
    val spine = denseSpine(obs, keys, windowCol, width)
    val joined = spine.join(obs, keys :+ windowCol, "left")
    val filled = locf(joined, keys, windowCol, fillCols)
    zeroCols.foldLeft(filled) { case (d, (c, default)) =>
      d.withColumn(c, coalesce(col(c), default))
    }
  }
}
