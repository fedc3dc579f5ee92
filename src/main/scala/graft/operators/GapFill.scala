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

  /** Constant-value imputation (DummyValueImputation,
   * transform/imputation.py:32-40): every missing slot takes a fixed
   * value. Row-local coalesce — the cheapest strategy, and the reference's
   * training default (value 0.0). */
  def fillConstant(df: DataFrame, fillCols: Seq[String], value: Column): DataFrame =
    fillCols.foldLeft(df)((d, c) => d.withColumn(c, coalesce(col(c), value)))

  /** Causal-mean gap-fill — the third imputation strategy of the reference
   * (CausalMeanImputation, transform/imputation.py:65-108): a missing
   * window takes the mean of everything observed up to that point.
   *
   * Exact-integer formulation: the running mean is computed from the
   * cumulative OBSERVED (sum, count) longs — `sum().over()/count().over()`
   * — so the imputed value is one deterministic double division of two
   * exact integers (no cross-row double accumulation), keeping the result
   * bit-exact vs any SQL oracle at any parallelism. (The reference's numpy
   * variant re-weights LOCF-filled values into the mean; we deliberately
   * use the observed-only mean to preserve the exactness discipline.)
   *
   * Output adds `avg_filled` (observed windows keep their own mean) and
   * zero-fills `cntCol`. */
  def gapFillCausalMean(
      obs: DataFrame,
      keys: Seq[String],
      windowCol: String,
      width: Long,
      sumCol: String,
      cntCol: String): DataFrame = {
    val spine = denseSpine(obs, keys, windowCol, width)
    val joined = spine.join(obs, keys :+ windowCol, "left")
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(windowCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("_cum_sum", sum(col(sumCol)).over(w)) // nulls skipped: observed only
      .withColumn("_cum_cnt", sum(col(cntCol)).over(w))
      .withColumn(
        "avg_filled",
        when(
          col(cntCol).isNotNull,
          col(sumCol).cast("double") / col(cntCol).cast("double"))
          .otherwise(col("_cum_sum").cast("double") / col("_cum_cnt").cast("double")))
      .withColumn(cntCol, coalesce(col(cntCol), lit(0L)))
      .drop("_cum_sum", "_cum_cnt")
  }

  /** Linear-interpolation gap-fill — the fourth imputation strategy
   * (pandas `interpolate(method='linear')` semantics on a regular grid):
   * a missing window between two observations takes the straight line
   * between them; leading/trailing gaps (no neighbor on one side) stay
   * NULL so the caller sees un-interpolatable edges explicitly.
   *
   * Exact-integer formulation: the interpolated value is milli fixed
   * point, `prev*1000 + (next - prev)*1000*(t - t_prev) DIV
   * (t_next - t_prev)` — integer division TRUNCATING TOWARD ZERO,
   * which is what both Spark's `DIV` and DuckDB's `//` implement
   * (measured: -7 // 2 = -3 in DuckDB — it does NOT floor), so the
   * milli value hash-matches cross-engine even when the segment
   * decreases (negative numerator). Observed windows carry value*1000.
   *
   * Scale shape: identical to [[gapFill]] — per-key spine generation
   * (no cross join), one shuffle on the series key, and the four
   * neighbor lookups are two frames (unbounded-preceding last +
   * unbounded-following first) over that one in-partition sort. */
  def linearInterpolate(
      obs: DataFrame,
      keys: Seq[String],
      windowCol: String,
      width: Long,
      valueCol: String): DataFrame = {
    val spine = denseSpine(obs, keys, windowCol, width)
    val joined = spine.join(obs, keys :+ windowCol, "left")
    val back = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(windowCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(windowCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined
      .withColumn("_pv", last(col(valueCol), ignoreNulls = true).over(back))
      .withColumn(
        "_pw",
        last(when(col(valueCol).isNotNull, col(windowCol)), ignoreNulls = true)
          .over(back))
      .withColumn("_nv", first(col(valueCol), ignoreNulls = true).over(fwd))
      .withColumn(
        "_nw",
        first(when(col(valueCol).isNotNull, col(windowCol)), ignoreNulls = true)
          .over(fwd))
      .withColumn(
        "_numer",
        (col("_nv").cast("long") - col("_pv").cast("long")) * 1000L *
          (col(windowCol).cast("long") - col("_pw").cast("long")))
      .withColumn("_denom", col("_nw").cast("long") - col("_pw").cast("long"))
      .withColumn(
        "interp_milli",
        when(col(valueCol).isNotNull, col(valueCol).cast("long") * 1000L)
          .when(
            col("_pv").isNotNull && col("_nv").isNotNull,
            col("_pv").cast("long") * 1000L + expr("_numer DIV _denom")))
      .withColumn("filled", col(valueCol).isNull)
      .drop("_pv", "_pw", "_nv", "_nw", "_numer", "_denom")
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
