package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Series analytics over the token table and its tiers: window outlier
 * detection, exponential smoothing, and cross-source correlation — the
 * observability layer a tier-timeseries store grows once the rollups
 * exist (outlier flags per window, smoothed levels, correlated sources).
 *
 * Arithmetic discipline matches the tier ladder: every aggregate that
 * crosses rows is an exact integer; doubles appear only in fixed
 * derivation expressions over those exact operands, so a SQL engine
 * running the same formula reproduces each value bit-for-bit.
 */
object SeriesAnalytics {

  /** Per-patch z-score outlier counts over the raw token arrays. A
   * point is an outlier when |x - mean| > z * sqrt(var) with mean and
   * sample variance derived from the patch's own exact sums (the tier
   * varExpr derivation). Computed entirely by the `arr_zscore_outliers`
   * row kernel: no explode, no shuffle — at 100 TB this is a map over
   * the document scan, embarrassingly parallel. */
  def patchOutliers(
      raw: DataFrame,
      width: Int,
      z: Double): DataFrame = {
    graft.functions.GraftFunctions.register(raw.sparkSession)
    raw
      .select(
        col("doc_id"),
        col("source"),
        col("n_tok"),
        posexplode(
          call_function("arr_zscore_outliers", col("tokens"), lit(width), lit(z)))
          .as(Seq("patch_idx", "n_outliers")))
      .select(
        col("doc_id"),
        col("source"),
        col("patch_idx"),
        least(lit(width), col("n_tok") - col("patch_idx") * width)
          .cast("int")
          .as("patch_len"),
        col("n_outliers"))
  }

  /** Final EWMA(alpha = 1/2) level per document, first-element seeded —
   * the SQL `list_reduce` fold shape, so the oracle replays the exact
   * IEEE op sequence. Row-local kernel: zero shuffles. */
  def ewmaLevels(raw: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(raw.sparkSession)
    raw.select(
      col("doc_id"),
      col("source"),
      col("n_tok"),
      call_function("arr_ewma_half", col("tokens")).as("ewma_half"))
  }

  /** Continuous alerting over a tier: windows whose `valueCol` exceeds
   * `threshold` for at least `k` STRICTLY ADJACENT windows (gap-free
   * runs — a missing window breaks the run, the conservative alerting
   * convention). Classic gaps-and-islands: island key = window index
   * minus the breach's rank, one row per breaching window annotated
   * with its run length, filtered to runs >= k.
   *
   * Deterministic cross-engine: the breach compare is on the tier's
   * derived double (exact-int derivation), ordering is by the unique
   * window_start, and the island arithmetic is integer. One shuffle on
   * the tier's own key. */
  def consecutiveBreaches(
      tier: DataFrame,
      valueCol: String,
      threshold: Double,
      k: Int,
      windowWidth: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val byKey = Window
      .partitionBy(col("source"), col("bucket"))
      .orderBy(col("window_start"))
    val breaches = tier
      .filter(col(valueCol) > threshold)
      .withColumn(
        "island",
        // integer DIV, not double division: double round-trips are exact
        // only below 2^53, and window_start may one day carry epoch-scale
        // values; DIV matches the oracle's // semantics on the whole domain
        expr(s"window_start DIV $windowWidth") - row_number().over(byKey))
    val runs = Window.partitionBy(col("source"), col("bucket"), col("island"))
    breaches
      .withColumn("run_len", count(lit(1)).over(runs).cast("int"))
      .filter(col("run_len") >= k)
      .select(
        col("source"),
        col("bucket"),
        col("window_start"),
        col(valueCol).as("value"),
        col("run_len"))
  }

  /** Exact distinct-value cardinality per tier window — the
   * cardinality-monitoring face of the tier store. Spark executes
   * countDistinct as a two-phase aggregate: map-side (key, tok) dedup
   * bounds the shuffle by distinct pairs, not points. */
  def windowCardinality(points: DataFrame, windowWidth: Int): DataFrame =
    points
      .groupBy(
        col("source"),
        expr(s"CAST(pos DIV ${graft.core.Tier.BucketWidth} AS INT)").as("bucket"),
        expr(s"CAST(pos - pos % $windowWidth AS INT)").as("window_start"))
      .agg(
        countDistinct(col("tok")).as("n_distinct"),
        count(lit(1)).as("cnt_tok"))

  /** Exact top-k heavy-hitter tokens per (source, bucket), ties broken
   * toward the smaller token — groupBy count then a per-key window
   * rank over the (already tiny) per-token aggregate. */
  def heavyHitters(points: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val rank = Window
      .partitionBy(col("source"), col("bucket"))
      .orderBy(col("cnt").desc, col("tok").asc)
    points
      .groupBy(
        col("source"),
        expr(s"CAST(pos DIV ${graft.core.Tier.BucketWidth} AS INT)").as("bucket"),
        col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= k)
  }

  /** Exact fixed-bin value histogram per (source, bucket): one count
   * row per occupied bin, bin = tok DIV binWidth. The fixed-memory
   * distribution sketch of the tier store — one partial-aggregated
   * groupBy whose shuffle volume is bounded by
   * |sources|x|buckets|x|bins|, never the point count. */
  def tierHistogram(points: DataFrame, binWidth: Int): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    points
      .groupBy(
        col("source"),
        expr(s"CAST(pos DIV ${graft.core.Tier.BucketWidth} AS INT)").as("bucket"),
        expr(s"CAST(tok DIV $binWidth AS INT)").as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Median bin per (source, bucket) from the exact histogram: the
   * smallest bin whose cumulative count reaches half the total — the
   * histogram-quantile path that replaces a full sort at scale. Pure
   * integer arithmetic (2*cum >= total avoids division). */
  def histogramMedianBin(hist: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(col("source"), col("bucket"))
    val cum = byKey.orderBy(col("bin"))
    hist
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("total_cnt", sum(col("cnt")).over(byKey))
      .filter(col("cum") * 2 >= col("total_cnt"))
      .groupBy(col("source"), col("bucket"))
      .agg(min(col("bin")).as("p50_bin"), min(col("total_cnt")).as("total_cnt"))
  }

  /** Trailing-k-window rolling stats over a tier: per (source, bucket)
   * ordered by window_start, the exact sums of the last k windows and
   * the derived rolling average token. One shuffle on the tier's own
   * key; window frames never leave the partition. */
  def rollingTierStats(tier: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val frame = Window
      .partitionBy(col("source"), col("bucket"))
      .orderBy(col("window_start"))
      .rowsBetween(-(k - 1), 0)
    tier
      .select(col("source"), col("bucket"), col("window_start"), col("sum_tok"), col("cnt_tok"))
      .withColumn("roll_sum", sum(col("sum_tok")).over(frame))
      .withColumn("roll_pts", sum(col("cnt_tok")).over(frame))
      .withColumn(
        "roll_avg",
        col("roll_sum").cast("double") / col("roll_pts").cast("double"))
  }

  /** Exact-integer Pearson correlation between sources over their
   * ALIGNED tier windows: for each source pair (a < b), correlate the
   * window sums at identical (bucket, window_start) keys. All six
   * accumulated moments are exact BIGINTs (window sums < 2^25 at the
   * tested scales, squared products < 2^60 summed over < 2^8 windows);
   * the final correlation combines them in one fixed double formula —
   * bit-reproducible cross-engine. Null when either side has zero
   * variance across the aligned windows.
   *
   * Scale shape: the input is a TIER (already 1/window-width the size
   * of the points); the self-join shuffles on the window key and each
   * window emits |sources-in-window|^2 pair rows that partial-aggregate
   * map-side to one row per source pair. CARDINALITY WARNING for anyone
   * copying this pattern: the per-window pair fan-out is quadratic in
   * the sources sharing a window BEFORE the map-side collapse — fine at
   * survey-scale source counts (tens to hundreds), but at 10^4+
   * co-windowed sources the intermediate explodes 10^8-fold per window;
   * that regime needs blocking (correlate within source groups) or a
   * sketch, not this exact all-pairs join. */
  def sourceCorrelation(tier: DataFrame): DataFrame = {
    val a = tier.select(
      col("source").as("source_a"),
      col("bucket"),
      col("window_start"),
      col("sum_tok").as("x"))
    val b = tier.select(
      col("source").as("source_b"),
      col("bucket"),
      col("window_start"),
      col("sum_tok").as("y"))
    a.join(b, Seq("bucket", "window_start"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(
        count(lit(1)).as("n_win"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn(
        "corr",
        expr("""
          CASE WHEN CAST(n_win AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                AND CAST(n_win AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
          THEN (CAST(n_win AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (SQRT(CAST(n_win AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * SQRT(CAST(n_win AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
          ELSE NULL END"""))
  }
}
