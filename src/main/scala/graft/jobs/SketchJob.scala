package graft.jobs

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental cardinality maintenance as a snapshot-committed job: the
 * per-window KMV sketch table is the durable artifact, and each delta
 * batch folds into the latest committed sketch through
 * [[Sketches.mergeSketches]] (kmin(A) ∪ kmin(B) == kmin(A ∪ B)) — the
 * history is NEVER rescanned, which is the whole reason to commit
 * sketches instead of exact distinct counts: exact counts don't merge,
 * so keeping them current costs a full-corpus aggregation per delta
 * (measured in BENCH.md "Sketch vs exact": ~every (key, token) pair
 * through the shuffle), while the sketch fold is one exchange bounded
 * by keys x k.
 *
 * Exactly-once discipline (the DedupJob.runDelta contract): a delta's
 * identity is its CONTENT fingerprint (count + order-free hash sum), so
 * a crash-retried or duplicate-delivered delta RESUMES instead of
 * double-folding — and skipping is correct, not just safe, because
 * folding an already-folded batch is a set-union no-op. Key counts ride
 * `observe` on the commit write itself, zero extra scans.
 */
object SketchJob {

  final case class Result(
      sketch: SnapshotInfo,
      metrics: SnapshotInfo,
      resumed: Boolean,
      keys: Long)

  private val SketchTable = "kmv_sketch"
  private val Keys = Seq("source", "bucket", "window_start")

  /** Content fingerprint of a point batch: count + order-independent
   * xxhash64 sum over the full point identity. */
  private def contentFp(points: DataFrame): (Long, String) = {
    val row = points
      .agg(
        count(lit(1)),
        coalesce(
          sum(xxhash64(col("source"), col("pos"), col("tok")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")))
      .head()
    (row.getLong(0), String.valueOf(row.getDecimal(1)))
  }

  // the key count is the sketch snapshot's own row count — commit()
  // already observes count(1) on the write action (one key per row), so
  // a separate Observation here would just duplicate snap.rowCount

  /** Metrics are keyed on the SKETCH snapshot's uid and committed via
   * getOrCompute, so a resumed (duplicate-delivered) run also resumes
   * its metrics instead of appending a duplicate version per replay —
   * without this, anyone summing input_points across metric versions
   * would double-count every retried delta. */
  private def commitMetrics(
      spark: SparkSession,
      store: SnapshotStore,
      snap: SnapshotInfo,
      stage: String,
      inputPoints: Long): SnapshotInfo = {
    import spark.implicits._
    store
      .getOrCompute("metrics", s"metrics_$stage", s"sketch=${snap.uid}")(
        Seq(
          ("kmv_sketch", snap.version.toLong, "keys", snap.rowCount.toDouble),
          ("kmv_sketch", snap.version.toLong, "input_points", inputPoints.toDouble))
          .toDF("job", "version", "metric", "value"))
      ._1
  }

  /** Initial build: the full corpus's per-window KMV sketch, committed
   * exactly-once per (params, content fingerprint). */
  def run(
      spark: SparkSession,
      points: DataFrame,
      store: SnapshotStore,
      windowWidth: Int,
      k: Int): Result = {
    val (n, fp) = contentFp(points)
    val params = s"w$windowWidth-k$k-n$n-fp$fp"
    val (snap, resumed) = store.getOrCompute(SketchTable, "initial", params)(
      Sketches.kmvSketch(points, windowWidth, k))
    val metrics = commitMetrics(spark, store, snap, "initial", n)
    Result(snap, metrics, resumed, snap.rowCount)
  }

  /** Fold one delta batch into the latest committed sketch. The
   * fingerprint is the delta's CONTENT only (the DedupJob.runDelta
   * discipline, deliberately NOT chained on the base sketch's uid): a
   * crash-retried or duplicate-delivered delta must resume even though
   * its first attempt already advanced the sketch table — and skipping
   * is correct because re-unioning an already-folded batch changes
   * nothing. */
  def runDelta(
      spark: SparkSession,
      deltaPoints: DataFrame,
      store: SnapshotStore,
      windowWidth: Int,
      k: Int): Result = {
    val prev = store
      .latest(SketchTable)
      .getOrElse(throw new IllegalStateException(
        "SketchJob.runDelta: no committed sketch to fold into — run " +
          "SketchJob.run for the initial corpus first"))
    val (n, fp) = contentFp(deltaPoints)
    val params = s"w$windowWidth-k$k-n$n-fp$fp"
    val merged = Sketches.mergeSketches(
      store.read(spark, prev),
      Sketches.kmvSketch(deltaPoints, windowWidth, k),
      Keys,
      k)
    val (snap, resumed) = store.getOrCompute(SketchTable, "delta", params)(merged)
    val metrics = commitMetrics(spark, store, snap, "delta", n)
    Result(snap, metrics, resumed, snap.rowCount)
  }
}
