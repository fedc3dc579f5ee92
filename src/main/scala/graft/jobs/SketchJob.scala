package graft.jobs

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
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

  private def commitSketch(
      store: SnapshotStore,
      sketch: DataFrame,
      stage: String,
      fingerprint: String): (SnapshotInfo, Boolean, Option[Long]) = {
    val obs = Observation(s"sketch-$stage-$fingerprint")
    val observed = sketch.observe(obs, count(lit(1)).as("keys"))
    val (snap, resumed) = store.getOrCompute(SketchTable, stage, fingerprint)(observed)
    // a resumed commit never ran the observe action; the key count is the
    // snapshot's own row count (parquet metadata, no data scan)
    val keys = if (resumed) None else Some(obs.get("keys").asInstanceOf[Long])
    (snap, resumed, keys)
  }

  private def commitMetrics(
      spark: SparkSession,
      store: SnapshotStore,
      snap: SnapshotInfo,
      stage: String,
      keys: Long,
      inputPoints: Long): SnapshotInfo = {
    import spark.implicits._
    store.commit(
      Seq(
        ("kmv_sketch", snap.version.toLong, "keys", keys.toDouble),
        ("kmv_sketch", snap.version.toLong, "input_points", inputPoints.toDouble))
        .toDF("job", "version", "metric", "value"),
      "metrics",
      s"metrics_$stage",
      s"sketch=${snap.uid}")
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
    val (snap, resumed, obsKeys) =
      commitSketch(store, Sketches.kmvSketch(points, windowWidth, k), "initial", params)
    val keys = obsKeys.getOrElse(snap.rowCount)
    val metrics = commitMetrics(spark, store, snap, "initial", keys, n)
    Result(snap, metrics, resumed, keys)
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
    val (snap, resumed, obsKeys) = commitSketch(store, merged, "delta", params)
    val keys = obsKeys.getOrElse(snap.rowCount)
    val metrics = commitMetrics(spark, store, snap, "delta", keys, n)
    Result(snap, metrics, resumed, keys)
  }
}
