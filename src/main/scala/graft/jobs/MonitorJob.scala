package graft.jobs

import graft.operators.SeriesAnalytics
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The observability job over a committed tier: consecutive-breach alerts
 * and CUSUM drift alarms computed from the LATEST tier snapshot and
 * committed as their own snapshot tables — the production face of the
 * q_tier_alerts / q_cusum query surfaces, with the engine's job
 * discipline (RollupJob/DedupJob):
 *
 *  - exactly-once per (tier version, parameters): both stage fingerprints
 *    chain on the tier snapshot uid, so rerunning on an unchanged tier
 *    resumes both stages, and a NEW tier version recomputes exactly the
 *    monitoring suffix;
 *  - counters ride the stages' own writes via observe (zero extra
 *    scans), landing in the metrics table beside the rollup/dedup
 *    telemetry;
 *  - only ALARMING rows are committed for the CUSUM surface (output
 *    bounded by incidents, not windows; the full statistic is
 *    recomputable from the tier by construction).
 *
 * Scale shape: both operators are one window pass over the
 * (cardinality-bounded) tier — see [[SeriesAnalytics.consecutiveBreaches]]
 * and [[SeriesAnalytics.cusum]]; nothing here touches raw points.
 */
object MonitorJob {

  /** `alertRows` / `alarmRows` are -1 when their stage resumed (the
   * metrics table holds the computing run's values). */
  final case class Result(
      alerts: SnapshotInfo,
      cusum: SnapshotInfo,
      alertRows: Long,
      alarmRows: Long,
      resumed: Boolean)

  def run(
      spark: SparkSession,
      store: SnapshotStore,
      tierTable: String = "tier_1m",
      alertValueCol: String = "avg_tok",
      alertThreshold: Double,
      alertMinRun: Int,
      windowWidth: Int,
      cusumValueCol: String = "sum_tok",
      cusumK: Long,
      cusumH: Long): Result = {
    val tierSnap = store
      .latest(tierTable)
      .getOrElse(throw new IllegalStateException(
        s"MonitorJob: no committed $tierTable snapshot to monitor — run the " +
          "rollup job first"))
    val tier = store.read(spark, tierSnap)

    val aObs = Observation(s"monitor-alerts-${tierSnap.uid}")
    val (alertsSnap, aResumed) = store.getOrCompute(
      "tier_alerts",
      "monitor_alerts",
      s"tier=${tierSnap.uid};v=$alertValueCol;t=$alertThreshold;k=$alertMinRun;w=$windowWidth") {
      SeriesAnalytics
        .consecutiveBreaches(tier, alertValueCol, alertThreshold, alertMinRun, windowWidth)
        .observe(aObs, count(lit(1)).as("alert_rows"))
    }
    val alertRows =
      if (aResumed) -1L else aObs.get("alert_rows").asInstanceOf[Long]

    val cObs = Observation(s"monitor-cusum-${tierSnap.uid}")
    val (cusumSnap, cResumed) = store.getOrCompute(
      "tier_cusum_alarms",
      "monitor_cusum",
      s"tier=${tierSnap.uid};v=$cusumValueCol;k=$cusumK;h=$cusumH") {
      SeriesAnalytics
        .cusum(tier, cusumValueCol, cusumK, cusumH)
        .filter(col("alarm"))
        .observe(cObs, count(lit(1)).as("alarm_rows"))
    }
    val alarmRows =
      if (cResumed) -1L else cObs.get("alarm_rows").asInstanceOf[Long]

    if (!aResumed || !cResumed) {
      val v = cusumSnap.version.toLong
      val rows =
        (if (aResumed) Seq.empty
         else Seq(("monitor", alertsSnap.version.toLong, "alert_rows", alertRows.toDouble))) ++
          (if (cResumed) Seq.empty
           else Seq(("monitor", v, "alarm_rows", alarmRows.toDouble)))
      val metricsDf = spark
        .createDataFrame(rows)
        .toDF("stage", "snapshot_id", "metric", "value")
      store.commit(
        metricsDf, "metrics", "metrics_monitor",
        s"a=${alertsSnap.uid};c=${cusumSnap.uid}")
    }
    Result(alertsSnap, cusumSnap, alertRows, alarmRows, aResumed && cResumed)
  }
}
