package graft.jobs

import graft.operators.{ConnectedComponents, Dedup}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The dedup chain as a snapshot-committed job with candidate-volume
 * telemetry: MinHash-sign -> band-bucket -> exact-verify pairs ->
 * connected-components keep-list, with the per-stage candidate counts
 * (pairs generated / verified / dropped, and the kept/dropped document
 * split) emitted into the store's `metrics` table.
 *
 * All pair/document counters ride `df.observe` (the Validity pattern) —
 * they are collected DURING the stage's own snapshot write, zero extra
 * scans — so the linear candidate-density claim the banding rests on
 * (candidates ~ docs x bands, not docs^2; property-tested in
 * PipelineSpec) is also MONITORED on every production run: an operator
 * watching the metrics table sees a band-collision blow-up (skewed
 * shingles, adversarial content) as a candidates_per_doc spike, before it
 * becomes a cluster-wide shuffle explosion. The only non-observe counter
 * is the input doc count — a parquet metadata count, no data scan.
 */
object DedupJob {

  final case class Result(
      pairs: SnapshotInfo,
      keep: SnapshotInfo,
      metrics: SnapshotInfo,
      candidatePairs: Long,
      verifiedPairs: Long,
      keptDocs: Long,
      droppedDocs: Long)

  def run(
      spark: SparkSession,
      docs: DataFrame,
      store: SnapshotStore,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): Result = {
    val nDocs = docs.count()
    val params = s"lsh-n$n-h$numHashes-b$bands-t$threshold-docs$nDocs"

    val (lsh, obsCand, obsVer) =
      Dedup.minHashLshPairsObserved(docs, "doc_id", "text", n, numHashes, bands, threshold)
    val pairsSnap = store.commit(lsh.pairs, "dedup_pairs", "lsh_pairs", params)
    // the committed snapshot is the durable pair set — release the chain's
    // internal shingle cache now (a long-lived session would otherwise
    // accumulate one cached shingle table per distinct corpus run)
    lsh.release()
    val cand = obsCand.get("candidate_pairs").asInstanceOf[Long]
    val ver = obsVer.get("verified_pairs").asInstanceOf[Long]

    val obsKeep = Observation("dedup_keep")
    val keep = ConnectedComponents
      .keepList(docs, "doc_id", store.read(spark, pairsSnap))
      .observe(
        obsKeep,
        count(when(col("keep"), lit(1))).as("kept"),
        count(when(!col("keep"), lit(1))).as("dropped"))
    val keepSnap =
      store.commit(keep, "dedup_keep", "keep_list", s"pairs=${pairsSnap.uid}")
    val kept = obsKeep.get("kept").asInstanceOf[Long]
    val dropped = obsKeep.get("dropped").asInstanceOf[Long]

    val v = keepSnap.version.toLong
    val metricsDf = spark
      .createDataFrame(
        Seq(
          ("dedup_lsh", v, "input_docs", nDocs.toDouble),
          ("dedup_lsh", v, "candidate_pairs", cand.toDouble),
          ("dedup_lsh", v, "verified_pairs", ver.toDouble),
          ("dedup_lsh", v, "rejected_pairs", (cand - ver).toDouble),
          // the density-bound monitor: ~O(bands) per doc when healthy
          ("dedup_lsh", v, "candidates_per_doc",
            if (nDocs > 0) cand.toDouble / nDocs else 0.0),
          ("dedup_lsh", v, "kept_docs", kept.toDouble),
          ("dedup_lsh", v, "dropped_docs", dropped.toDouble)))
      .toDF("stage", "snapshot_id", "metric", "value")
    val metricsSnap =
      store.commit(metricsDf, "metrics", "metrics_dedup_lsh", s"v$v-${keepSnap.uid}")
    Result(pairsSnap, keepSnap, metricsSnap, cand, ver, kept, dropped)
  }
}
