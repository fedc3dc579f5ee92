package graft.jobs

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.UnionBuilder
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The training-data curation funnel as one snapshot-committed job:
 * exact dedup -> benchmark decontamination -> quality verdict -> split
 * assignment, with the per-stage drop counts observed into the store's
 * `metrics` table (the DedupJob telemetry discipline — counters ride
 * `df.observe` on the output's own snapshot write, zero extra scans).
 *
 * Funnel attribution is ordered: a document dropped by an earlier gate
 * is not recounted by a later one (dup -> contaminated -> low-quality),
 * so the four counters partition the corpus exactly and an operator
 * reading the metrics table sees where volume is lost.
 *
 * Every verdict column stays in the output table — the job never
 * destroys rows, it labels them (the keep/drop decision is replayable
 * and auditable downstream, like ConnectedComponents.keepList).
 */
object CurationJob {

  final case class Result(
      curated: SnapshotInfo,
      metrics: SnapshotInfo,
      inputDocs: Long,
      droppedDup: Long,
      droppedContaminated: Long,
      droppedQuality: Long,
      keptDocs: Long)

  /** The funnel's per-document labeling surface — every gate a boolean
   * column, never a dropped row. Shared verbatim by [[run]] (which adds
   * the observed counters and snapshot commit) and the oracle-checked
   * `q_curation_funnel` query, so the end-user-facing labels themselves
   * sit on the hard cross-engine gate, not only on JobSpec counters. */
  def labelDocs(
      docs: DataFrame,
      testDocs: DataFrame,
      n: Int = 8,
      testPermille: Int = 20,
      valPermille: Int = 50): DataFrame = {
    val canonical = Dedup
      .exactDedup(docs, "doc_id", "text")
      .select(col("doc_id"), lit(true).as("canonical"))
    val contam = Dedup
      .decontaminate(docs, testDocs, "doc_id", "text", n)
      .select(col("doc_id"), col("contaminated"))
    val verdict = TextAnalysis
      .curationVerdict(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep").as("quality_ok"))
    UnionBuilder
      .assignSplit(docs.select(col("doc_id"), col("source")), "doc_id", testPermille, valPermille)
      .join(canonical, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      // LEFT joins throughout: a doc the signal stages cannot score
      // (e.g. NULL text never survives the word explode) must still be
      // LABELED — quality defaults to failed, never to row loss, or
      // the funnel's exact-partition invariant silently breaks
      .join(verdict, Seq("doc_id"), "left")
      .withColumn("canonical", coalesce(col("canonical"), lit(false)))
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
      .withColumn("quality_ok", coalesce(col("quality_ok"), lit(false)))
      .withColumn(
        "kept",
        col("canonical") && !col("contaminated") && col("quality_ok"))
  }

  def run(
      spark: SparkSession,
      docs: DataFrame,
      testDocs: DataFrame,
      store: SnapshotStore,
      n: Int = 8,
      testPermille: Int = 20,
      valPermille: Int = 50): Result = {
    // configuration-only fingerprint: the input count is already
    // observed for free on the snapshot write (input_docs) — counting
    // up front would be one redundant full-corpus scan per run
    val params = s"curate-n$n-tp$testPermille-vp$valPermille"

    val obs = Observation("curation_funnel")
    val labeled = labelDocs(docs, testDocs, n, testPermille, valPermille)
      .observe(
        obs,
        count(lit(1)).as("input_docs"),
        count(when(!col("canonical"), lit(1))).as("dropped_dup"),
        count(when(col("canonical") && col("contaminated"), lit(1)))
          .as("dropped_contaminated"),
        count(
          when(col("canonical") && !col("contaminated") && !col("quality_ok"), lit(1)))
          .as("dropped_quality"),
        count(when(col("kept"), lit(1))).as("kept_docs"))
    val curatedSnap = store.commit(labeled, "curated", "curation_funnel", params)

    val input = obs.get("input_docs").asInstanceOf[Long]
    val dup = obs.get("dropped_dup").asInstanceOf[Long]
    val cont = obs.get("dropped_contaminated").asInstanceOf[Long]
    val qual = obs.get("dropped_quality").asInstanceOf[Long]
    val kept = obs.get("kept_docs").asInstanceOf[Long]

    val v = curatedSnap.version.toLong
    val metricsDf = spark
      .createDataFrame(
        Seq(
          ("curation", v, "input_docs", input.toDouble),
          ("curation", v, "dropped_dup", dup.toDouble),
          ("curation", v, "dropped_contaminated", cont.toDouble),
          ("curation", v, "dropped_quality", qual.toDouble),
          ("curation", v, "kept_docs", kept.toDouble),
          ("curation", v, "kept_ratio", if (input > 0) kept.toDouble / input else 0.0)))
      .toDF("stage", "snapshot_id", "metric", "value")
    val metricsSnap =
      store.commit(metricsDf, "metrics", "metrics_curation", s"v$v-${curatedSnap.uid}")
    Result(curatedSnap, metricsSnap, input, dup, cont, qual, kept)
  }
}
