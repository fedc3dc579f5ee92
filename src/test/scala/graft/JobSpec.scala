package graft

import java.nio.file.{Files, Path}

import graft.core.Tier
import graft.jobs.{RollupJob, SnapshotStore}
import graft.operators.Rollup
import graft.sources.TokenTable

/** Resumability, lineage and salt-skew correctness of the production job. */
class JobSpec extends SparkSpec {

  private def tmpDir(): Path = Files.createTempDirectory("graft-job-")

  private def tierRows(dir: String, store: SnapshotStore, table: String) =
    store
      .read(spark, store.latest(table).get)
      .collect()
      .map(_.toSeq)
      .toSet

  test("job computes the full ladder and matches the in-memory cascade bit-exactly") {
    val base = tmpDir().toString
    val dir = sf("sf0.001")
    val results = RollupJob.run(spark, dir, base)
    assert(results.size == 5 && results.values.forall(!_.resumed))
    val store = new SnapshotStore(base)
    val ladder = Rollup.ladder(TokenTable.points(spark, dir))
    for (tier <- Seq(Tier.OneMinute, Tier.FiveMinutes, Tier.OneHour, Tier.OneDay)) {
      val want = ladder(tier).collect().map(_.toSeq).toSet
      val got = tierRows(dir, store, s"tier_$tier")
      assert(got == want, s"tier $tier mismatch")
    }
  }

  test("re-run resumes every stage; invalidated suffix recomputes identically") {
    val base = tmpDir().toString
    val dir = sf("sf0.001")
    RollupJob.run(spark, dir, base)
    val store = new SnapshotStore(base)
    val before = tierRows(dir, store, "tier_1d")

    // full re-run: everything resumed, no new snapshot versions
    val r2 = RollupJob.run(spark, dir, base)
    assert(r2.values.forall(_.resumed))
    assert(store.latest("tier_1d").get.version == 1)

    // invalidate the 1h snapshot -> 1h and 1d recompute, 1m/5m resume
    import scala.jdk.CollectionConverters._
    val snapDir = java.nio.file.Paths.get(base, "tier_1h", "_snapshots")
    Files.list(snapDir).iterator().asScala.foreach(Files.delete)
    val r3 = RollupJob.run(spark, dir, base)
    assert(r3("raw").resumed && r3("rollup_1m").resumed && r3("rollup_5m").resumed)
    assert(!r3("rollup_1h").resumed && !r3("rollup_1d").resumed)
    val after = tierRows(dir, store, "tier_1d")
    assert(after == before, "recomputed suffix must be bit-exact")
  }

  test("lineage covers all rows; metrics emitted per computed stage") {
    val base = tmpDir().toString
    RollupJob.run(spark, sf("sf0.001"), base)
    val store = new SnapshotStore(base)
    val lineage = store.read(spark, store.latest("lineage").get)
    // lineage table holds the LAST committed stage's rows; check any stage's
    // lineage sums to that stage's rowCount
    val snaps = store.snapshots("lineage")
    assert(snaps.size == 5, s"one lineage snapshot per computed stage, got ${snaps.size}")
    snaps.foreach { s =>
      val stageName = s.stage.stripPrefix("lineage_")
      val rows = store
        .read(spark, s)
        .agg(org.apache.spark.sql.functions.sum("rows_out"))
        .collect()(0)
        .getLong(0)
      val stageTable = store
        .snapshots(if (stageName == "raw") "raw" else s"tier_${stageName.stripPrefix("rollup_")}")
      assert(rows == stageTable.last.rowCount, s"lineage rows != rowCount for $stageName")
    }
    assert(store.snapshots("metrics").size == 5)
    assert(lineage.columns.toSet ==
      Set("stage", "snapshot_id", "partition_id", "rows_out", "wall_ms"))
    // the 1m stage's metrics carry the validity-invariant counters
    // (skip-and-count via observe — no extra scan)
    val m1m = store.snapshots("metrics").find(_.stage == "metrics_rollup_1m").get
    val validity = store
      .read(spark, m1m)
      .filter("metric IN ('skipped_rows', 'input_rows')")
      .collect()
      .map(r => r.getString(2) -> r.getDouble(3))
      .toMap
    assert(validity("skipped_rows") == 0.0) // corpus has no empty docs
    assert(validity("input_rows") > 0.0)
  }

  test("salted two-phase rollup is bit-exact vs unsalted") {
    val points = TokenTable.points(spark, sf("sf0.001"))
    val plain = Rollup
      .rollupFromPoints(points, Tier.OneMinute)
      .collect()
      .map(_.toSeq)
      .toSet
    val salted = RollupJob
      .rollupSalted(
        points.select(
          org.apache.spark.sql.functions.col("doc_id").cast("string").as("doc_id"),
          org.apache.spark.sql.functions.col("source"),
          org.apache.spark.sql.functions.col("pos"),
          org.apache.spark.sql.functions.col("tok")),
        Tier.OneMinute,
        salt = 8)
      .collect()
      .map(_.toSeq)
      .toSet
    assert(salted == plain)
  }

  test("dedup job: observe-collected candidate telemetry lands in the metrics table") {
    val base = tmpDir().toString
    val store = new SnapshotStore(base)
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val res = graft.jobs.DedupJob.run(spark, docs, store)
    val nDocs = docs.count()

    // observed counters match independent recomputation of each stage
    val truePairs = graft.operators.Dedup
      .minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5)
      .count()
    assert(res.verifiedPairs == truePairs)
    assert(res.candidatePairs >= res.verifiedPairs)
    assert(res.verifiedPairs > 0, "corpus plants near-dups — pairs expected")
    assert(res.keptDocs + res.droppedDocs == nDocs)
    assert(store.read(spark, res.pairs).count() == res.verifiedPairs)
    assert(store.read(spark, res.keep).count() == nDocs)

    // the density bound the banding promises: candidates are ~linear in
    // docs x bands, never quadratic in docs
    assert(res.candidatePairs <= nDocs * 16, "candidate blow-up: > docs x bands")

    // the metrics table carries the full counter set
    val m = store
      .read(spark, res.metrics)
      .collect()
      .map(r => r.getString(2) -> r.getDouble(3))
      .toMap
    assert(m("input_docs") == nDocs.toDouble)
    assert(m("candidate_pairs") == res.candidatePairs.toDouble)
    assert(m("verified_pairs") == res.verifiedPairs.toDouble)
    assert(m("rejected_pairs") == (res.candidatePairs - res.verifiedPairs).toDouble)
    assert(m("kept_docs") == res.keptDocs.toDouble)
    assert(m("dropped_docs") == res.droppedDocs.toDouble)
    assert(m("candidates_per_doc") == res.candidatePairs.toDouble / nDocs)
  }

  test("delta dedup job: warm-start labeling equals the full-corpus keep list; resumable") {
    import org.apache.spark.sql.functions._
    val base = tmpDir().toString
    val store = new SnapshotStore(base)
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val isNew = col("doc_id") % 3 === 0
    // initial run over the old corpus commits pairs + labels
    graft.jobs.DedupJob.run(spark, docs.filter(!isNew), store)
    // the delta batch arrives: fold it into the committed state
    val r = graft.jobs.DedupJob
      .runDelta(spark, docs, docs.filter(isNew).select("doc_id"), store)
    assert(!r.resumed)
    val got = store.read(spark, r.keep).collect().map(_.toSeq).toSet
    val want = graft.operators.ConnectedComponents
      .keepList(
        docs,
        "doc_id",
        graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5))
      .collect()
      .map(_.toSeq)
      .toSet
    assert(got == want, "delta labeling must equal never-having-batched")
    assert(r.keptDocs + r.droppedDocs == docs.count())
    assert(r.verifiedPairs > 0, "the corpus plants near-dups across the batch split")
    assert(r.candidatePairs >= r.verifiedPairs)
    // the delta pair snapshot holds ONLY delta-touching pairs (log-structured)
    val deltaPairs = store.read(spark, r.pairsDelta)
    assert(deltaPairs.count() == r.verifiedPairs)
    val newIds = docs.filter(isNew).select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet
    assert(
      deltaPairs.collect().forall(p => newIds(p.getLong(0)) || newIds(p.getLong(1))),
      "old-vs-old pairs must not be re-emitted by a delta run")
    // exactly-once: an identical retry resumes both stages
    val r2 = graft.jobs.DedupJob
      .runDelta(spark, docs, docs.filter(isNew).select("doc_id"), store)
    assert(r2.resumed && r2.keep.uid == r.keep.uid)
  }

  test("delta dedup job: crash-retry (pairs committed, keep lost) still records metrics") {
    import org.apache.spark.sql.functions._
    val store = new SnapshotStore(tmpDir().toString)
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val isNew = col("doc_id") % 3 === 0
    graft.jobs.DedupJob.run(spark, docs.filter(!isNew), store)
    val newIds = docs.filter(isNew).select("doc_id")
    // simulate the crash window: commit ONLY the pairs stage, with the
    // exact fingerprint runDelta derives, then "retry" the whole delta —
    // the pairs stage must resume, the keep stage must compute, and the
    // metrics version must carry verified_pairs (recovered from the
    // snapshot row count) with no candidate rows and no -1 sentinels
    val fpRow = newIds
      .select(col("doc_id").cast("long").as("_nid"))
      .distinct()
      .agg(
        count(lit(1)),
        coalesce(
          sum(xxhash64(col("_nid")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")))
      .head()
    val params =
      s"delta-n3-h64-b16-t0.5-new${fpRow.getLong(0)}-fp${fpRow.getDecimal(1)}"
    val (deltaPairs, release) = graft.operators.Dedup
      .minHashLshDeltaPairs(docs, newIds, "doc_id", "text", 3, 64, 16, 0.5)
    val (pre, preResumed) =
      store.getOrCompute("dedup_pairs", "lsh_pairs_delta", params)(deltaPairs)
    release()
    assert(!preResumed, "the simulated crash run must have computed the pairs")
    val r = graft.jobs.DedupJob.runDelta(spark, docs, newIds, store)
    assert(!r.resumed, "the keep stage must compute on the retry")
    assert(r.pairsDelta.uid == pre.uid, "the retry must resume the committed pairs")
    assert(r.candidatePairs == -1L, "candidate counter only exists on the computing run")
    assert(r.verifiedPairs == store.read(spark, r.pairsDelta).count())
    val m = store
      .read(spark, store.latest("metrics").get)
      .filter(col("stage") === "dedup_delta")
      .collect()
      .map(row => row.getString(2) -> row.getDouble(3))
      .toMap
    assert(m("verified_pairs") == r.verifiedPairs.toDouble)
    assert(m("kept_docs") == r.keptDocs.toDouble)
    assert(m("dropped_docs") == r.droppedDocs.toDouble)
    assert(!m.contains("candidate_pairs") && !m.contains("candidates_per_new_doc"))
    assert(m.values.forall(_ >= 0.0), s"no -1 sentinels in the table: $m")
  }

  test("monitor job: alerts + cusum alarms == direct operators; resumes on unchanged tier") {
    import org.apache.spark.sql.functions._
    val store = new SnapshotStore(tmpDir().toString)
    val dir = sf("sf0.001")
    // commit a 1m tier for the job to monitor
    val tier = graft.operators.Rollup
      .rollupFromPoints(graft.sources.TokenTable.points(spark, dir), graft.core.Tier.OneMinute)
    store.commit(tier, "tier_1m", "rollup_1m", "test-tier")
    val r = graft.jobs.MonitorJob.run(
      spark, store,
      alertThreshold = 25200.0, alertMinRun = 2, windowWidth = 60,
      cusumK = 1507710L, cusumH = 150000L)
    assert(!r.resumed)
    // committed surfaces equal the operators run directly on the tier
    val alertsWant = graft.operators.SeriesAnalytics
      .consecutiveBreaches(tier, "avg_tok", 25200.0, 2, 60)
      .collect().map(_.toSeq).toSet
    val alertsGot = store.read(spark, r.alerts).collect().map(_.toSeq).toSet
    assert(alertsGot == alertsWant && r.alertRows == alertsWant.size)
    val alarmsWant = graft.operators.SeriesAnalytics
      .cusum(tier, "sum_tok", 1507710L, 150000L)
      .filter(col("alarm"))
      .collect().map(_.toSeq).toSet
    val alarmsGot = store.read(spark, r.cusum).collect().map(_.toSeq).toSet
    assert(alarmsGot == alarmsWant && r.alarmRows == alarmsWant.size)
    assert(r.alertRows > 0 && r.alarmRows > 0, "the test data must exercise both surfaces")
    // counters landed in the metrics table
    val m = store
      .read(spark, store.latest("metrics").get)
      .filter(col("stage") === "monitor")
      .collect()
      .map(row => row.getString(2) -> row.getDouble(3))
      .toMap
    assert(m("alert_rows") == r.alertRows.toDouble && m("alarm_rows") == r.alarmRows.toDouble)
    // unchanged tier + params -> both stages resume, nothing recomputes
    val r2 = graft.jobs.MonitorJob.run(
      spark, store,
      alertThreshold = 25200.0, alertMinRun = 2, windowWidth = 60,
      cusumK = 1507710L, cusumH = 150000L)
    assert(r2.resumed && r2.alerts.uid == r.alerts.uid && r2.cusum.uid == r.cusum.uid)
    // a NEW tier version invalidates the monitoring suffix
    store.commit(tier.filter(col("bucket") === 0), "tier_1m", "rollup_1m", "test-tier-v2")
    val r3 = graft.jobs.MonitorJob.run(
      spark, store,
      alertThreshold = 25200.0, alertMinRun = 2, windowWidth = 60,
      cusumK = 1507710L, cusumH = 150000L)
    assert(!r3.resumed && r3.alerts.uid != r.alerts.uid)
  }

  test("retention stage: survivors bit-exact, observed counters in metrics, resumable") {
    val base = tmpDir().toString
    val dir = sf("sf0.001")
    val results = RollupJob.run(spark, dir, base, retentionHorizon = Some(300L))
    assert(results.contains("retention_1m"))
    val store = new SnapshotStore(base)

    // survivors == the operator applied to the independent in-memory
    // ladder (full coverage: cascade caught up -> every expired row is
    // covered -> survivors are exactly the in-horizon rows, none flagged)
    val ladder = Rollup.ladder(TokenTable.points(spark, dir))
    val want = graft.operators.Retention
      .safeExpire(ladder(Tier.OneMinute), ladder(Tier.FiveMinutes), Tier.FiveMinutes, 300L)
      .collect()
      .map(_.toSeq)
      .toSet
    val got = tierRows(dir, store, "tier_1m_retained")
    assert(got == want, "retained tier mismatch")
    assert(want.nonEmpty && want.forall(r => r.last == false), "full coverage -> no flags")
    val fineCount = ladder(Tier.OneMinute).count()
    assert(got.size < fineCount, "horizon must actually expire rows")

    // observed counters land in the metrics table and match reality
    val m = store
      .read(spark, store.latest("metrics").get)
      .collect()
      .map(r => r.getString(2) -> r.getDouble(3))
      .toMap
    assert(m("survivor_rows") == got.size.toDouble)
    assert(m("retained_uncovered_rows") == 0.0)

    // the stage is snapshot-fingerprinted like every other: re-run resumes
    val r2 = RollupJob.run(spark, dir, base, retentionHorizon = Some(300L))
    assert(r2("retention_1m").resumed)
    // a different horizon is a different fingerprint: recomputes
    val r3 = RollupJob.run(spark, dir, base, retentionHorizon = Some(240L))
    assert(!r3("retention_1m").resumed)
  }

  test("ladder retention stages: per-level survivors bit-exact vs the operator, resumable") {
    val base = tmpDir().toString
    val dir = sf("sf0.001")
    // nonincreasing fine -> coarse: finer tiers keep less history
    val horizons = Seq(120L, 60L, 0L)
    val results = RollupJob.run(spark, dir, base, ladderHorizons = horizons)
    val stages = Seq("retention_1m", "retention_5m", "retention_1h")
    assert(stages.forall(results.contains))
    val store = new SnapshotStore(base)
    val ladder = Rollup.ladder(TokenTable.points(spark, dir))
    val pairs = Seq(
      (Tier.OneMinute, Tier.FiveMinutes, 120L, "tier_1m_retained"),
      (Tier.FiveMinutes, Tier.OneHour, 60L, "tier_5m_retained"),
      (Tier.OneHour, Tier.OneDay, 0L, "tier_1h_retained"))
    for ((f, c, h, table) <- pairs) {
      val want = graft.operators.Retention
        .safeExpire(ladder(f), ladder(c), c, h)
        .collect()
        .map(_.toSeq)
        .toSet
      assert(tierRows(dir, store, table) == want, s"$table mismatch")
    }
    // the finest level must actually expire rows
    assert(
      tierRows(dir, store, "tier_1m_retained").size < ladder(Tier.OneMinute).count())
    // the last-committed metrics snapshot carries the 1h level's counters
    val m = store
      .read(spark, store.latest("metrics").get)
      .collect()
      .map(r => r.getString(2) -> r.getDouble(3))
      .toMap
    assert(
      m("survivor_rows") == tierRows(dir, store, "tier_1h_retained").size.toDouble)
    // all three stages are snapshot-fingerprinted: a re-run resumes each
    val r2 = RollupJob.run(spark, dir, base, ladderHorizons = horizons)
    assert(stages.forall(r2(_).resumed))
  }

  test("curation job: funnel counters partition the corpus and match the labeled table") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = tmpDir().toString
    val store = new SnapshotStore(base)
    // one unscannable doc (NULL text): it must be LABELED dropped-quality,
    // not silently lost by the signal stages' word explode
    val docs = spark.read
      .parquet(s"${sf("sf0.001")}/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
      .unionByName(
        Seq((999999L, null.asInstanceOf[String], "srcX")).toDF("doc_id", "text", "source"))
    val testSet = docs.filter(col("doc_id") % 53 === 0)
    val res = graft.jobs.CurationJob.run(spark, docs, testSet, store)
    val nDocs = docs.count()

    // the four counters partition the corpus exactly (ordered attribution)
    assert(res.inputDocs == nDocs)
    assert(
      res.droppedDup + res.droppedContaminated + res.droppedQuality + res.keptDocs == nDocs)
    assert(res.droppedContaminated > 0, "test members are in the corpus — contamination expected")
    assert(res.keptDocs > 0)

    // counters == independent recomputation from the committed table
    val t = store.read(spark, res.curated)
    assert(t.count() == nDocs, "the job labels rows, never destroys them")
    assert(t.filter(!col("canonical")).count() == res.droppedDup)
    assert(
      t.filter(col("canonical") && col("contaminated")).count() == res.droppedContaminated)
    assert(
      t.filter(col("canonical") && !col("contaminated") && !col("quality_ok")).count() ==
        res.droppedQuality)
    assert(t.filter(col("kept")).count() == res.keptDocs)
    // every kept row carries a split label; buckets agree with the hash
    assert(
      t.filter(col("kept") && !col("split").isin("train", "val", "test")).count() == 0)

    // the metrics table carries the funnel
    val m = store
      .read(spark, res.metrics)
      .collect()
      .map(r => r.getString(2) -> r.getDouble(3))
      .toMap
    assert(m("input_docs") == nDocs.toDouble)
    assert(m("kept_docs") == res.keptDocs.toDouble)
    assert(m("dropped_dup") == res.droppedDup.toDouble)
    assert(m("dropped_contaminated") == res.droppedContaminated.toDouble)
    assert(m("dropped_quality") == res.droppedQuality.toDouble)
  }

  test("sketch job: delta folds == full-corpus sketch; replayed delta resumes") {
    import graft.jobs.SketchJob
    import graft.operators.Sketches
    val store = new SnapshotStore(tmpDir().toString)
    val pts = TokenTable.points(spark, sf("sf0.001"))
    val hist = pts.filter(org.apache.spark.sql.functions.expr("doc_id % 2 = 0"))
    val delta = pts.filter(org.apache.spark.sql.functions.expr("doc_id % 2 = 1"))

    val r0 = SketchJob.run(spark, hist, store, 3600, 64)
    assert(!r0.resumed && r0.sketch.version == 1)
    val r1 = SketchJob.runDelta(spark, delta, store, 3600, 64)
    assert(!r1.resumed && r1.sketch.version == 2)

    // the folded sketch equals a from-scratch sketch of the whole corpus
    def kmins(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getSeq[Long](3))
      .toMap
    assert(
      kmins(store.read(spark, r1.sketch)) == kmins(Sketches.kmvSketch(pts, 3600, 64)),
      "incremental job must equal the full recompute")

    // duplicate delivery of the SAME delta resumes (no double fold, no
    // new version) even though the base has advanced since its commit
    val r2 = SketchJob.runDelta(spark, delta, store, 3600, 64)
    assert(r2.resumed && r2.sketch.version == 2 && r2.sketch.uid == r1.sketch.uid)
    assert(r2.keys == r1.keys)
    // the METRICS commit must resume too — a replay that appended a new
    // metrics version would double-count input_points for anyone summing
    // across versions
    assert(r2.metrics.uid == r1.metrics.uid, "replayed delta must not re-commit metrics")

    // metrics table carries the key count on both paths
    val m = store
      .read(spark, r1.metrics)
      .collect()
      .map(r => r.getString(2) -> r.getDouble(3))
      .toMap
    assert(m("keys") == r1.keys.toDouble)
    assert(m("input_points") == delta.count().toDouble)
  }

  test("snapshot lifecycle: time travel, zero-copy rollback, reachability-safe expiry") {
    import spark.implicits._
    val store = new SnapshotStore(tmpDir().toString)
    def commitRows(n: Int, stage: String) =
      store.commit((1 to n).toDF("x"), "t", stage, s"fp-$n")
    val v1 = commitRows(10, "s1")
    val v2 = commitRows(20, "s2")
    val v3 = commitRows(30, "s3")
    assert(Seq(v1.version, v2.version, v3.version) == Seq(1, 2, 3))

    // time travel: an old version reads bit-identically after newer commits
    assert(store.readVersion(spark, "t", 2).count() == 20)
    assert(store.latest("t").get.version == 3)

    // rollback commits a NEW version aliasing v2's immutable data
    val v4 = store.rollbackTo("t", 2)
    assert(v4.version == 4 && v4.dataPath == v2.dataPath && v4.rowCount == 20)
    assert(store.read(spark, store.latest("t").get).count() == 20)
    // the rolled-back-over version is still readable (nothing was deleted)
    assert(store.readVersion(spark, "t", 3).count() == 30)
    // resume bookkeeping: the rollback never masquerades as the producing stage
    assert(store.find("t", "s2", "fp-20").get.version == 2)
    intercept[RuntimeException](store.rollbackTo("t", 9))

    // expiry keeps the newest keepLast versions; v4 (latest) references
    // v2's data, so that directory must SURVIVE expiring v2's manifest
    val expired = store.expireSnapshots("t", keepLast = 2)
    assert(expired == Seq(1, 2))
    assert(store.snapshots("t").map(_.version) == Seq(3, 4))
    assert(store.read(spark, store.latest("t").get).count() == 20)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(v2.dataPath)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(v1.dataPath)))
    intercept[RuntimeException](store.readVersion(spark, "t", 1))
  }
}
