package graft

import java.nio.file.Files

import graft.jobs.{DedupJob, SnapshotStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the incremental-dedup JOB surface against the full re-run it
 * replaces (round-6 VERDICT item 2's "BENCH.md note", with numbers):
 *
 *   full  = DedupJob.run over the whole corpus into a fresh store
 *   delta = DedupJob.runDelta folding the newest `1/deltaFrac` of docs
 *           into a PRE-COMMITTED state built from the rest
 *
 * The delta run re-shingles and re-bands the corpus (row-local + one
 * linear shuffle — unavoidable without committed signature snapshots)
 * but verifies ONLY delta-touching candidate pairs and folds them into
 * the committed labels from a warm start, so its join volume scales
 * with the delta. The q_dedup_incremental QUERY pays the pair join once
 * per batch branch instead (no persist release point in a query
 * builder) — this main exists to show the job does not.
 *
 * Run FOREGROUND (BENCH.md "background-task trap"):
 *   DEDUP_DELTA_DOCS=1000000 sbt "Test/runMain graft.DedupDeltaBenchMain"
 */
object DedupDeltaBenchMain {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(s"graft-dedup-delta-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("DEDUP_DELTA_DOCS", "1000000").toLong
    val deltaFrac = sys.env.getOrElse("DEDUP_DELTA_FRAC", "20").toInt
    val runs = sys.env.getOrElse("DEDUP_DELTA_RUNS", "2").toInt
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = session(cores)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
    })
    val docs = DedupScalingMain.corpus(spark, nDocs)
    // the delta is the id tail — near-dup pairs straddle the boundary
    // (every 7th doc duplicates its predecessor), so the fold has real
    // cross-batch merge work, not only intra-delta pairs
    val cut = nDocs - nDocs / deltaFrac
    val oldDocs = docs.filter(col("doc_id") < cut)
    val newIds = docs.filter(col("doc_id") >= cut).select("doc_id")

    def timed(label: String)(body: => Any): (Double, Double) = {
      val c0 = cpuNs.get
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val cpu = (cpuNs.get - c0) / 1e9
      System.err.println(f"[dedup-delta] $label $wall%.2f s wall, $cpu%.1f s cpu")
      (wall, cpu)
    }

    var fullW = Double.MaxValue; var fullC = Double.MaxValue
    var deltaW = Double.MaxValue; var deltaC = Double.MaxValue
    for (_ <- 1 to runs) {
      // full re-run: fresh store every time (nothing resumes)
      val fullStore = new SnapshotStore(Files.createTempDirectory("dd-full-").toString)
      val (fw, fc) = timed("full")(DedupJob.run(spark, docs, fullStore))
      fullW = math.min(fullW, fw); fullC = math.min(fullC, fc)
      // delta: prior state committed untimed, then the fold timed
      val store = new SnapshotStore(Files.createTempDirectory("dd-delta-").toString)
      DedupJob.run(spark, oldDocs, store)
      val (dw, dc) = timed("delta")(DedupJob.runDelta(spark, docs, newIds, store))
      deltaW = math.min(deltaW, dw); deltaC = math.min(deltaC, dc)
    }
    println(
      f"""{"dedup_delta_bench":{"docs":$nDocs,"delta_docs":${nDocs / deltaFrac},"cores":$cores,"full_sec":$fullW%.3f,"delta_sec":$deltaW%.3f,"full_cpu_sec":$fullC%.1f,"delta_cpu_sec":$deltaC%.1f,"wall_ratio":${fullW / deltaW}%.2f,"cpu_ratio":${fullC / deltaC}%.2f}}""")
    spark.stop()
  }
}
