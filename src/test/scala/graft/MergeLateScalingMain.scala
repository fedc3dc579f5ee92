package graft

import graft.core.Tier
import graft.operators.Rollup
import graft.sources.TokenTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-evidence job for the incremental late-data merge: a 1B-point
 * corpus whose 1m tier has MILLIONS of windows (long pos ranges — the
 * tier axis is window count, which is what the broadcast split must
 * survive), a late delta touching 0.1% of windows, and two measured
 * stages at local[4] vs local[16] on identical input:
 *
 *   MERGE_BENCH_STAGE=merge  — mergeLate(tier-parquet, delta): the
 *     incremental path (delta rollup + broadcast anti/semi split +
 *     small re-merge). The tier is materialized to parquet ONCE before
 *     the levels, so the measured job is what production runs.
 *   MERGE_BENCH_STAGE=full   — rollupFromPoints over ALL points: the
 *     recompute the merge exists to avoid, same protocol.
 *
 * The headline is the ratio (merge ≪ full at a 0.1% delta) plus the
 * merge's own N-vs-4N efficiency. Run FOREGROUND (BENCH.md
 * "background-task trap"):
 *
 *   MERGE_BENCH_STAGE=merge sbt "Test/runMain graft.MergeLateScalingMain"
 */
object MergeLateScalingMain {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(s"graft-merge-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // 200 docs x 5M tokens = 1B points; pos spans 5M per doc, so the 1m
  // tier holds ~|sources| x ~2 x (5M/60) ≈ 3.3M windows — a tier big
  // enough that a tier-wide shuffle would dominate, which is exactly
  // what the broadcast split avoids.
  private def nDocs = sys.env.getOrElse("MERGE_BENCH_DOCS", "200").toLong
  private def tokensPerDoc = sys.env.getOrElse("MERGE_BENCH_TOKENS", "5000000").toInt
  private val LateCond = "(pos DIV 60) % 1000 = 0" // 0.1% of windows

  private def points(s: SparkSession, frac: Int) =
    TokenTable.rangePoints(s, nDocs / frac, tokensPerDoc, partitions = 256)

  /** The late-arrival table, generated DIRECTLY (production late data is
   * its own small table — modeling it as a filter over the full corpus
   * would bill a 1B-row scan to the merge): dense positions remapped
   * onto every 1000th window, one point per late (doc, window, offset). */
  private def delta(s: SparkSession, frac: Int) =
    TokenTable
      .rangePoints(s, nDocs / frac, tokensPerDoc / 1000, partitions = 32)
      .select(
        col("doc_id"),
        col("source"),
        (expr("pos DIV 60") * 60000 + col("pos") % 60).cast("int").as("pos"),
        col("tok"))

  private def run(s: SparkSession, tierPath: String, frac: Int): Long =
    sys.env.getOrElse("MERGE_BENCH_STAGE", "merge") match {
      case "full" =>
        Rollup.rollupFromPoints(points(s, frac), Tier.OneMinute).count()
      case "shuffle" =>
        // the MIDDLE regime forced (broadcast ceiling zeroed): whole-tier
        // union + ONE hash re-merge — costs a tier shuffle (millions of
        // rows) but never touches the (window-width-times-larger) points
        Rollup
          .mergeLate(
            s.read.parquet(tierPath), delta(s, frac), Tier.OneMinute,
            maxBroadcastWindows = 0L)
          .count()
      case _ =>
        Rollup
          .mergeLate(s.read.parquet(tierPath), delta(s, frac), Tier.OneMinute)
          .count()
    }

  def main(args: Array[String]): Unit = {
    val pts = nDocs * tokensPerDoc
    // one-time setup OUTSIDE the measurement: materialize the tier table
    val tierPath = java.nio.file.Files.createTempDirectory("graft-merge-tier-").toString + "/t1m"
    locally {
      val s = session(16)
      val tier = Rollup.rollupFromPoints(
        points(s, 1).filter(!expr(LateCond)),
        Tier.OneMinute)
      tier.write.mode("overwrite").parquet(tierPath)
      val n = s.read.parquet(tierPath).count()
      System.err.println(s"[merge-scaling] tier rows=$n")
      s.stop()
    }

    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    def level(cores: Int): (Double, Double) = {
      val s = session(cores)
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null) cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
      })
      run(s, tierPath, 20) // warmup / JIT at 1/20 size
      var bestWall = Double.MaxValue
      var bestCpu = Double.MaxValue
      val runsPerLevel = sys.env.getOrElse("MERGE_BENCH_RUNS", "3").toInt
      for (_ <- 1 to runsPerLevel) {
        val c0 = cpuNs.get
        val t0 = System.nanoTime()
        val rows = run(s, tierPath, 1)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        if (wall < bestWall) bestWall = wall
        bestCpu = math.min(bestCpu, (cpuNs.get - c0) / 1e9)
        System.err.println(f"[merge-scaling] local[$cores] $wall%.2f s, $rows rows")
      }
      s.stop()
      (bestWall, bestCpu)
    }
    val rounds = sys.env.getOrElse("MERGE_BENCH_ROUNDS", "2").toInt
    var w4 = Double.MaxValue; var c4 = Double.MaxValue
    var w16 = Double.MaxValue; var c16 = Double.MaxValue
    for (_ <- 1 to rounds) {
      val (a, b) = level(4); w4 = math.min(w4, a); c4 = math.min(c4, b)
      val (c, d) = level(16); w16 = math.min(w16, c); c16 = math.min(c16, d)
    }
    val eff = (pts / w16) / (4.0 * (pts / w4))
    val stage = sys.env.getOrElse("MERGE_BENCH_STAGE", "merge")
    println(
      f"""{"merge_scaling":{"stage":"$stage","points":$pts,"n_sec":$w4%.3f,"4n_sec":$w16%.3f,"scaling_efficiency":$eff%.3f,"n_cpu_sec":$c4%.1f,"4n_cpu_sec":$c16%.1f,"cpu_ratio":${c16 / c4}%.3f}}""")
  }
}
