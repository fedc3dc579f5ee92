package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.core.Tier
import graft.operators.Rollup
import graft.sources.TokenTable
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): times every registered query on
 * SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS], then measures the
 * engine's primary metric — rolled-up points/sec — on a synthesized
 * token table at TWO parallelism levels (local[N] and local[4N]) as the
 * sandbox stand-in for N vs 4N executors, reporting scaling efficiency
 * (north-rule gate: >= 0.8). Appends the scaling evidence to BENCH.md.
 *
 * Prints ONE JSON line (compact: the 8 slowest queries +
 * "queries_full":"bench_out.json" pointing at the complete per-query map,
 * so the line survives the driver's tail capture):
 *   {"metric":"total","value":S,"unit":"sec","suite_passes":2,
 *    "queries":{...},"queries_full":"bench_out.json","sf":...,
 *    "rollup":{"points":P,"n_sec":...,"4n_sec":...,"n_pps":...,
 *              "4n_pps":...,"scaling_efficiency":E,"n_cores":N},
 *    "tiers":{...}}
 * Suite timings are the MIN over SPARK_GRAFT_SUITE_PASSES (default 2)
 * interleaved full passes.
 */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Timing action that consumes EVERY output column (one hash-sum
   * scalar to the driver). `df.count()` is NOT a valid timing action for
   * aggregate-producing plans: Catalyst prunes aggregate expressions the
   * action never reads, so a count() over a groupBy times only the
   * grouping keys (measured: the exact windowCardinality "ran" in 22 KB
   * of shuffle because the countDistinct was dead code — BENCH.md
   * "Sketch vs exact"; the 1m rollup itself is 1.18x under full
   * consumption). Every bench timing goes through here. */
  private def consumeAll(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.functions.{col, hash, sum, count => cnt, lit}
    df.select(
        cnt(lit(1)).as("n"),
        sum(hash(df.columns.map(col): _*).cast("long")).as("h"))
      .first()
      .getLong(0)
  }

  /** Primary-metric job: 1m rollup over `nDocs` synthesized docs
   * (`tokensPerDoc` tokens each). Returns (points, seconds).
   * SPARK_GRAFT_UDAF=1 swaps the five built-in aggregates for the fused
   * tier_stats TypedImperativeAggregate (ObjectHashAggregate path) so the
   * two physical strategies can be compared on identical input. */
  private def rollupRun(spark: SparkSession, nDocs: Long, tokensPerDoc: Int): (Long, Double) = {
    val points = TokenTable.rangePoints(spark, nDocs, tokensPerDoc, partitions = 256)
    // "1" -> tier_stats (TypedImperativeAggregate, ObjectHashAggregate
    // path); "decl" -> tier_stats_decl (DeclarativeAggregate, codegen
    // HashAggregate path); anything else -> the five built-in aggregates
    val udafMode = sys.env.getOrElse("SPARK_GRAFT_UDAF", "0")
    val useUdaf = udafMode == "1" || udafMode == "decl"
    val t0 = System.nanoTime()
    // consumeAll, NOT count(): count() lets Catalyst prune the five tier
    // aggregates and times only the key grouping (~1.18x fast) — see
    // consumeAll's doc. Protocol change 2026-08-18; rows before it carry
    // the old action.
    if (useUdaf) {
      graft.functions.GraftFunctions.register(spark)
      import org.apache.spark.sql.functions._
      consumeAll(
        points
          .groupBy(
            col("source"),
            org.apache.spark.sql.functions.expr(s"CAST(pos DIV ${Tier.BucketWidth} AS INT)").as("bucket"),
            org.apache.spark.sql.functions.expr("CAST(pos - pos % 60 AS INT)").as("window_start"))
          .agg(call_function(
            if (udafMode == "decl") "tier_stats_decl" else "tier_stats",
            col("tok")).as("st"))
          .select(col("source"), col("bucket"), col("window_start"),
            col("st.min_tok"), col("st.max_tok"), col("st.sum_tok"),
            col("st.cnt_tok"), col("st.sumsq_tok")))
      ()
    } else {
      consumeAll(Rollup.rollupFromPoints(points, Tier.OneMinute))
      ()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    (nDocs * tokensPerDoc, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val runScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0"

    // -- Part 1: the registered query suite ------------------------------
    val runSuite = sys.env.getOrElse("SPARK_GRAFT_SUITE", "1") != "0"
    // min over interleaved full passes: single-run-per-query timings are
    // noise-limited on this host (CPU delivery swings minutes-scale up to
    // 10x — BENCH.md), and interleaving whole passes (not back-to-back
    // repeats) keeps a slow window from biasing one contiguous query range
    val passes = sys.env.getOrElse("SPARK_GRAFT_SUITE_PASSES", "2").toInt
    val spark = session(cpus)
    graft.functions.GraftFunctions.register(spark)
    // throwaway warmup: the first query of a fresh session otherwise pays
    // session init + whole-stage-codegen JIT (~3-5 s) that would be
    // misattributed to whichever query sorts first alphabetically
    if (runSuite) {
      // warm up against the SAME sfDir as the suite (SparkEntry.entry is
      // pinned to sf0.001, which need not exist on the bench host)
      try SparkEntry.queries("q_rollup_1m")(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    }
    // SPARK_GRAFT_ONLY=a,b narrows the suite for focused A/B timing runs
    // (same semantics as Verify's filter)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val suite =
      if (runSuite)
        SparkEntry.queries.toSeq
          .filter(q => only.forall(_.contains(q._1)))
          .sortBy(_._1)
      else Seq.empty
    // ~1-2 s host-noise CONTROL bracketing the suite: a fixed-size rollup
    // (the engine's primary-metric job, small enough to dodge the
    // minutes-scale frequency troughs documented in BENCH.md) run before
    // and after the passes. control_pps calibrates what the host was
    // actually delivering during THIS artifact, so cross-round suite
    // comparisons can divide out the window (BENCH.md interpretation) —
    // round 5's 27.7 -> 47.7 s "regression" was exactly such a window.
    val controlDocs = 200000L
    val controlTokens = 256
    def controlRun(): Double =
      if (!runSuite) Double.NaN else rollupRun(spark, controlDocs, controlTokens)._2
    final case class SuiteRun(
        results: Seq[(String, Double)],
        failed: Seq[String],
        flaky: Seq[String],
        controlSec: Double) {
      def controlPps: Double =
        if (controlSec.isNaN) Double.NaN else controlDocs * controlTokens / controlSec
    }
    def runPasses(): SuiteRun = {
      val best =
        scala.collection.mutable.LinkedHashMap(suite.map(_._1 -> Double.MaxValue): _*)
      // a failed pass must NOT feed math.min — a query that dies quickly
      // would otherwise report an artificially fast best time with the
      // failure visible only on stderr (round-4 ADVICE); failures are
      // carried into the JSON artifact instead
      val failedPassNames = scala.collection.mutable.LinkedHashSet[String]()
      val controlBefore = controlRun()
      for (_ <- 1 to passes; (name, fn) <- suite) {
        val t0 = System.nanoTime()
        val ok =
          try { consumeAll(fn(spark, sfDir)); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
        if (ok) best(name) = math.min(best(name), (System.nanoTime() - t0) / 1e9)
        else failedPassNames += name
      }
      val controlAfter = controlRun()
      val results =
        suite.collect { case (name, _) if best(name) != Double.MaxValue => name -> best(name) }
      // "failed" = queries that NEVER produced a timing (absent from the
      // queries map); a query that failed in one pass but timed in another is
      // "flaky_passes" — the two were previously conflated in one list
      val failed = suite.collect {
        case (name, _) if best(name) == Double.MaxValue && failedPassNames.contains(name) => name
      }
      SuiteRun(
        results, failed, failedPassNames.toSeq.filterNot(failed.toSet),
        math.min(controlBefore, controlAfter))
    }
    // CONTROL-FLOOR GATE on the artifact of record: a run whose bracketing
    // control shows the host in a frequency trough (round-6's committed
    // artifact measured 70.2 s at control 14.4 M pts/s — ~2x the same
    // binary's healthy-window 51.8 s at 35.7 M) must not become the round's
    // number. If the control is below the floor, re-execute the passes (up
    // to SPARK_GRAFT_CONTROL_ATTEMPTS total) and keep the attempt with the
    // healthiest window; per-query mins are NOT pooled across attempts so
    // the artifact stays one self-consistent (timings, control) pair.
    val controlFloorPps = sys.env.getOrElse("SPARK_GRAFT_CONTROL_FLOOR", "28000000").toDouble
    val maxAttempts = sys.env.getOrElse("SPARK_GRAFT_CONTROL_ATTEMPTS", "3").toInt
    var run = runPasses()
    var attempts = 1
    while (runSuite && run.controlPps < controlFloorPps && attempts < maxAttempts) {
      System.err.println(
        f"[bench] control ${run.controlPps / 1e6}%.1f M pts/s below floor " +
          f"${controlFloorPps / 1e6}%.1f M (host trough) — re-executing passes " +
          s"(attempt ${attempts + 1}/$maxAttempts)")
      val retry = runPasses()
      if (retry.controlPps > run.controlPps) run = retry
      attempts += 1
    }
    val (results, failed, flaky, controlSec) =
      (run.results, run.failed, run.flaky, run.controlSec)
    spark.stop()

    // -- Part 2: primary metric at two cluster sizes ---------------------
    // N vs 4N executors is evidenced by local[4] vs local[16] — both within
    // the box's physical core budget. Two confounds of single-box thread
    // scaling are handled explicitly:
    //  * host-CPU noise (minutes-scale, up to 10x): each level runs 3 timed
    //    jobs per session x 2 interleaved rounds; min-of-all is reported;
    //  * DVFS/turbo (more active cores -> lower clock): wall-clock
    //    efficiency is paired with CPU-TIME per point (SparkListener
    //    executorCpuTime), which is frequency-confounded the same way but
    //    proves the ABSENCE of algorithmic contention: equal cpu-time per
    //    point at both levels means the plan has no serial bottleneck, so
    //    on a real cluster (4N executors = 4x independent chips) the wall
    //    ratio follows core count.
    val scaling: Option[Scaling] =
      if (!runScaling) None
      else {
        val n = 4
        val docsN = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "1000000").toLong
        val tokens = 256
        val cpuNs = new java.util.concurrent.atomic.AtomicLong
        def level(cores: Int): (Double, Double) = {
          val s = session(cores)
          s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (te.taskMetrics != null) cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
          })
          rollupRun(s, 50000, tokens) // warmup / JIT
          var bestWall = Double.MaxValue
          var bestCpu = Double.MaxValue
          for (_ <- 1 to 3) {
            val c0 = cpuNs.get
            val (_, sec) = rollupRun(s, docsN, tokens)
            Thread.sleep(200) // let task-end events drain
            bestWall = math.min(bestWall, sec)
            bestCpu = math.min(bestCpu, (cpuNs.get - c0) / 1e9)
          }
          s.stop()
          (bestWall, bestCpu)
        }
        // the same ~1-2 s control that brackets the suite also brackets the
        // scaling measurement (round-7 discipline): each scaling row carries
        // the host window it was captured in, so the gate tally can be
        // reported over healthy-window runs only instead of mixing
        // frequency-trough samples into the median
        def scalingControl(): Double = {
          val s = session(n * 4)
          val (pts, sec) = { rollupRun(s, 50000, 256); rollupRun(s, 200000, 256) }
          s.stop()
          pts / sec
        }
        val ctlBefore = scalingControl()
        var (wN, cN) = (Double.MaxValue, Double.MaxValue)
        var (w4N, c4N) = (Double.MaxValue, Double.MaxValue)
        for (_ <- 1 to 2) {
          val a = level(n); wN = math.min(wN, a._1); cN = math.min(cN, a._2)
          val b = level(n * 4); w4N = math.min(w4N, b._1); c4N = math.min(c4N, b._2)
        }
        val ctl = math.max(ctlBefore, scalingControl())
        Some(Scaling(docsN * tokens, n, wN, w4N, cN, c4N, ctl))
      }

    // -- Part 3: per-retention-tier ladder throughput ---------------------
    // BASELINE.json's metric is "rolled-up points/sec PER RETENTION TIER":
    // the 1m tier consumes the raw points; each coarser tier reaggregates
    // the (much smaller) previous tier. Reported per tier: wall seconds,
    // rows produced, and raw-points-equivalent/sec (the raw volume the
    // tier's output covers per second of its own compute).
    val ladderJson: String =
      if (!runScaling) ""
      else {
        val docsN = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "1000000").toLong
        val tokens = 256
        val rawPts = docsN * tokens
        val s = session(4 * 4) // the 4N level of the scaling measurement
        val points = TokenTable.rangePoints(s, docsN, tokens, partitions = 256)
        var prev = Rollup.rollupFromPoints(points, Tier.ladder.head._1)
        var cached: org.apache.spark.sql.DataFrame = null
        val entries = Tier.ladder.map { case (tierName, _) =>
          val df =
            if (tierName == Tier.ladder.head._1) prev
            else {
              if (cached != null) cached.unpersist() // only the direct input stays pinned
              cached = prev.cache()
              cached.count() // materialize before timing the reaggregation
              Rollup.reaggregate(cached, tierName)
            }
          var best = Double.MaxValue
          var rows = 0L
          for (_ <- 1 to 2) {
            val t0 = System.nanoTime()
            rows = consumeAll(df)
            best = math.min(best, (System.nanoTime() - t0) / 1e9)
          }
          prev = df
          f""""$tierName":{"sec":$best%.3f,"rows_out":$rows,"raw_pts_per_sec":${rawPts / best}%.0f}"""
        }
        s.stop()
        s""","tiers":{${entries.mkString(",")}}"""
      }

    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // compact per-query map for the stdout line: only the slowest queries,
    // so the line stays well under the driver's tail-capture window (the
    // full map made the r1-r3 artifact lines head-truncate; the complete
    // map is in bench_out.json)
    val qsCompact = results
      .sortBy(-_._2)
      .take(8)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // failures surface in the artifact, not only on stderr
    val failedJson = {
      val f =
        if (failed.isEmpty) ""
        else s""","failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
      val fl =
        if (flaky.isEmpty) ""
        else s""","flaky_passes":${flaky.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
      f + fl
    }
    val controlJson =
      if (!runSuite || controlSec.isNaN) ""
      else {
        val pts = controlDocs * controlTokens
        f""","control":{"points":$pts,"sec":$controlSec%.3f,"pps":${pts / controlSec}%.0f,"floor_pps":$controlFloorPps%.0f,"attempts":$attempts}"""
      }
    // control-normalized total beside the raw one: value scaled by what the
    // host delivered during THIS run vs the recorded reference window, so
    // cross-round comparisons don't mistake a frequency trough for a code
    // regression (round-6 artifact: raw 70.2 s at control 14.4 M ~ 2x the
    // same binary's healthy-window time)
    val normalizedJson =
      if (!runSuite || controlSec.isNaN) ""
      else
        f""","value_normalized":${total * run.controlPps / ReferenceControlPps}%.3f,"normalized_ref_pps":$ReferenceControlPps%.0f"""
    val rollupJson = scaling
      .map { sc =>
        // short (<1B-point) runs inflate the CPU ratio with fixed per-run
        // costs (BENCH.md "size dependence" section); label them so the
        // JSON is self-describing when read against the >=1B gate evidence
        val note =
          if (sc.pts < 1000000000L)
            ""","note":"short run: fixed per-run CPU inflates the ratio; gate evidence at >=1B points in BENCH.md""""
          else ""
        f""","rollup":{"points":${sc.pts},"n_cores":${sc.n},"n_sec":${sc.wN}%.3f,"4n_sec":${sc.w4N}%.3f,"n_pps":${sc.ppsN}%.0f,"4n_pps":${sc.pps4N}%.0f,"scaling_efficiency":${sc.eff}%.3f,"n_cpu_sec":${sc.cN}%.1f,"4n_cpu_sec":${sc.c4N}%.1f,"cpu_per_point_ratio":${sc.cpuRatio}%.3f,"control_pps":${sc.ctlPps}%.0f$note}"""
      }
      .getOrElse("")
    val fullLine =
      s"""{"metric":"total","value":$total$normalizedJson,"unit":"sec","suite_passes":$passes,"queries":$qs$failedJson$controlJson,"sf":"$sfDir"$rollupJson$ladderJson}"""
    // Compact stdout line: same shape, but "queries" carries only the 8
    // slowest (min-of-passes) timings plus a pointer to the full map. The
    // driver's stdout tail-capture truncates long lines from the HEAD
    // (r1-r3 artifacts all lost their first ~25 queries and parsed as
    // null); keeping the one stdout JSON line short is the fix, and
    // bench_out.json is the durable complete copy.
    val compactLine =
      s"""{"metric":"total","value":$total$normalizedJson,"unit":"sec","suite_passes":$passes,"queries":$qsCompact,"queries_full":"bench_out.json"$failedJson$controlJson,"sf":"$sfDir"$rollupJson$ladderJson}"""
    // Only a SUITE run may overwrite the durable per-query artifact — a
    // scaling-only run (SPARK_GRAFT_SUITE=0) would otherwise clobber the
    // complete query map with an empty one.
    if (runSuite)
      Files.write(
        Paths.get("bench_out.json"),
        (fullLine + "\n").getBytes(StandardCharsets.UTF_8))
    // the stdout line is also persisted verbatim so the round artifact is
    // reconstructable even if the driver's stdout capture mangles it; a
    // scaling-only run lands in its own file for the same clobber reason
    // as bench_out.json above (its suite total is a meaningless 0.0)
    Files.write(
      Paths.get(if (runSuite) "bench_summary.json" else "bench_scaling.json"),
      (compactLine + "\n").getBytes(StandardCharsets.UTF_8))
    println(compactLine)

    // -- Scaling evidence into BENCH.md (north-rule reporting) -----------
    // Rows are inserted directly under the table header at the sentinel
    // marker, NOT appended at EOF — prose sections below the table would
    // otherwise swallow later rows (the round-1 BENCH.md corruption).
    scaling.foreach { sc =>
      val variant =
        sys.env.getOrElse("SPARK_GRAFT_UDAF", "0") match {
          case "1" => " (tier_stats UDAF)"
          case "decl" => " (tier_stats_decl)"
          case _ => ""
        }
      val row =
        f"| ${java.time.Instant.now()}$variant | ${sc.pts}%,d | local[${sc.n}] | ${sc.wN}%.2f s | ${sc.ppsN / 1e6}%.1f M | local[${sc.n * 4}] | ${sc.w4N}%.2f s | ${sc.pps4N / 1e6}%.1f M | ${sc.eff}%.3f | ${sc.cN}%.1f / ${sc.c4N}%.1f = ${sc.cpuRatio}%.2f | ${sc.ctlPps / 1e6}%.1f M |"
      val benchMd = Paths.get("BENCH.md")
      val sentinel = "<!-- bench-rows -->"
      if (!Files.exists(benchMd)) {
        Files.write(
          benchMd,
          (s"""# BENCH — measured throughput + N vs 4N scaling evidence
             |
             || run (UTC) | points | N | N wall | N pts/s | 4N | 4N wall | 4N pts/s | wall efficiency | cpu s (N/4N) | control |
             ||---|---|---|---|---|---|---|---|---|---|---|
             |$sentinel
             |""".stripMargin).getBytes(StandardCharsets.UTF_8))
      }
      val content = Files.readString(benchMd)
      val updated =
        if (content.contains(sentinel))
          content.replace(sentinel, row + "\n" + sentinel)
        else content + "\n" + row + "\n" // legacy file without marker
      Files.write(benchMd, updated.getBytes(StandardCharsets.UTF_8))
    }
  }

  final case class Scaling(
      pts: Long, n: Int, wN: Double, w4N: Double, cN: Double, c4N: Double,
      ctlPps: Double) {
    def ppsN: Double = pts / wN
    def pps4N: Double = pts / w4N
    def eff: Double = pps4N / (4.0 * ppsN)
    def cpuRatio: Double = c4N / cN // ~1.0 => no contention added by 4x threads
  }

  /** Reference healthy-window control throughput for cross-round
   * normalization: the fixed 51.2M-point control rollup has measured
   * 30-37 M pts/s in every healthy host window across rounds 4-7 (BENCH.md
   * interpretation section); 32 M is the recorded midpoint. A suite total
   * is normalized as `value * control_pps / ReferenceControlPps`, so a
   * trough-window artifact (e.g. round 6: 70.2 s at 14.4 M) and a
   * healthy-window one compare on the same scale. */
  val ReferenceControlPps: Double = 32000000.0
}
