package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary scaling-evidence job (beyond the primary rollup metric): the
 * FULL rolling-window evaluation chain — window enumeration over a
 * synthesized billion-token raw table, per-window metric kernels
 * (freq-derived seasonal MASE shape), one partial-aggregated reduction —
 * run at local[4] vs local[16] on identical input, reporting throughput
 * at both levels plus wall scaling efficiency. Complements the rollup
 * scaling rows in BENCH.md so the N-vs-4N evidence covers two different
 * plan shapes (wide-scan aggregation AND explode-heavy window math).
 *
 * Run FOREGROUND (BENCH.md "background-task trap"):
 *   sbt "Test/runMain graft.MetricScalingMain"
 */
object MetricScalingMain {

  private val Ctx = 64
  private val Hor = 16
  private val Stride = 32

  private def session(cores: Int): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(s"graft-metric-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The q_eval_mase_freq chain over a synthesized raw table: one row per
   * doc, token arrays from the affine_mod_seq kernel, windows exploded at
   * (Ctx, Hor, Stride), per-window kernels, per-(source, m) reduction. */
  private def run(spark: SparkSession, nDocs: Long, tokensPerDoc: Int): Long = {
    graft.functions.GraftFunctions.register(spark)
    import graft.sources.TokenTable.{MulA, MulB, Vocab}
    val raw = spark
      .range(nDocs)
      .select(
        col("id").as("d"),
        concat(lit("src"), (col("id") % 20).cast("string")).as("source"),
        lit(tokensPerDoc).as("n_tok"))
      .select(
        col("d"),
        col("source"),
        col("n_tok"),
        call_function("affine_mod_seq", col("d"), col("n_tok"), lit(MulA), lit(MulB), lit(Vocab))
          .as("tokens"))
    val mEven = graft.core.Seasonality.of("H")
    val mOdd = graft.core.Seasonality.of("B")
    // the FUSED generator (the production chain since round 4): window
    // enumeration + packed reductions in one kernel pass per doc, window
    // rows carry 8 longs — not a copy of the token array (the slice-based
    // variant measured 0.647 wall efficiency 4->16, the ranged-kernel
    // variant 0.679; both were capped by the exploded rows' series copies)
    raw
      .select(
        col("source"),
        explode(
          call_function(
            "eval_window_stats",
            col("tokens"),
            expr(s"CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0 THEN $mEven ELSE $mOdd END"),
            lit(Ctx),
            lit(Hor),
            lit(Stride),
            lit(10000L))).as("st"))
      .withColumn("m", expr(s"CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0 THEN $mEven ELSE $mOdd END"))
      .withColumn("sum_eq", col("st.sum_eq"))
      .withColumn("se_num", col("st.se_num"))
      .withColumn(
        "mase_w",
        expr(
          s"(CAST(sum_eq AS DOUBLE) / 10000.0 / $Hor.0) / " +
            s"CASE WHEN se_num = 0 THEN 1.0 ELSE CAST(se_num AS DOUBLE) / CAST($Ctx - m AS DOUBLE) END"))
      .groupBy(col("source"), col("m"))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(expr("CAST(CAST(floor(mase_w * 1000000 + 0.5) AS BIGINT) AS DECIMAL(38,0))"))
          .as("mase_q_sum"))
      // a global checksum over the metric column, COLLECTED — a bare
      // count() lets Catalyst prune every aggregate (and with it the whole
      // window-math chain), timing nothing
      .agg(sum(col("mase_q_sum")).cast("double").as("chk"), sum(col("n_windows")).as("nw"))
      .collect()(0)
      .getLong(1)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("METRIC_BENCH_DOCS", "2000000").toLong
    val tokensPerDoc = 512
    val points = nDocs * tokensPerDoc
    def level(cores: Int): Double = {
      val s = session(cores)
      run(s, nDocs / 20, tokensPerDoc) // warmup / JIT
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        run(s, nDocs, tokensPerDoc)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      s.stop()
      best
    }
    // interleave the two levels (host-noise discipline, Bench.scala)
    var w4 = Double.MaxValue
    var w16 = Double.MaxValue
    for (_ <- 1 to 2) {
      w4 = math.min(w4, level(4))
      w16 = math.min(w16, level(16))
    }
    val eff = (points / w16) / (4.0 * (points / w4))
    println(
      f"""{"metric_scaling":{"tokens":$points,"n_sec":$w4%.3f,"4n_sec":$w16%.3f,"n_tok_per_sec":${points / w4}%.0f,"4n_tok_per_sec":${points / w16}%.0f,"scaling_efficiency":$eff%.3f}}""")
  }
}
