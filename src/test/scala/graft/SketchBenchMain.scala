package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantifies the KMV sketch's scale claim: per-window distinct counts
 * computed exactly (countDistinct — shuffle bounded by every distinct
 * (key, token-hash) pair) vs the kmv_kmin sketch (shuffle bounded by
 * ≤k longs per key), on SKETCH_BENCH_POINTS synthesized points. Reports
 * wall seconds AND total shuffle-write bytes per path (SparkListener
 * task metrics) — the bytes column is the 100 TB argument: the exact
 * path's shuffle grows with cardinality, the sketch's with key count
 * only. Prints one JSON line; results recorded in BENCH.md. Run
 * foreground: `sbt "Test/runMain graft.SketchBenchMain"` (see the
 * background-task trap in BENCH.md). */
object SketchBenchMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val n = sys.env.getOrElse("SKETCH_BENCH_POINTS", "256000000").toLong
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null && te.taskMetrics.shuffleWriteMetrics != null)
          shuffleBytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // points with a WIDE per-window cardinality: 1h windows over 20
    // sources x few buckets, tok spread over the full 50257 vocab, so
    // each (source, bucket, window) key sees tens of thousands of
    // distinct tokens — the regime where the exact path's shuffle
    // explodes and the sketch's stays k longs per key
    def pts = graft.sources.TokenTable
      .rangePoints(spark, n / 256, 256, partitions = 128)

    // consume EVERY column: a bare count() would let Catalyst prune the
    // countDistinct itself (measured: the exact path shuffles only the 80
    // key rows under count() — 22 KB — because the aggregate is dead code)
    def consume(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(hash(df.columns.map(col): _*)).cast("long")).first().getLong(0)

    def timed(f: => Long): (Double, Double, Long) = {
      f // warmup
      var bestW = Double.MaxValue
      var bytes = 0.0
      var rows = 0L
      for (_ <- 1 to 2) {
        Thread.sleep(200)
        val b0 = shuffleBytes.get
        val t0 = System.nanoTime
        rows = f
        val w = (System.nanoTime - t0) / 1e9
        Thread.sleep(200) // drain task-end events
        if (w < bestW) { bestW = w; bytes = (shuffleBytes.get - b0).toDouble }
      }
      (bestW, bytes, rows)
    }

    val (exactW, exactB, _) = timed {
      consume(graft.operators.SeriesAnalytics.windowCardinality(pts, 3600))
    }
    val (kmvW, kmvB, _) = timed {
      consume(graft.operators.Sketches.approxDistinct(pts, 3600, 256))
    }
    val exactRows = graft.operators.SeriesAnalytics.windowCardinality(pts, 3600).count()

    println(
      s"""{"metric":"sketch_vs_exact","points":$n,"keys":$exactRows,""" +
        s""""exact_sec":$exactW,"exact_shuffle_mb":${(exactB / 1e6).round},""" +
        s""""kmv_sec":$kmvW,"kmv_shuffle_mb":${(kmvB / 1e6).round},""" +
        s""""shuffle_ratio":${(exactB / math.max(kmvB, 1)).round}}""")
    spark.stop()
  }
}
