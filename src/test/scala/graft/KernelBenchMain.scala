package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off micro-benchmark quantifying the round-4 kernel-ization claim:
 * the same per-window reductions as interpreted SQL `aggregate` lambdas
 * vs the typed array kernels (ArrayExpressions.scala), on a synthesized
 * frame of KERNEL_BENCH_ARRAYS (default 20M) 64-element arrays — 1.28B
 * elements at the default, the scale recorded in BENCH.md. Prints one
 * JSON line;
 * results are recorded in BENCH.md ("Kernel vs interpreted-lambda"
 * section). Run: `sbt "Test/runMain graft.KernelBenchMain"` (foreground —
 * see the background-task trap in BENCH.md). */
object KernelBenchMain {
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

    val n = sys.env.getOrElse("KERNEL_BENCH_ARRAYS", "20000000").toLong
    def base = spark
      .range(n)
      .select(
        col("id"),
        call_function(
          "affine_mod_seq",
          col("id"),
          lit(64),
          lit(2654435761L),
          lit(40503L),
          lit(50257L)).as("a"))

    def time(label: String, sql: String): (String, Double) = {
      val df = base.selectExpr("id", s"$sql AS v").agg(sum("v"))
      df.collect() // warmup (codegen + JIT)
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        df.collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      label -> best
    }

    val results = Seq(
      // generation-only baseline: how much of every row's cost is the
      // shared affine_mod_seq array construction
      time("baseline_size", "CAST(size(a) AS BIGINT)"),
      time("hof_sum", "aggregate(a, 0L, (acc, x) -> acc + x)"),
      time("kernel_sum", "arr_sum(a)"),
      time(
        "hof_err_q_sum",
        "aggregate(a, 0L, (acc, x) -> acc + CAST(floor(abs(CAST(x AS DOUBLE) - 3.5) * 10000 + 0.5) AS BIGINT))"),
      time("kernel_err_q_sum", "arr_abs_err_q_sum(a, CAST(3.5 AS DOUBLE), 10000)"),
      time(
        "hof_seasonal",
        "aggregate(sequence(7, 63), 0L, (acc, t) -> acc + abs(CAST(element_at(a, t + 1) AS BIGINT) - element_at(a, t - 6)))"),
      time("kernel_seasonal", "arr_seasonal_abs_sum(a, 7)"))
    val js = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    println(s"""{"kernel_bench":{"arrays":$n,"elems_per_array":64,$js}}""")
    spark.stop()
  }
}
