package graft

import graft.core.Tier
import graft.functions.GraftFunctions
import graft.operators.{Dedup, Downsample, GapFill, Rollup}
import graft.sources.TokenTable
import org.apache.spark.sql.functions._

/** One end-to-end chain through the engine — documents → dedup → token
 * table → tier ladder → gap-fill → downsample → compressed payload —
 * asserting a conservation invariant at every stage boundary. This is the
 * "a user could run their whole pipeline on this" test, not a per-operator
 * one. */
class PipelineE2ESpec extends SparkSpec {

  test("documents → dedup → rollup → gap-fill → LTTB → codec payload, invariants at every stage") {
    GraftFunctions.register(spark)
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()

    // 1. exact dedup: representatives' group sizes cover the corpus
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
    assert(kept.agg(sum("group_size")).collect()(0).getLong(0) == nDocs)

    // 2. token table restricted to kept docs; token mass must equal the
    // arithmetic formula's total over kept docs
    val keptIds = kept.select(col("doc_id"))
    val raw = TokenTable.raw(spark, dir).join(keptIds, "doc_id")
    val points = TokenTable
      .points(spark, dir)
      .join(keptIds.select(col("doc_id").cast("bigint").as("doc_id")), "doc_id")
    val tokSumRaw = raw
      .select(expr("aggregate(tokens, 0L, (a, x) -> a + x)").as("s"))
      .agg(sum("s")).collect()(0).getLong(0)
    val tokSumPts = points.agg(sum(col("tok").cast("long"))).collect()(0).getLong(0)
    assert(tokSumRaw == tokSumPts)

    // 3. tier ladder: every tier conserves sum and count exactly
    val ladder = Rollup.ladder(points)
    val cnt = points.count()
    for ((tier, df) <- ladder) {
      val r = df.agg(sum("sum_tok"), sum("cnt_tok")).collect()(0)
      assert(r.getLong(0) == tokSumPts, s"tier $tier sum drift")
      assert(r.getLong(1) == cnt, s"tier $tier count drift")
    }

    // 4. gap-fill of the (dense) 1m tier is an identity on observed rows
    val t1m = ladder(Tier.OneMinute)
    val filled = GapFill.gapFill(
      t1m.select("source", "bucket", "window_start", "avg_tok", "cnt_tok"),
      keys = Seq("source", "bucket"),
      windowCol = "window_start",
      width = 60L,
      fillCols = Seq("avg_tok"),
      zeroCols = Map("cnt_tok" -> lit(0L)))
    assert(filled.count() == t1m.count()) // dense input: spine adds nothing
    assert(filled.filter(col("cnt_tok") === 0).count() == 0)

    // 5. causal-mean fill on the same dense tier is also an identity
    val causal = GapFill.gapFillCausalMean(
      t1m.select("source", "bucket", "window_start", "sum_tok", "cnt_tok"),
      keys = Seq("source", "bucket"),
      windowCol = "window_start",
      width = 60L,
      sumCol = "sum_tok",
      cntCol = "cnt_tok")
    val drift = causal
      .withColumn("own", col("sum_tok").cast("double") / col("cnt_tok").cast("double"))
      .filter(col("avg_filled") =!= col("own"))
      .count()
    assert(drift == 0, "causal fill must not rewrite observed windows")

    // 6. LTTB over each (source, bucket) tier series keeps endpoints
    val ds = Downsample.lttb(
      spark,
      t1m.select(
        concat(col("source"), lit(":"), col("bucket")).as("k"),
        col("window_start").cast("double").as("x"),
        col("avg_tok").as("y")),
      "k", "x", "y", 5)
    val perKey = ds.groupBy("k").agg(count(lit(1)).as("n"), min("x").as("x0"), max("x").as("x1"))
    val ext = t1m
      .groupBy(concat(col("source"), lit(":"), col("bucket")).as("k"))
      .agg(min(col("window_start").cast("double")).as("w0"), max(col("window_start").cast("double")).as("w1"))
    val bad = perKey
      .join(ext, "k")
      .filter(col("n") > 5 || col("x0") =!= col("w0") || col("x1") =!= col("w1"))
      .count()
    assert(bad == 0, "LTTB must keep first/last and respect the threshold")

    // 7. payload codecs round-trip the tier series bit-exactly in-plan
    val payloadDrift = t1m
      .groupBy(col("source"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("window_start"), col("avg_tok")))).as("series"))
      .select(
        expr("transform(series, s -> s.avg_tok)").as("vals"),
        expr("transform(series, s -> CAST(s.window_start AS BIGINT))").as("ts"))
      .filter(
        expr("gorilla_decode(gorilla_encode(vals)) != vals") ||
          expr("chimp_decode(chimp_encode(vals)) != vals") ||
          expr("dod_decode(dod_encode(ts)) != ts"))
      .count()
    assert(payloadDrift == 0, "codec round-trips must be exact on tier payloads")
  }
}
