package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding similarity search: brute-force cosine top-k (exact baseline)
 * and random-hyperplane LSH bucketing (the scale path).
 *
 * Determinism discipline: embeddings are float32; every cross-engine value
 * is computed on FIXED-POINT quantized components
 * (q = floor(x * 1000 + 0.5), exact in both engines), so dot products and
 * norms are exact integer sums — order-free — and the final cosine is one
 * deterministic double expression. Quantization is also the realistic
 * at-scale choice (int8/int16 quantized ANN).
 */
object Similarity {

  /** Adds `qvec: array<bigint>` (fixed-point) and `norm2: bigint`. */
  def quantized(emb: DataFrame, vecCol: String): DataFrame =
    emb
      .withColumn(
        "qvec",
        expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"))
      .withColumn("norm2", expr("aggregate(qvec, 0L, (a, v) -> a + v * v)"))

  private val cosExpr =
    expr(
      "CAST(aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (a, v) -> a + v) AS DOUBLE)" +
        " / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))")

  /** All pairs (a < b) within the same blocking column with cosine >=
   * threshold. Row-local exact-integer dot product via zip_with/aggregate. */
  def cosinePairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    val q = quantized(emb, vecCol)
      .select(col(idCol).as("_ida"), col(blockCol).as("_blk"), col("qvec").as("qa"), col("norm2").as("na"))
    val r = quantized(emb, vecCol)
      .select(col(idCol).as("_idb"), col(blockCol).as("_blkb"), col("qvec").as("qb"), col("norm2").as("nb"))
    q.join(r, col("_blk") === col("_blkb") && col("_ida") < col("_idb"))
      .select(
        col("_ida").as("id_a"),
        col("_idb").as("id_b"),
        cosExpr.as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Brute-force top-k cosine neighbors for each query vector against the
   * full corpus (self excluded). The corpus side is broadcast when small;
   * at scale this is the exact-rerank stage after LSH/IVF pruning. */
  def cosineTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    val base = quantized(emb, vecCol)
    val queries = base
      .filter(queryPred)
      .select(col(idCol).as("query_id"), col("qvec").as("qa"), col("norm2").as("na"))
    val corpus = base
      .select(col(idCol).as("neighbor_id"), col("qvec").as("qb"), col("norm2").as("nb"))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queries)
      .join(corpus, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosExpr.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket id (`nPlanes`-bit signature). Plane
   * components are deterministic pseudo-random ±1/±2/±3 values derived from
   * (plane, dim) by integer hashing — identical at any parallelism. The
   * bucket is the sign pattern of the quantized dot products. */
  def lshBucketed(emb: DataFrame, idCol: String, vecCol: String, nPlanes: Int): DataFrame = {
    // plane(p, d) = ((hash64(p * D + d) mod 7) - 3), a small signed weight
    val q = quantized(emb, vecCol)
    q.withColumn(
      "lsh_bucket",
      expr(
        s"""aggregate(
           |  sequence(0, ${nPlanes - 1}),
           |  0L,
           |  (acc, p) -> acc * 2 + CASE WHEN
           |    aggregate(
           |      zip_with(qvec, sequence(0, size(qvec) - 1),
           |        (v, d) -> v * (pmod(xxhash64(p * 1024 + d), 7) - 3)),
           |      0L, (a, x) -> a + x) >= 0 THEN 1 ELSE 0 END)""".stripMargin))
  }

  /** ANN via LSH: exact cosine ranking restricted to same-bucket candidates.
   * Returns (query_id, neighbor_id, cos, rank<=k). Recall vs the exact
   * baseline is asserted in SimilaritySpec. */
  def annTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: org.apache.spark.sql.Column,
      nPlanes: Int,
      k: Int): DataFrame = {
    val b = lshBucketed(emb, idCol, vecCol, nPlanes)
    val queries = b
      .filter(queryPred)
      .select(col(idCol).as("query_id"), col("qvec").as("qa"), col("norm2").as("na"), col("lsh_bucket"))
    val corpus = b
      .select(col(idCol).as("neighbor_id"), col("qvec").as("qb"), col("norm2").as("nb"), col("lsh_bucket").as("_cb"))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    queries
      .join(corpus, col("lsh_bucket") === col("_cb") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosExpr.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
