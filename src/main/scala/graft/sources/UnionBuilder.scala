package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Weighted multi-source dataset builder — the engine's analogue of the
 * reference's `LOTSADatasetBuilder.load_dataset` composition
 * (uni2ts/src/uni2ts/data/builder/lotsa_v1/_base.py:71-112): each named
 * dataset gets a per-dataset transform resolved from a transform map, a
 * multiplicative `dataset_weight` on its size (data/dataset.py:36-46:
 * `__len__ = ceil(weight * len(indexer))`), and the results are
 * concatenated (ConcatDataset).
 *
 * Transform resolution priority mirrors `_get_transform`
 * (_base.py:90-112): dataset name -> dataset type -> "default" -> identity.
 *
 * The reference realizes the weight by repeating/sampling indices at
 * __getitem__ time; the deterministic batch analogue replicates each row
 * `floor(w)` times plus one more iff `hash(id) mod 1000 < frac(w) * 1000`
 * (the same multiplicative hash as the weighted Bernoulli sampler,
 * StatQueries q_weighted_sample), so the expected size is `w * |dataset|`
 * and the result is bit-reproducible at any parallelism.
 *
 * Scale shape: per-source transforms and the replication are row-local
 * (a filter + a bounded explode); the union is a plan-level concat — no
 * shuffle is introduced by the builder itself.
 */
object UnionBuilder {

  /** One named input dataset: the frame, its dataset type (the reference's
   * `dataset_type_map` entry), and the size weight. */
  final case class Source(
      df: DataFrame,
      datasetType: String = "default",
      weight: Double = 1.0) {
    require(weight >= 0, s"negative dataset weight: $weight")
  }

  /** Sign-safe deterministic permille bucket of a numeric id:
   * multiplicative mix reduced by the PRIME modulus 1e9+7 BEFORE the
   * mod-1000 projection. The prime step is load-bearing: with a
   * composite modulus the multiplier cancels (2654435761 ≡ 761 mod
   * 1000, and 1000 | 1e9), so the bucket degenerates to a fixed
   * permutation of `id mod 1000` and any strided id space (sharded
   * allocators emitting multiples of 1000) collapses into ONE bucket.
   * The prime modulus makes every id stride cover all residues. */
  private[graft] def permilleBucketSql(idCol: String): String =
    s"pmod(pmod((CAST($idCol AS BIGINT) % 1000000007L) * 2654435761L, 1000000007L), 1000L)"

  /** `_get_transform` priority: name -> type -> "default" -> identity. */
  def transformFor(
      name: String,
      datasetType: String,
      transformMap: Map[String, DataFrame => DataFrame]): DataFrame => DataFrame =
    transformMap
      .get(name)
      .orElse(transformMap.get(datasetType))
      .orElse(transformMap.get("default"))
      .getOrElse(identity)

  /**
   * Load + transform + weight + concat. Output carries two builder columns:
   * `ds` (the dataset name) and `rep_idx` (1-based replica index, so
   * weighted duplicates stay distinguishable downstream).
   *
   * @param idCol numeric (long-castable) id column used by the
   *              deterministic fractional-replication hash
   */
  def load(
      sources: Seq[(String, Source)],
      transformMap: Map[String, DataFrame => DataFrame],
      idCol: String): DataFrame = {
    require(sources.nonEmpty, "no sources")
    // the builder owns ds/rep_idx/_rep; an input already carrying one of
    // them would be silently clobbered by withColumn — refuse up front
    // (same reserved-name discipline as AsOfJoin.asOf)
    val reserved = Set("ds", "rep_idx", "_rep")
    val clash =
      sources.flatMap(_._2.df.columns).filter(reserved.contains).distinct
    require(
      clash.isEmpty,
      s"UnionBuilder inputs must not contain reserved column name(s): ${clash.mkString(", ")}")
    val parts = sources.map { case (name, src) =>
      val t = transformFor(name, src.datasetType, transformMap)
      val base = math.floor(src.weight).toInt
      val fracThreshold = math.round((src.weight - base) * 1000).toInt
      t(src.df)
        .withColumn("ds", lit(name))
        .withColumn(
          "_rep",
          // pmod, not %: a negative id's sign-preserving remainder would
          // always clear the threshold and over-replicate the row
          lit(base) + when(
            expr(permilleBucketSql(idCol)) < fracThreshold,
            1).otherwise(0))
        .filter(col("_rep") > 0)
        .withColumn("rep_idx", explode(expr("sequence(1, _rep)")))
        .drop("_rep")
    }
    parts.reduce(_ unionByName _)
  }

  /** Deterministic train/val/test assignment by the builder's
   * multiplicative id hash (the same permille-bucket discipline as the
   * fractional replication above): stable under any parallelism,
   * reshuffle, or re-run — a document's split never changes. Row-local;
   * zero shuffle. */
  def assignSplit(
      docs: DataFrame,
      idCol: String,
      testPermille: Int,
      valPermille: Int): DataFrame = {
    require(
      testPermille >= 0 && valPermille >= 0 && testPermille + valPermille <= 1000,
      s"permilles must be >= 0 and sum <= 1000, got $testPermille + $valPermille")
    docs
      .withColumn("split_bucket", expr(permilleBucketSql(idCol)))
      .withColumn(
        "split",
        when(col("split_bucket") < testPermille, "test")
          .when(col("split_bucket") < testPermille + valPermille, "val")
          .otherwise("train"))
  }

  /** Temperature-based source mixing weights — the multilingual-LM
   * sampling scheme (p_s ∝ size_s^alpha, alpha in (0,1]: alpha=1 is
   * proportional sampling, alpha→0 approaches uniform; the XLM/mT5
   * convention). One row per source: doc count, size total, the raw
   * tempered weight, and the normalized mix in parts-per-billion.
   *
   * For alpha = 0.5 the raw weight is floor(sqrt(total)): IEEE-754 sqrt
   * is correctly rounded on every engine and the floor is exact for
   * totals < 2^52, so the whole computation is integer-exact and
   * SQL-oracle-able. Other alphas go through pow() (double;
   * cross-engine bit equality not guaranteed — not oracle-checked).
   *
   * Scale shape: one partial-aggregated groupBy on source; the
   * normalizing window runs over the per-source aggregate only
   * (rows == |sources|, never the corpus). */
  def temperatureWeights(
      docs: DataFrame,
      srcCol: String,
      sizeCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val perSrc = docs
      .groupBy(col(srcCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol).cast("long")).as("size_total"))
    val raw =
      if (alpha == 0.5) floor(sqrt(col("size_total").cast("double"))).cast("long")
      else floor(pow(col("size_total").cast("double"), lit(alpha))).cast("long")
    perSrc
      .withColumn("w_raw", raw)
      .withColumn(
        "mix_ppb",
        // loud, not NULL, when every source is empty (normalizing sum 0):
        // a silent all-NULL mix would propagate into sampling weights.
        // The unpartitioned OVER () is INTENTIONAL and safe: it runs over
        // the per-source aggregate (rows = #sources, tens at most), never
        // the corpus — the WindowExec single-partition warning in bench
        // logs traces here and is pre-explained.
        expr(
          "CASE WHEN sum(w_raw) OVER () = 0 THEN " +
            "raise_error('temperatureWeights: all sources have zero size — no mix is defined') " +
            "ELSE w_raw * 1000000000L DIV sum(w_raw) OVER () END"))
  }
}
