package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Physical-layout reshaping operators — the engine's dedicated analogue of
 * the reference's PackFields / FlatPackFields / FlatPackCollection /
 * SequencifyField (uni2ts/src/uni2ts/transform/reshape.py:26-123): array
 * concatenation along the variate axis, full flattening of nested
 * collections, and scalar-to-sequence broadcast. All row-local (zero
 * shuffle) and codegen'd built-ins.
 */
object Reshape {

  /** PackFields: concatenate several array columns into one array. */
  def packFields(df: DataFrame, fields: Seq[String], out: String): DataFrame =
    df.withColumn(out, concat(fields.map(col): _*))

  /** FlatPackCollection: flatten an array-of-arrays column fully. */
  def flatPack(df: DataFrame, field: String, out: String): DataFrame =
    df.withColumn(out, flatten(col(field)))

  /** SequencifyField: broadcast a scalar column to a length-n array. */
  def sequencify(df: DataFrame, field: String, n: Int, out: String): DataFrame =
    df.withColumn(out, array_repeat(col(field), n))

  /** AddVariateIndex (transform/feature.py:26-71): assign each exploded
   * variate a distinct id in [0, maxDim), optionally as a randomized
   * permutation — here DETERMINISTIC: an affine bijection
   * `(a*d + b) mod maxDim` with odd `a` derived from the row id hash, so
   * the permutation reproduces at any parallelism (the engine's standing
   * substitution for np.random). A dim index >= maxDim is a HARD runtime
   * error, matching the reference's assert (feature.py:56-58) — a silent
   * mod-wrap would hand two dims the same variate id. `dimCol` is the
   * 0-based dim index of an already posexploded frame. */
  def addVariateIndex(
      df: DataFrame,
      idCol: String,
      dimCol: String,
      maxDim: Int,
      out: String): DataFrame = {
    require(
      maxDim >= 2 && Integer.bitCount(maxDim) == 1,
      s"maxDim must be a power of two >= 2, got $maxDim")
    // prime-reduced mix (the UnionBuilder.permilleBucketSql rationale):
    // without it the power-of-two moduli below see only a low-bit
    // permutation of the id and strided id spaces degenerate
    val h = s"pmod((CAST($idCol AS BIGINT) % 1000000007L) * 2654435761L, 1000000007L)"
    df.withColumn(
      out,
      expr(
        s"CASE WHEN $dimCol >= $maxDim THEN " +
          s"CAST(raise_error(CONCAT('variate dim ', $dimCol, ' exceeds max_dim $maxDim')) AS INT) " +
          s"ELSE CAST(pmod((2L * pmod($h, ${maxDim / 2}) + 1L) * $dimCol " +
          s"+ pmod($h DIV 64, $maxDim), $maxDim) AS INT) END"))
  }
}
