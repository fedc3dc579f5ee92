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
}
