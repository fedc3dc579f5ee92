package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The packed scaler family's trivial member — PackedNOPScaler
 * (uni2ts/src/uni2ts/module/packed_scaler.py:63-75): loc = 0, scale = 1,
 * i.e. scaling disabled while keeping the (loc, scale) interface every
 * downstream consumer expects. The two non-trivial members live where
 * their aggregations do: PackedStdScaler is the grouped mean/variance of
 * the rollup ladder (operators/Rollup.scala, q_rollup_stats) and
 * PackedAbsMeanScaler is q_scaler_absmean (queries/StatQueries.scala).
 */
object Scalers {

  /** Attach the NOP scaler's constant (loc, scale) columns. Row-local,
   * zero shuffle; Catalyst folds the literals into any downstream
   * (x - loc) / scale projection, so the NOP path costs nothing at any
   * scale — matching the reference, where it is the "scaling off"
   * configuration switch. */
  def nop(df: DataFrame, locCol: String = "loc", scaleCol: String = "scale"): DataFrame =
    df.withColumn(locCol, lit(0.0)).withColumn(scaleCol, lit(1.0))
}
