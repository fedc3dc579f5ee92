package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: a new session starts when the time since the
 * previous event on the same key exceeds `gap`.
 *
 * Semantic ancestor: the reference's rolling window enumeration with a
 * `distance` stride (uni2ts/src/uni2ts/data/dataset.py:185-211) — batch-form
 * session windows (SURVEY.md §2.10: no streaming session windows exist in
 * the reference; this is the batch equivalent).
 *
 * One shuffle on the key + in-partition sort; the session id is a running
 * sum over a boolean gap indicator (lag + cumulative sum), the canonical
 * linear-time construction.
 */
object Sessionize {

  /** Adds `session_id` (0-based per key) to `df`.
   * @param tsMicrosCol event time in epoch microseconds (long)
   * @param gapMicros   inactivity gap that splits sessions
   * @param tieBreak    extra ordering columns making the within-key order
   *                    TOTAL — `lag`/running sums over a non-unique order
   *                    are nondeterministic when two events of one key share
   *                    a timestamp, so callers should pass a unique id
   */
  def assignSessions(
      df: DataFrame,
      keys: Seq[String],
      tsMicrosCol: String,
      gapMicros: Long,
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val order = (tsMicrosCol +: tieBreak).map(col)
    val byTime = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val run = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(
        "_new_session",
        when(
          col(tsMicrosCol) - lag(col(tsMicrosCol), 1).over(byTime) > gapMicros,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new_session")).over(run))
      .drop("_new_session")
  }
}
