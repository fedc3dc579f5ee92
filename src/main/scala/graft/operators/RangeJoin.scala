package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scale-safe interval (range) join: points ⋈ intervals on
 * `start <= t <= end` within a key, WITHOUT a pairwise range comparison.
 *
 * Construction: time is cut into coarse buckets; every interval is
 * exploded to each bucket it overlaps, every point maps to its single
 * bucket, and the join is a plain equi-join on (key, bucket) with the
 * exact range predicate applied only to bucket-colliding candidates. A
 * matching (point, interval) pair meets in EXACTLY ONE bucket — the
 * point's own — so no dedup pass is needed.
 *
 * Scale: shuffle volume is |points| + Σ interval spans/bucketWidth
 * (the replication factor), and candidate verification is local — the
 * same banding discipline as the MinHash/SimHash dedup paths, applied to
 * the time axis. Choose bucketWidth ≈ the typical interval span.
 */
object RangeJoin {

  /** All (point, interval) matches with `startCol <= tCol <= endCol`,
   * equi-joined on `keys`. Output: point columns + interval columns. */
  def pointsInIntervals(
      points: DataFrame,
      keys: Seq[String],
      tCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    val p = points.withColumn("_bkt", expr(s"$tCol DIV $bucketWidth"))
    val iv = intervals.withColumn(
      "_bkt",
      explode(sequence(
        expr(s"$startCol DIV $bucketWidth"),
        expr(s"$endCol DIV $bucketWidth"))))
    p.join(iv, keys :+ "_bkt")
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("_bkt")
  }
}
