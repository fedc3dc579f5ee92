package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PatchCrop — the reference's random patch-aligned training-window sampler
 * (uni2ts/src/uni2ts/transform/crop.py:30-108), made deterministic:
 *
 *   offset        in [0, time mod P]           (start not always a patch multiple)
 *   total_patches = (time - offset) div P
 *   max_p         = min(maxPatches, total_patches)   [will_flatten=false => nvar=1]
 *   num_patches   in [minTimePatches, max_p]
 *   first         in [0, total_patches - num_patches]
 *   crop          = [offset + first*P, offset + (first+num)*P)
 *
 * The reference draws the three variates from np.random; here each is a
 * fixed modular-hash function of the series id (the engine's standing
 * substitution — SQL-expressible on BOTH engines, so the crop itself is
 * oracle-checkable, unlike an opaque RNG). Rows where max_p <
 * minTimePatches are filtered (the reference raises there,
 * crop.py:93-96); the richer seeded samplers live in
 * [[graft.core.Samplers]] for driver-side use.
 */
object Crop {

  def patchCrop(
      df: DataFrame,
      idCol: String,
      arrCol: String,
      lenCol: String,
      patchSize: Int,
      minTimePatches: Int,
      maxPatches: Int): DataFrame = {
    require(minTimePatches <= maxPatches, "min_patches must be <= max_patches")
    // pmod, not %: a negative id's sign-preserving remainder would make
    // _offset negative and slice() silently take an END-anchored crop
    val h = s"pmod((CAST($idCol AS BIGINT) % 1000000000L) * 2654435761L, 1000000007L)"
    df.withColumn("_h", expr(h))
      .withColumn("_offset", expr(s"CAST(_h % ($lenCol % $patchSize + 1) AS INT)"))
      .withColumn("_total", expr(s"CAST(($lenCol - _offset) DIV $patchSize AS INT)"))
      .withColumn("_maxp", expr(s"LEAST($maxPatches, _total)"))
      .filter(col("_maxp") >= minTimePatches)
      .withColumn(
        "num_patches",
        expr(s"CAST($minTimePatches + (_h DIV 7) % (_maxp - $minTimePatches + 1) AS INT)"))
      .withColumn(
        "first_patch",
        expr("CAST((_h DIV 49) % (_total - num_patches + 1) AS INT)"))
      .withColumn("crop_start", expr(s"_offset + first_patch * $patchSize"))
      .withColumn(
        "crop",
        expr(s"slice($arrCol, crop_start + 1, num_patches * $patchSize)"))
      .drop("_h", "_offset", "_total", "_maxp")
  }
}
