package graft.core

/**
 * Seasonality period per frequency alias — the engine's analogue of
 * `gluonts.time_feature.get_seasonality`, which the reference uses to pick
 * the seasonal-naive lag m for MASE/MSIS
 * (uni2ts/src/uni2ts/eval_util/evaluation.py:26,73-88: `seasonality_entry
 * = get_seasonality(freq)` when not given explicitly).
 *
 * Base table (periods of the dominant cycle at each granularity, the
 * public gluonts defaults): secondly 3600 (one hour), minutely 1440 (one
 * day), hourly 24 (one day), daily 1 , weekly 1, monthly 12 (one year),
 * business-daily 5 (one week), quarterly 4 (one year). A multiplied alias
 * "kF" keeps the cycle length: seasonality(base)/k when divisible, else 1
 * (the same rule gluonts applies via `to_offset(freq).n`).
 */
object Seasonality {

  val Defaults: Map[String, Int] = Map(
    "S" -> 3600,
    "T" -> 1440,
    "H" -> 24,
    "D" -> 1,
    "B" -> 5,
    "W" -> 1,
    "M" -> 12,
    "Q" -> 4,
    "A" -> 1,
    "Y" -> 1)

  /** Seasonal period for a (possibly multiplied) freq alias; 1 when the
   * alias is unknown or the multiple does not divide the base period. */
  def of(freq: String): Int = {
    val mult = freq.takeWhile(_.isDigit)
    val k = if (mult.isEmpty) 1 else mult.toInt
    val base = Defaults.getOrElse(PatchSizing.baseAlias(freq), 1)
    if (k > 0 && base % k == 0) base / k else 1
  }
}
