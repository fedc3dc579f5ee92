package graft

/** Shared full-consumption timing action for the SIDE benchmark mains
 * ([[BenchExtra]], [[BenchScalingExtra]]). Same contract as the frozen
 * [[Bench]]'s private copy: count + hash-sum over EVERY output column,
 * so Catalyst cannot prune aggregate expressions out of a timed plan
 * (the count()-pruning lesson — see Bench.consumeAll's doc). Bench
 * itself is frozen and keeps its own definition; any future protocol
 * fix must be applied to both. */
private[graft] object BenchActions {
  def consumeAll(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.functions.{col, hash, sum, count => cnt, lit}
    df.select(
        cnt(lit(1)).as("n"),
        sum(hash(df.columns.map(col): _*).cast("long")).as("h"))
      .first()
      .getLong(0)
  }
}
