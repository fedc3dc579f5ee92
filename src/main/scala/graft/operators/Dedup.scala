package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines over the documents
 * table: exact (hash groupBy), word-n-gram Jaccard, MinHash+LSH.
 *
 * Scale design notes:
 *  - exact dedup is one groupBy on a 128-bit content hash — shuffle volume
 *    is one row per document, never the text;
 *  - n-gram Jaccard uses a (shingle -> doc) inverted-list self-join BLOCKED
 *    by `source` (a pair can only match within a block), which bounds the
 *    quadratic term by the largest block, the standard blocking discipline;
 *  - MinHash+LSH replaces the all-pairs join with banded signature
 *    bucketing: candidate generation is linear in documents × bands, and
 *    only bucket-colliding pairs are verified exactly.
 */
object Dedup {

  /** words/shingles helper: word n-gram shingle array per doc. */
  def withShingles(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs
      .withColumn("_ws", split(col(textCol), " "))
      .filter(size(col("_ws")) >= n)
      .withColumn(
        "shingles",
        expr(
          s"array_distinct(transform(sequence(1, size(_ws) - ${n - 1}), " +
            s"i -> concat_ws(' ', ${(0 until n).map(k => s"element_at(_ws, i + $k)").mkString(", ")})))"))
      .drop("_ws")

  /** Exact dedup: group identical texts by md5, keep the smallest id as the
   * canonical representative. Output: one row per KEPT doc with its
   * duplicate-group size. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("text_hash")).orderBy(col(idCol))
    docs
      .select(col(idCol), md5(col(textCol)).as("text_hash"))
      .withColumn("group_size", count(lit(1)).over(Window.partitionBy(col("text_hash"))))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** All pairs (a < b) within the same `blockCol` whose distinct word-n-gram
   * Jaccard similarity >= threshold. Jaccard is exact-integer arithmetic
   * (|A∩B| / (|A|+|B|-|A∩B|)) — deterministic under any shuffle. */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int,
      threshold: Double): DataFrame = {
    val sh = withShingles(docs, textCol, n)
      .select(col(idCol).as("_id"), col(blockCol).as("_blk"), explode(col("shingles")).as("s"))
    val cnt = sh.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    val a = sh
    val b = sh.select(col("_id").as("_idb"), col("_blk").as("_blkb"), col("s").as("sb"))
    val inter = a
      .join(b, col("s") === col("sb") && col("_blk") === col("_blkb") && col("_id") < col("_idb"))
      .groupBy(col("_id"), col("_idb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.withColumnRenamed("_id", "_ca").withColumnRenamed("_n", "na"), col("_id") === col("_ca"))
      .join(cnt.withColumnRenamed("_id", "_cb").withColumnRenamed("_n", "nb"), col("_idb") === col("_cb"))
      .select(
        col("_id").as("doc_a"),
        col("_idb").as("doc_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -- MinHash + LSH ------------------------------------------------------

  /** MinHash signature per doc: sig[i] = min over shingles of the i-seeded
   * xxhash64 of the shingle (one independent permutation per seed — no
   * overflow under ANSI mode, deterministic at any parallelism). One
   * shuffle (groupBy id). */
  def minHashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int): DataFrame = {
    val sh = withShingles(docs, textCol, n)
      .select(col(idCol).as("_id"), explode(col("shingles")).as("s"))
    val aggs = (0 until numHashes).map { i =>
      min(xxhash64(lit(i), col("s"))).as(s"mh_$i")
    }
    sh.groupBy(col("_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("_id"), array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
  }

  /** LSH candidate pairs from banded signatures, verified with exact
   * Jaccard over distinct shingle sets (row-local array_intersect on the
   * candidate pairs only). */
  def minHashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val sigs = minHashSignatures(docs, idCol, textCol, n, numHashes)
    val banded = sigs.select(
      col("_id"),
      explode(
        expr(
          s"transform(sequence(0, ${bands - 1}), " +
            s"b -> struct(b AS band, xxhash64(concat_ws(',', slice(sig, b * $rows + 1, $rows)), b) AS bh))"))
        .as("bb"))
    val candidates = banded
      .select(col("_id"), col("bb.band"), col("bb.bh"))
      .join(
        banded.select(col("_id").as("_idb"), col("bb.band").as("bandb"), col("bb.bh").as("bhb")),
        col("band") === col("bandb") && col("bh") === col("bhb") && col("_id") < col("_idb"))
      .select(col("_id"), col("_idb"))
      .distinct()
    val sets = withShingles(docs, textCol, n).select(col(idCol).as("_sid"), col("shingles"))
    candidates
      .join(sets.withColumnRenamed("_sid", "_id_a").withColumnRenamed("shingles", "sa"), col("_id") === col("_id_a"))
      .join(sets.withColumnRenamed("_sid", "_id_b").withColumnRenamed("shingles", "sb"), col("_idb") === col("_id_b"))
      .select(
        col("_id").as("doc_a"),
        col("_idb").as("doc_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
