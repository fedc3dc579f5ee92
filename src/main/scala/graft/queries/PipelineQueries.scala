package graft.queries

import graft.functions.GraftFunctions
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline queries over documents/embeddings: dedup (exact,
 * n-gram Jaccard, MinHash+LSH, SimHash), similarity search (brute-force +
 * LSH ANN), text analysis, multimodal plumbing. */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactDedup(docs(s, dir), "doc_id", "text")),

    // Deterministic train/val/test split: 2% test, 5% val by the
    // builder's multiplicative permille hash — stable under any
    // parallelism or re-run, zero shuffle.
    "q_split_assign" -> ((s, dir) =>
      graft.sources.UnionBuilder
        .assignSplit(docs(s, dir), "doc_id", testPermille = 20, valPermille = 50)
        .select(col("doc_id"), col("split_bucket"), col("split"))),

    // Benchmark decontamination (GPT-3/Gopher appendix): corpus docs
    // sharing >= 1 distinct 8-gram with the deterministic "test set"
    // (doc_id % 53 == 0) are flagged. Test shingles broadcast; corpus
    // shuffles once keyed by doc.
    "q_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminate(d, d.filter(col("doc_id") % 53 === 0), "doc_id", "text", 8)
    }),

    "q_dedup_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", "source", 3, 0.5)),

    // Pairs -> clusters -> keep-list (ConnectedComponents.scala): the
    // transitive closure of the verified Jaccard near-dup pairs via
    // alternating large-star/small-star rounds, with the component MINIMUM
    // as the deterministic representative. Every document gets a verdict
    // (singletons keep themselves). Oracle: DuckDB WITH RECURSIVE closure
    // over the identical pair set.
    "q_dedup_clusters" -> ((s, dir) =>
      graft.operators.ConnectedComponents.keepList(
        docs(s, dir),
        "doc_id",
        Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", "source", 3, 0.5))),

    // Incremental closure maintenance: the SAME pair set arrives in two
    // batches (a deterministic third of the pairs is "new"); the old
    // batch is closed first, then incrementalComponents folds the new
    // pairs into the labeling from a warm start. Oracle: the full
    // recursive closure — incremental must equal never-having-batched.
    "q_dedup_incremental" -> ((s, dir) => {
      import graft.operators.ConnectedComponents
      // the pair set feeds both batches: materialize it ONCE (narrow id
      // pairs only) instead of re-running the shingle self-join per
      // filtered branch. localCheckpoint blocks are reclaimed by the
      // ContextCleaner when the result DataFrame is dropped — the same
      // lifetime contract as the closure's own per-round checkpoints
      // (ConnectedComponents.scala), so no persist leak outlives the
      // query. Production incremental maintenance reads COMMITTED pair
      // snapshots (DedupJob), where the delta arrives pre-materialized.
      val pairs =
        Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", "source", 3, 0.5)
          .select(col("doc_a"), col("doc_b"))
          // lazy: materialized by the first action (plan/schema inspection
          // of the query must not execute the shingle self-join at
          // DataFrame-build time), then both branches read the blocks
          .localCheckpoint(eager = false)
      val isNew = (col("doc_a") + col("doc_b")) % 3 === 0
      val prev = ConnectedComponents.components(pairs.filter(!isNew), "doc_a", "doc_b")
      val labels = ConnectedComponents
        .incrementalComponents(prev, pairs.filter(isNew), "doc_a", "doc_b")
        .withColumnRenamed("node", "doc_id")
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep_id"))
        .withColumn("keep", col("doc_id") === col("rep_id"))
    }),

    // MinHash+LSH: 64 hashes × 16 bands of 4 (s-curve threshold ≈ 0.5).
    // No SQL oracle (SplitMix64 signature family is not SQL-reproducible);
    // PipelineSpec asserts the LSH pair set equals the exact-Jaccard pair
    // set at the same threshold.
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minHashLshPairs(docs(s, dir), "doc_id", "text", 3, 64, 16, 0.5)),

    // SimHash near-dup pairs (hamming <= 10) blocked by source, generated
    // via the banded Hamming multi-index (11 bands; pigeonhole guarantees
    // the same pair set as all-pairs with NO within-source cartesian in
    // the plan). Rows-only; PipelineSpec asserts banded == all-pairs and
    // that planted near-dups are found.
    "q_dedup_simhash" -> ((s, dir) => {
      GraftFunctions.register(s)
      val sigs = docs(s, dir)
        .select(
          col("doc_id"),
          col("source"),
          call_function("simhash64", split(col("text"), " ")).as("sig"))
      Dedup.simHashBandedPairs(sigs, "doc_id", "sig", "source", 10)
    }),

    // Embedding near-dup pairs: fixed-point cosine >= 0.4 blocked by label.
    "q_embed_neardup" -> ((s, dir) =>
      Similarity.cosinePairs(emb(s, dir), "vec_id", "embedding", "label", 0.4)),

    // Embedding dedup end to end: cosine near-dup pairs -> connected
    // components -> per-vector keep verdict — the same canonicalization
    // chain as q_dedup_clusters but over the embedding modality, so BOTH
    // dedup front-ends (text shingles, embedding cosine) feed the one
    // closure operator. Oracle: recursive closure over the identical
    // fixed-point pair set.
    "q_embed_keep" -> ((s, dir) =>
      graft.operators.ConnectedComponents.keepList(
        emb(s, dir),
        "vec_id",
        Similarity.cosinePairs(emb(s, dir), "vec_id", "embedding", "label", 0.4),
        "id_a",
        "id_b")),

    // Brute-force exact cosine top-5 for the first 10 vectors.
    "q_knn_bruteforce" -> ((s, dir) =>
      Similarity.cosineTopK(emb(s, dir), "vec_id", "embedding", col("vec_id") < 10, 5)),

    // LSH-bucketed ANN top-5 (8 hyperplanes). Rows-only; PipelineSpec
    // asserts recall vs the exact baseline.
    "q_knn_ann" -> ((s, dir) =>
      Similarity.annTopK(emb(s, dir), "vec_id", "embedding", col("vec_id") < 10, 8, 5)),

    // Multiprobe ANN (9 probes/query: own bucket + every Hamming-1
    // neighbor) — the recall upgrade over single-probe. Rows-only;
    // PipelineSpec asserts recall beats single-probe.
    "q_knn_multiprobe" -> ((s, dir) =>
      Similarity.annTopKMultiprobe(emb(s, dir), "vec_id", "embedding", col("vec_id") < 10, 8, 5)),

    // IVF ANN (coarse quantizer + inverted lists, the FAISS shape):
    // ~1/50 of vectors become centroids, queries probe the 4 nearest
    // lists. Rows-only; PipelineSpec asserts recall on clustered vectors.
    "q_knn_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(emb(s, dir), "vec_id", "embedding", col("vec_id") < 10, 50, 4, 5)),

    // The IVF ASSIGNMENT stage oracle-checked on its own: best-cosine
    // centroid per vector over the modulo-sampled centroid set (1/25 of
    // ids). Quantized integer dot/norms make the cosine (and therefore
    // the argmax, ties to smallest centroid id) bit-equal across engines.
    "q_ivf_assign" -> ((s, dir) =>
      Similarity.ivfAssign(emb(s, dir), "vec_id", "embedding", 25)),

    // the hyperplane ASSIGNMENT stage oracle-checked on its own: the
    // 8-bit sign bucket from the SQL-reproducible lsh_sig_affine weights
    // (two Lehmer rounds of exact BIGINT arithmetic — both engines compute
    // the identical integer plane dots, so the bucket id hash-matches)
    "q_ann_assign" -> ((s, dir) =>
      Similarity.annAssign(emb(s, dir), "vec_id", "embedding", 8)),

    "q_text_tokens" -> ((s, dir) =>
      TextAnalysis.tokenCounts(docs(s, dir), "doc_id", "text")),

    "q_text_quality" -> ((s, dir) =>
      TextAnalysis.qualityScores(docs(s, dir), "doc_id", "text")),

    "q_text_langid" -> ((s, dir) =>
      TextAnalysis.langId(docs(s, dir), "doc_id", "text")),

    // Gopher-class repetition signals: per-row kernel over the document
    // scan (no explode, no shuffle). n-gram identity is the shingle FNV
    // hash; the oracle counts the string n-grams themselves (identical
    // counts absent a within-doc 64-bit collision).
    "q_text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionScores(docs(s, dir), "doc_id", "text")),

    "q_text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(docs(s, dir), "doc_id", "text")),

    // Unigram-LM quality score (the CCNet perplexity filter's SQL-exact
    // core): add-1 smoothed self-trained unigram NLL per doc, fixed-point
    // nano-nats so the sum is order-independent and hash-exact.
    "q_lm_quality" -> ((s, dir) =>
      TextAnalysis.unigramLogLoss(docs(s, dir), "doc_id", "text")),

    // Top-5 tf-idf keywords per doc, exact fixed-point idf, deterministic
    // rank ties (score desc, word asc).
    "q_tfidf_keywords" -> ((s, dir) =>
      TextAnalysis.tfIdfKeywords(docs(s, dir), "doc_id", "text", 5)),

    // The SimHash ASSIGNMENT stage hash-checked on its own: 16-bit
    // buckets from the SQL-reproducible simhash_affine kernel (the
    // q_ann_assign template applied to text).
    "q_simhash_assign" -> ((s, dir) =>
      graft.operators.Dedup.simHashAssign(docs(s, dir), "doc_id", "text", 16)),

    // The MinHash ASSIGNMENT stage hash-checked on its own: per-seed
    // signature minima from the SQL-reproducible minhash_affine kernel
    // (3-gram shingles, 8 seeds; docs under 3 words have no shingles and
    // emit no rows — matching the oracle's n-gram enumeration).
    "q_minhash_assign" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      docs(s, dir).select(
        col("doc_id"),
        posexplode(call_function("minhash_affine", col("text"), lit(3), lit(8)))
          .as(Seq("seed", "min_val")))
    }),

    // The composed curation verdict: every gate its own boolean column
    // plus the conjunction — the end-to-end quality-filter face of the
    // text ops above.
    "q_curation_verdict" -> ((s, dir) =>
      TextAnalysis.curationVerdict(docs(s, dir), "doc_id", "text")),

    // The funnel's END-USER-FACING per-doc labels on the hard gate: the
    // exact frame CurationJob commits (canonical / contaminated /
    // quality_ok / kept / split), vs one DuckDB recomputation of all
    // four gates composed — JobSpec checks the counters; this checks the
    // labeling itself.
    "q_curation_funnel" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.jobs.CurationJob
        .labelDocs(d, d.filter(col("doc_id") % 53 === 0))
        .select(
          col("doc_id"), col("split"), col("canonical"),
          col("contaminated"), col("quality_ok"), col("kept"))
    }),

    // Multimodal: batched decode+feature plumbing over binary media. ALL
    // THREE modalities are real container decodes (PNG / RIFF-WAVE PCM /
    // RIFF-AVI DIB) and their stats are over the DECODED payloads; every
    // container is lossless, so the oracle reproduces the decoded bytes
    // from doc_id arithmetic alone.
    "q_multimodal_features" -> ((s, dir) =>
      Multimodal
        .features(s, Multimodal.mediaTable(s, dir))
        .toDF()
        .select("doc_id", "modality", "n_bytes", "hist_sum", "spaces_bin")),

    // Frame sampling: 256-byte frames, every 2nd kept — an audio/video
    // operation (byte-chunking a compressed PNG container is meaningless,
    // and its deflate length is not SQL-reproducible). Operates on the
    // CONTAINER bytes; both containers are fixed-size (audio 444 B,
    // video 2304 B) so the chunk geometry is SQL-reproducible.
    "q_multimodal_frames" -> ((s, dir) =>
      Multimodal
        .frameSample(
          Multimodal.mediaTable(s, dir).filter(col("modality") =!= "image"),
          256,
          2)
        .select(col("doc_id"), col("modality"), explode(col("frames")).as("f"))
        .select(
          col("doc_id"),
          col("modality"),
          col("f.frame_idx").as("frame_idx"),
          octet_length(col("f.frame")).as("frame_bytes"))),

    // REAL video-frame decode surface: every '00db' DIB frame of each AVI
    // container, with its unsigned-byte checksum — uncompressed DIB is
    // lossless, so the oracle recomputes each frame's sum from the
    // deterministic pattern without touching the container.
    "q_video_frames" -> ((s, dir) =>
      Multimodal
        .videoFrames(s, Multimodal.mediaTable(s, dir))
        .toDF()),

    // The CANONICAL §3.1 training chain composed end-to-end (SURVEY §3.1:
    // ImputeTimeSeries(0) -> Patchify -> AddVariateIndex -> AddTimeIndex ->
    // AddObservedMask -> EvalMaskedPrediction -> pack): deterministic
    // missingness planted per point, dummy-imputed, patched at width 64,
    // feature-indexed, horizon-masked (last 16 positions), and reduced to
    // exact per-patch checksums a plain SQL oracle reproduces.
    "q_train_pipeline" -> ((s, dir) =>
      graft.sources.TokenTable
        .raw(s, dir)
        .select(
          col("doc_id").cast("long").as("doc_id"),
          col("source"),
          col("n_tok"),
          posexplode(col("tokens")).as(Seq("i", "tok")))
        .withColumn("pos", col("i").cast("int"))
        // planted missingness + AddObservedMask (feature.py:107-127)
        .withColumn("observed", expr("(doc_id + pos) % 7 != 0"))
        // ImputeTimeSeries with DummyValueImputation(0) (imputation.py:32-40)
        .withColumn("y", expr("CASE WHEN observed THEN tok ELSE 0 END"))
        // Patchify (patch.py:123-159) + AddTimeIndex/AddSampleIndex
        .withColumn("patch_idx", expr("pos DIV 64"))
        // EvalMaskedPrediction horizon mask (task.py:116-166), last 16
        .withColumn("prediction_mask", expr("pos >= n_tok - 16"))
        .groupBy(col("doc_id"), col("source"), col("patch_idx"))
        .agg(
          count(lit(1)).cast("int").as("patch_len"),
          sum(expr("CAST(observed AS BIGINT)")).as("obs_cnt"),
          sum(expr("CAST(y AS BIGINT)")).as("y_sum"),
          sum(expr("CAST(prediction_mask AS BIGINT)")).as("pred_cnt"),
          sum(col("pos").cast("long")).as("time_id_sum"),
          max(lit(1)).as("sample_id"),
          max(lit(0)).as("variate_id")))
  )

  private val ShinglesCte =
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT DISTINCT doc_id, source,
      |              ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) t)""".stripMargin

  private val ModalityCase =
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

  /** Shared recursive-closure oracle: q_dedup_clusters and
   * q_dedup_incremental must stay in lockstep — the incremental warm
   * start is defined as observationally identical to never batching. */
  private lazy val dedupClosureOracle: String =
    s"""${ShinglesCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |jp AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT p.doc_a, p.doc_b,
         |           CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard
         |    FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |          FROM sh a JOIN sh b
         |            ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2) p
         |    JOIN cnt ca ON p.doc_a = ca.doc_id
         |    JOIN cnt cb ON p.doc_b = cb.doc_id)
         |  WHERE jaccard >= 0.5),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
         |          UNION SELECT doc_b, doc_a FROM jp),
         |walk(node, r) AS (
         |  SELECT DISTINCT u, u FROM edges
         |  UNION
         |  SELECT e.v, wk.r FROM walk wk JOIN edges e ON e.u = wk.node),
         |comp AS (SELECT node, MIN(r) AS rep FROM walk GROUP BY node)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |       CAST(COALESCE(c.rep, d.doc_id) AS BIGINT) AS rep_id,
         |       (d.doc_id = COALESCE(c.rep, d.doc_id)) AS keep
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.node""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_train_pipeline" ->
      s"""${TokenRollupQueries.PtsCte},
         |d AS (SELECT p.*, count(*) OVER (PARTITION BY doc_id) AS nn FROM pts p)
         |SELECT doc_id, source, CAST(pos // 64 AS INT) AS patch_idx,
         |       CAST(count(*) AS INT) AS patch_len,
         |       CAST(sum(CASE WHEN (doc_id + pos) % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS obs_cnt,
         |       CAST(sum(CASE WHEN (doc_id + pos) % 7 <> 0 THEN tok ELSE 0 END) AS BIGINT)
         |         AS y_sum,
         |       CAST(sum(CASE WHEN pos >= nn - 16 THEN 1 ELSE 0 END) AS BIGINT) AS pred_cnt,
         |       CAST(sum(pos) AS BIGINT) AS time_id_sum,
         |       CAST(1 AS INT) AS sample_id,
         |       CAST(0 AS INT) AS variate_id
         |FROM d GROUP BY 1, 2, 3""".stripMargin,
    "q_split_assign" ->
      """SELECT doc_id,
        |       ((((doc_id % 1000000007) * 2654435761) % 1000000007 + 1000000007) % 1000000007) % 1000 AS split_bucket,
        |       CASE WHEN ((((doc_id % 1000000007) * 2654435761) % 1000000007 + 1000000007) % 1000000007) % 1000 < 20 THEN 'test'
        |            WHEN ((((doc_id % 1000000007) * 2654435761) % 1000000007 + 1000000007) % 1000000007) % 1000 < 70 THEN 'val'
        |            ELSE 'train' END AS split
        |FROM documents""".stripMargin,
    "q_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
        |         ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7] AS g
        |  FROM w, UNNEST(range(1, len(ws) - 6)) AS t(i)),
        |tg AS (SELECT DISTINCT g FROM g WHERE doc_id % 53 = 0),
        |cg AS (SELECT DISTINCT doc_id, g FROM g),
        |h AS (SELECT cg.doc_id, count(*) AS n_hits FROM cg JOIN tg USING (g) GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |       coalesce(h.n_hits, 0) >= 1 AS contaminated
        |FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id""".stripMargin,
    "q_dedup_exact" ->
      """SELECT doc_id, text_hash, group_size FROM (
        |  SELECT doc_id, md5(text) AS text_hash,
        |         count(*) OVER (PARTITION BY md5(text)) AS group_size,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1""".stripMargin,
    "q_dedup_jaccard" ->
      s"""$ShinglesCte,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b
         |    ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT p.doc_a, p.doc_b,
         |         CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard
         |  FROM pairs p
         |  JOIN cnt ca ON p.doc_a = ca.doc_id
         |  JOIN cnt cb ON p.doc_b = cb.doc_id)
         |WHERE jaccard >= 0.5""".stripMargin,
    // transitive closure of the Jaccard pair set: min reachable id per
    // node via a recursive label walk, singletons keep themselves
    "q_dedup_clusters" -> dedupClosureOracle,
    "q_dedup_incremental" -> dedupClosureOracle,
    "q_embed_neardup" ->
      """WITH q AS (
        |  SELECT vec_id, label, CAST(t.i AS INT) AS i,
        |         CAST(floor(CAST(e[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
        |  FROM (SELECT vec_id, label, embedding AS e FROM embeddings),
        |       LATERAL (SELECT unnest(range(1, len(e) + 1)) AS i) t),
        |nrm AS (SELECT vec_id, label, CAST(sum(v*v) AS BIGINT) AS n2 FROM q GROUP BY 1, 2),
        |dots AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, CAST(sum(a.v * b.v) AS BIGINT) AS dot
        |  FROM q a JOIN q b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, cos FROM (
        |  SELECT d.id_a, d.id_b,
        |         CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
        |  FROM dots d JOIN nrm na ON d.id_a = na.vec_id JOIN nrm nb ON d.id_b = nb.vec_id)
        |WHERE cos >= 0.4""".stripMargin,
    "q_knn_bruteforce" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(t.i AS INT) AS i,
        |         CAST(floor(CAST(e[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
        |  FROM (SELECT vec_id, embedding AS e FROM embeddings),
        |       LATERAL (SELECT unnest(range(1, len(e) + 1)) AS i) t),
        |nrm AS (SELECT vec_id, CAST(sum(v*v) AS BIGINT) AS n2 FROM q GROUP BY 1),
        |dots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(sum(a.v * b.v) AS BIGINT) AS dot
        |  FROM q a JOIN q b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id != b.vec_id
        |  GROUP BY 1, 2),
        |cosd AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
        |  FROM dots d JOIN nrm na ON d.query_id = na.vec_id
        |              JOIN nrm nb ON d.neighbor_id = nb.vec_id)
        |SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY cos DESC, neighbor_id) AS rank FROM cosd)
        |WHERE rank <= 5""".stripMargin,
    // the q_embed_neardup pair set closed transitively (recursive label
    // walk, min reachable id), every vector verdict'ed; singletons keep
    // themselves
    "q_embed_keep" ->
      """WITH RECURSIVE q AS (
        |  SELECT vec_id, label, CAST(t.i AS INT) AS i,
        |         CAST(floor(CAST(e[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
        |  FROM (SELECT vec_id, label, embedding AS e FROM embeddings),
        |       LATERAL (SELECT unnest(range(1, len(e) + 1)) AS i) t),
        |nrm AS (SELECT vec_id, label, CAST(sum(v*v) AS BIGINT) AS n2 FROM q GROUP BY 1, 2),
        |dots AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, CAST(sum(a.v * b.v) AS BIGINT) AS dot
        |  FROM q a JOIN q b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT d.id_a, d.id_b,
        |           CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
        |    FROM dots d JOIN nrm na ON d.id_a = na.vec_id JOIN nrm nb ON d.id_b = nb.vec_id)
        |  WHERE cos >= 0.4),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |walk(node, r) AS (
        |  SELECT DISTINCT u, u FROM edges
        |  UNION
        |  SELECT e.v, wk.r FROM walk wk JOIN edges e ON e.u = wk.node),
        |comp AS (SELECT node, MIN(r) AS rep FROM walk GROUP BY node)
        |SELECT CAST(em.vec_id AS BIGINT) AS doc_id,
        |       CAST(COALESCE(c.rep, em.vec_id) AS BIGINT) AS rep_id,
        |       (em.vec_id = COALESCE(c.rep, em.vec_id)) AS keep
        |FROM embeddings em LEFT JOIN comp c ON em.vec_id = c.node""".stripMargin,
    // assignment argmax over the modulo-sampled centroids; the same
    // quantized-integer dot/norm discipline as q_knn_bruteforce keeps the
    // cosine double (and the argmax it decides) bit-equal across engines
    "q_ivf_assign" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(t.i AS INT) AS i,
        |         CAST(floor(CAST(e[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
        |  FROM (SELECT vec_id, embedding AS e FROM embeddings),
        |       LATERAL (SELECT unnest(range(1, len(e) + 1)) AS i) t),
        |nrm AS (SELECT vec_id, CAST(sum(v*v) AS BIGINT) AS n2 FROM q GROUP BY 1),
        |dots AS (
        |  SELECT a.vec_id AS vid, b.vec_id AS cid,
        |         CAST(sum(a.v * b.v) AS BIGINT) AS dot
        |  FROM q a JOIN q b ON a.i = b.i AND b.vec_id % 25 = 0
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.vid, d.cid,
        |         CAST(d.dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS c_cos
        |  FROM dots d JOIN nrm nv ON d.vid = nv.vec_id
        |              JOIN nrm nc ON d.cid = nc.vec_id)
        |SELECT CAST(vid AS BIGINT) AS vec_id, CAST(cid AS BIGINT) AS c_id, c_cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vid
        |            ORDER BY c_cos DESC, cid) AS rn FROM scored)
        |WHERE rn = 1""".stripMargin,
    // the 8-bit hyperplane bucket recomputed from scratch: quantized
    // components x two-Lehmer-round weights -> exact integer plane dots,
    // sign bits packed MSB-first (plane 0 is the high bit, matching the
    // kernel's acc*2+bit fold)
    "q_ann_assign" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(t.i AS BIGINT) - 1 AS d,
        |         CAST(floor(CAST(e[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
        |  FROM (SELECT vec_id, embedding AS e FROM embeddings),
        |       LATERAL (SELECT unnest(range(1, len(e) + 1)) AS i) t),
        |w AS (
        |  SELECT q.vec_id, pl.p, q.v,
        |         (((((q.d + pl.p * 1024) * 1103515245 + 12345) % 2147483647)
        |            * 1103515245 + 54321) % 2147483647) % 7 - 3 AS w
        |  FROM q, (SELECT unnest(range(0, 8)) AS p) pl),
        |s AS (
        |  SELECT vec_id, p, CAST(sum(v * w) AS BIGINT) AS s
        |  FROM w GROUP BY 1, 2)
        |SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |       CAST(sum(CASE WHEN s >= 0 THEN 1 << CAST(7 - p AS INT) ELSE 0 END) AS BIGINT)
        |         AS ann_bucket
        |FROM s GROUP BY 1""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |       CAST(len(text) AS INT) AS n_chars,
        |       CAST(GREATEST(len(string_split(text, ' ')), (len(text) + 3) // 4) AS INT)
        |         AS est_bpe_tokens
        |FROM documents""".stripMargin,
    "q_text_quality" ->
      """WITH w AS (
        |  SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
        |         unnest(string_split(text, ' ')) AS w
        |  FROM documents)
        |SELECT doc_id, count(*) AS n_words, n_chars,
        |       CAST(sum(CASE WHEN w IN ('the','a','and','of','to','in') THEN 1 ELSE 0 END) AS BIGINT)
        |         AS stopword_cnt,
        |       CAST(n_chars - (count(*) - 1) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_word_len,
        |       CAST(sum(CASE WHEN w IN ('the','a','and','of','to','in') THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS stopword_ratio,
        |       CAST(count(DISTINCT w) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS distinct_ratio
        |FROM w GROUP BY doc_id, n_chars""".stripMargin,
    "q_lm_quality" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT w, count(*) AS cw FROM w GROUP BY 1),
        |t AS (SELECT CAST(sum(cw) AS BIGINT) AS n_total, count(*) AS v_distinct FROM c),
        |p AS (
        |  SELECT w, CAST(FLOOR(-LN(CAST(cw + 1 AS DOUBLE)
        |                           / CAST(n_total + v_distinct AS DOUBLE)) * 1e9)
        |            AS BIGINT) AS nll_nano
        |  FROM c, t)
        |SELECT doc_id, count(*) AS n_words,
        |       CAST(sum(nll_nano) AS BIGINT) AS nll_nano_sum,
        |       CAST(sum(nll_nano) AS DOUBLE) / 1e9 / CAST(count(*) AS DOUBLE) AS avg_nll
        |FROM w JOIN p USING (w)
        |GROUP BY doc_id""".stripMargin,
    "q_minhash_assign" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(list_slice(ws, t.i, t.i + 2), ' ') AS gram
        |  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) t),
        |h AS (
        |  SELECT doc_id,
        |         list_reduce(
        |           list_prepend(CAST(0 AS BIGINT),
        |             list_transform(string_split(gram, ''),
        |                            c -> CAST(ascii(c) AS BIGINT))),
        |           (a, c) -> (a * 31 + c) % 1000000007) AS h
        |  FROM g)
        |SELECT doc_id, CAST(s.k AS INT) AS seed,
        |       CAST(min((h * 1103515245 + s.k * 12345 + 6789) % 1000000007) AS BIGINT)
        |         AS min_val
        |FROM h, (SELECT unnest(range(0, 8)) AS k) s
        |GROUP BY 1, 2""".stripMargin,
    "q_simhash_assign" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |nz AS (SELECT doc_id, w FROM w WHERE w <> ''),
        |h AS (
        |  SELECT doc_id,
        |         list_reduce(
        |           list_prepend(CAST(0 AS BIGINT),
        |             list_transform(string_split(w, ''),
        |                            c -> CAST(ascii(c) AS BIGINT))),
        |           (a, c) -> (a * 31 + c) % 1000000007) AS h
        |  FROM nz),
        |b AS (
        |  SELECT doc_id, g.i AS i,
        |         sum(CASE WHEN ((h * 1103515245 + g.i * 12345 + 6789) % 1000000007) * 2
        |                       >= 1000000007
        |                  THEN 1 ELSE -1 END) AS acc
        |  FROM h, (SELECT unnest(range(0, 16)) AS i) g
        |  GROUP BY 1, 2)
        |SELECT doc_id,
        |       CAST(sum(CASE WHEN acc >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
        |            AS BIGINT) AS simhash_bucket
        |FROM b GROUP BY doc_id""".stripMargin,
    "q_tfidf_keywords" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |dw AS (SELECT doc_id, w, count(*) AS tf FROM w GROUP BY 1, 2),
        |dfq AS (SELECT w, count(*) AS df FROM dw GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT dw.doc_id, dw.w, CAST(dw.tf AS BIGINT) AS tf,
        |         CAST(dfq.df AS BIGINT) AS df,
        |         CAST(dw.tf AS BIGINT)
        |           * CAST(FLOOR(LN(CAST(n_docs AS DOUBLE) / CAST(dfq.df AS DOUBLE))
        |                        * 1e9) AS BIGINT) AS tfidf_nano
        |  FROM dw JOIN dfq USING (w), n),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |            ORDER BY tfidf_nano DESC, w ASC) AS INT) AS rank
        |  FROM s)
        |SELECT doc_id, w, tf, df, tfidf_nano, rank FROM r WHERE rank <= 5""".stripMargin,
    "q_text_langid" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN w IN ('the','a','and','of') THEN 1 ELSE 0 END) AS BIGINT) AS cnt_en,
        |    CAST(sum(CASE WHEN w IN ('der','die','das','und') THEN 1 ELSE 0 END) AS BIGINT) AS cnt_de,
        |    CAST(sum(CASE WHEN w IN ('el','los','que','y') THEN 1 ELSE 0 END) AS BIGINT) AS cnt_es,
        |    CAST(sum(CASE WHEN w IN ('le','la','les','et') THEN 1 ELSE 0 END) AS BIGINT) AS cnt_fr,
        |    CAST(sum(CASE WHEN w IN ('de','shi','le','wo') THEN 1 ELSE 0 END) AS BIGINT) AS cnt_zh
        |  FROM w GROUP BY 1)
        |SELECT doc_id, cnt_en, cnt_de, cnt_es, cnt_fr, cnt_zh,
        |  CASE
        |    WHEN cnt_en > 0 AND cnt_en = GREATEST(cnt_en, cnt_de, cnt_es, cnt_fr, cnt_zh) THEN 'en'
        |    WHEN cnt_de > 0 AND cnt_de = GREATEST(cnt_en, cnt_de, cnt_es, cnt_fr, cnt_zh) THEN 'de'
        |    WHEN cnt_es > 0 AND cnt_es = GREATEST(cnt_en, cnt_de, cnt_es, cnt_fr, cnt_zh) THEN 'es'
        |    WHEN cnt_fr > 0 AND cnt_fr = GREATEST(cnt_en, cnt_de, cnt_es, cnt_fr, cnt_zh) THEN 'fr'
        |    WHEN cnt_zh > 0 AND cnt_zh = GREATEST(cnt_en, cnt_de, cnt_es, cnt_fr, cnt_zh) THEN 'zh'
        |    ELSE 'und' END AS pred_lang
        |FROM c""".stripMargin,
    // all four funnel gates recomputed and composed: exact-dedup rank,
    // 8-gram test-set overlap, the five quality signals, and the permille
    // split hash — per-doc labels, kept = canonical AND NOT contaminated
    // AND quality_ok, LEFT joins so unscoreable docs stay labeled
    "q_curation_funnel" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
        |         ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7] AS g
        |  FROM w, UNNEST(range(1, len(ws) - 6)) AS t(i)),
        |tg AS (SELECT DISTINCT g FROM g WHERE doc_id % 53 = 0),
        |contam AS (SELECT DISTINCT g.doc_id FROM g JOIN tg USING (g)),
        |canon AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM documents) WHERE rn = 1),
        |wx AS (SELECT doc_id, unnest(ws) AS w FROM w),
        |q AS (
        |  SELECT doc_id, count(*) AS n_words,
        |         CAST(sum(CASE WHEN w IN ('the','a','and','of','to','in') THEN 1 ELSE 0 END) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS stopword_ratio,
        |         CAST(count(DISTINCT w) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS distinct_ratio
        |  FROM wx GROUP BY 1),
        |g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
        |       FROM w, UNNEST(range(1, len(ws))) AS t(i)),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        |s2 AS (SELECT doc_id, CAST(max(c) AS INT) AS top2, CAST(sum(c) AS INT) AS slots2
        |       FROM c2 GROUP BY 1),
        |g3 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        |       FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)),
        |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
        |s3 AS (SELECT doc_id,
        |              CAST(coalesce(sum(c) FILTER (WHERE c >= 2), 0) AS INT) AS dup3,
        |              CAST(sum(c) AS INT) AS slots3
        |       FROM c3 GROUP BY 1),
        |qual AS (
        |  SELECT q.doc_id,
        |         (n_words >= 20 AND stopword_ratio <= CAST(0.5 AS DOUBLE)
        |          AND distinct_ratio >= CAST(0.3 AS DOUBLE)
        |          AND (CASE WHEN coalesce(slots2, 0) > 0
        |               THEN CAST(top2 AS DOUBLE) / CAST(slots2 AS DOUBLE) ELSE 0.0 END)
        |            <= CAST(0.2 AS DOUBLE)
        |          AND (CASE WHEN coalesce(slots3, 0) > 0
        |               THEN CAST(dup3 AS DOUBLE) / CAST(slots3 AS DOUBLE) ELSE 0.0 END)
        |            <= CAST(0.2 AS DOUBLE)) AS keep
        |  FROM q LEFT JOIN s2 ON q.doc_id = s2.doc_id
        |         LEFT JOIN s3 ON q.doc_id = s3.doc_id)
        |SELECT d.doc_id,
        |       CASE WHEN ((((d.doc_id % 1000000007) * 2654435761) % 1000000007 + 1000000007) % 1000000007) % 1000 < 20 THEN 'test'
        |            WHEN ((((d.doc_id % 1000000007) * 2654435761) % 1000000007 + 1000000007) % 1000000007) % 1000 < 70 THEN 'val'
        |            ELSE 'train' END AS split,
        |       (c.doc_id IS NOT NULL) AS canonical,
        |       (ct.doc_id IS NOT NULL) AS contaminated,
        |       coalesce(qu.keep, FALSE) AS quality_ok,
        |       (c.doc_id IS NOT NULL AND ct.doc_id IS NULL
        |        AND coalesce(qu.keep, FALSE)) AS kept
        |FROM documents d
        |LEFT JOIN canon c ON d.doc_id = c.doc_id
        |LEFT JOIN contam ct ON d.doc_id = ct.doc_id
        |LEFT JOIN qual qu ON d.doc_id = qu.doc_id""".stripMargin,
    "q_curation_verdict" ->
      """WITH wx AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |q AS (
        |  SELECT doc_id, count(*) AS n_words,
        |         CAST(sum(CASE WHEN w IN ('the','a','and','of','to','in') THEN 1 ELSE 0 END) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS stopword_ratio,
        |         CAST(count(DISTINCT w) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS distinct_ratio
        |  FROM wx GROUP BY 1),
        |ws2 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
        |       FROM ws2, UNNEST(range(1, len(ws))) AS t(i)),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        |s2 AS (SELECT doc_id, CAST(max(c) AS INT) AS top2, CAST(sum(c) AS INT) AS slots2
        |       FROM c2 GROUP BY 1),
        |g3 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        |       FROM ws2, UNNEST(range(1, len(ws) - 1)) AS t(i)),
        |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
        |s3 AS (SELECT doc_id,
        |              CAST(coalesce(sum(c) FILTER (WHERE c >= 2), 0) AS INT) AS dup3,
        |              CAST(sum(c) AS INT) AS slots3
        |       FROM c3 GROUP BY 1),
        |v AS (
        |  SELECT q.doc_id, n_words, stopword_ratio, distinct_ratio,
        |         CASE WHEN coalesce(slots2, 0) > 0
        |              THEN CAST(top2 AS DOUBLE) / CAST(slots2 AS DOUBLE) ELSE 0.0 END AS top_frac_2,
        |         CASE WHEN coalesce(slots3, 0) > 0
        |              THEN CAST(dup3 AS DOUBLE) / CAST(slots3 AS DOUBLE) ELSE 0.0 END AS dup_frac_3
        |  FROM q LEFT JOIN s2 ON q.doc_id = s2.doc_id
        |         LEFT JOIN s3 ON q.doc_id = s3.doc_id)
        |SELECT doc_id,
        |       n_words >= 20 AS len_ok,
        |       stopword_ratio <= CAST(0.5 AS DOUBLE) AS stopword_ok,
        |       distinct_ratio >= CAST(0.3 AS DOUBLE) AS diversity_ok,
        |       top_frac_2 <= CAST(0.2 AS DOUBLE) AS rep_bigram_ok,
        |       dup_frac_3 <= CAST(0.2 AS DOUBLE) AS rep_trigram_ok,
        |       (n_words >= 20 AND stopword_ratio <= CAST(0.5 AS DOUBLE)
        |        AND distinct_ratio >= CAST(0.3 AS DOUBLE)
        |        AND top_frac_2 <= CAST(0.2 AS DOUBLE)
        |        AND dup_frac_3 <= CAST(0.2 AS DOUBLE)) AS keep
        |FROM v""".stripMargin,
    "q_text_repetition" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g2 AS (
        |  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g
        |  FROM w, UNNEST(range(1, len(ws))) AS t(i)),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        |s2 AS (SELECT doc_id, CAST(sum(c) AS INT) AS slots_2,
        |              CAST(max(c) AS INT) AS top_cnt_2,
        |              CAST(coalesce(sum(c) FILTER (WHERE c >= 2), 0) AS INT) AS dup_cnt_2
        |       FROM c2 GROUP BY 1),
        |g3 AS (
        |  SELECT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS g
        |  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)),
        |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
        |s3 AS (SELECT doc_id, CAST(sum(c) AS INT) AS slots_3,
        |              CAST(max(c) AS INT) AS top_cnt_3,
        |              CAST(coalesce(sum(c) FILTER (WHERE c >= 2), 0) AS INT) AS dup_cnt_3
        |       FROM c3 GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(coalesce(slots_2, 0) AS INT) AS slots_2,
        |       CAST(coalesce(top_cnt_2, 0) AS INT) AS top_cnt_2,
        |       CAST(coalesce(dup_cnt_2, 0) AS INT) AS dup_cnt_2,
        |       CASE WHEN coalesce(slots_2, 0) > 0
        |            THEN CAST(top_cnt_2 AS DOUBLE) / CAST(slots_2 AS DOUBLE)
        |            ELSE 0.0 END AS top_frac_2,
        |       CASE WHEN coalesce(slots_2, 0) > 0
        |            THEN CAST(dup_cnt_2 AS DOUBLE) / CAST(slots_2 AS DOUBLE)
        |            ELSE 0.0 END AS dup_frac_2,
        |       CAST(coalesce(slots_3, 0) AS INT) AS slots_3,
        |       CAST(coalesce(top_cnt_3, 0) AS INT) AS top_cnt_3,
        |       CAST(coalesce(dup_cnt_3, 0) AS INT) AS dup_cnt_3,
        |       CASE WHEN coalesce(slots_3, 0) > 0
        |            THEN CAST(top_cnt_3 AS DOUBLE) / CAST(slots_3 AS DOUBLE)
        |            ELSE 0.0 END AS top_frac_3,
        |       CASE WHEN coalesce(slots_3, 0) > 0
        |            THEN CAST(dup_cnt_3 AS DOUBLE) / CAST(slots_3 AS DOUBLE)
        |            ELSE 0.0 END AS dup_frac_3
        |FROM documents d LEFT JOIN s2 ON d.doc_id = s2.doc_id
        |                 LEFT JOIN s3 ON d.doc_id = s3.doc_id""".stripMargin,
    "q_text_fingerprint" ->
      """WITH w AS (
        |  SELECT doc_id, ws, CAST(t.i AS INT) AS i
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |       LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) t)
        |SELECT doc_id,
        |       CAST(sum(CAST(ascii(ws[i]) AS BIGINT) * ((i * 31 + 7) % 97)) % 1000000007 AS BIGINT)
        |         AS fingerprint,
        |       count(*) AS n_words
        |FROM w GROUP BY 1""".stripMargin,
    // byte-exact oracle — every modality a lossless REAL decode, so the
    // oracle recomputes the decoded bytes from doc_id arithmetic alone:
    // image rows: the 256 deterministic pixels (PNG lossless),
    //   pixel_i = ((doc_id+1)*2654435761 + i*40503) % 256.
    // audio rows: the 400-byte little-endian PCM stream of 200
    //   deterministic 16-bit samples v_i = ((id+1)*MulA + i*MulB) % 2^16
    //   (WAV PCM is uncompressed, so each byte is v%256 or v//256).
    // video rows: the 4x256 = 1024 concatenated DIB frame bytes,
    //   byte_j = ((doc_id+1)*2654435761 + j*40503) % 256 (AVI '00db'
    //   frames are uncompressed, so decode == pattern).
    // The bin-2 count is the full 0x20..0x2f byte class.
    "q_multimodal_features" ->
      s"""SELECT d.doc_id, 'video' AS modality,
         |       CAST(1024 AS INT) AS n_bytes,
         |       CAST(1024 AS BIGINT) AS hist_sum,
         |       CAST(sum(CASE WHEN ((d.doc_id + 1) * 2654435761 + t.j * 40503) % 256
         |                          BETWEEN 32 AND 47 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS spaces_bin
         |FROM documents d, LATERAL (SELECT unnest(range(0, 1024)) AS j) t
         |WHERE d.doc_id % 3 = 2
         |GROUP BY 1
         |UNION ALL
         |SELECT doc_id, 'audio' AS modality,
         |       CAST(400 AS INT) AS n_bytes,
         |       CAST(400 AS BIGINT) AS hist_sum,
         |       CAST(sum(CASE WHEN (v % 256) BETWEEN 32 AND 47 THEN 1 ELSE 0 END)
         |          + sum(CASE WHEN (v // 256) BETWEEN 32 AND 47 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS spaces_bin
         |FROM (SELECT d.doc_id,
         |             ((d.doc_id + 1) * 2654435761 + t.i * 40503) % 65536 AS v
         |      FROM documents d, LATERAL (SELECT unnest(range(0, 200)) AS i) t
         |      WHERE d.doc_id % 3 = 1)
         |GROUP BY 1
         |UNION ALL
         |SELECT d.doc_id, 'image' AS modality,
         |       CAST(256 AS INT) AS n_bytes,
         |       CAST(256 AS BIGINT) AS hist_sum,
         |       CAST(sum(CASE WHEN ((d.doc_id + 1) * 2654435761 + t.i * 40503) % 256
         |                          BETWEEN 32 AND 47 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS spaces_bin
         |FROM documents d, LATERAL (SELECT unnest(range(0, 256)) AS i) t
         |WHERE d.doc_id % 3 = 0
         |GROUP BY 1""".stripMargin,
    // container sizes are FIXED by the header layouts: audio 444 bytes
    // (44-byte canonical header + 400 PCM) -> ceil(444/256) = 2 chunks,
    // every-2nd keeps chunk 0 at the full 256 bytes; video 2304 bytes
    // (AVI headers + 4 x (8+256) movi frames) = exactly 9 x 256 ->
    // chunks 0,2,4,6,8, all full
    "q_multimodal_frames" ->
      s"""SELECT doc_id, 'video' AS modality,
         |       CAST(t.i AS INT) AS frame_idx,
         |       CAST(256 AS INT) AS frame_bytes
         |FROM documents,
         |     LATERAL (SELECT unnest(range(0, 9)) AS i) t
         |WHERE t.i % 2 = 0 AND doc_id % 3 = 2
         |UNION ALL
         |SELECT doc_id, 'audio' AS modality,
         |       CAST(0 AS INT) AS frame_idx, CAST(256 AS INT) AS frame_bytes
         |FROM documents WHERE doc_id % 3 = 1""".stripMargin,
    // per-frame checksums over the DECODED 8-bit DIB frames: frame f,
    // byte i -> pattern index j = f*256 + i
    "q_video_frames" ->
      s"""SELECT d.doc_id, CAST(t.f AS INT) AS frame_idx,
         |       CAST(256 AS INT) AS frame_bytes,
         |       CAST(sum(((d.doc_id + 1) * 2654435761 + (t.f * 256 + i.i) * 40503) % 256)
         |            AS BIGINT) AS frame_sum
         |FROM documents d,
         |     LATERAL (SELECT unnest(range(0, 4)) AS f) t,
         |     LATERAL (SELECT unnest(range(0, 256)) AS i) i
         |WHERE d.doc_id % 3 = 2
         |GROUP BY 1, 2""".stripMargin
  )
}
