package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object JoinRepro {
  def main(args: Array[String]): Unit = {
    val shm = sys.env.get("REPRO_SHM").contains("1")
    val b = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("REPRO_BC", "10485760"))
      .config("spark.ui.enabled", "false")
    val s = (if (shm) b.config("spark.local.dir", "/dev/shm/graft-shuffle") else b).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val gcNs = new java.util.concurrent.atomic.AtomicLong
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) { cpuNs.addAndGet(te.taskMetrics.executorCpuTime); gcNs.addAndGet(te.taskMetrics.jvmGCTime * 1000000L) }
    })
    import s.implicits._
    val nDocs = 1000000L
    val docs = s.range(nDocs).as[Long].map { id =>
      val base = if (id % 7 == 0 && id > 0) id - 1 else id
      val sb = new java.lang.StringBuilder(224)
      var j = 0
      while (j < 32) {
        if (j > 0) sb.append(' ')
        val w = if (j == 31 && base != id) 0x1ffffL
          else graft.core.Hash.mix64((base + 1) * 0x9e3779b97f4a7c15L + j) & 0xffffL
        sb.append('w').append(java.lang.Long.toHexString(w)); j += 1
      }
      (id, sb.toString)
    }.toDF("doc_id", "text")
    for (r <- 1 to 4) {
      val c0 = cpuNs.get; val g0 = gcNs.get
      val t0 = System.nanoTime()
      val c =
        if (sys.env.get("REPRO_GROUPED").contains("1")) {
          graft.functions.GraftFunctions.register(s)
          val sigs = graft.operators.Dedup.minHashSignatures(docs, "doc_id", "text", 3, 64)
          val banded = sigs.select(
            col("_id"),
            posexplode(call_function("lsh_bands", col("sig"), lit(16))).as(Seq("band", "bh")))
          banded.groupBy(col("band"), col("bh"))
            .agg(collect_list(col("_id")).as("ids"))
            .where(size(col("ids")) > 1)
            .select(explode(expr(
              "flatten(transform(array_sort(ids), (x, i) -> transform(slice(array_sort(ids), i + 2, size(ids)), y -> struct(x AS a, y AS b))))")).as("p"))
            .select(col("p.a"), col("p.b")).distinct().count()
        } else if (sys.env.get("REPRO_NOPERSIST").contains("1")) {
          graft.functions.GraftFunctions.register(s)
          val cands = graft.operators.Dedup.lshCandidatePairs(docs, "doc_id", "text", 3, 64, 16)
          val sets = graft.operators.Dedup.shingleHashes(docs, "doc_id", "text", "doc_id", 3)
            .select(col("_id").as("_sid"), col("hs"))
          cands
            .join(sets.withColumnRenamed("_sid", "_id_a").withColumnRenamed("hs", "sa"), col("_id") === col("_id_a"))
            .join(sets.withColumnRenamed("_sid", "_id_b").withColumnRenamed("hs", "sb"), col("_idb") === col("_id_b"))
            .withColumn("_inter", call_function("arr_sorted_inter_size", col("sa"), col("sb")))
            .select(col("_id"), col("_idb"),
              (col("_inter").cast("double") / (size(col("sa")) + size(col("sb")) - col("_inter")).cast("double")).as("j"))
            .filter(col("j") >= 0.5).count()
        } else graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).count()
      Thread.sleep(300)
      println(f"[repro] shm=$shm run $r: wall=${(System.nanoTime()-t0)/1e9}%.1f s cpu=${(cpuNs.get-c0)/1e9}%.1f s gc=${(gcNs.get-g0)/1e9}%.1f s pairs=$c")
      s.catalog.clearCache()
    }
    s.stop()
  }
}
