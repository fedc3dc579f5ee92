package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic: per-stage wall/CPU for the LSH chain at a given
 * core count — finds where local[16] threads go idle. */
object DedupStageProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("PROBE_CORES", "16").toInt
    val nDocs = sys.env.getOrElse("PROBE_DOCS", "200000").toLong
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
        val m = i.taskMetrics
        val run = m.executorRunTime / 1e3
        val cpu = m.executorCpuTime / 1e9
        val gc = m.jvmGCTime / 1e3
        val spillM = m.memoryBytesSpilled / 1e6
        val spillD = m.diskBytesSpilled / 1e6
        val shw = m.shuffleWriteMetrics.writeTime / 1e9
        val shr = m.shuffleReadMetrics.fetchWaitTime / 1e3
        val deser = m.executorDeserializeTime / 1e3
        println(
          f"[stage] id=${i.stageId}%3d tasks=${i.numTasks}%3d wall=$wall%7.2f run=$run%7.2f cpu=$cpu%7.2f gc=$gc%6.2f deser=$deser%6.2f shw=$shw%6.2f shrWait=$shr%6.2f spill=${spillM}%6.0f/${spillD}%6.0fMB  ${i.name.takeWhile(_ != '\n').take(50)}")
      }
    })
    import s.implicits._
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
    val t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5)
    val c = pairs.count()
    println(f"[probe] cores=$cores docs=$nDocs total=${(System.nanoTime()-t0)/1e9}%.2f s pairs=$c")
    if (sys.env.get("PROBE_PLAN").contains("1")) {
      println("[plan] " + pairs.queryExecution.executedPlan.toString.take(8000))
      import org.apache.spark.sql.functions.{call_function, col, lit, posexplode}
      graft.functions.GraftFunctions.register(s)
      val sigs = graft.operators.Dedup.minHashSignatures(docs, "doc_id", "text", 3, 64)
      val banded = sigs.select(
        col("_id"),
        posexplode(call_function("lsh_bands", col("sig"), lit(16))).as(Seq("band", "bh")))
      var t1 = System.nanoTime()
      val nb = banded.count()
      println(f"[probe] banded=$nb in ${(System.nanoTime()-t1)/1e9}%.2f s")
      t1 = System.nanoTime()
      val other = banded
        .select(col("_id").as("_idb"), col("band").as("bandb"), col("bh").as("bhb"))
      val preDistinct = banded
        .join(
          other,
          col("band") === col("bandb") && col("bh") === col("bhb") && col("_id") < col("_idb"))
        .count()
      println(f"[probe] pre_distinct=$preDistinct in ${(System.nanoTime()-t1)/1e9}%.2f s")
      t1 = System.nanoTime()
      val cand = graft.operators.Dedup
        .lshCandidatePairs(docs, "doc_id", "text", 3, 64, 16)
        .count()
      println(f"[probe] candidates=$cand in ${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    s.stop()
  }
}
