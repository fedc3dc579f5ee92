package graft.jobs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Iceberg-style snapshot layer over parquet directories (no Iceberg jars
 * ship in this environment, so the table format's load-bearing ideas are
 * implemented directly): immutable data versions + atomically-committed
 * JSON manifests, giving snapshot isolation, idempotent re-runs and
 * checkpoint/resume.
 *
 * Layout per table:
 *   <base>/<table>/data/v<N>/part-*.parquet   (immutable)
 *   <base>/<table>/_snapshots/v<N>.json       (manifest, committed last)
 *
 * A manifest is only visible after an atomic rename, so a crashed writer
 * leaves at most an orphaned data directory, never a half-visible
 * snapshot — the same commit protocol Iceberg uses (spec: metadata file
 * swap). Resumability contract mirrors the reference's Lightning
 * `ckpt_path="last"` resume (reference cli/train.py:185-189): a stage is
 * skipped when a snapshot with the same (stage, fingerprint) already
 * exists.
 */
final case class SnapshotInfo(
    table: String,
    version: Int,
    uid: Long, // globally unique commit id — downstream fingerprints chain on it
    stage: String,
    fingerprint: String,
    rowCount: Long,
    dataPath: String)

final class SnapshotStore(base: String) {

  private def tableDir(table: String): Path = Paths.get(base, table)
  private def snapDir(table: String): Path = tableDir(table).resolve("_snapshots")

  private def parse(j: String): SnapshotInfo = {
    def field(k: String): String = {
      val m = ("\"" + k + "\"\\s*:\\s*(\"([^\"]*)\"|(\\d+))").r
      m.findFirstMatchIn(j)
        .map(g => Option(g.group(2)).getOrElse(g.group(3)))
        .getOrElse(sys.error(s"missing $k in manifest"))
    }
    SnapshotInfo(
      field("table"),
      field("version").toInt,
      field("uid").toLong,
      field("stage"),
      field("fingerprint"),
      field("rowCount").toLong,
      field("dataPath"))
  }

  private def render(s: SnapshotInfo): String =
    s"""{"table": "${s.table}", "version": ${s.version}, "uid": ${s.uid}, "stage": "${s.stage}",
       | "fingerprint": "${s.fingerprint}", "rowCount": ${s.rowCount},
       | "dataPath": "${s.dataPath}"}""".stripMargin

  def snapshots(table: String): Seq[SnapshotInfo] = {
    val d = snapDir(table)
    if (!Files.isDirectory(d)) return Seq.empty
    import scala.jdk.CollectionConverters._
    Files
      .list(d)
      .iterator()
      .asScala
      .filter(_.getFileName.toString.matches("v\\d+\\.json"))
      .map(p => parse(Files.readString(p)))
      .toSeq
      .sortBy(_.version)
  }

  def latest(table: String): Option[SnapshotInfo] = snapshots(table).lastOption

  /** Existing committed snapshot for (stage, fingerprint), if any — the
   * resume check. */
  def find(table: String, stage: String, fingerprint: String): Option[SnapshotInfo] =
    snapshots(table).findLast(s => s.stage == stage && s.fingerprint == fingerprint)

  /** Write `df` as the next version of `table` and commit its manifest
   * atomically. Returns the committed snapshot.
   *
   * Two scale/safety properties:
   *  - the row count comes from `df.observe` piggy-backed on the write
   *    action itself (NOT a second full read of the output — at 100x scale
   *    a re-read would double checkpoint I/O);
   *  - the data directory name embeds the commit uid, so two racing
   *    writers targeting the same next-version number write to DISJOINT
   *    directories; the loser's ATOMIC_MOVE of the manifest fails and its
   *    data dir is left orphaned — never visible, never overwritten. */
  def commit(
      df: DataFrame,
      table: String,
      stage: String,
      fingerprint: String): SnapshotInfo = {
    val next = latest(table).map(_.version + 1).getOrElse(1)
    val uid = System.nanoTime()
    val dataPath = tableDir(table).resolve("data").resolve(s"v$next-$uid")
    val obs = org.apache.spark.sql.Observation(s"commit-$table-v$next-$uid")
    df.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write.mode("overwrite").parquet(dataPath.toString)
    val rows = obs.get("rows").asInstanceOf[Long]
    val info =
      SnapshotInfo(table, next, uid, stage, fingerprint, rows, dataPath.toString)
    Files.createDirectories(snapDir(table))
    val tmp = snapDir(table).resolve(s".v$next-$uid.json.tmp")
    Files.write(tmp, render(info).getBytes(StandardCharsets.UTF_8))
    // Atomic CREATE-if-absent: a hard link fails with
    // FileAlreadyExistsException when the manifest exists (POSIX link(2)
    // never replaces), unlike rename(2)/ATOMIC_MOVE which silently
    // replaces an existing target — so of two racing writers exactly one
    // commits vN and the loser's exception surfaces instead of clobbering.
    try Files.createLink(snapDir(table).resolve(s"v$next.json"), tmp)
    finally Files.deleteIfExists(tmp)
    info
  }

  def read(spark: SparkSession, snap: SnapshotInfo): DataFrame =
    spark.read.parquet(snap.dataPath)

  /** Time travel: the table as of a committed version (Iceberg
   * `VERSION AS OF` semantics — a version is immutable data + manifest,
   * so reading it later returns bit-identical rows regardless of any
   * newer commits). */
  def readVersion(spark: SparkSession, table: String, version: Int): DataFrame = {
    val snap = snapshots(table)
      .find(_.version == version)
      .getOrElse(sys.error(s"$table has no committed version $version"))
    read(spark, snap)
  }

  /** Roll the table back to `version` by committing a NEW version whose
   * manifest points at the old version's (immutable) data — Iceberg's
   * rollback: no data is copied, deleted or rewritten, and the rolled-
   * back-over versions remain readable via [[readVersion]]. The new
   * manifest's stage/fingerprint mark the rollback provenance, so
   * `find`-based resume never confuses it with the stage that first
   * produced the data. */
  def rollbackTo(table: String, version: Int): SnapshotInfo = {
    val target = snapshots(table)
      .find(_.version == version)
      .getOrElse(sys.error(s"$table has no committed version $version to roll back to"))
    val next = latest(table).map(_.version + 1).getOrElse(1)
    require(next > version, s"$table: cannot roll back to unwritten future version $version")
    val uid = System.nanoTime()
    val info = SnapshotInfo(
      table,
      next,
      uid,
      stage = s"rollback",
      fingerprint = s"rollback-to-v$version-uid${target.uid}",
      rowCount = target.rowCount,
      dataPath = target.dataPath)
    Files.createDirectories(snapDir(table))
    val tmp = snapDir(table).resolve(s".v$next-$uid.json.tmp")
    Files.write(tmp, render(info).getBytes(StandardCharsets.UTF_8))
    try Files.createLink(snapDir(table).resolve(s"v$next.json"), tmp)
    finally Files.deleteIfExists(tmp)
    info
  }

  /** Expire snapshots older than the newest `keepLast` versions:
   * manifests are deleted first (a version stops being visible before
   * its files go), then each data directory that no SURVIVING manifest
   * references is removed — a rollback target's data stays on disk as
   * long as any live version points at it (the Iceberg
   * expire_snapshots contract: reachable files are never collected).
   * Returns the expired versions. */
  def expireSnapshots(table: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"expireSnapshots: keepLast must be >= 1, got $keepLast")
    val all = snapshots(table)
    if (all.size <= keepLast) return Seq.empty
    val (expire, keep) = all.splitAt(all.size - keepLast)
    val liveData = keep.map(_.dataPath).toSet
    expire.foreach { s =>
      Files.deleteIfExists(snapDir(table).resolve(s"v${s.version}.json"))
    }
    expire.filterNot(s => liveData.contains(s.dataPath)).foreach { s =>
      val dir = Paths.get(s.dataPath)
      if (Files.isDirectory(dir)) {
        import scala.jdk.CollectionConverters._
        // close the walk stream deterministically — an unclosed directory
        // stream holds a file descriptor until GC, which accumulates when
        // expiring many versions (round-7 ADVICE)
        val walk = Files.walk(dir)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists)
        finally walk.close()
      }
    }
    expire.map(_.version)
  }

  /** Compute-or-resume: return the existing snapshot for (stage,
   * fingerprint) or compute, commit and return a new one. The boolean is
   * true when the stage was resumed (skipped). */
  def getOrCompute(
      table: String,
      stage: String,
      fingerprint: String)(compute: => DataFrame): (SnapshotInfo, Boolean) =
    find(table, stage, fingerprint) match {
      case Some(s) => (s, true)
      case None => (commit(compute, table, stage, fingerprint), false)
    }
}
