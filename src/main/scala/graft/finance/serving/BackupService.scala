package graft.finance.serving

import java.nio.file.{Files, Path, Paths}
import java.time.{Instant, LocalDateTime}

import graft.finance.ops.{BackupSchedule, Snapshots}

/** Backup control-plane over [[Snapshots]] — the service half of
  * `ui/backend/api/backup.py` (run / list / restore / schedule). The
  * schedule persists as a tiny JSON file beside the snapshots, like the
  * reference's `save_schedule`; `next_run` is computed with the
  * APScheduler-compatible [[BackupSchedule]] cron arithmetic. Actually
  * FIRING the cron belongs to the orchestrator hosting this service (the
  * Dagster glue's ScheduleDefinition) — the engine side stays pure.
  */
final class BackupService(
    warehouseRoot: String,
    backupDir: String,
    now: () => Instant = () => Instant.now()) {

  final case class BackupInfo(filename: String, sizeBytes: Long, created: String)
  final case class ScheduleState(
      enabled: Boolean, cron: String, retentionDays: Int, nextRun: Option[String])

  private def schedulePath: Path = Paths.get(backupDir, "schedule.json")

  /** POST /api/backup/run: snapshot + retention sweep; returns the new
    * snapshot's name and byte size (`backup.py:121-148`). */
  def run(): (String, Long) = {
    val snap = Snapshots.create(warehouseRoot, backupDir, now())
    Snapshots.applyRetention(backupDir, loadSchedule().retentionDays, now())
    val size = treeSize(snap)
    (snap.getFileName.toString, size)
  }

  /** GET /api/backup/list: newest first (`backup.py:188-206`). */
  def list(): Seq[BackupInfo] =
    Snapshots.list(backupDir).map { name =>
      val p = Paths.get(backupDir, name)
      BackupInfo(name, treeSize(p),
        Files.getLastModifiedTime(p).toInstant.toString)
    }.sortBy(_.created).reverse

  /** POST /api/backup/restore: the reference requires confirm == "RESTORE"
    * and an existing file (`backup.py:72-103`). */
  def restore(filename: String, confirm: Option[String]): Either[(Int, String), String] = {
    if (!confirm.contains("RESTORE"))
      Left((400, "Confirmation required: pass confirm=\"RESTORE\""))
    else {
      val snap = Paths.get(backupDir, filename)
      if (!Files.isDirectory(snap) || !Snapshots.list(backupDir).contains(filename))
        Left((404, s"Backup not found: $filename"))
      else {
        Snapshots.restore(snap, warehouseRoot)
        Right(s"Restored from $filename")
      }
    }
  }

  /** GET /api/backup/download filename — the reference's
    * `dagster_backup_{ts}.dump` convention (`backup.py:111-112`) with the
    * engine's own prefix and a zip container in place of pg_dump -Fc. */
  def downloadFilename(): String = {
    val ts = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
      .withZone(java.time.ZoneOffset.UTC).format(now())
    s"graft_backup_$ts.zip"
  }

  /** GET /api/backup/download body (`backup.py:106-118`): create a manual
    * backup and STREAM it to the browser. The reference streams `pg_dump
    * -Fc` without retaining anything server-side; the engine equivalent
    * takes a consistent [[Snapshots]] copy into a temp dir (the pg_dump
    * snapshot semantics), zips it file-at-a-time straight onto the
    * response stream (constant memory, compression in flight), then
    * deletes the temp copy — nothing retained, exactly like the manual
    * dump. */
  def writeDownload(out: java.io.OutputStream): Unit = {
    val tmp = Files.createTempDirectory("graft_backup_dl")
    try {
      val snap = Snapshots.create(warehouseRoot, tmp.toString, now())
      val zos = new java.util.zip.ZipOutputStream(out)
      val walk = Files.walk(snap)
      try {
        val files = walk.filter(Files.isRegularFile(_)).sorted.iterator()
        while (files.hasNext) {
          val f = files.next()
          zos.putNextEntry(new java.util.zip.ZipEntry(
            snap.getParent.relativize(f).toString))
          Files.copy(f, zos)
          zos.closeEntry()
        }
      } finally walk.close()
      zos.finish()
    } finally graft.finance.ops.FileTrees.delete(tmp)
  }

  /** GET /api/backup/schedule. */
  def loadSchedule(): ScheduleState = {
    val s =
      if (Files.exists(schedulePath)) parseSchedule(Files.readString(schedulePath))
      else BackupSchedule.Schedule(enabled = false)
    withNextRun(s)
  }

  /** POST /api/backup/schedule: retention clamped to [1, 90] as the route
    * does (`backup.py:162-185`). */
  def saveSchedule(enabled: Boolean, cron: Option[String], retentionDays: Option[Int]): ScheduleState = {
    val s = BackupSchedule.Schedule(
      enabled = enabled,
      cron = cron.filter(_.nonEmpty).getOrElse("0 2 * * *"),
      retentionDays = math.max(1, math.min(90, retentionDays.getOrElse(7))))
    Files.createDirectories(schedulePath.getParent)
    Files.writeString(schedulePath, ApiJson.obj(Seq(
      "enabled" -> s.enabled.toString,
      "cron" -> ApiJson.str(s.cron),
      "retention_days" -> s.retentionDays.toString)))
    withNextRun(s)
  }

  private def withNextRun(s: BackupSchedule.Schedule): ScheduleState = {
    val next = BackupSchedule.nextRunFor(s,
      LocalDateTime.ofInstant(now(), java.time.ZoneOffset.UTC))
    ScheduleState(s.enabled, s.cron, s.retentionDays, next.map(_.toString))
  }

  private def parseSchedule(json: String): BackupSchedule.Schedule =
    ApiJson.parse(json) match {
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        BackupSchedule.Schedule(
          enabled = mm.get("enabled").contains(true),
          cron = mm.get("cron").collect { case s: String => s }.getOrElse("0 2 * * *"),
          retentionDays = mm.get("retention_days")
            .collect { case d: Double => d.toInt }.getOrElse(7))
      case _ => BackupSchedule.Schedule(enabled = false)
    }

  private def treeSize(p: Path): Long = {
    val stream = Files.walk(p)
    try stream.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
    finally stream.close()
  }
}
