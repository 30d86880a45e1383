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
