package graft.finance.ops

import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import scala.jdk.CollectionConverters._

/** Warehouse snapshot / restore / retention — the Spark-warehouse analogue
  * of the reference's pg_dump backup service (SURVEY §2.1 S9,
  * `ui/backend/services/backup_service.py`): a backup is a copy of the
  * parquet root (named like the reference's `dagster_backup_<ts>.dump`),
  * restore replaces the root, retention deletes snapshots older than N days
  * (`backup_service.py:74-84`). Pure file operations — not a query operator.
  */
object Snapshots {

  private val fmt = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss").withZone(ZoneOffset.UTC)

  def snapshotName(at: Instant): String = s"warehouse_backup_${fmt.format(at)}"

  /** Copy the warehouse root into `backupDir/<snapshotName>`. */
  def create(warehouseRoot: String, backupDir: String, at: Instant = Instant.now()): Path = {
    val target = Paths.get(backupDir, snapshotName(at))
    Files.createDirectories(target.getParent)
    copyTree(Paths.get(warehouseRoot), target)
    target
  }

  /** Replace the warehouse root with a snapshot's contents. */
  def restore(snapshot: Path, warehouseRoot: String): Unit = {
    val root = Paths.get(warehouseRoot)
    deleteTree(root)
    copyTree(snapshot, root)
  }

  /** Delete snapshots whose timestamp (from the name) is older than
    * `retentionDays` relative to `now`; returns deleted names. Mirrors
    * `apply_retention` (mtime there, name-encoded time here — the name is
    * authoritative and survives copies). */
  def applyRetention(backupDir: String, retentionDays: Int, now: Instant = Instant.now()): Seq[String] = {
    val dir = Paths.get(backupDir)
    if (!Files.isDirectory(dir)) return Nil
    val cutoff = now.minusSeconds(retentionDays.toLong * 86400)
    Files.list(dir).iterator().asScala.toSeq
      .filter(p => p.getFileName.toString.startsWith("warehouse_backup_"))
      .filter { p =>
        val ts = p.getFileName.toString.stripPrefix("warehouse_backup_")
        try Instant.from(fmt.parse(ts)).isBefore(cutoff)
        catch { case _: Exception => false }
      }
      .map { p => deleteTree(p); p.getFileName.toString }
  }

  def list(backupDir: String): Seq[String] = {
    val dir = Paths.get(backupDir)
    if (!Files.isDirectory(dir)) Nil
    else Files.list(dir).iterator().asScala.toSeq
      .map(_.getFileName.toString)
      .filter(_.startsWith("warehouse_backup_")).sorted
  }

  private def copyTree(from: Path, to: Path): Unit = FileTrees.copy(from, to)
  private def deleteTree(p: Path): Unit = FileTrees.delete(p)
}
