package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the steady-state ops problem of every
  * incremental lake layout: append-shaped writers (TableStore.appendNew,
  * streaming sinks) accrete files far below the scan-efficient size, and
  * each one costs a task, a footer read, and scheduler pressure; at 100 TB
  * a table can rot into millions of KB-files that make scans
  * metadata-bound. Compaction rewrites many small files into few
  * target-sized ones without changing a row.
  *
  * Planning is next-fit-decreasing over the FILE LISTING — metadata, not
  * data: the same bounded-bin discipline as `operators/SequencePack` (docs
  * → token bins there, files → byte bins here), on the driver because the
  * listing already lives there (it is how any engine plans a scan).
  * Oversized files get a singleton group and are left in place — rewriting
  * a file that is already big enough is pure write amplification.
  *
  * The rewrite reads each multi-file group once and writes it as one file,
  * into a fresh directory swapped in atomically (the TableStore/Snapshots
  * rename posture): readers see the old complete state or the new one,
  * never a half-compacted directory.
  */
object Compaction {

  final case class FileInfo(path: String, bytes: Long)
  final case class Group(files: Seq[FileInfo]) {
    def bytes: Long = files.map(_.bytes).sum
  }
  final case class Stats(filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Data files directly under `dir` (no recursion — partitioned layouts
    * compact per partition directory, which also bounds one run's blast
    * radius). */
  def listDataFiles(spark: SparkSession, dir: String): Seq[FileInfo] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(s => FileInfo(s.getPath.toString, s.getLen))
  }

  /** Next-fit-decreasing byte-bin planning: every file in exactly one
    * group, no multi-file group over `targetBytes`, files over the target
    * isolated as singletons. Deterministic (size desc, path tiebreak). */
  def planGroups(files: Seq[FileInfo], targetBytes: Long): Seq[Group] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val sorted = files.sortBy(f => (-f.bytes, f.path))
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var bin = scala.collection.mutable.ArrayBuffer.empty[FileInfo]
    var used = 0L
    sorted.foreach { f =>
      if (bin.nonEmpty && used + f.bytes > targetBytes) {
        groups += Group(bin.toSeq); bin = scala.collection.mutable.ArrayBuffer.empty
        used = 0L
      }
      bin += f; used += f.bytes
    }
    if (bin.nonEmpty) groups += Group(bin.toSeq)
    groups.toSeq
  }

  /** Rewrite `dir` so no two files could still merge under `targetBytes`.
    * Multi-file groups are read once and written as one file; singleton
    * groups (already-big-enough files) are moved, not rewritten. The new
    * layout is staged in a sibling directory and renamed in. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): Stats = {
    val files = listDataFiles(spark, dir)
    val groups = planGroups(files, targetBytes)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new Path(dir + "._compact_tmp")
    if (fs.exists(staged)) fs.delete(staged, true)
    fs.mkdirs(staged)
    groups.zipWithIndex.foreach { case (g, i) =>
      if (g.files.size == 1) {
        // pure move: no read, no write amplification
        val src = new Path(g.files.head.path)
        fs.rename(src, new Path(staged, f"keep-$i%05d-${src.getName}"))
        ()
      } else {
        val groupDir = new Path(staged, f"group-$i%05d")
        spark.read.parquet(g.files.map(_.path): _*)
          .coalesce(1)
          .write.parquet(groupDir.toString)
        // hoist the single data file up; drop the _SUCCESS scaffolding
        fs.listStatus(groupDir).filter(_.isFile)
          .filter(s => !s.getPath.getName.startsWith("_"))
          .foreach(s => fs.rename(s.getPath,
            new Path(staged, f"merged-$i%05d-${s.getPath.getName}")))
        fs.delete(groupDir, true)
        ()
      }
    }
    // atomic-ish swap: old dir out, staged in (the Snapshots posture)
    val old = new Path(dir + "._compact_old")
    if (fs.exists(old)) fs.delete(old, true)
    fs.rename(p, old)
    fs.rename(staged, p)
    fs.delete(old, true)
    Stats(files.size, listDataFiles(spark, dir).size, files.map(_.bytes).sum)
  }
}
