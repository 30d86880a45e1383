package graft.finance.ops

import java.nio.file.{Files, Path}
import scala.util.Using

/** Shared recursive file-tree operations (used by TableStore, Snapshots,
  * ModelStore — previously three private near-identical copies). The
  * Files.walk streams are closed deterministically; the JDK otherwise
  * leaks a directory handle per call. */
object FileTrees {

  def copy(from: Path, to: Path): Unit =
    Using.resource(Files.walk(from)) { stream =>
      stream.forEach { p =>
        val dest = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(dest)
        else { Files.createDirectories(dest.getParent); Files.copy(p, dest) }
      }
    }

  def delete(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val paths = Using.resource(Files.walk(p))(_.iterator().asScala.toSeq)
      paths.reverse.foreach(Files.delete)
    }
}
