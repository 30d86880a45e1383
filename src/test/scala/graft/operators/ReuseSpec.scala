package graft.operators

import graft.SparkSpec

/** Reuse.materialize must take the RELIABLE checkpoint path whenever the
  * session has a checkpoint dir (the cluster-survivable mode g6's edge
  * reuse depends on) — not the executor-local localCheckpoint fallback. */
class ReuseSpec extends SparkSpec {

  test("materialize writes a reliable checkpoint when a checkpoint dir is set") {
    import spark.implicits._
    val dir = spark.sparkContext.getCheckpointDir
    assert(dir.isDefined, "test harness must configure a checkpoint dir")
    def files(): Long = {
      val d = new java.io.File(new java.net.URI(dir.get).getPath)
      if (!d.isDirectory) 0L
      else java.nio.file.Files.walk(d.toPath).filter(_.toFile.isFile).count()
    }
    val before = files()
    val m = Reuse.materialize((1 to 10).toDF("x"))
    assert(m.count() == 10)
    assert(files() > before, "no checkpoint blocks written — localCheckpoint fallback taken?")
  }
}
