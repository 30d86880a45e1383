package graft.operators

import org.apache.spark.sql.DataFrame

/** Multi-consumer materialization of an intermediate DataFrame.
  *
  * The pattern: a computed frame (edge list, assignment table) is read by
  * several downstream branches; without materialization each branch
  * re-executes the producing plan (and Spark's lazy evaluation happily
  * recomputes an expensive join three times).
  *
  * Mode is decided by the session's checkpoint configuration:
  *  - checkpoint dir set → RELIABLE `checkpoint()`: blocks are written to
  *    durable storage (HDFS/object store on a cluster), lineage is
  *    truncated SAFELY — an executor loss re-reads the checkpoint instead
  *    of killing the job. This is the only mode fit for 100 TB plans
  *    (round-9 verdict: `localCheckpoint`'s executor-local blocks are
  *    unrecoverable).
  *  - no checkpoint dir (bare dev session) → eager `localCheckpoint`:
  *    single-JVM fallback where "executor loss" means the JVM died anyway.
  *
  * `graft.GraftSession`, `Verify`, `Bench` and the test harness all set a
  * checkpoint dir, so the reliable path is the one actually exercised.
  */
object Reuse {

  /** Materialize `df` eagerly for reuse; returns the checkpointed frame. */
  def materialize(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isDefined) {
      df.checkpoint() // eager; durable blocks, cluster-survivable
    } else {
      val d = df.localCheckpoint(eager = false)
      d.count() // materialize so consumers read blocks, not the plan
      d
    }
  }
}
