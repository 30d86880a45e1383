package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins `Tables.fanIfNarrow`'s 100 TB no-op claim (round-17, VERDICT r16
  * #9): the fan repartition must fire ONLY when the file layout caps scan
  * parallelism below half the cores — a many-file production layout must
  * get NO extra exchange, while the single-file fixture shape must fan.
  * Before this spec the claim lived in a comment; a regression (say, an
  * unconditional repartition slipping back in) would silently add a
  * corpus-wide exchange to every scan at scale.
  */
class FanIfNarrowSpec extends SparkSpec {

  private def hasRoundRobinFan(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
    }.nonEmpty

  test("fanIfNarrow is a NO-OP on a many-file layout (the production shape)") {
    val dir = Files.createTempDirectory("fan-noop").toString
    spark.range(0, 1000)
      .selectExpr("id AS doc_id", "CAST(id AS STRING) AS text")
      .repartition(64)
      .write.parquet(s"$dir/documents.parquet")
    val parts = new java.io.File(s"$dir/documents.parquet")
      .listFiles.count(_.getName.startsWith("part-"))
    assert(parts >= 32, s"expected a many-file layout, got $parts part files")
    val fanned = Tables.fanIfNarrow(spark, dir, "documents")(
      spark.read.parquet(s"$dir/documents.parquet"))
    assert(!hasRoundRobinFan(fanned),
      "fanIfNarrow added a round-robin exchange on a many-file layout — " +
        "this would shuffle the whole corpus at 100 TB for nothing")
  }

  test("fanIfNarrow fans a single-file scan that caps parallelism below the cores") {
    val stage = Files.createTempDirectory("fan-single-stage").toString
    spark.range(0, 1000)
      .selectExpr("id AS doc_id", "CAST(id AS STRING) AS text")
      .coalesce(1)
      .write.parquet(s"$stage/out")
    val part = new java.io.File(s"$stage/out").listFiles
      .filter(_.getName.startsWith("part-")).head
    val dir = Files.createTempDirectory("fan-single").toString
    // a BARE single parquet file — the fixture layout — not a directory
    Files.copy(part.toPath, Paths.get(s"$dir/documents.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val fanned = Tables.fanIfNarrow(spark, dir, "documents")(
      spark.read.parquet(s"$dir/documents.parquet"))
    assert(hasRoundRobinFan(fanned),
      "fanIfNarrow did not fan a single-file scan — CPU-heavy map stages " +
        "would run on one core wherever the layout is one small file")
  }
}
