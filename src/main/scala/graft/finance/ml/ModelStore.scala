package graft.finance.ml

import java.nio.file.{Files, Paths}
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model artifact persistence + the predict-time selection chain
  * (SURVEY §2.1 S8 / §2.10 M11, `classifier_train.py:315-347`,
  * `classifier_predict.py:33-84`): models are saved under
  * `<root>/<model_version>` with a `latest` copy; predict loads
  * active → latest-trained → `latest`-directory fallback, in that order.
  */
final class ModelStore(spark: SparkSession, root: String) {

  def save(model: PipelineModel, labels: Array[String], version: String): String = {
    val dir = Paths.get(root, version)
    model.write.overwrite().save(dir.toString)
    Files.writeString(dir.resolve("labels.txt"), labels.mkString("\n"))
    // copy-to-latest (classifier_train.py:341-347): a stable alias path
    val latest = Paths.get(root, "latest")
    deleteTree(latest)
    copyTree(dir, latest)
    dir.toString
  }

  def load(pathOrVersion: String): (PipelineModel, Array[String]) = {
    val dir =
      if (Paths.get(pathOrVersion).isAbsolute) Paths.get(pathOrVersion)
      else Paths.get(root, pathOrVersion)
    val labels = Files.readString(dir.resolve("labels.txt")).split("\n").filter(_.nonEmpty)
    (PipelineModel.load(dir.toString), labels)
  }

  /** Predict-time selection: the registry's active model, else the newest
    * trained row, else the `latest` directory; None when nothing exists. */
  def loadForPredict(registry: Option[DataFrame]): Option[(PipelineModel, Array[String], String)] = {
    val fromRegistry = registry.flatMap { reg =>
      val trained = reg.filter(col("status") === "trained")
      val active = trained.filter(col("is_active"))
        .orderBy(col("training_timestamp").desc).limit(1)
      val pick = if (!active.isEmpty) active
        else trained.orderBy(col("training_timestamp").desc).limit(1)
      pick.collect().headOption.map(_.getAs[String]("model_version"))
    }
    val version = fromRegistry.orElse(
      if (Files.exists(Paths.get(root, "latest"))) Some("latest") else None)
    version.flatMap { v =>
      try { val (m, l) = load(v); Some((m, l, v)) }
      catch { case _: Exception => None }
    }
  }

  private def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(from).iterator().asScala.foreach { p =>
      val dest = to.resolve(from.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(dest)
      else { Files.createDirectories(dest.getParent); Files.copy(p, dest) }
    }
  }
  private def deleteTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }
}
