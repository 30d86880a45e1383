package graft.streaming

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.finance.ml.CategoryClassifier

/** Streaming twin of the predict job (north-star extension of SURVEY §2.10
  * M10): score transactions as they arrive instead of per-batch. The
  * fitted pipeline is transform-only at scoring time, so it applies to a
  * streaming DataFrame unchanged; the UNCERTAIN thresholding is the same
  * expression as the batch path. Sink side pairs with
  * `TableStore.upsert` via `foreachBatch` (micro-batch upsert = the
  * streaming form of the reference's delete-then-insert).
  */
object ScoringStream {

  def score(
      model: PipelineModel,
      labels: Array[String],
      transactions: DataFrame,
      modelVersion: String,
      confidenceThreshold: Double = 0.40): DataFrame =
    CategoryClassifier.score(model, labels, transactions, modelVersion, confidenceThreshold)

  /** Attach an upsert sink: each micro-batch delete-then-inserts into the
    * predictions table by transaction_id. */
  def upsertSink(
      scored: DataFrame,
      store: graft.finance.TableStore,
      table: String = "predicted_transactions"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    scored.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) => store.upsert(table, batch, "transaction_id")
    }
}
