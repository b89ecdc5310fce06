package org.apache.spark.ml.graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.util.HasTrainingSummary

/** Drops the `trainingSummary` from every fitted stage of a pipeline
  * (the setter is `private[spark]`, hence this bridge — the
  * [[org.apache.spark.sql.graft.ColumnBridge]] pattern).
  *
  * Why the engine needs this AT SCALE: summary-bearing models
  * (RandomForest/LogisticRegression classification models, GLR) keep a
  * live `SparkSession` reference inside the summary, and `transform`'s
  * prediction UDF closes over the MODEL — so every serialized task drags
  * the session object graph along. That "works" only while the session's
  * lazily-initialized `observationManager` field (a non-transient field
  * of a non-serializable class) is still null; the first `Dataset
  * .observe` anywhere in the session initializes it, and from then on
  * every summary-carrying transform fails with "Task not serializable"
  * (hit by the bench harness's zero-cost row observer; reproduced
  * against Spark 4.1.2, see Bench.scala). Serving models should not ship
  * a driver-session reference in their task closures regardless — the
  * summary is training-time reporting, not inference state.
  * RandomForestClassificationModel.copy happens to drop the summary but
  * LogisticRegressionModel.copy re-attaches it (verified against the
  * 4.1.2 bytecode), so copy() is not a reliable strip.
  */
object SummaryBridge {
  def stripTrainingSummaries(model: PipelineModel): PipelineModel = {
    model.stages.foreach {
      case h: HasTrainingSummary[_] => h.setSummary(None)
      case _                        => ()
    }
    model
  }
}
