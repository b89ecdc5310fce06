package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineStage}
import org.apache.spark.ml.feature.{OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}

/** Feature-engineering pipeline builder (reference E1-E5:
  * Claims_Prediction.py:80-93 — StringIndexer → OneHotEncoder →
  * VectorAssembler(numeric) → StandardScaler → VectorAssembler(final)).
  *
  * All stages are spark.ml transformers: indexing does one distinct-collect
  * per fit, OHE is metadata-only, scaling is a single stats pass — each a
  * bounded number of distributed jobs regardless of data size.
  */
object Features {

  /** The claims-style 6-stage pipeline: index + one-hot each categorical,
    * assemble + scale the numerics, then assemble everything into
    * `features`. Ref: Claims_Prediction.py:80-93.
    */
  def encodePipeline(categorical: Seq[String], numeric: Seq[String]): Pipeline = {
    val idx = new StringIndexer()
      .setInputCols(categorical.toArray)
      .setOutputCols(categorical.map(_ + "_idx").toArray)
      .setHandleInvalid("keep")
    val ohe = new OneHotEncoder()
      .setInputCols(categorical.map(_ + "_idx").toArray)
      .setOutputCols(categorical.map(_ + "_ohe").toArray)
    val numAsm = new VectorAssembler()
      .setInputCols(numeric.toArray).setOutputCol("num_features")
    val scaler = new StandardScaler()
      .setInputCol("num_features").setOutputCol("scaled_num_features")
    val finalAsm = new VectorAssembler()
      .setInputCols((categorical.map(_ + "_ohe") :+ "scaled_num_features").toArray)
      .setOutputCol("features")
    new Pipeline().setStages(
      Array[PipelineStage](idx, ohe, numAsm, scaler, finalAsm))
  }

  /** Plain numeric assembly (higgs-style, E1: higgs_ensemble_analysis.py:73). */
  def assemble(numeric: Seq[String], out: String = "features"): VectorAssembler =
    new VectorAssembler().setInputCols(numeric.toArray).setOutputCol(out)
}
