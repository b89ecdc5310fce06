package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{GBTClassifier, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ensemble classification suite (reference T1, E6-E8, E12-E14:
  * higgs_ensemble_analysis.py:74-149).
  *
  * Differences from the reference, by design:
  *  - confusion matrix is a DataFrame pivot aggregation, not an RDD
  *    `MulticlassMetrics` escape (higgs:104,143 → one hash aggregate here);
  *  - AUC is computed from the probability column (the reference's
  *    rawPredictionCol="prediction" yields a degenerate two-point ROC —
  *    quirk Q3, higgs:106); we emit both the correct and the parity number.
  */
object Classifiers {

  def randomForest(features: Seq[String], labelCol: String,
                   numTrees: Int = 25, subsamplingRate: Double = 1.0,
                   featureSubsetStrategy: String = "auto",
                   seed: Long = 40L): Pipeline = {
    val rf = new RandomForestClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setNumTrees(numTrees).setSubsamplingRate(subsamplingRate)
      .setFeatureSubsetStrategy(featureSubsetStrategy).setSeed(seed)
    new Pipeline().setStages(Array(Features.assemble(features), rf))
  }

  def gbt(features: Seq[String], labelCol: String,
          maxIter: Int = 11, maxDepth: Int = 5,
          subsamplingRate: Double = 1.0, seed: Long = 40L): Pipeline = {
    val g = new GBTClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(maxIter).setMaxDepth(maxDepth)
      .setSubsamplingRate(subsamplingRate).setSeed(seed)
    new Pipeline().setStages(Array(Features.assemble(features), g))
  }

  /** 3-fold CV grid search over an RF pipeline, all three reference grid
    * dimensions: numTrees × featureSubsetStrategy × subsamplingRate
    * (higgs:77-87). `parallelism` fits grid points concurrently — the
    * scale knob the reference lacks.
    */
  def rfCrossValidated(features: Seq[String], labelCol: String,
                       numTrees: Seq[Int], subsamplingRates: Seq[Double],
                       featureSubsetStrategies: Seq[String] =
                         Seq("log2", "auto", "all"),
                       numFolds: Int = 3, seed: Long = 40L,
                       parallelism: Int = 4): CrossValidator = {
    val rf = new RandomForestClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features").setSeed(seed)
    val pipe = new Pipeline().setStages(Array(Features.assemble(features), rf))
    val grid = new ParamGridBuilder()
      .addGrid(rf.numTrees, numTrees)
      .addGrid(rf.featureSubsetStrategy, featureSubsetStrategies)
      .addGrid(rf.subsamplingRate, subsamplingRates)
      .build()
    new CrossValidator()
      .setEstimator(pipe)
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setLabelCol(labelCol).setMetricName("f1"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds).setSeed(seed).setParallelism(parallelism)
  }

  /** 3-fold CV grid over a GBT pipeline, all three reference grid
    * dimensions: maxIter × maxDepth × subsamplingRate (higgs:119-129).
    */
  def gbtCrossValidated(features: Seq[String], labelCol: String,
                        maxIters: Seq[Int], maxDepths: Seq[Int],
                        subsamplingRates: Seq[Double] = Seq(0.6, 0.8, 1.0),
                        numFolds: Int = 3, seed: Long = 40L,
                        parallelism: Int = 4): CrossValidator = {
    val g = new GBTClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features").setSeed(seed)
    val pipe = new Pipeline().setStages(Array(Features.assemble(features), g))
    val grid = new ParamGridBuilder()
      .addGrid(g.maxIter, maxIters)
      .addGrid(g.maxDepth, maxDepths)
      .addGrid(g.subsamplingRate, subsamplingRates)
      .build()
    new CrossValidator()
      .setEstimator(pipe)
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setLabelCol(labelCol).setMetricName("f1"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds).setSeed(seed).setParallelism(parallelism)
  }

  /** Best params of a fitted CV model (E19: higgs:93-98). */
  def bestParams(cv: CrossValidatorModel): Map[String, Any] = {
    val best = cv.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
    best.stages.last.extractParamMap().toSeq
      .map(p => p.param.name -> p.value).toMap
  }

  /** DataFrame-native confusion matrix: one distributed aggregate, replacing
    * the reference's RDD MulticlassMetrics bridge (E12, higgs:23-40).
    */
  def confusionMatrix(predictions: DataFrame, labelCol: String): DataFrame =
    predictions
      .groupBy(col(labelCol).cast("double").as("label"),
        col("prediction"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("label", "prediction")

  /** Per-class precision / recall / fMeasure, derived from the confusion
    * counts in ONE distributed aggregate (E12 parity: the reference reads
    * `MulticlassMetrics.precision(label)` etc., higgs_ensemble_analysis.py:
    * 23-40, consumed at :104-149). Null-safe: a class never predicted gets
    * precision 0.0, a class absent from the labels gets recall 0.0.
    * Output: (class, precision, recall, f_measure) ordered by class.
    */
  def perClassMetrics(predictions: DataFrame, labelCol: String): DataFrame = {
    val cm = confusionMatrix(predictions, labelCol) // label, prediction, cnt
    val byLabel = cm.groupBy(col("label").as("class"))
      .agg(sum("cnt").as("n_label"))
    val byPred = cm.groupBy(col("prediction").as("class"))
      .agg(sum("cnt").as("n_pred"))
    val tp = cm.filter(col("label") === col("prediction"))
      .select(col("label").as("class"), col("cnt").as("tp"))
    val safeDiv = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      when(b.isNull || b === 0, 0.0).otherwise(a.cast("double") / b)
    byLabel.join(byPred, Seq("class"), "full_outer")
      .join(tp, Seq("class"), "left_outer")
      .withColumn("tp", coalesce(col("tp"), lit(0L)))
      .withColumn("precision", safeDiv(col("tp"), col("n_pred")))
      .withColumn("recall", safeDiv(col("tp"), col("n_label")))
      .withColumn("f_measure",
        when(col("precision") + col("recall") === 0, 0.0)
          .otherwise(col("precision") * col("recall") * 2 /
            (col("precision") + col("recall"))))
      .select("class", "precision", "recall", "f_measure")
      .orderBy("class")
  }

  /** Feature importances of the final tree-ensemble stage of a fitted
    * pipeline, named and sorted descending (E19 parity:
    * higgs_ensemble_analysis.py:47,55 writes `featureImportances` for both
    * RF and GBT). Driver-side: the vector is model metadata, not data.
    */
  def featureImportances(model: org.apache.spark.ml.PipelineModel,
                         featureNames: Seq[String]): Seq[(String, Double)] = {
    val imp = model.stages.last match {
      case m: org.apache.spark.ml.classification.RandomForestClassificationModel =>
        m.featureImportances
      case m: org.apache.spark.ml.classification.GBTClassificationModel =>
        m.featureImportances
      case other => throw new IllegalArgumentException(
        s"last pipeline stage has no featureImportances: ${other.getClass}")
    }
    featureNames.zip(imp.toArray).sortBy { case (_, v) => -v }
  }

  /** Accuracy / weighted precision / recall / f1 in one evaluator family
    * (E14: higgs:84,107,127,146), plus probability-based AUC and the
    * reference-parity hard-prediction AUC (Q3) for binary problems.
    */
  def classificationMetrics(predictions: DataFrame, labelCol: String,
                            binary: Boolean): Map[String, Double] = {
    val m = new MulticlassClassificationEvaluator().setLabelCol(labelCol)
    val base = Map(
      "accuracy" -> m.setMetricName("accuracy").evaluate(predictions),
      "f1" -> m.setMetricName("f1").evaluate(predictions),
      "weightedPrecision" -> m.setMetricName("weightedPrecision").evaluate(predictions),
      "weightedRecall" -> m.setMetricName("weightedRecall").evaluate(predictions))
    if (!binary) base
    else {
      val aucProb = new BinaryClassificationEvaluator().setLabelCol(labelCol)
        .setRawPredictionCol("probability").setMetricName("areaUnderROC")
        .evaluate(predictions)
      // parity with higgs:106: AUC over hard 0/1 predictions (degenerate ROC)
      val aucHard = new BinaryClassificationEvaluator().setLabelCol(labelCol)
        .setRawPredictionCol("prediction").setMetricName("areaUnderROC")
        .evaluate(predictions)
      base + ("areaUnderROC" -> aucProb) + ("areaUnderROC_hard" -> aucHard)
    }
  }
}
