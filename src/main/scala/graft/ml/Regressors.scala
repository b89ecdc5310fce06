package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.{MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.regression.{GeneralizedLinearRegression, LinearRegression}
import org.apache.spark.sql.DataFrame

/** Regression suite (reference T2, E9-E11, E15:
  * Claims_Prediction.py:108-150): Poisson GLM, L1/L2 linear regression,
  * L1/L2 logistic regression, and the regParam validation-curve sweep.
  *
  * Every fit is maxIter bounded; each IRLS / L-BFGS iteration is one
  * treeAggregate over the data — linear in input size, no driver-side data.
  */
object Regressors {

  /** family=poisson, link=log (ref claims:108-110). */
  def poissonGlm(categorical: Seq[String], numeric: Seq[String],
                 labelCol: String, regParam: Double = 0.0,
                 maxIter: Int = 50): Pipeline = {
    val glr = new GeneralizedLinearRegression()
      .setFamily("poisson").setLink("log")
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setRegParam(regParam).setMaxIter(maxIter)
    withFeatures(categorical, numeric, glr)
  }

  /** elasticNetParam 1.0 = L1 / 0.0 = L2 (ref claims:111-114). */
  def linear(categorical: Seq[String], numeric: Seq[String], labelCol: String,
             elasticNet: Double, regParam: Double = 0.01,
             maxIter: Int = 50): Pipeline = {
    val lr = new LinearRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setElasticNetParam(elasticNet).setRegParam(regParam).setMaxIter(maxIter)
    withFeatures(categorical, numeric, lr)
  }

  /** Binary logistic with L1/L2 (ref claims:115-118). */
  def logistic(categorical: Seq[String], numeric: Seq[String], labelCol: String,
               elasticNet: Double, regParam: Double = 0.01,
               maxIter: Int = 50): Pipeline = {
    val lr = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setElasticNetParam(elasticNet).setRegParam(regParam).setMaxIter(maxIter)
    withFeatures(categorical, numeric, lr)
  }

  private def withFeatures(categorical: Seq[String], numeric: Seq[String],
                           est: org.apache.spark.ml.PipelineStage): Pipeline =
    new Pipeline().setStages(
      Array(Features.encodePipeline(categorical, numeric), est))

  /** Three immutable evaluators (quirk Q8: the reference mutates one
    * evaluator's metricName between reads, als:57-62).
    */
  def regressionMetrics(predictions: DataFrame, labelCol: String): Map[String, Double] =
    Seq("rmse", "mae", "mse").map { name =>
      name -> new RegressionEvaluator().setLabelCol(labelCol)
        .setMetricName(name).evaluate(predictions)
    }.toMap

  /** regParam validation curve (ref claims:139-150): one fit + one eval per
    * regParam on a fixed train/test split; returns (regParam, rmse) rows.
    */
  def validationCurve(pipelineFor: Double => Pipeline, train: DataFrame,
                      test: DataFrame, labelCol: String,
                      regParams: Seq[Double]): Seq[(Double, Double)] =
    validationCurveMetric(pipelineFor, train, test, labelCol, "rmse",
      regParams)

  /** As [[validationCurve]] with a chosen metric: a RegressionEvaluator
    * name ("rmse"/"mae"/"mse") for regression families, or "accuracy" for
    * classification families — the reference's curves use RMSE for the
    * Poisson/linear fits and ACCURACY for the logistic ones
    * (Claims_Prediction.py:148-152).
    */
  def validationCurveMetric(pipelineFor: Double => Pipeline, train: DataFrame,
                            test: DataFrame, labelCol: String, metric: String,
                            regParams: Seq[Double]): Seq[(Double, Double)] =
    regParams.map { rp =>
      val model: PipelineModel = pipelineFor(rp).fit(train)
      val preds = model.transform(test)
      val v = metric match {
        case "accuracy" => new MulticlassClassificationEvaluator()
          .setLabelCol(labelCol).setMetricName("accuracy").evaluate(preds)
        case r => new RegressionEvaluator().setLabelCol(labelCol)
          .setMetricName(r).evaluate(preds)
      }
      rp -> v
    }
}
