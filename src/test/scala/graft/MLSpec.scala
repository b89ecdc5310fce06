package graft

import org.apache.spark.sql.functions._

import graft.ml.{Classifiers, Recommender, Regressors, Timing}
import graft.operators.Relational

class MLSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lineitem = Tables.lineitem(spark, sf0001)
    .withColumn("label", when(col("l_returnflag") === "N", 1.0).otherwise(0.0))
    .cache()

  test("RF pipeline trains and beats chance on a learnable label") {
    val Array(tr, te) = lineitem.randomSplit(Array(0.7, 0.3), 40)
    val (model, secs) = Timing.timed(Classifiers.randomForest(
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), "label",
      numTrees = 10).fit(tr))
    assert(secs > 0)
    val metrics = Classifiers.classificationMetrics(
      model.transform(te), "label", binary = true)
    assert(metrics("accuracy") > 0.4)
    assert(metrics.contains("areaUnderROC") && metrics.contains("areaUnderROC_hard"))
  }

  test("confusion matrix cells sum to the scored row count") {
    val Array(tr, te) = lineitem.randomSplit(Array(0.7, 0.3), 40)
    val model = Classifiers.randomForest(
      Seq("l_quantity", "l_discount"), "label", numTrees = 5).fit(tr)
    val cm = Classifiers.confusionMatrix(model.transform(te), "label")
    assert(cm.agg(sum("cnt")).as[Long].head() == te.count())
  }

  test("per-class metrics agree with hand-computed confusion ratios (E12)") {
    val preds = Seq(
      (1.0, 1.0), (1.0, 1.0), (1.0, 0.0),      // label 1: tp=2, fn=1
      (0.0, 0.0), (0.0, 1.0), (0.0, 0.0), (0.0, 0.0)) // label 0: tp=3, fp->1
      .toDF("label", "prediction")
    val rows = Classifiers.perClassMetrics(preds, "label").collect()
      .map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val (p1, r1, f1) = rows(1.0)
    assert(math.abs(p1 - 2.0 / 3) < 1e-9) // predicted-1: 3, tp: 2
    assert(math.abs(r1 - 2.0 / 3) < 1e-9) // labeled-1: 3, tp: 2
    assert(math.abs(f1 - 2.0 / 3) < 1e-9)
    val (p0, r0, _) = rows(0.0)
    assert(math.abs(p0 - 3.0 / 4) < 1e-9)
    assert(math.abs(r0 - 3.0 / 4) < 1e-9)
  }

  test("per-class metrics null-safe for never-predicted classes (E12)") {
    val preds = Seq((2.0, 0.0), (2.0, 0.0), (0.0, 0.0))
      .toDF("label", "prediction")
    val rows = Classifiers.perClassMetrics(preds, "label").collect()
      .map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(rows(2.0) == ((0.0, 0.0, 0.0))) // never predicted
    assert(rows(0.0)._2 == 1.0)            // its one label row was caught
  }

  test("featureImportances are named, sorted, and sum to ~1 (E19)") {
    val features = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val model = Classifiers.randomForest(features, "label", numTrees = 10)
      .fit(lineitem)
    val imp = Classifiers.featureImportances(model, features)
    assert(imp.map(_._1).toSet == features.toSet)
    assert(math.abs(imp.map(_._2).sum - 1.0) < 1e-6)
    assert(imp == imp.sortBy(-_._2))
  }

  test("GBT pipeline fits (E7)") {
    val m = Classifiers.gbt(Seq("l_quantity", "l_discount"), "label",
      maxIter = 3).fit(lineitem.limit(1000))
    assert(m.transform(lineitem.limit(100)).count() == 100)
  }

  test("poisson GLM produces finite coefficients with categorical encoding") {
    val model = Regressors.poissonGlm(
      Seq("l_returnflag"), Seq("l_discount", "l_tax"),
      "l_quantity", maxIter = 10).fit(lineitem)
    val glm = model.stages.last
      .asInstanceOf[org.apache.spark.ml.regression.GeneralizedLinearRegressionModel]
    assert(glm.coefficients.toArray.forall(c => !c.isNaN && !c.isInfinite))
  }

  test("regression metrics: three immutable evaluators (Q8)") {
    val model = Regressors.linear(Seq("l_returnflag"), Seq("l_discount"),
      "l_quantity", elasticNet = 0.0, maxIter = 5).fit(lineitem)
    val m = Regressors.regressionMetrics(model.transform(lineitem), "l_quantity")
    assert(Set("rmse", "mae", "mse").subsetOf(m.keySet))
    assert(math.abs(m("mse") - m("rmse") * m("rmse")) < 1e-6)
  }

  test("validation curve returns one point per regParam") {
    val Array(tr, te) = lineitem.randomSplit(Array(0.7, 0.3), 40)
    val curve = Regressors.validationCurve(
      rp => Regressors.linear(Seq("l_returnflag"), Seq("l_discount"),
        "l_quantity", elasticNet = 1.0, regParam = rp, maxIter = 5),
      tr, te, "l_quantity", Seq(0.01, 10.0))
    assert(curve.map(_._1) == Seq(0.01, 10.0))
    assert(curve.forall(_._2 > 0))
  }

  private lazy val ratings = Tables.lineitem(spark, sf0001)
    .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
    .select(col("o_custkey").cast("int").as("user"),
      col("l_partkey").cast("int").as("item"),
      col("l_quantity").as("rating"),
      col("o_orderdate").cast("timestamp_ltz").cast("long").as("ts"),
      col("l_orderkey") * 10 + col("l_linenumber") as "rid")
    .cache()

  test("ALS temporal eval yields finite rmse per split (E16)") {
    val results = Recommender.temporalEval(ratings, "ts", "rid",
      Seq(0.6, 0.8), Recommender.als(rank = 5, maxIter = 3))
    assert(results.size == 2)
    assert(results.forall { case (_, m) => m("rmse") > 0 && !m("rmse").isNaN })
  }

  test("KMeans over ALS user factors assigns every user (E17+E18+Q6)") {
    val model = Recommender.als(rank = 5, maxIter = 3).fit(ratings)
    val clusters = Recommender.clusterUserFactors(model, k = 4)
    assert(clusters.count() == model.userFactors.count())
    assert(clusters.select("cluster").distinct().count() <= 4)
  }

  test("cluster-token chain produces ranked tokens (als genre chain)") {
    val model = Recommender.als(rank = 5, maxIter = 3).fit(ratings)
    val clusters = Recommender.clusterUserFactors(model, k = 4)
    val toks = Recommender.topAttributeTokens(clusters, ratings,
      Tables.part(spark, sf0001).withColumnRenamed("p_partkey", "item"),
      "item", "p_name", " ", minRatings = 1, topItems = 10, topTokens = 5)
    assert(toks.count() > 0 && toks.count() <= 5)
  }

  // ---- Tolerance-banded invariants (round-8/9 verdict task): the goldens
  // pin exact outputs for ONE seed; these assert the properties that must
  // hold under ANY reasonable seed/partitioning, so a Spark upgrade or
  // parallelism change that silently degrades a model fails loudly while
  // mere seed drift does not. The fixture's columns are mutually
  // independent (|corr| < 0.02 everywhere — measured), so the invariants
  // DERIVE their targets from the features: the models then have real
  // signal to recover, and failing to recover it is a model bug, not data
  // noise.

  /** label: which side of the unit-price boundary (a RATIO of two
    * features — RF must compose axis splits to carve it, ~50/50 classes
    * at the fixture's ~2060 median unit price); y: a linear response on
    * (quantity, discount) with the independent extendedprice column
    * scaled into same-magnitude additive noise.
    */
  private lazy val learnable = Tables.lineitem(spark, sf0001)
    .withColumn("label",
      when(col("l_extendedprice") > col("l_quantity") * 2000.0, 1.0)
        .otherwise(0.0))
    .withColumn("y", col("l_quantity") * 3.0 + col("l_discount") * 100.0 +
      col("l_extendedprice") * 0.001)
    .cache()

  test("invariant: probability AUC >= hard AUC > 0.5 across seeds") {
    for (seed <- Seq(7L, 40L, 1234L)) {
      val Array(tr, te) = learnable.randomSplit(Array(0.7, 0.3), seed)
      val model = Classifiers.randomForest(
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), "label",
        numTrees = 10).fit(tr)
      val m = Classifiers.classificationMetrics(
        model.transform(te), "label", binary = true)
      // ranking by probability dominates the one-point hard-label ROC;
      // both must beat chance on the learnable boundary
      assert(m("areaUnderROC") >= m("areaUnderROC_hard") - 1e-9,
        s"seed $seed: prob AUC ${m("areaUnderROC")} < hard AUC ${m("areaUnderROC_hard")}")
      assert(m("areaUnderROC_hard") > 0.6,
        s"seed $seed: hard AUC ${m("areaUnderROC_hard")} barely above chance")
    }
  }

  test("invariant: lasso validation curve rmse is monotone in regParam") {
    for (seed <- Seq(40L, 99L)) {
      val Array(tr, te) = learnable.randomSplit(Array(0.7, 0.3), seed)
      val rps = Seq(0.01, 1.0, 100.0)
      val curve = Regressors.validationCurve(
        rp => Regressors.linear(Seq("l_returnflag"),
          Seq("l_quantity", "l_discount"),
          "y", elasticNet = 1.0, regParam = rp, maxIter = 10),
        tr, te, "y", rps)
      val rmse = curve.map(_._2)
      // L1 shrinkage can only remove fit on a real linear response:
      // held-out rmse must not improve as regParam grows (0.1% relative
      // band absorbs solver tolerance), and the heavy end must have
      // genuinely collapsed toward intercept-only (strictly worse)
      assert(rmse.sliding(2).forall { case Seq(a, b) => b >= a * 0.999 },
        s"seed $seed: rmse not monotone along $rps: $rmse")
      assert(rmse.last > rmse.head * 1.1,
        s"seed $seed: regParam=100 did not degrade fit: $rmse")
    }
  }

  test("invariant: ALS held-out rmse improves with more training history") {
    // temporal split is deterministic in ts; vary the ALS seed instead
    for (seed <- Seq(1L, 17L)) {
      val results = Recommender.temporalEval(ratings, "ts", "rid",
        Seq(0.4, 0.8), Recommender.als(rank = 5, maxIter = 5, seed = seed))
      val rmse = results.toMap.map { case (f, m) => f -> m("rmse") }
      // doubling the training history must not make the forecast WORSE
      // than 10% beyond the short-history model (band absorbs fit noise)
      assert(rmse(0.8) < rmse(0.4) * 1.1,
        s"seed $seed: rmse(80%)=${rmse(0.8)} vs rmse(40%)=${rmse(0.4)}")
    }
  }

  test("stratifiedSplit + RF end-to-end (claims shape)") {
    val (tr, te) = Relational.stratifiedSplit(lineitem, "l_returnflag", 0.7,
      40, Seq("l_orderkey", "l_linenumber"))
    assert(tr.count() + te.count() == lineitem.count())
  }
}
