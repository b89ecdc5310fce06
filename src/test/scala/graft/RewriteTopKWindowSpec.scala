package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanTestBridge

import graft.operators.Relational
import graft.plans.RewriteTopKWindow

/** The opt-in window-top-k → partial-aggregate rewrite: plan shape,
  * result equivalence (including null metrics and deep tiebreaks), and
  * the conservative bail-outs.
  */
class RewriteTopKWindowSpec extends SparkSpec {
  import spark.implicits._

  private def withFlag[A](on: Boolean)(body: => A): A = {
    spark.conf.set("spark.graft.topkRewrite.enabled", on.toString)
    try body finally spark.conf.unset("spark.graft.topkRewrite.enabled")
  }

  private def topK(df: DataFrame): DataFrame =
    Relational.topKPerGroup(df, Seq("g"), col("m"), 3, Seq(col("id")))

  private lazy val data = spark.range(5000).select(
    (col("id") % 13).as("g"),
    col("id").as("id"),
    when(col("id") % 7 === 0, lit(null))
      .otherwise(pmod(hash(col("id")), lit(97))).as("m"),
    concat(lit("p"), col("id") % 5).as("payload"))

  test("rewrites rn<=k into topkrows aggregate with identical results") {
    withFlag(on = true) {
      val df = topK(data)
      val optimized = df.queryExecution.optimizedPlan
      val rewritten = RewriteTopKWindow(optimized)
      assert(rewritten.toString.toLowerCase.contains("topkrows"),
        s"rewrite did not fire:\n$rewritten")
      assert(!rewritten.exists(_.isInstanceOf[Window]))
      // the WindowGroupLimit InferWindowGroupLimit inserted from the same
      // rn-filter must be absorbed, not left under the aggregate (it would
      // re-introduce a per-partition sort)
      assert(!rewritten.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit]),
        s"WindowGroupLimit survived:\n$rewritten")
      val got = PlanTestBridge.ofRows(spark, rewritten)
      assert(got.schema == df.schema, s"${got.schema} vs ${df.schema}")
      val a = got.orderBy("g", "rn").collect().toSeq
      val b = df.orderBy("g", "rn").collect().toSeq
      assert(a == b)
      // and the physical path is a genuine partial aggregate
      val phys = got.queryExecution.executedPlan.toString
      assert(phys.contains("partial_topkrows"), phys)
    }
  }

  test("rewrite handles rn < k and reversed literal comparisons") {
    withFlag(on = true) {
      val base = data.filter(col("m").isNotNull)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("m").desc, col("id"))
      for (cond <- Seq(col("rn") < 4, lit(4) > col("rn"), lit(3) >= col("rn"))) {
        val df = base.withColumn("rn", row_number().over(w)).filter(cond)
        val rewritten = RewriteTopKWindow(df.queryExecution.optimizedPlan)
        assert(rewritten.toString.toLowerCase.contains("topkrows"), cond.toString)
        val a = PlanTestBridge.ofRows(spark, rewritten)
          .orderBy("g", "rn").collect().toSeq
        val b = df.orderBy("g", "rn").collect().toSeq
        assert(a == b, cond.toString)
      }
    }
  }

  test("conservative bail-outs: flag off, k too large, extra window exprs") {
    val df = topK(data)
    val optimized = df.queryExecution.optimizedPlan
    // flag off → untouched
    withFlag(on = false) {
      assert(RewriteTopKWindow(optimized) eq optimized)
    }
    withFlag(on = true) {
      // k above the cap → untouched
      spark.conf.set("spark.graft.topkRewrite.maxK", "2")
      try assert(RewriteTopKWindow(optimized).exists(_.isInstanceOf[Window]))
      finally spark.conf.unset("spark.graft.topkRewrite.maxK")
      // a second window expression alongside row_number → untouched
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("m").desc, col("id"))
      val multi = data.select(col("g"), col("id"), col("m"),
          row_number().over(w).as("rn"), lag("m", 1).over(w).as("prev"))
        .filter(col("rn") <= 3)
      val plan = multi.queryExecution.optimizedPlan
      assert(RewriteTopKWindow(plan).exists(_.isInstanceOf[Window]))
    }
  }

  test("rewrite preserves q02's oracle-checked output exactly") {
    withFlag(on = true) {
      val df = SparkEntry.queries("q02_top_users_per_type")(spark, sf0001)
      val rewritten = RewriteTopKWindow(df.queryExecution.optimizedPlan)
      assert(rewritten.toString.toLowerCase.contains("topkrows"))
      val a = PlanTestBridge.ofRows(spark, rewritten).collect().toSeq
      val b = df.collect().toSeq
      assert(a == b)
    }
  }
}
