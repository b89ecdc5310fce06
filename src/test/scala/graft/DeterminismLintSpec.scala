package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan, Sort, Window => WindowNode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Regression gate for the oracle determinism rules (SparkEntry scaladoc):
  * every oracle-checkable query must (a) end in a GLOBAL Sort — the total
  * ORDER BY the hash-compare depends on — unless it can produce at most one
  * row, and (b) contain no Sum/Average over raw floating-point input, whose
  * result depends on partition order and silently reopens hash-flakiness.
  * One carelessly-written new query previously could only be caught by a
  * flaky red several rounds later; this spec catches it at `sbt test` time.
  *
  * Scope is exactly `SparkEntry.oracleSql.keySet`: golden-pinned ML/split
  * queries are checked by GoldenSpec against stored outputs instead (their
  * determinism argument is seeded fits + rounding, not hash-stable plans).
  */
class DeterminismLintSpec extends SparkSpec {

  private def lint(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.analyzed
    val errs = Seq.newBuilder[String]
    // a Limit above a global Sort stays deterministic (the sort's
    // tiebreaks pin which rows survive the cut) — unwrap it
    def stripLimit(p: LogicalPlan): LogicalPlan = p match {
      case l: GlobalLimit => stripLimit(l.child)
      case l: LocalLimit => stripLimit(l.child)
      case other => other
    }
    val sortOk = stripLimit(plan) match {
      case s: Sort => s.global
      case p => p.maxRows.exists(_ <= 1L)
    }
    if (!sortOk)
      errs += "no global Sort at the plan root (result order unpinned)"
    def checkAggs(exprs: Seq[Expression], where: String): Unit =
      exprs.foreach(_.foreach {
        case ae: AggregateExpression =>
          ae.aggregateFunction match {
            case f @ (_: Sum | _: Average)
                if f.children.exists(c =>
                  c.dataType == DoubleType || c.dataType == FloatType) =>
              errs += s"order-dependent float ${f.prettyName} in $where " +
                s"(decimal-cast the input): ${ae.sql}"
            case _ => ()
          }
        case _ => ()
      })
    plan.foreach {
      case a: Aggregate => checkAggs(a.aggregateExpressions, "Aggregate")
      case w: WindowNode => checkAggs(w.windowExpressions, "Window")
      case _ => ()
    }
    errs.result()
  }

  test("every oracle-checkable query obeys the determinism rules") {
    val failures = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val errs = lint(SparkEntry.queries(name)(spark, sf0001))
      errs.map(e => s"$name: $e")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the lint actually fires on a deliberately-broken query") {
    val broken = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("s"), avg(col("l_discount")).as("a"))
    val errs = lint(broken)
    assert(errs.exists(_.contains("no global Sort")), errs.toString)
    assert(errs.count(_.contains("order-dependent float")) == 2,
      errs.toString)
    // and the fixed form passes
    val fixed = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(operators.Relational.decSum(col("l_quantity")).as("s"))
      .orderBy("l_returnflag")
    assert(lint(fixed).isEmpty, lint(fixed).toString)
  }

  test("no serving query runs an in-line corpus-linear recall audit " +
      "(round-17 verdict #1: certificates, not per-query brute force)") {
    // The production-probe rows (q164/q169/q173) must enforce their
    // recall floors by READING the persisted certificate, never by
    // re-running ivfRecallAtK / an exhaustive-decisions pass inside the
    // serving query. Source-level pin: the query layer may not reference
    // the audit primitive at all — it lives in the mutation/certification
    // layer (Similarity.certifyIvfIndex, Dedup.certifyDecisionRecall)
    // and in specs.
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala"))
    assert(!src.contains("ivfRecallAtK"),
      "SparkEntry references ivfRecallAtK — a serving query regressed " +
        "to the in-line corpus-linear audit; read the stored recall " +
        "certificate instead (requireCertifiedRecall)")
  }
}
