package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.expressions.MisraGriesCandidates
import graft.functions.expressions.TopKByScore

/** Custom aggregate functions with genuine partial (map-side) phases —
  * the reductions Spark's built-ins or windows can't do without funneling
  * whole groups through single reducers.
  */
object AggFunctions {

  /** Top-k (score DESC, id ASC) entries per group as
    * array<struct<n_id, sim>>, best-first. Partial-aggregating: each input
    * partition contributes at most k entries to the shuffle, so the
    * reduction is `groups × k` rows regardless of input size (vs a
    * row_number window, which shuffles and sorts EVERY input row into one
    * reducer per group). `id` must be bigint; cast upstream.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** Misra–Gries frequent-item candidates as a sorted array<string>:
    * a deterministic SUPERSET of every item with frequency > N/(k+1),
    * with ≤ partitions × k entries ever crossing the shuffle (vs one row
    * per distinct item per partition for a plain GROUP BY). Pair with an
    * exact-count verify join to emit exact heavy hitters in two passes.
    */
  def frequentCandidates(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesCandidates(ColumnBridge.expression(item), k)
        .toAggregateExpression())
}
