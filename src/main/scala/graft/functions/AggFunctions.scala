package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
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

  /** Spark's own Bloom-filter aggregate (the engine behind runtime join
    * filtering), surfaced as a Column: folds `key` (must be bigint — hash
    * upstream with xxhash64) into one serialized Bloom filter of `numBits`
    * bits, with the hash-function count sized optimally for
    * `expectedItems`. Genuine partial agg: each partition builds its own
    * filter and merge is a bitwise OR, so exactly one `numBits/8`-byte
    * blob per partition crosses the shuffle regardless of input size.
    */
  def bloomFilterAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(key),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a serialized Bloom filter (no false
    * negatives; false-positive rate set by the build's bits-per-key). The
    * filter rides the plan as a binary literal — broadcast once per
    * executor exactly like Spark's injected runtime filters — and the
    * probe is a codegen-friendly scalar, so it runs inside the scan's
    * WholeStageCodegen span. [[graft.functions.expressions
    * .BloomMightContainKey]] rather than Spark's own
    * `BloomFilterMightContain`, whose generated `(Long)` cast breaks
    * Janino (and silently interprets the probe) whenever the key
    * constant-folds to a negative literal.
    */
  def bloomMightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(
      graft.functions.expressions.BloomMightContainKey(
        Literal(bloom), ColumnBridge.expression(key)))
}
