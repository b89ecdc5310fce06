package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k best (score, id) entries under the ordering
  * score DESC, id ASC, held as a binary min-heap with the WORST entry at the
  * root so a new candidate costs O(1) to reject and O(log k) to accept.
  * Memory is exactly 2 parallel k-arrays — independent of input size.
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a-entry strictly worse than b-entry (lower score, or same score and
    * larger id — larger ids lose ties so output prefers small ids). */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i // index of worst among i and children
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      val ts = scores(i); val ti = ids(i)
      scores(i) = scores(w); ids(i) = ids(w)
      scores(w) = ts; ids(w) = ti
      i = w
    }
  }

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      // sift-up insert
      var i = size
      scores(i) = score; ids(i) = id
      size += 1
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          val ts = scores(i); val ti = ids(i)
          scores(i) = scores(p); ids(i) = ids(p)
          scores(p) = ts; ids(p) = ti
          i = p
        } else return
      }
    } else if (worse(scores(0), ids(0), score, id)) {
      // better than the current worst: replace root, restore heap
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  /** Entries sorted best-first (score DESC, id ASC). */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    out.sortBy { case (s, i) => (-s, i) }
  }
}

/** Partial-aggregate top-k: `SELECT q, topk(score, id, k) GROUP BY q`.
  *
  * This is the ANN reduction SURVEY §7.3 predicted the engine would need: a
  * `row_number().over(partitionBy(q))` window has NO partial phase — every
  * scored (query × corpus) row shuffles into one reducer per query and is
  * fully sorted there, a single-reducer funnel at corpus scale. This
  * aggregate instead keeps a k-entry bounded heap PER INPUT PARTITION
  * (partial), then merges k-sized heaps on the final side — shuffle volume
  * is `groups × k` rows regardless of corpus size, and no sort ever
  * materializes more than k entries per group.
  *
  * Returns array<struct<n_id:bigint, sim:double>> sorted best-first
  * (score DESC, id ASC — deterministic under any partitioning).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ImplicitCastInputTypes {

  require(k > 0, s"topKByScore: k must be positive, got $k")

  // SQL surface (graft_topk): coerce/reject at analysis time instead of a
  // ClassCastException mid-execution when score/id aren't double/bigint
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("n_id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.scores(i), other.ids(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i))
      bb.putLong(buf.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKHeap(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val id = bb.getLong
      buf.insert(s, id)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}
