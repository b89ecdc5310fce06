package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries summary: at most k (item, count) counters with the classic
  * decrement-on-overflow update and the mergeable-summaries combine
  * (Misra & Gries 1982; Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Deterministic invariant (not probabilistic): after ingesting N items in
  * any update/merge order, every stored count undercounts its item's true
  * frequency by at most N/(k+1). Hence any item with true count
  * > N/(k+1) is guaranteed present — the summary is a SUPERSET of the
  * φ-heavy hitters for every φ > 1/(k+1).
  */
final class MGSummary(val k: Int) {
  val counts = new mutable.HashMap[String, Long]

  /** Classic MG update: increment if tracked; insert if room; otherwise
    * decrement every counter (the new item is NOT inserted) and drop zeros.
    * The decrement pass is O(k) but amortized O(1): each triggers only
    * after k prior increments paid for it.
    */
  def add(item: String): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None =>
        if (counts.size < k) counts.update(item, 1L)
        else counts.filterInPlace((_, c) => c > 1L)
          .mapValuesInPlace((_, c) => c - 1L)
    }
  }

  /** Mergeable-summaries combine: sum counts pointwise, then if more than k
    * counters remain, subtract the (k+1)-th largest count from all and drop
    * the non-positive — the step whose error telescopes so the merged
    * summary still undercounts by ≤ (N_this + N_other)/(k+1).
    */
  def mergeIn(other: MGSummary): Unit = {
    other.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    if (counts.size > k) {
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - (k + 1)) // (k+1)-th largest
      counts.filterInPlace((_, c) => c > cut)
      counts.mapValuesInPlace((_, c) => c - cut)
    }
  }
}

/** Partial-aggregate frequent-item CANDIDATES:
  * `SELECT graft_mg(tok, k)` → array<string> of every item that MIGHT have
  * frequency > N/(k+1), sorted (deterministic superset of the heavy
  * hitters).
  *
  * The scale story is shuffle volume: a plain `GROUP BY tok` shuffles one
  * row per DISTINCT token per partition — billions of rows for a web-scale
  * corpus vocabulary. This aggregate's partial phase keeps a k-counter
  * bounded summary per partition, so the shuffle carries ≤ partitions × k
  * entries no matter how large the vocabulary is; the exact-count verify
  * pass then touches only candidate tokens (bounded by k) via a broadcast
  * semi-join. Memory per buffer is O(k) strings — independent of input.
  */
case class MisraGriesCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] with ImplicitCastInputTypes {

  require(k > 0, s"misraGriesCandidates: k must be positive, got $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MGSummary, other: MGSummary): MGSummary = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MGSummary): Any = {
    val items = buf.counts.keysIterator.toArray
    java.util.Arrays.sort(items, Ordering[String])
    new GenericArrayData(items.map(UTF8String.fromString): Array[Any])
  }

  override def serialize(buf: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new MGSummary(k)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesCandidates =
    copy(child = newChildren(0))
}
