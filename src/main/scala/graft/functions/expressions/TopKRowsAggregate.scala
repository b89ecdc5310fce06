package graft.functions.expressions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, NullsFirst, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** One buffered entry: the evaluated sort keys plus the full row payload. */
final class RowEntry(val keys: Array[Any], val row: InternalRow)

/** Bounded top-k buffer of FULL ROWS under an arbitrary SortOrder list —
  * the generalization of [[TopKHeap]] that backs the
  * [[graft.plans.RewriteTopKWindow]] optimizer rule (a row_number window
  * keeps every column, so the rewrite must too). Max-heap with the WORST
  * entry at the root; memory is ≤ k rows regardless of input size.
  */
final class RowHeap(val k: Int, val ord: Ordering[RowEntry]) {
  val pq = new java.util.PriorityQueue[RowEntry](k, ord.reverse) // head=worst
  def insert(e: RowEntry): Unit = {
    if (pq.size < k) { pq.add(e); () }
    else if (ord.lt(e, pq.peek())) { pq.poll(); pq.add(e); () }
  }
  def sortedEntries: Array[RowEntry] = {
    val arr = pq.toArray(new Array[RowEntry](pq.size))
    scala.util.Sorting.stableSort(arr)(ord)
    arr
  }
}

/** Partial-aggregate top-k of WHOLE ROWS: keeps the k first rows in the
  * order given by `orderKeys` (any directions / null orderings), returning
  * them as array<struct<...>> best-first. Same scale rationale as
  * [[TopKByScore]]: each input partition contributes ≤ k rows to the
  * shuffle — the reduction a `row_number().over(...)` + `rn <= k` filter
  * needs but cannot get from a window (windows have no partial phase).
  */
case class TopKRows(
    orderKeys: Seq[SortOrder],
    rowExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RowHeap] {

  require(k > 0, s"topKRows: k must be positive, got $k")
  require(orderKeys.nonEmpty, "topKRows: at least one sort key")

  override def children: Seq[Expression] = orderKeys :+ rowExpr
  override def nullable: Boolean = false
  @transient private lazy val rowType = rowExpr.dataType.asInstanceOf[StructType]
  override def dataType: DataType = ArrayType(rowType, containsNull = false)

  /** Per-key interpreted orderings with direction / null-ordering applied:
    * entry A ranks before entry B iff compare < 0.
    */
  @transient private lazy val entryOrdering: Ordering[RowEntry] = {
    val fields = orderKeys.map { so =>
      (TypeUtils.getInterpretedOrdering(so.child.dataType),
        so.direction == Ascending, so.nullOrdering == NullsFirst)
    }.toArray
    new Ordering[RowEntry] {
      override def compare(a: RowEntry, b: RowEntry): Int = {
        var i = 0
        while (i < fields.length) {
          val (ord, asc, nullsFirst) = fields(i)
          val va = a.keys(i); val vb = b.keys(i)
          val c =
            if (va == null && vb == null) 0
            else if (va == null) { if (nullsFirst) -1 else 1 }
            else if (vb == null) { if (nullsFirst) 1 else -1 }
            else {
              val raw = ord.compare(va, vb)
              if (asc) raw else -raw
            }
          if (c != 0) return c
          i += 1
        }
        0
      }
    }
  }

  override def createAggregationBuffer(): RowHeap = new RowHeap(k, entryOrdering)

  override def update(buf: RowHeap, input: InternalRow): RowHeap = {
    val keys = new Array[Any](orderKeys.length)
    var i = 0
    while (i < orderKeys.length) {
      keys(i) = InternalRow.copyValue(orderKeys(i).child.eval(input))
      i += 1
    }
    val row = rowExpr.eval(input).asInstanceOf[InternalRow].copy()
    buf.insert(new RowEntry(keys, row))
    buf
  }

  override def merge(buf: RowHeap, other: RowHeap): RowHeap = {
    val it = other.pq.iterator()
    while (it.hasNext) buf.insert(it.next())
    buf
  }

  override def eval(buf: RowHeap): Any =
    new GenericArrayData(buf.sortedEntries.map(_.row.asInstanceOf[Any]))

  // ---- serialization: one UnsafeRow of (keys..., row) per entry --------
  @transient private lazy val serTypes: Array[DataType] =
    (orderKeys.map(_.child.dataType) :+ rowType).toArray
  @transient private lazy val serProj = UnsafeProjection.create(serTypes)

  override def serialize(buf: RowHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val writeBuffer = new Array[Byte](4096)
    out.writeInt(buf.pq.size)
    val it = buf.pq.iterator()
    while (it.hasNext) {
      val e = it.next()
      val ur = serProj(new GenericInternalRow(e.keys :+ (e.row: Any)))
      out.writeInt(ur.getSizeInBytes)
      ur.writeToStream(out, writeBuffer)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RowHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new RowHeap(k, entryOrdering)
    var e = 0
    while (e < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val ur = new UnsafeRow(serTypes.length)
      ur.pointTo(rowBytes, len)
      val keys = new Array[Any](orderKeys.length)
      var i = 0
      while (i < orderKeys.length) {
        keys(i) = InternalRow.copyValue(ur.get(i, serTypes(i)))
        i += 1
      }
      val row = ur.getStruct(orderKeys.length, rowType.size).copy()
      buf.insert(new RowEntry(keys, row))
      e += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(orderKeys = newChildren.init.map(_.asInstanceOf[SortOrder]),
      rowExpr = newChildren.last)
}
