package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Bounded group-collect: gathers up to `cap` bigint values per group and
  * yields NULL for any group whose true cardinality exceeds the cap.
  *
  * This is the single-pass form of the document-frequency prefilter used by
  * shingle-based dedup (`DedupOps.d02NgramJaccard`): a hot shingle ("the of
  * and") must never materialize its full doc list — its group would hold
  * millions of ids and its downstream pair fan-out would be df². The naive
  * two-pass shape (count per key, filter, join back, collect_list) pays the
  * explode twice; this aggregate does it in ONE pass with hard-bounded state:
  * every partial buffer stops accumulating at cap+1 elements (~1 KB at
  * cap=128), so a billion-document stop-word shingle costs the same buffer as
  * a rare one. Groups that overflow evaluate to NULL and are dropped by a
  * `isNotNull` filter — exactly the rows the df-prefilter would have removed
  * (buffer length reaches cap+1 iff the group's distinct-row count > cap).
  *
  * Map-side partial aggregation applies (ObjectHashAggregate), so the
  * shuffle carries at most cap+1 longs per (partition, key) — never the raw
  * exploded rows of a hot key.
  */
case class CollectListCappedI64(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]] {

  private lazy val cap: Int = capExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"collect_list_capped cap must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, capExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint value column, got ${child.dataType.simpleString}")
    else if (!capExpr.foldable ||
      (capExpr.dataType != IntegerType && capExpr.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable integer cap, got ${capExpr.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "collect_list_capped"

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    scala.collection.mutable.ArrayBuffer.empty[Long]

  override def update(
      buf: scala.collection.mutable.ArrayBuffer[Long],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    val v = child.eval(input)
    // cap+1 is the overflow sentinel state: one extra element proves the
    // group exceeded the cap without unbounded growth
    if (v != null && buf.length <= cap) buf += v.asInstanceOf[Long]
    buf
  }

  override def merge(
      buf: scala.collection.mutable.ArrayBuffer[Long],
      other: scala.collection.mutable.ArrayBuffer[Long]): scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < other.length && buf.length <= cap) { buf += other(i); i += 1 }
    buf
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Long]): Any =
    if (buf.length > cap) null else new GenericArrayData(buf.toArray)

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.length * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new scala.collection.mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectListCappedI64 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectListCappedI64 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), capExpr = newChildren(1))
}
