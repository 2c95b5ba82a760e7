package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Scaled element-wise vector sum: per group, `Σ scale · vec` over
  * bigint-array rows — the single-aggregate form of the tf·idf document
  * embedding sum ([[graft.queries.SimilarityOps]] `sumGramVectors`).
  *
  * Why it exists (r10 scale finding): the declarative form
  * `posexplode(v) → groupBy(doc, pos) sum → collect_list` multiplies the
  * (doc, gram) row mass by the vector width — 64× — before the hash
  * aggregate, and the embed build measured SUPERLINEAR at ht40×
  * (200k docs: ~3× wall per 2× rows — the 640M exploded rows spill the
  * aggregation) while every other stage of the near-dup family stayed
  * linear. This aggregate keeps one fixed-width Array[Long] buffer per
  * group and adds `scale · vec` in a tight loop — rows into the shuffle
  * drop from |doc-gram pairs| × width to |docs|, and map-side partial
  * aggregation applies (ObjectHashAggregate), so the shuffle carries one
  * ~520-byte buffer per (partition, doc).
  *
  * Deterministic: exact integer arithmetic, associative and commutative —
  * shuffle-order-proof, same value the DuckDB oracle computes.
  */
case class SumVecScaledI64(
    vec: Expression,
    scale: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(vec, scale)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(LongType, _) if scale.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, bigint), got " +
        s"(${vec.dataType.simpleString}, ${scale.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sum_vec_scaled_i64"

  // empty array = "no rows seen yet" sentinel (a real vector is never
  // zero-width; width is pinned by the first row per buffer)
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = vec.eval(input)
    val s = scale.eval(input)
    if (v == null || s == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val k = s.asInstanceOf[Long]
      val n = arr.numElements()
      val out = if (buf.length == 0) new Array[Long](n) else buf
      require(out.length == n,
        s"$prettyName: ragged vectors in one group (${out.length} vs $n)")
      var i = 0
      while (i < n) { out(i) += k * arr.getLong(i); i += 1 }
      out
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.length == 0) buf
    else if (buf.length == 0) other
    else {
      require(buf.length == other.length,
        s"$prettyName: ragged vectors across partials (${buf.length} vs ${other.length})")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.length * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SumVecScaledI64 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SumVecScaledI64 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), scale = newChildren(1))
}
