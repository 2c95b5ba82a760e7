package graft.combiners

import graft.core._

/** Schema-combine accumulator algebra (combiners.py:15-66): commutative,
  * associative reduction of CubeSchemas along ONE dimension. The accumulator
  * carries (schema so far, concat dim name or None). `addInput` stamps the
  * incoming schema's per-position chunk entry; `merge` folds accumulators.
  */
object SchemaCombine {
  type Acc = (Option[CubeSchema], Option[String])

  def zero(dimension: Dimension): Acc =
    (None, if (dimension.operation == CombineOp.Concat) Some(dimension.name) else None)

  def addInput(acc: Acc, item: (Index, CubeSchema), dimension: Dimension): Acc = {
    val (accSchema, accConcatDim) = acc
    val (index, schema0) = item
    val schema = accConcatDim match {
      case Some(cd) =>
        require(!schema0.chunks.contains(cd),
          "Concat dim should be unchunked for new input")
        val position = index(dimension).value
        schema0.copy(chunks =
          schema0.chunks.updated(cd, Map(position -> schema0.dims(cd))))
      case None => schema0
    }
    accSchema match {
      case Some(s) => (Some(CubeSchema.combine(s, schema, accConcatDim)), accConcatDim)
      case None => (Some(schema), accConcatDim)
    }
  }

  def merge(a1: Acc, a2: Acc): Acc = {
    if (a1._2 != a2._2 && a1._1.isDefined && a2._1.isDefined)
      throw new IllegalArgumentException("Can't merge accumulators with different concat_dims")
    val concatDim = a1._2.orElse(a2._2)
    (a1._1, a2._1) match {
      case (None, b) => (b, concatDim)
      case (a, None) => (a, concatDim)
      case (Some(a), Some(b)) => (Some(CubeSchema.combine(a, b, concatDim)), concatDim)
    }
  }

  def extract(acc: Acc): CubeSchema =
    acc._1.getOrElse(throw new IllegalStateException(
      "Encountered two empty XarraySchemas during combine: one must be non-empty"))
}

/** Single-pass (min, max, count) fold — MinMaxCountCombineFn
  * (combiners.py:99-115). In SQL queries this is a built-in fused agg
  * (Relational.q10MinMaxCount); this typed version serves the typed pipeline.
  */
object MinMaxCount {
  type Acc = (Long, Long, Long)
  val zero: Acc = (Long.MaxValue, Long.MinValue, 0L)
  def add(acc: Acc, v: Long): Acc =
    (math.min(acc._1, v), math.max(acc._2, v), acc._3 + 1)
  def merge(a: Acc, b: Acc): Acc =
    (math.min(a._1, b._1), math.max(a._2, b._2), a._3 + b._3)
}
