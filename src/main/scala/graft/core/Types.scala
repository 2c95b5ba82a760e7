package graft.core

/** Core index algebra for the cube engine.
  *
  * Semantics mirror the reference's index model
  * (pangeo_forge_recipes/types.py:6-86): an [[Index]] locates one fragment
  * within the n-dimensional combine space; each [[Dimension]] is either a
  * MERGE (widthwise variable union) or CONCAT (axis concatenation) operation;
  * a [[Pos]] is either a file-ordinal (indexed=false) or an element offset
  * into the global concat axis (indexed=true, with the known global dimsize).
  */
object CombineOp extends Enumeration {
  val Merge: CombineOp.Value = Value(1, "MERGE")
  val Concat: CombineOp.Value = Value(2, "CONCAT")
  val Subset: CombineOp.Value = Value(3, "SUBSET") // declared, never produced (types.py:10)
}

final case class Dimension(name: String, operation: CombineOp.Value)

object Dimension {
  implicit val ordering: Ordering[Dimension] =
    Ordering.by(d => (d.name, d.operation.id))
}

/** Position within a dimension. indexed=false → ordinal in the file sequence;
  * indexed=true → element offset, with dimsize = global axis length.
  * (types.py:25-40 collapses Position/IndexedPosition into one shape here.) */
final case class Pos(value: Int, indexed: Boolean = false, dimsize: Int = 0)

object Pos {
  def indexed(value: Int, dimsize: Int): Pos = Pos(value, indexed = true, dimsize)
  implicit val ordering: Ordering[Pos] =
    Ordering.by(p => (p.value, p.indexed, p.dimsize))
}

/** Hashable, deterministically-ordered map Dimension -> Pos (types.py:43-81). */
final case class Index(entries: Map[Dimension, Pos]) {
  /** Canonical sorted view — the deterministic serialization order. */
  def sorted: Vector[(Dimension, Pos)] = entries.toVector.sortBy(_._1)

  def apply(d: Dimension): Pos = entries(d)
  def get(d: Dimension): Option[Pos] = entries.get(d)
  def contains(d: Dimension): Boolean = entries.contains(d)
  def updated(d: Dimension, p: Pos): Index = Index(entries.updated(d, p))
  def size: Int = entries.size

  /** types.py:62-75: the unique CONCAT dimension with this name, if any. */
  def findConcatDim(dimName: String): Option[Dimension] = {
    val cands = entries.keys.filter(d =>
      d.name == dimName && d.operation == CombineOp.Concat).toList
    cands match {
      case Nil => None
      case one :: Nil => Some(one)
      case many => throw new IllegalArgumentException(
        s"Found ${many.size} concat dims named $dimName in the index $this.")
    }
  }

  def findPosition(dimName: String): Int =
    findConcatDim(dimName) match {
      case Some(d) => entries(d).value
      case None => throw new IllegalArgumentException(
        s"No dimension found with name $dimName")
    }

  /** Stable string form usable as a Spark grouping key. */
  def canonical: String = sorted.map { case (d, p) =>
    s"${d.name}#${d.operation.id}=${p.value},${p.indexed},${p.dimsize}"
  }.mkString(";")

  override def toString: String = s"Index(${canonical})"
}

object Index {
  val empty: Index = Index(Map.empty[Dimension, Pos])
  def of(pairs: (Dimension, Pos)*): Index = Index(pairs.toMap)
}
