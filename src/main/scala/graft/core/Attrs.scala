package graft.core

/** JSON-shaped attribute values (dataset / variable attrs and encodings).
  * Equality follows the reference's combine rule: NaNs compare equal
  * (aggregation.py:115-132). */
sealed trait AttrValue extends Serializable {
  def eqNanAware(other: AttrValue): Boolean = (this, other) match {
    case (AttrValue.ANum(a), AttrValue.ANum(b)) =>
      (a.isNaN && b.isNaN) || a == b
    case (a, b) => a == b
  }
}

object AttrValue {
  final case class AStr(v: String) extends AttrValue
  final case class ANum(v: Double) extends AttrValue
  final case class AInt(v: Long) extends AttrValue
  final case class ABool(v: Boolean) extends AttrValue
  final case class AList(v: Vector[AttrValue]) extends AttrValue
  case object ANull extends AttrValue

  def apply(s: String): AttrValue = AStr(s)
  def apply(d: Double): AttrValue = ANum(d)
  def apply(l: Long): AttrValue = AInt(l)
  def apply(i: Int): AttrValue = AInt(i.toLong)
  def apply(b: Boolean): AttrValue = ABool(b)
}

object Attrs {
  type Attrs = Map[String, AttrValue]
  val empty: Attrs = Map.empty

  /** Intersection of key/value-equal attrs; NaN==NaN special-cased
    * (aggregation.py:115-132). An empty left side yields the right side. */
  def combine(a1: Attrs, a2: Attrs): Attrs =
    if (a1.isEmpty) a2
    else a1.keySet.intersect(a2.keySet).iterator.flatMap { k =>
      if (a1(k).eqNanAware(a2(k))) Some(k -> a1(k)) else None
    }.toMap
}
