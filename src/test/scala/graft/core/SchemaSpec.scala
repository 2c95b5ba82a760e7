package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.combiners.SchemaCombine

/** Schema-combine contract tests — port of tests/test_combiners.py:138-221
  * and FIXTURES.md §6: incremental concat chunk maps, out-of-order adds,
  * attr-conflict drops, second-axis concat, merge of renamed variables,
  * error paths. */
class SchemaSpec extends AnyFunSuite {
  import GoldenCube._

  private val timeDim = Dimension("time", CombineOp.Concat)

  private def schemaAt(nt: Int, start: Int): (Index, CubeSchema) = {
    val frag = makeDs(nt = nt)
    val idx = Index.of(timeDim -> Pos(start))
    (idx, CubeSchema.fromFragment(frag))
  }

  test("incremental concat stamps chunk positions") {
    val dim = timeDim
    var acc = SchemaCombine.zero(dim)
    acc = SchemaCombine.addInput(acc, schemaAt(3, 0), dim)
    assert(SchemaCombine.extract(acc).chunks("time") == Map(0 -> 3))
    acc = SchemaCombine.addInput(acc, schemaAt(3, 1), dim)
    val s = SchemaCombine.extract(acc)
    assert(s.chunks("time") == Map(0 -> 3, 1 -> 3))
    assert(s.dims("time") == 6)
    assert(s.dims("lat") == NY)
  }

  test("out-of-order adds are position-stable") {
    val dim = timeDim
    var acc = SchemaCombine.zero(dim)
    acc = SchemaCombine.addInput(acc, schemaAt(3, 5), dim)
    acc = SchemaCombine.addInput(acc, schemaAt(3, 4), dim)
    val s = SchemaCombine.extract(acc)
    assert(s.chunks("time") == Map(5 -> 3, 4 -> 3))
    assert(s.dims("time") == 6)
  }

  test("merge of accumulators is associative across partitions") {
    val dim = timeDim
    val accA = SchemaCombine.addInput(SchemaCombine.zero(dim), schemaAt(3, 0), dim)
    val accB = SchemaCombine.addInput(SchemaCombine.zero(dim), schemaAt(3, 1), dim)
    val accC = SchemaCombine.addInput(SchemaCombine.zero(dim), schemaAt(4, 2), dim)
    val left = SchemaCombine.merge(SchemaCombine.merge(accA, accB), accC)
    val right = SchemaCombine.merge(accA, SchemaCombine.merge(accB, accC))
    assert(SchemaCombine.extract(left) == SchemaCombine.extract(right))
    assert(SchemaCombine.extract(left).chunks("time") == Map(0 -> 3, 1 -> 3, 2 -> 4))
    assert(SchemaCombine.extract(left).dims("time") == 10)
  }

  test("conflicting attrs are dropped (intersection)") {
    val s1 = CubeSchema.fromFragment(makeDs(3))
    val base = makeDs(3)
    val s2 = CubeSchema.fromFragment(base.copy(
      attrs = base.attrs.updated("conventions", AttrValue("somethingelse"))))
    val combined = CubeSchema.combine(s1, s2, Some("time"))
    assert(!combined.attrs.contains("conventions"))
  }

  test("NaN attrs compare equal") {
    val a1 = Map("fill" -> AttrValue.ANum(Double.NaN))
    val a2 = Map("fill" -> AttrValue.ANum(Double.NaN))
    assert(Attrs.combine(a1, a2).contains("fill"))
  }

  test("error: different non-concat dim sizes") {
    val s1 = CubeSchema.fromFragment(makeDs(3))
    val frag = makeDs(3)
    val shrunk = frag.isel(Map("lat" -> Slc(0, 10)))
    val s2 = CubeSchema.fromFragment(shrunk)
    intercept[IllegalArgumentException](CubeSchema.combine(s1, s2, Some("time")))
  }

  test("error: overlapping chunk keys in concat dim") {
    val c1 = Map("time" -> Map(0 -> 3))
    val c2 = Map("time" -> Map(0 -> 3))
    intercept[IllegalArgumentException](
      CubeSchema.combineChunks(c1, c2, Some("time")))
  }

  test("error: merge duplicate variable without concat dim") {
    val s1 = CubeSchema.fromFragment(makeDs(3))
    intercept[IllegalArgumentException](
      CubeSchema.combineVars(s1.dataVars, s1.dataVars, None, allowBoth = false))
  }

  test("MERGE of distinct variables unions them") {
    val full = makeDs(3)
    val byVar = GoldenCube.splitByVariable(full)
    val sFoo = CubeSchema.fromFragment(byVar("foo"))
    val sBar = CubeSchema.fromFragment(byVar("bar"))
    val merged = CubeSchema.combine(sFoo, sBar, None)
    assert(merged.dataVars.keySet == Set("foo", "bar"))
    assert(merged.dims == full.dims)
  }

  test("dtype promotion lattice") {
    import DType._
    assert(promote(I4, I8) == I8)
    assert(promote(I4, F4) == F8) // numpy: i4+f4 -> f8
    assert(promote(F4, F8) == F8)
    assert(promote(I8, F8) == F8)
    assert(promote(F8, F8) == F8)
    intercept[IllegalArgumentException](promote(M8ns, F8))
  }

  test("determineTargetChunks") {
    val dim = timeDim
    var acc = SchemaCombine.zero(dim)
    acc = SchemaCombine.addInput(acc, schemaAt(2, 0), dim)
    acc = SchemaCombine.addInput(acc, schemaAt(2, 1), dim)
    val s = SchemaCombine.extract(acc)
    assert(CubeSchema.determineTargetChunks(s) ==
      Map("time" -> 2, "lat" -> NY, "lon" -> NX))
    assert(CubeSchema.determineTargetChunks(s, Map("time" -> 3)) ==
      Map("time" -> 3, "lat" -> NY, "lon" -> NX))
    assert(CubeSchema.determineTargetChunks(s, Map.empty, includeAllDims = false) ==
      Map("time" -> 2))
  }
}
