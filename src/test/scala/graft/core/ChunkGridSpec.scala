package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Port of tests/test_chunk_grid.py:6-152 (exhaustive oracle enumeration). */
class ChunkGridSpec extends AnyFunSuite {

  test("chunk axis conversions") {
    val ca = ChunkAxis(Vector(2, 4, 3))
    assert(ca.len == 9)
    assert(ca.nchunks == 3)

    intercept[IndexOutOfBoundsException](ca.arrayIndexToChunkIndex(-1))
    val expected = Seq(0 -> 0, 1 -> 0, 2 -> 1, 3 -> 1, 4 -> 1, 5 -> 1, 6 -> 2, 7 -> 2, 8 -> 2)
    expected.foreach { case (ai, ci) => assert(ca.arrayIndexToChunkIndex(ai) == ci, s"ai=$ai") }
    intercept[IndexOutOfBoundsException](ca.arrayIndexToChunkIndex(9))

    intercept[IllegalArgumentException](Slc(-1, 5))
    intercept[IndexOutOfBoundsException](ca.arraySliceToChunkSlice(Slc(5, 4)))
    intercept[IndexOutOfBoundsException](ca.arraySliceToChunkSlice(Slc(5, 10)))

    assert(ca.arraySliceToChunkSlice(Slc(0, 9)) == Slc(0, 3))
    assert(ca.arraySliceToChunkSlice(Slc(1, 9)) == Slc(0, 3))
    assert(ca.arraySliceToChunkSlice(Slc(2, 9)) == Slc(1, 3))
    assert(ca.arraySliceToChunkSlice(Slc(2, 8)) == Slc(1, 3))
    assert(ca.arraySliceToChunkSlice(Slc(2, 6)) == Slc(1, 2))
    assert(ca.arraySliceToChunkSlice(Slc(2, 5)) == Slc(1, 2))
    assert(ca.arraySliceToChunkSlice(Slc(6, 7)) == Slc(2, 3))

    intercept[IndexOutOfBoundsException](ca.chunkIndexToArraySlice(-1))
    assert(ca.chunkIndexToArraySlice(0) == Slc(0, 2))
    assert(ca.chunkIndexToArraySlice(1) == Slc(2, 6))
    assert(ca.chunkIndexToArraySlice(2) == Slc(6, 9))
    intercept[IndexOutOfBoundsException](ca.chunkIndexToArraySlice(3))
  }

  test("subset and consolidate") {
    assert(ChunkAxis(Vector(2, 4, 3)).subset(2).chunks == Vector(1, 1, 2, 2, 1, 2))
    val ca = ChunkAxis(Vector(2, 4, 3, 4, 2))
    assert(ca.consolidate(2).chunks == Vector(6, 7, 2))
    assert(ca.consolidate(3).chunks == Vector(9, 6))
  }

  test("chunk grid") {
    val cg = ChunkGrid(Map("x" -> ChunkAxis(Vector(2, 4, 3)), "time" -> ChunkAxis(Vector(7, 8))))
    assert(cg.dims == Set("x", "time"))
    assert(cg.shape == Map("x" -> 9, "time" -> 15))
    assert(cg.nchunks == Map("x" -> 3, "time" -> 2))
    assert(cg.ndim == 2)
    assert(cg.arrayIndexToChunkIndex(Map("x" -> 2)) == Map("x" -> 1))
    assert(cg.arrayIndexToChunkIndex(Map("time" -> 10)) == Map("time" -> 1))
    assert(cg.arrayIndexToChunkIndex(Map("x" -> 7, "time" -> 10)) == Map("x" -> 2, "time" -> 1))
    assert(cg.arraySliceToChunkSlice(Map("x" -> Slc(0, 9), "time" -> Slc(0, 15))) ==
      Map("x" -> Slc(0, 3), "time" -> Slc(0, 2)))
    assert(cg.chunkIndexToArraySlice(Map("x" -> 1, "time" -> 1)) ==
      Map("x" -> Slc(2, 6), "time" -> Slc(7, 15)))
  }

  test("uniform grid with remainder and clamping") {
    val cg1 = ChunkGrid(Map("x" -> ChunkAxis(Vector(2, 2)), "y" -> ChunkAxis(Vector(3, 3, 3, 1))))
    val cg2 = ChunkGrid.fromUniformGrid(Map("x" -> (2, 4), "y" -> (3, 10)))
    assert(cg1 == cg2)
    assert(ChunkGrid.fromUniformGrid(Map("x" -> (999, 2))) ==
      ChunkGrid(Map("x" -> ChunkAxis(Vector(2)))))
    intercept[IllegalArgumentException](ChunkGrid.fromUniformGrid(Map("x" -> (0, 2))))
    intercept[IllegalArgumentException](ChunkGrid.fromUniformGrid(Map("x" -> (2, 0))))
  }

  test("grid consolidate/subset") {
    val cg = ChunkGrid(Map("x" -> ChunkAxis(Vector(2, 4, 3)), "time" -> ChunkAxis(Vector(7, 8))))
    assert(cg.consolidate(Map.empty) == cg)
    assert(cg.consolidate(Map("x" -> 2)).nchunks == Map("x" -> 2, "time" -> 2))
    assert(cg.consolidate(Map("x" -> 2, "time" -> 2)).nchunks == Map("x" -> 2, "time" -> 1))
    assert(cg.subset(Map("x" -> 2)).nchunks == Map("x" -> 6, "time" -> 2))
    assert(cg.subset(Map("x" -> 2, "time" -> 2)).nchunks == Map("x" -> 6, "time" -> 4))
  }

  test("chunk conflicts") {
    val ca1 = ChunkAxis(Vector(2, 4, 3, 4, 2))
    val ca2 = ChunkAxis(Vector(5, 4, 6))
    (0 until ca1.nchunks).foreach(n => assert(ca1.chunkConflicts(n, ca1) == Set.empty[Int]))
    assert(ca1.chunkConflicts(0, ca2) == Set(0))
    assert(ca1.chunkConflicts(1, ca2) == Set(0, 1))
    assert(ca1.chunkConflicts(2, ca2) == Set(1))
    assert(ca1.chunkConflicts(3, ca2) == Set(2))
    assert(ca1.chunkConflicts(4, ca2) == Set(2))
    assert(ca2.chunkConflicts(0, ca1) == Set(1))
    assert(ca2.chunkConflicts(1, ca1) == Set(1))
    assert(ca2.chunkConflicts(2, ca1) == Set.empty[Int])
    intercept[IllegalArgumentException](ca1.chunkConflicts(0, ChunkAxis(Vector(14))))
  }

  test("calc subsets") {
    assert(ChunkMath.calcSubsets(4, 2) == Vector(2, 2))
    assert(ChunkMath.calcSubsets(3, 2) == Vector(1, 2))
    assert(ChunkMath.calcSubsets(10, 3) == Vector(3, 3, 4))
    intercept[IllegalArgumentException](ChunkMath.calcSubsets(2, 3))
  }
}
