package graft.patterns

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Port of tests/test_patterns.py:17-213 (FIXTURES.md §3). */
class FilePatternSpec extends AnyFunSuite {

  private def concatPattern: FilePattern = FilePattern(
    kw => s"T_${kw("time")}",
    Vector(ConcatDim("time", Vector("0", "1", "2"))))

  private def concatMergePattern: FilePattern = FilePattern(
    kw => s"T_${kw("time")}_V_${kw("variable")}",
    Vector(
      MergeDim("variable", Vector("foo", "bar")),
      ConcatDim("time", Vector("0", "1", "2"))))

  test("concat-only pattern enumerates in order") {
    val p = concatPattern
    assert(p.dims == Map("time" -> 3))
    assert(p.shape == Vector(3))
    assert(p.concatDims == Vector("time"))
    assert(p.mergeDims.isEmpty)
    val urls = p.items.map(_._2).toVector
    assert(urls == Vector("T_0", "T_1", "T_2"))
  }

  test("concat x merge pattern: outer product, last dim fastest") {
    val p = concatMergePattern
    assert(p.shape == Vector(2, 3))
    val items = p.items.toVector
    assert(items.map(_._2) == Vector(
      "T_0_V_foo", "T_1_V_foo", "T_2_V_foo",
      "T_0_V_bar", "T_1_V_bar", "T_2_V_bar"))
    val idx0 = items.head._1
    assert(idx0(Dimension("variable", CombineOp.Merge)) == Pos(0))
    assert(idx0(Dimension("time", CombineOp.Concat)) == Pos(0))
  }

  test("prune keeps merge dims, truncates concat dims") {
    val p = concatMergePattern.prune(2)
    assert(p.shape == Vector(2, 2))
    assert(p.items.map(_._2).toVector ==
      Vector("T_0_V_foo", "T_1_V_foo", "T_0_V_bar", "T_1_V_bar"))
  }

  test("augment_index_with_start_stop oracle (test_patterns.py:204-213)") {
    val itemLens = Vector(2, 2, 3, 2, 2)
    val expectedStarts = Vector(0, 2, 4, 7, 9)
    for (offset <- Seq(0, 5, 500)) {
      (0 until 5).foreach { pos =>
        val aug = FilePattern.augmentIndexWithStartStop(Pos(pos), itemLens, offset)
        assert(aug.value == expectedStarts(pos) + offset)
        assert(aug.indexed)
        assert(aug.dimsize == 11 + offset)
      }
    }
    intercept[IllegalArgumentException](
      FilePattern.augmentIndexWithStartStop(Pos.indexed(0, 4), itemLens))
  }

  test("merkle chain: identical patterns hash equal, url change shifts hash") {
    val p1 = concatPattern
    val p2 = concatPattern
    assert(java.util.Arrays.equals(p1.sha256Hash, p2.sha256Hash))
    val p3 = FilePattern(kw => s"X_${kw("time")}",
      Vector(ConcatDim("time", Vector("0", "1", "2"))))
    assert(!java.util.Arrays.equals(p1.sha256Hash, p3.sha256Hash))
    assert(p1.merkleList.length == 4) // root + 3 items
  }

  test("start_processing_from finds the append resume point") {
    val small = concatPattern.prune(2)
    val full = concatPattern
    // the merkle chain of `full` passes through `small`'s last hash at
    // the index where new files begin
    val resume = full.startProcessingFrom(small.sha256Hash)
    assert(resume.isDefined)
    assert(resume.get.findPosition("time") == 2)
  }

  test("opendap + fsspec kwargs is rejected") {
    intercept[IllegalArgumentException] {
      FilePattern(kw => "x", Vector(ConcatDim("t", Vector("0"))),
        fsspecOpenKwargs = Map("block_size" -> "0"),
        fileType = FileType.Opendap)
    }
  }

  test("nitems fast path: concat_sequence_lens") {
    val p = FilePattern.fromFileSequence(Vector("a", "b", "c"), "time",
      nitemsPerFile = Some(5))
    assert(p.nitemsPerInput == Map("time" -> Some(5)))
    assert(p.concatSequenceLens == Map("time" -> Some(15)))
  }
}
