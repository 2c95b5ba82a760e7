package graft.core

/** Half-open integer interval [start, stop), step 1 — the slice type used
  * across the chunk math and the writer region logic. */
final case class Slc(start: Int, stop: Int) {
  def length: Int = stop - start
  require(start >= 0, s"Slice start must be >= 0, got $start")
}

object ChunkMath {
  /** utils.py:1-9: divide a length into n integer segments; the last segment
    * absorbs the remainder. */
  def calcSubsets(sequenceLen: Int, nSegments: Int): Vector[Int] = {
    if (nSegments > sequenceLen)
      throw new IllegalArgumentException(
        s"Can't split len $sequenceLen into $nSegments segments")
    val step = sequenceLen / nSegments
    val remainder = sequenceLen % nSegments
    Vector.fill(nSegments - 1)(step) :+ (step + remainder)
  }
}

/** One chunked axis with two index spaces — array space and chunk space —
  * and the conversions between them (chunk_grid.py:144-254). */
final case class ChunkAxis(chunks: Vector[Int]) {
  /** cumulative bounds; bounds(i) = first array index of chunk i. */
  val bounds: Vector[Int] = chunks.scanLeft(0)(_ + _)
  def len: Int = bounds.last
  def nchunks: Int = chunks.length

  def subset(factor: Int): ChunkAxis =
    ChunkAxis(chunks.flatMap(c => ChunkMath.calcSubsets(c, factor)))

  def consolidate(factor: Int): ChunkAxis =
    ChunkAxis(chunks.zipWithIndex.groupBy(_._2 / factor).toVector
      .sortBy(_._1).map(_._2.map(_._1).sum))

  def chunkIndexToArraySlice(chunkIndex: Int): Slc = {
    if (chunkIndex < 0 || chunkIndex >= nchunks)
      throw new IndexOutOfBoundsException("chunk_index out of range")
    Slc(bounds(chunkIndex), bounds(chunkIndex + 1))
  }

  /** numpy searchsorted(side="right") - 1 on the bounds. */
  def arrayIndexToChunkIndex(arrayIndex: Int): Int = {
    if (arrayIndex < 0 || arrayIndex >= len)
      throw new IndexOutOfBoundsException("Index out of range")
    searchSortedRight(arrayIndex) - 1
  }

  /** All chunks intersecting [sl.start, sl.stop) (chunk_grid.py:201-214). */
  def arraySliceToChunkSlice(sl: Slc): Slc = {
    if (sl.stop <= sl.start)
      throw new IndexOutOfBoundsException("Stop must be greater than start")
    if (sl.stop > len)
      throw new IndexOutOfBoundsException(s"Stop must be <= than $len")
    val first = searchSortedRight(sl.start) - 1
    val last = searchSortedLeft(sl.stop)
    Slc(first, last)
  }

  /** chunk_grid.py:216-254: other-grid chunks needing locks for a safe write
    * of this chunk (at most one on each edge). Unused on the aligned main
    * path, ported for the writer's safety analysis. */
  def chunkConflicts(chunkIndex: Int, other: ChunkAxis): Set[Int] = {
    if (other.len != len)
      throw new IllegalArgumentException(
        "Can't compute conflict for ChunkAxes of different size.")
    var conflicts = Set.empty[Int]
    val arraySlice = chunkIndexToArraySlice(chunkIndex)
    val otherChunks = other.arraySliceToChunkSlice(arraySlice)

    val otherLeft = otherChunks.start
    val leftBack = arraySliceToChunkSlice(other.chunkIndexToArraySlice(otherLeft))
    if (leftBack.start < chunkIndex) conflicts += otherLeft

    val otherRight = otherChunks.stop - 1
    val rightBack = arraySliceToChunkSlice(other.chunkIndexToArraySlice(otherRight))
    if (rightBack.stop > chunkIndex + 1) conflicts += otherRight
    conflicts
  }

  // index of first bound > v
  private def searchSortedRight(v: Int): Int = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) { val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid }
    lo
  }
  // index of first bound >= v
  private def searchSortedLeft(v: Int): Int = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) { val mid = (lo + hi) >>> 1
      if (bounds(mid) < v) lo = mid + 1 else hi = mid }
    lo
  }
}

/** Named collection of ChunkAxis (chunk_grid.py:19-141). Axis order is
  * irrelevant; all per-dimension ops take/return maps keyed by dim name. */
final case class ChunkGrid(axes: Map[String, ChunkAxis]) {
  def dims: Set[String] = axes.keySet
  def shape: Map[String, Int] = axes.map { case (n, a) => n -> a.len }
  def nchunks: Map[String, Int] = axes.map { case (n, a) => n -> a.nchunks }
  def ndim: Int = axes.size

  def consolidate(factors: Map[String, Int]): ChunkGrid =
    ChunkGrid(axes.map { case (n, a) =>
      n -> factors.get(n).map(a.consolidate).getOrElse(a) })

  def subset(factors: Map[String, Int]): ChunkGrid =
    ChunkGrid(axes.map { case (n, a) =>
      n -> factors.get(n).map(a.subset).getOrElse(a) })

  def chunkIndexToArraySlice(chunkIndex: Map[String, Int]): Map[String, Slc] =
    chunkIndex.map { case (n, i) => n -> axes(n).chunkIndexToArraySlice(i) }

  def arrayIndexToChunkIndex(arrayIndex: Map[String, Int]): Map[String, Int] =
    arrayIndex.map { case (n, i) => n -> axes(n).arrayIndexToChunkIndex(i) }

  def arraySliceToChunkSlice(slices: Map[String, Slc]): Map[String, Slc] =
    slices.map { case (n, s) => n -> axes(n).arraySliceToChunkSlice(s) }

  def chunkConflicts(chunkIndex: Map[String, Int], other: ChunkGrid): Map[String, Set[Int]] =
    chunkIndex.map { case (n, i) => n -> axes(n).chunkConflicts(i, other.axes(n)) }
}

object ChunkGrid {
  /** Uniform chunks with a remainder chunk; chunksize clamps to dimsize
    * (chunk_grid.py:38-61). */
  def fromUniformGrid(chunksizeAndDimsize: Map[String, (Int, Int)]): ChunkGrid =
    ChunkGrid(chunksizeAndDimsize.map { case (name, (chunksize0, dimsize)) =>
      if (dimsize <= 0) throw new IllegalArgumentException("dimsize must be greater than 0")
      if (chunksize0 <= 0) throw new IllegalArgumentException("chunksize must be greater than 0")
      val chunksize = math.min(chunksize0, dimsize)
      val full = Vector.fill(dimsize / chunksize)(chunksize)
      val rem = dimsize % chunksize
      name -> ChunkAxis(if (rem > 0) full :+ rem else full)
    })
}
