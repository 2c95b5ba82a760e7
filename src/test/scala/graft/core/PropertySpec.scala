package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.rechunking.Rechunking

/** Randomized-property tests (the reference's heavy parametrization,
  * SURVEY §5, generalized): chunk-math invariants and the split/combine
  * round-trip hold across seeded-random chunkings, offsets, and target
  * chunk sizes. (The scalatest-scalacheck bridge is not in the offline
  * cache, so generation is a seeded rng — same coverage, reproducible.) */
class PropertySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(3)
  private def randChunks(): Vector[Int] =
    Vector.fill(1 + rng.nextInt(8))(1 + rng.nextInt(9))

  test("ChunkAxis: conversions are mutually consistent (100 random axes)") {
    (1 to 100).foreach { _ =>
      val chunks = randChunks()
      val ca = ChunkAxis(chunks)
      assert(ca.len == chunks.sum)
      (0 until ca.len).foreach { i =>
        val c = ca.arrayIndexToChunkIndex(i)
        val sl = ca.chunkIndexToArraySlice(c)
        assert(sl.start <= i && i < sl.stop, s"chunks=$chunks i=$i")
      }
      val tiles = (0 until ca.nchunks).map(ca.chunkIndexToArraySlice)
      assert(tiles.map(_.length).sum == ca.len)
      tiles.sliding(2).foreach {
        case Seq(a, b) => assert(a.stop == b.start)
        case _ =>
      }
    }
  }

  test("ChunkAxis: subset preserves length, consolidate preserves length") {
    (1 to 100).foreach { _ =>
      val chunks = randChunks()
      val factor = 1 + rng.nextInt(4)
      val ca = ChunkAxis(chunks)
      if (chunks.forall(_ >= factor)) {
        val sub = ca.subset(factor)
        assert(sub.len == ca.len, s"chunks=$chunks factor=$factor")
        assert(sub.nchunks == ca.nchunks * factor)
      }
      assert(ca.consolidate(factor).len == ca.len)
    }
  }

  test("calcSubsets partitions the length (200 random cases)") {
    (1 to 200).foreach { _ =>
      val len = 1 + rng.nextInt(100)
      val n = 1 + rng.nextInt(math.min(len, 10))
      val parts = ChunkMath.calcSubsets(len, n)
      assert(parts.sum == len, s"len=$len n=$n parts=$parts")
      assert(parts.length == n)
      assert(parts.forall(_ >= 1))
    }
  }

  test("split/combine round-trip for 40 random file/target chunkings") {
    val timeDim = Dimension("time", CombineOp.Concat)
    val nt = 10
    val full = GoldenCube.makeDs(nt)
    (1 to 40).foreach { _ =>
      val daysPerFile = 1 + rng.nextInt(10)
      val targetChunk = 1 + rng.nextInt(12)
      val fragments = (0 until nt by daysPerFile).map { t0 =>
        val f = full.isel(Map("time" -> Slc(t0, math.min(t0 + daysPerFile, nt))))
        (Index.of(timeDim -> Pos.indexed(t0, nt)), f)
      }.toVector
      val combined = fragments
        .flatMap { case (i, f) =>
          Rechunking.splitFragment(i, f,
            Some(Map("time" -> math.min(targetChunk, nt)))) }
        .groupBy(_._1)
        .values.map(g => Rechunking.combineFragments(g.map(_._2)))
      val whole = Rechunking.combineFragments(combined.toSeq)._2
      assert(whole.sameAs(full),
        s"round-trip failed: daysPerFile=$daysPerFile targetChunk=$targetChunk")
    }
  }

  test("dtype promotion is commutative") {
    val ds = Seq(DType.I4, DType.I8, DType.F4, DType.F8)
    for (a <- ds; b <- ds)
      assert(DType.promote(a, b) == DType.promote(b, a), s"$a $b")
  }

  test("lzf: compress/decompress round-trips across entropy mixes (300 random buffers)") {
    import graft.hdf5.Lzf
    (1 to 300).foreach { trial =>
      val n = 1 + rng.nextInt(20000)
      val mode = rng.nextInt(5)
      val buf = new Array[Byte](n)
      mode match {
        case 0 => rng.nextBytes(buf) // high entropy
        case 1 => // runs of a few symbols
          var i = 0
          while (i < n) {
            val run = 1 + rng.nextInt(600); val b = rng.nextInt(4).toByte
            java.util.Arrays.fill(buf, i, math.min(n, i + run), b)
            i += run
          }
        case 2 => // periodic with period spanning the offset encoding
          val period = 1 + rng.nextInt(300)
          buf.indices.foreach(i => buf(i) = (i % period).toByte)
        case 3 => // text-like: small alphabet with repeats
          buf.indices.foreach(i => buf(i) = (97 + rng.nextInt(6)).toByte)
        case 4 => // mixed: noise with embedded repeated blocks
          rng.nextBytes(buf)
          val block = new Array[Byte](math.min(n, 1 + rng.nextInt(64)))
          rng.nextBytes(block)
          (0 until 4).foreach { _ =>
            val at = rng.nextInt(math.max(1, n - block.length + 1))
            System.arraycopy(block, 0, buf, at, math.min(block.length, n - at))
          }
      }
      Lzf.compress(buf) match {
        case Some(c) =>
          assert(c.length < n, s"trial $trial: not smaller")
          assert(Lzf.decompress(c, n).sameElements(buf), s"trial $trial mode $mode")
        case None => // incompressible: filter stores raw; nothing to check
      }
    }
  }

  test("lzf: decoder rejects corrupt streams, never mis-indexes (500 random streams)") {
    import graft.hdf5.Lzf
    (1 to 500).foreach { trial =>
      val s = new Array[Byte](rng.nextInt(200))
      rng.nextBytes(s)
      val outLen = rng.nextInt(400)
      // arbitrary bytes must either decode to exactly outLen bytes or be
      // rejected with the codec's own error — no out-of-bounds escapes
      try { val out = Lzf.decompress(s, outLen); assert(out.length == outLen) }
      catch { case _: IllegalStateException => () }
    }
  }
}
