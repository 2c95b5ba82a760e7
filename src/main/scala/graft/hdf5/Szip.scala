package graft.hdf5

/** Clean-room szip codec — HDF5 filter 4, the CCSDS 121.0-B extended-Rice
  * entropy coder as implemented by szlib/libaec (the format older NASA
  * EOS/HDF-EOS archives carry; the reference reads them via h5py+libaec).
  *
  * HDF5 hands the filter four client values: the szlib options mask,
  * bits per pixel, pixels per block (J) and pixels per scanline (the
  * reference sample interval). The chunk payload is the raw CCSDS
  * bitstream (HDF5 always sets the RAW option — no szlib container):
  * per scanline, blocks of J samples each coded by an option ID
  * (id_len = 3/4/5 bits for n ≤ 8/16/32):
  *
  *   id 0 + '0'   zero-block run (FS-coded count; 5 = rest-of-segment,
  *                segments are 64 blocks within a scanline)
  *   id 0 + '1'   second extension (pairs coded as one FS codeword
  *                gamma = (a+b)(a+b+1)/2 + b)
  *   id 1..max-1  k-split, k = id-1: FS-coded high parts then k raw
  *                LSBs per sample
  *   id max       uncompressed (n raw bits per sample)
  *
  * With the NN (nearest-neighbour) option the first sample of every
  * scanline is a raw reference and the rest are unit-delay prediction
  * errors folded non-negative by the standard theta-mapping; without it
  * the coder sees raw sample values. Both the decoder and a fixture
  * encoder are implemented (the m12-LZW/J2K pattern: no independent
  * szip codec exists in this offline JVM, so tests round-trip through
  * the real bit-level format and pin the bitstream layout byte-for-byte).
  *
  * Geometry follows szlib/libaec's RSI rule, so scanlines need NOT
  * divide the chunk: the coded scanline is rsi = ceil(pps/J) blocks
  * (rsi·J samples — a scanline whose pixel count does not fill whole
  * blocks is padded up), and the chunk's total pixel count is coded as
  * ceil(total/pps) scanlines with the final scanline padded. Padding
  * duplicates the scanline's last real sample under NN (so the deltas
  * are zero and the pad costs ~one zero-block) and is zero otherwise;
  * the DECODER never depends on the fill — it decodes the padded
  * scanline and emits only the real prefix, which is what makes real
  * NASA EOS chunks (whose fastest dim rarely divides into J-pixel
  * blocks) readable.
  *
  * The LSB/MSB option masks carry the byte order of the DECODED
  * multi-byte samples (H5Z__set_local_szip sets SZ_LSB_OPTION_MASK for
  * little-endian datatypes — the common case — and MSB for big-endian);
  * the bitstream itself is always MSB-first.
  *
  * Named-error corners: both byte-order bits set, sample depths past
  * 32 bits, pixels-per-block outside szlib's even 2..32, scanlines
  * past 128 blocks.
  */
object Szip {

  // szlib option masks (public SZ_* constants)
  val MaskAllowK13 = 1
  val MaskChip = 2
  val MaskEC = 4
  val MaskLSB = 8
  val MaskMSB = 16
  val MaskNN = 32
  val MaskRaw = 128

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"corrupt szip chunk: $msg")

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0L
    private val end = data.length.toLong * 8
    def bit(): Int = {
      if (pos >= end) fail("truncated bitstream")
      val b = (data((pos >>> 3).toInt) >> (7 - (pos & 7)).toInt) & 1
      pos += 1
      b
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Fundamental-sequence (unary) code: m zeros then a one. */
    def fs(): Long = {
      var c = 0L
      while (bit() == 0) {
        c += 1
        if (c > (1L << 20)) fail("runaway FS code")
      }
      c
    }
  }

  private final class BitWriter {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nb += 1
      if (nb == 8) { bos.write(cur); cur = 0; nb = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def fs(m: Long): Unit = {
      var i = 0L
      while (i < m) { bit(0); i += 1 }
      bit(1)
    }
    def finish(): Array[Byte] = {
      if (nb > 0) { cur <<= (8 - nb); bos.write(cur); nb = 0 }
      bos.toByteArray
    }
  }

  private def betaOf(gamma: Long): Long = {
    var beta = 0L
    while ((beta + 1) * (beta + 2) / 2 <= gamma) beta += 1
    beta
  }

  private def validate(optionMask: Int, n: Int, j: Int, pps: Int): Unit = {
    if ((optionMask & MaskLSB) != 0 && (optionMask & MaskMSB) != 0)
      fail("both LSB and MSB sample byte-order options set")
    if (n < 1 || n > 32) fail(s"$n bits per pixel")
    if (j < 2 || j > 32 || j % 2 != 0) fail(s"$j pixels per block")
    if (pps < 1 || pps > j * 128)
      fail(s"$pps pixels per scanline with $j-pixel blocks (max ${j * 128})")
  }

  /** Byte order of the decoded sample layout: MSB → big-endian samples,
    * LSB (the libhdf5 default for little-endian datatypes) or neither →
    * little-endian. */
  private def orderOf(optionMask: Int): java.nio.ByteOrder =
    if ((optionMask & MaskMSB) != 0) java.nio.ByteOrder.BIG_ENDIAN
    else java.nio.ByteOrder.LITTLE_ENDIAN

  private def sampleBytesOf(n: Int): Int = if (n <= 8) 1 else if (n <= 16) 2 else 4
  private def idLenOf(n: Int): Int = if (n <= 8) 3 else if (n <= 16) 4 else 5

  /** Decode one HDF5 chunk. `outBytes` is the chunk's decoded byte count
    * (HDF5 chunks are always full-size); samples are written at the
    * 1/2/4-byte container width of `bitsPerPixel` in the byte order the
    * LSB/MSB option bits name. Scanlines follow the libaec RSI rule
    * (see the object scaladoc): each coded scanline is ceil(pps/J)
    * whole blocks and only the real sample prefix is emitted, so
    * neither pps nor the scanline count needs to divide anything. */
  def decompress(data: Array[Byte], optionMask: Int, bitsPerPixel: Int,
                 pixelsPerBlock: Int, pixelsPerScanline: Int,
                 outBytes: Int): Array[Byte] = {
    val n = bitsPerPixel
    val j = pixelsPerBlock
    val pps = pixelsPerScanline
    validate(optionMask, n, j, pps)
    val sb = sampleBytesOf(n)
    if (outBytes % sb != 0) fail(s"$outBytes chunk bytes at $sb-byte samples")
    val total = outBytes / sb
    val pp = (optionMask & MaskNN) != 0
    val idLen = idLenOf(n)
    val idMax = (1 << idLen) - 1
    val maxv = if (n == 32) 0xFFFFFFFFL else (1L << n) - 1
    val blocksPerScan = (pps + j - 1) / j // the libaec rsi
    val sps = blocksPerScan * j           // coded (padded) samples/scanline
    val br = new BitReader(data)
    val out = java.nio.ByteBuffer.allocate(outBytes).order(orderOf(optionMask))
    def writeSample(x: Long): Unit = sb match {
      case 1 => out.put(x.toByte)
      case 2 => out.putShort(x.toShort)
      case _ => out.putInt(x.toInt)
    }

    val mapped = new Array[Long](sps)
    val vals = new Array[Long](sps)
    var done = 0
    while (done < total) {
      java.util.Arrays.fill(mapped, 0L)
      var refVal = 0L
      var blk = 0
      while (blk < blocksPerScan) {
        val refBlock = pp && blk == 0
        val id = br.bits(idLen).toInt
        if (id == 0) {
          val se = br.bit() == 1
          if (refBlock) refVal = br.bits(n)
          if (se) {
            var i = if (refBlock) 1 else 0
            while (i < j) {
              val gamma = br.fs()
              val beta = betaOf(gamma)
              val d1 = gamma - beta * (beta + 1) / 2
              if ((i & 1) == 0) {
                if (beta < d1) fail("second-extension pair out of range")
                mapped(blk * j + i) = beta - d1
                i += 1
                mapped(blk * j + i) = d1 // j is even, so the slot exists
                i += 1
              } else { // first pair after a reference: only the odd element
                mapped(blk * j + i) = d1
                i += 1
              }
            }
          } else {
            val f = br.fs()
            val zb0 = f + 1
            val segEnd = math.min((blk / 64 + 1) * 64, blocksPerScan)
            val run =
              if (zb0 == 5) segEnd - blk // rest of segment
              else if (zb0 > 5) (zb0 - 1).toInt
              else zb0.toInt
            if (run < 1 || blk + run > blocksPerScan)
              fail(s"zero-block run of $run at block $blk/$blocksPerScan")
            // mapped[] is pre-zeroed; just skip the blocks
            blk += run - 1
          }
        } else if (id == idMax) {
          var i = 0
          if (refBlock) { refVal = br.bits(n); i = 1 }
          while (i < j) { mapped(blk * j + i) = br.bits(n); i += 1 }
        } else {
          val k = id - 1
          if (k > n) fail(s"split k=$k exceeds $n-bit samples")
          var i = 0
          if (refBlock) { refVal = br.bits(n); i = 1 }
          val start = i
          val hi = new Array[Long](j)
          while (i < j) { hi(i) = br.fs(); i += 1 }
          i = start
          while (i < j) {
            mapped(blk * j + i) = (hi(i) << k) | br.bits(k)
            i += 1
          }
        }
        blk += 1
      }
      // post-process the full padded scanline: unmap prediction errors
      // (NN) or copy — then emit only the real sample prefix (pad samples
      // are decoded, validated against the pixel depth, and dropped)
      if (!pp) {
        var i = 0
        while (i < sps) {
          if (mapped(i) > maxv) fail("sample exceeds the pixel depth")
          vals(i) = mapped(i)
          i += 1
        }
      } else {
        if (refVal > maxv) fail("reference sample exceeds the pixel depth")
        vals(0) = refVal
        var prev = refVal
        var i = 1
        while (i < sps) {
          val d = mapped(i)
          val theta = math.min(prev, maxv - prev)
          val delta =
            if (d > 2 * theta) { if (theta == prev) d - theta else theta - d }
            else if ((d & 1L) == 1L) -((d + 1) / 2)
            else d / 2
          val x = prev + delta
          if (x < 0 || x > maxv) fail("prediction error out of range")
          vals(i) = x
          prev = x
          i += 1
        }
      }
      val real = math.min(pps, total - done)
      var i = 0
      while (i < real) { writeSample(vals(i)); i += 1 }
      done += real
    }
    out.array()
  }

  /** Encode one chunk (fixture writer): exact-cost option choice per
    * block among zero-run / second-extension / k-split / uncompressed —
    * every decode path is reachable. Samples read at the container width
    * of `bitsPerPixel` in the byte order the LSB/MSB option bits name;
    * partial scanlines/blocks are padded per the libaec rule (duplicate
    * the last real sample under NN, zero otherwise). */
  def compress(raw: Array[Byte], optionMask: Int, bitsPerPixel: Int,
               pixelsPerBlock: Int, pixelsPerScanline: Int): Array[Byte] = {
    val n = bitsPerPixel
    val j = pixelsPerBlock
    val pps = pixelsPerScanline
    validate(optionMask, n, j, pps)
    val sb = sampleBytesOf(n)
    require(raw.length % sb == 0, s"${raw.length} bytes at $sb-byte samples")
    val total = raw.length / sb
    val pp = (optionMask & MaskNN) != 0
    val idLen = idLenOf(n)
    val idMax = (1 << idLen) - 1
    val maxv = if (n == 32) 0xFFFFFFFFL else (1L << n) - 1
    val blocksPerScan = (pps + j - 1) / j // the libaec rsi
    val sps = blocksPerScan * j           // coded (padded) samples/scanline
    val in = java.nio.ByteBuffer.wrap(raw).order(orderOf(optionMask))
    def readSample(): Long = sb match {
      case 1 => in.get() & 0xFFL
      case 2 => in.getShort() & 0xFFFFL
      case _ => in.getInt() & 0xFFFFFFFFL
    }
    val bw = new BitWriter

    val x = new Array[Long](sps)
    val mapped = new Array[Long](sps)
    var done = 0
    while (done < total) {
      val real = math.min(pps, total - done)
      var i = 0
      while (i < real) {
        x(i) = readSample()
        require(x(i) <= maxv, s"sample ${x(i)} exceeds $n bits")
        i += 1
      }
      // pad the scanline tail and the block remainder up to rsi·J
      val fill = if (pp) x(real - 1) else 0L
      while (i < sps) { x(i) = fill; i += 1 }
      if (!pp) System.arraycopy(x, 0, mapped, 0, sps)
      else {
        mapped(0) = x(0) // raw reference, emitted separately
        i = 1
        while (i < sps) {
          val prev = x(i - 1)
          val theta = math.min(prev, maxv - prev)
          val delta = x(i) - prev
          mapped(i) =
            if (delta >= 0 && delta <= theta) 2 * delta
            else if (delta < 0 && -delta <= theta) -2 * delta - 1
            else theta + math.abs(delta)
          i += 1
        }
      }
      // per-block option choice; zero blocks merge into runs
      var blk = 0
      while (blk < blocksPerScan) {
        val refBlock = pp && blk == 0
        val start = blk * j + (if (refBlock) 1 else 0)
        val until = (blk + 1) * j
        def allZero(b: Int): Boolean = {
          val s0 = b * j + (if (pp && b == 0) 1 else 0)
          var q = s0
          while (q < (b + 1) * j) { if (mapped(q) != 0) return false; q += 1 }
          true
        }
        if (allZero(blk)) {
          var run = 1
          val segEnd = math.min((blk / 64 + 1) * 64, blocksPerScan)
          while (blk + run < segEnd && allZero(blk + run)) run += 1
          bw.bits(0, idLen); bw.bit(0)
          if (refBlock) bw.bits(mapped(0), n)
          if (blk + run == segEnd) bw.fs(4) // rest of segment
          else if (run <= 4) bw.fs(run - 1)
          else bw.fs(run)
          blk += run
        } else {
          val count = until - start
          // candidate costs
          val uncompCost = count.toLong * n
          var bestK = -1
          var bestSplit = Long.MaxValue
          var k = 0
          while (k <= math.max(0, n - 2)) {
            var c = 0L
            var q = start
            while (q < until) { c += (mapped(q) >>> k) + 1 + k; q += 1 }
            if (c < bestSplit) { bestSplit = c; bestK = k }
            k += 1
          }
          var seCost = 0L
          var q = start
          if (refBlock) { // first pair carries only the odd element
            // same 2^24 hopeless fence as the pair loop: d1·(d1+1)/2
            // overflows a Long for d1 near 2^32 (wrapping seCost negative,
            // which would make SE look free and emit runaway FS codes)
            val d1 = mapped(q)
            if (d1 > (1L << 24)) seCost = Long.MaxValue / 2
            else seCost += d1 * (d1 + 1) / 2 + d1 + 1
            q += 1
          }
          while (q < until && seCost < Long.MaxValue / 2) {
            val a = mapped(q); val b = mapped(q + 1)
            val s2 = a + b
            if (s2 > (1L << 24)) seCost = Long.MaxValue / 2 // hopeless
            else seCost += s2 * (s2 + 1) / 2 + b + 1
            q += 2
          }
          if (seCost <= bestSplit && seCost <= uncompCost && idMax > 1) {
            bw.bits(0, idLen); bw.bit(1)
            if (refBlock) bw.bits(mapped(blk * j), n)
            var p = start
            if (refBlock) {
              val d1 = mapped(p)
              bw.fs(d1 * (d1 + 1) / 2 + d1)
              p += 1
            }
            while (p < until) {
              val a = mapped(p); val b = mapped(p + 1)
              bw.fs((a + b) * (a + b + 1) / 2 + b)
              p += 2
            }
          } else if (bestSplit <= uncompCost && bestK + 1 < idMax) {
            bw.bits(bestK + 1, idLen)
            if (refBlock) bw.bits(mapped(blk * j), n)
            var p = start
            while (p < until) { bw.fs(mapped(p) >>> bestK); p += 1 }
            p = start
            if (bestK > 0) {
              while (p < until) {
                bw.bits(mapped(p) & ((1L << bestK) - 1), bestK)
                p += 1
              }
            }
          } else {
            bw.bits(idMax, idLen)
            var p = blk * j
            if (refBlock) { bw.bits(mapped(p), n); p += 1 }
            while (p < until) { bw.bits(mapped(p), n); p += 1 }
          }
          blk += 1
        }
      }
      done += real
    }
    bw.finish()
  }
}
