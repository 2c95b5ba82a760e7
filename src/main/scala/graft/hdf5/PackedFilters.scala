package graft.hdf5

/** The two libhdf5 bit-packing filters: scale-offset (id 6) and nbit
  * (id 5) — the last h5py-readable filter pair this reader previously
  * named as unsupported. Clean-room implementations from the public
  * H5Zscaleoffset/H5Znbit client-data layouts and chunk formats.
  *
  * Both pack each element's significant bits MSB-first into a
  * contiguous bitstream (the byte-at-a-time C loops in libhdf5 are an
  * optimization of exactly that). Both are lossless for integers:
  * scale-offset subtracts the chunk minimum and stores offsets in
  * `minbits` bits (fill values ride as the all-ones sentinel); nbit
  * stores only the datatype's `precision` bits at `offset`.
  */
private[hdf5] object BitStream {
  /** MSB-first bit writer. */
  final class Writer(capacityBits: Long) {
    val bytes = new Array[Byte](((capacityBits + 7) / 8).toInt)
    private var bit = 0L
    def put(v: Long, nbits: Int): Unit = {
      var i = nbits - 1
      while (i >= 0) {
        if (((v >>> i) & 1L) != 0)
          bytes((bit / 8).toInt) = (bytes((bit / 8).toInt) |
            (0x80 >>> (bit % 8).toInt)).toByte
        bit += 1
        i -= 1
      }
    }
  }
  /** MSB-first bit reader over a bounded region. */
  final class Reader(data: Array[Byte], startByte: Int) {
    private var bit = startByte * 8L
    private val endBit = data.length * 8L
    def get(nbits: Int): Long = {
      require(bit + nbits <= endBit,
        s"corrupt packed chunk: bitstream exhausted (need $nbits bits)")
      var v = 0L
      var i = 0
      while (i < nbits) {
        v = (v << 1) |
          ((data((bit / 8).toInt) >> (7 - (bit % 8).toInt)) & 1)
        bit += 1
        i += 1
      }
      v
    }
  }
}

/** Scale-offset filter (H5Z id 6), integer path — the variant NASA/NOAA
  * netCDF-4 archives carry (`nccopy`/h5repack `SOFF=0,2`).
  *
  * Client data (H5Z__set_local_scaleoffset): [0] scale type (2 = INT),
  * [1] scale factor (integer: user minbits floor, 0 = auto), [2] chunk
  * element count, [3] dtype class (0 integer / 1 float), [4] dtype
  * size, [5] sign, [6] byte order (0 LE / 1 BE), [7] fill-value-defined
  * flag, [8..] raw fill-value bytes.
  *
  * Chunk layout: fixed 21-byte header — minbits as LE u32 at [0,4),
  * minval byte-width at [4], minval little-endian at [5, 5+width), the
  * rest reserved — then the element offsets packed `minbits` bits each,
  * MSB-first. `minbits == 8·size` marks an untransformed raw chunk;
  * with a defined fill value, the all-ones `minbits` pattern is the
  * fill sentinel and real offsets satisfy offset < sentinel.
  */
object ScaleOffset {
  val ScaleTypeFloatDScale = 0
  val ScaleTypeFloatEScale = 1
  val ScaleTypeInt = 2
  val HeaderBytes = 21

  /** cd_values for the filter-pipeline message (integer path). */
  def cdValues(size: Int, signed: Boolean, littleEndian: Boolean,
               nelmts: Int, fill: Option[Long]): Vector[Int] = {
    val fillWords: Vector[Int] = fill match {
      case None => Vector.empty
      case Some(fv) =>
        // fill value bytes in the dataset's byte order, memcpy'd into
        // the little-endian u32 parameter words
        val bytes = new Array[Byte](size)
        var i = 0
        while (i < size) {
          val shift = if (littleEndian) i else size - 1 - i
          bytes(i) = ((fv >>> (shift * 8)) & 0xFF).toByte
          i += 1
        }
        bytes.padTo((size + 3) / 4 * 4, 0.toByte).grouped(4).map { g =>
          (g(0) & 0xFF) | ((g(1) & 0xFF) << 8) | ((g(2) & 0xFF) << 16) |
            ((g(3) & 0xFF) << 24)
        }.toVector
    }
    Vector(ScaleTypeInt, 0, nelmts, 0, size, if (signed) 1 else 0,
      if (littleEndian) 0 else 1, if (fill.isDefined) 1 else 0) ++ fillWords
  }

  /** cd_values for the FLOAT D-scale path (r14): scale type 0, the
    * decimal scale factor D at [1], dtype class float (1) at [3].
    * `fillBits` carries the fill value's IEEE bit pattern. */
  def cdValuesFloat(size: Int, littleEndian: Boolean, nelmts: Int,
                    dScale: Int, fillBits: Option[Long]): Vector[Int] = {
    val fillWords: Vector[Int] = fillBits match {
      case None => Vector.empty
      case Some(fb) =>
        val bytes = new Array[Byte](size)
        var i = 0
        while (i < size) {
          val shift = if (littleEndian) i else size - 1 - i
          bytes(i) = ((fb >>> (shift * 8)) & 0xFF).toByte
          i += 1
        }
        bytes.padTo((size + 3) / 4 * 4, 0.toByte).grouped(4).map { g =>
          (g(0) & 0xFF) | ((g(1) & 0xFF) << 8) | ((g(2) & 0xFF) << 16) |
            ((g(3) & 0xFF) << 24)
        }.toVector
    }
    Vector(ScaleTypeFloatDScale, dScale, nelmts, 1, size, 0,
      if (littleEndian) 0 else 1, if (fillBits.isDefined) 1 else 0) ++
      fillWords
  }

  private def bitsFor(span: Long): Int = {
    var b = 0
    while ((1L << b) < span && b < 63) b += 1
    b
  }

  private def readElem(raw: Array[Byte], i: Int, size: Int, le: Boolean,
                       signed: Boolean): Long = {
    var v = 0L
    var k = 0
    while (k < size) {
      val byte = raw(i * size + (if (le) size - 1 - k else k)) & 0xFFL
      v = (v << 8) | byte
      k += 1
    }
    if (signed && size < 8) {
      val sh = 64 - size * 8
      (v << sh) >> sh
    } else v
  }

  private def writeElem(out: Array[Byte], i: Int, size: Int, le: Boolean,
                        v: Long): Unit = {
    var k = 0
    while (k < size) {
      val shift = if (le) k else size - 1 - k
      out(i * size + k) = ((v >>> (shift * 8)) & 0xFF).toByte
      k += 1
    }
  }

  /** Decode one chunk. `cd` is the pipeline message's client data. */
  def decompress(data: Array[Byte], cd: Vector[Int]): Array[Byte] = {
    require(cd.length >= 8,
      s"scale-offset filter carries ${cd.length} client values (need >= 8)")
    val scaleType = cd(0)
    if (scaleType == ScaleTypeFloatDScale) return decompressFloatD(data, cd)
    require(scaleType == ScaleTypeInt,
      "scale-offset filter: float E-scale (scale type 1) is unimplemented " +
        "in libhdf5 itself — no writer can produce it; integer (2) and " +
        "float D-scale (0) chunks decode")
    val nelmts = cd(2)
    val size = cd(4)
    val le = cd(6) == 0
    val fillDefined = cd(7) == 1
    require(size >= 1 && size <= 8, s"scale-offset element size $size")
    require(nelmts >= 0 && nelmts.toLong * size <= (1L << 31) - 1,
      s"scale-offset chunk claims $nelmts x $size bytes")
    require(data.length >= HeaderBytes,
      s"scale-offset chunk of ${data.length} bytes lacks the 21-byte header")
    val minbits = (data(0) & 0xFF) | ((data(1) & 0xFF) << 8) |
      ((data(2) & 0xFF) << 16) | ((data(3) & 0xFF) << 24)
    require(minbits >= 0 && minbits <= size * 8,
      s"corrupt scale-offset chunk: minbits $minbits for $size-byte elements")
    val minvalWidth = math.min(8, data(4) & 0xFF)
    var minval = 0L
    var i = 0
    while (i < minvalWidth) {
      minval |= (data(5 + i) & 0xFFL) << (i * 8)
      i += 1
    }
    val out = new Array[Byte](nelmts * size)
    if (minbits == size * 8) {
      // full precision: raw copy, no transform was applied
      require(data.length - HeaderBytes >= out.length,
        s"corrupt scale-offset chunk: ${data.length - HeaderBytes} payload " +
          s"bytes for ${out.length}")
      System.arraycopy(data, HeaderBytes, out, 0, out.length)
    } else {
      val fillSentinel = (1L << minbits) - 1
      val fillVal =
        if (fillDefined) {
          require(cd.length >= 8 + (size + 3) / 4,
            s"scale-offset filter: fill flagged but only ${cd.length} " +
              "client values")
          // fill bytes live in cd[8..] in dataset order
          val fb = new Array[Byte](size)
          var k = 0
          while (k < size) {
            fb(k) = ((cd(8 + k / 4) >>> ((k % 4) * 8)) & 0xFF).toByte
            k += 1
          }
          var v = 0L
          var k2 = 0
          while (k2 < size) {
            v = (v << 8) | (fb(if (le) size - 1 - k2 else k2) & 0xFFL)
            k2 += 1
          }
          v
        } else 0L
      val rdr = new BitStream.Reader(data, HeaderBytes)
      var e = 0
      while (e < nelmts) {
        val packed = rdr.get(minbits)
        val v =
          if (fillDefined && packed == fillSentinel) fillVal
          else packed + minval
        writeElem(out, e, size, le, v)
        e += 1
      }
    }
    out
  }

  /** Encode one chunk (fixture writer twin; auto minbits). */
  def compress(raw: Array[Byte], size: Int, signed: Boolean, le: Boolean,
               fill: Option[Long]): Array[Byte] = {
    require(raw.length % size == 0, "scale-offset: partial element")
    val n = raw.length / size
    var min = Long.MaxValue
    var max = Long.MinValue
    var nonFill = 0
    var i = 0
    while (i < n) {
      val v = readElem(raw, i, size, le, signed)
      if (!fill.contains(v)) {
        if (v < min) min = v
        if (v > max) max = v
        nonFill += 1
      }
      i += 1
    }
    if (nonFill == 0) { min = 0L; max = 0L }
    val span = max - min + 1
    // span <= 0 marks 64-bit overflow (full-range int64 data): fall back
    // to the untransformed full-precision chunk, like libhdf5
    val minbits =
      if (span <= 0) size * 8
      else math.min(
        if (fill.isDefined) bitsFor(span + 1) else bitsFor(span),
        size * 8)
    val out = new Array[Byte](HeaderBytes +
      (if (minbits == size * 8) raw.length
       else ((n.toLong * minbits + 7) / 8).toInt))
    out(0) = (minbits & 0xFF).toByte
    out(1) = ((minbits >>> 8) & 0xFF).toByte
    out(2) = ((minbits >>> 16) & 0xFF).toByte
    out(3) = ((minbits >>> 24) & 0xFF).toByte
    out(4) = 8.toByte
    var k = 0
    while (k < 8) { out(5 + k) = ((min >>> (k * 8)) & 0xFF).toByte; k += 1 }
    if (minbits == size * 8) {
      System.arraycopy(raw, 0, out, HeaderBytes, raw.length)
    } else {
      val w = new BitStream.Writer(n.toLong * minbits)
      val sentinel = (1L << minbits) - 1
      var e = 0
      while (e < n) {
        val v = readElem(raw, e, size, le, signed)
        w.put(if (fill.contains(v)) sentinel else v - min, minbits)
        e += 1
      }
      System.arraycopy(w.bytes, 0, out, HeaderBytes, w.bytes.length)
    }
    out
  }

  // ------------------------------------------------ float D-scale (r14)

  /** FLOAT D-scale decode (H5Z__scaleoffset_postdecompress_fd): packed
    * offsets are llround(v·10^D − min·10^D); the header's minval field
    * carries the chunk minimum's IEEE bit pattern (little-endian, like
    * the integer path's minval); the restored value is
    * packed/10^D + min computed in the dataset's own float width —
    * lossy beyond D decimal digits, exactly as libhdf5 documents. */
  private def decompressFloatD(data: Array[Byte], cd: Vector[Int]): Array[Byte] = {
    val dScale = cd(1)
    val nelmts = cd(2)
    val size = cd(4)
    val le = cd(6) == 0
    val fillDefined = cd(7) == 1
    require(size == 4 || size == 8,
      s"float scale-offset element size $size (f32/f64 are)")
    require(dScale >= 0 && dScale <= 18,
      s"corrupt scale-offset chunk: decimal scale factor $dScale")
    require(nelmts >= 0 && nelmts.toLong * size <= (1L << 31) - 1,
      s"scale-offset chunk claims $nelmts x $size bytes")
    require(data.length >= HeaderBytes,
      s"scale-offset chunk of ${data.length} bytes lacks the 21-byte header")
    val minbits = (data(0) & 0xFF) | ((data(1) & 0xFF) << 8) |
      ((data(2) & 0xFF) << 16) | ((data(3) & 0xFF) << 24)
    require(minbits >= 0 && minbits <= size * 8,
      s"corrupt scale-offset chunk: minbits $minbits for $size-byte elements")
    val minvalWidth = math.min(8, data(4) & 0xFF)
    var minBits = 0L
    var i = 0
    while (i < minvalWidth) {
      minBits |= (data(5 + i) & 0xFFL) << (i * 8)
      i += 1
    }
    val out = new Array[Byte](nelmts * size)
    if (minbits == size * 8) {
      require(data.length - HeaderBytes >= out.length,
        s"corrupt scale-offset chunk: ${data.length - HeaderBytes} payload " +
          s"bytes for ${out.length}")
      System.arraycopy(data, HeaderBytes, out, 0, out.length)
      return out
    }
    val fillBitsVal =
      if (fillDefined) {
        require(cd.length >= 8 + (size + 3) / 4,
          s"scale-offset filter: fill flagged but only ${cd.length} " +
            "client values")
        val fb = new Array[Byte](size)
        var k = 0
        while (k < size) {
          fb(k) = ((cd(8 + k / 4) >>> ((k % 4) * 8)) & 0xFF).toByte
          k += 1
        }
        var v = 0L
        var k2 = 0
        while (k2 < size) {
          v = (v << 8) | (fb(if (le) size - 1 - k2 else k2) & 0xFFL)
          k2 += 1
        }
        v
      } else 0L
    val sentinel = (1L << minbits) - 1
    val rdr = new BitStream.Reader(data, HeaderBytes)
    var e = 0
    if (size == 4) {
      val minF = java.lang.Float.intBitsToFloat(minBits.toInt)
      val p10 = math.pow(10.0, dScale).toFloat
      while (e < nelmts) {
        val packed = rdr.get(minbits)
        val bits: Long =
          if (fillDefined && packed == sentinel) fillBitsVal
          else java.lang.Float.floatToIntBits(
            packed.toFloat / p10 + minF).toLong & 0xFFFFFFFFL
        writeElem(out, e, size, le, bits)
        e += 1
      }
    } else {
      val minD = java.lang.Double.longBitsToDouble(minBits)
      val p10 = math.pow(10.0, dScale)
      while (e < nelmts) {
        val packed = rdr.get(minbits)
        val bits: Long =
          if (fillDefined && packed == sentinel) fillBitsVal
          else java.lang.Double.doubleToLongBits(packed.toDouble / p10 + minD)
        writeElem(out, e, size, le, bits)
        e += 1
      }
    }
    out
  }

  /** FLOAT D-scale encode (fixture-writer twin of [[decompressFloatD]]):
    * per-element packed = llround(v·10^D − min·10^D); a value within
    * 10^-D/2 of the fill value packs as the all-ones sentinel. */
  def compressFloatD(raw: Array[Byte], size: Int, le: Boolean,
                     dScale: Int, fill: Option[Double]): Array[Byte] = {
    require(size == 4 || size == 8, s"float scale-offset size $size")
    require(raw.length % size == 0, "scale-offset: partial element")
    require(dScale >= 0 && dScale <= 18, s"decimal scale factor $dScale")
    val n = raw.length / size
    def elemAt(i: Int): Double = {
      var bits = 0L
      var k = 0
      while (k < size) {
        bits = (bits << 8) | (raw(i * size + (if (le) size - 1 - k else k)) & 0xFFL)
        k += 1
      }
      if (size == 4) java.lang.Float.intBitsToFloat(bits.toInt).toDouble
      else java.lang.Double.longBitsToDouble(bits)
    }
    val p10 = math.pow(10.0, dScale)
    val fillTol = math.pow(10.0, -dScale) / 2
    def isFill(v: Double): Boolean =
      fill.exists(fv => math.abs(v - fv) < fillTol)
    var min = Double.MaxValue
    var max = -Double.MaxValue
    var nonFill = 0
    var i = 0
    while (i < n) {
      val v = elemAt(i)
      require(!v.isNaN && !v.isInfinite,
        "float scale-offset cannot pack NaN/Inf values (use a finite fill)")
      if (!isFill(v)) {
        if (v < min) min = v
        if (v > max) max = v
        nonFill += 1
      }
      i += 1
    }
    if (nonFill == 0) { min = 0.0; max = 0.0 }
    // llround(max·10^D − min·10^D) + 1, the difference taken BEFORE
    // rounding (the H5Z__scaleoffset_precompress_fd expression)
    val span = math.round(max * p10 - min * p10) + 1
    val minbits =
      if (span <= 0 || span >= (1L << 62)) size * 8
      else math.min(bitsFor(span + 1), size * 8) // +1 reserves the sentinel
    val minBitsPattern =
      if (size == 4) java.lang.Float.floatToIntBits(min.toFloat).toLong & 0xFFFFFFFFL
      else java.lang.Double.doubleToLongBits(min)
    val out = new Array[Byte](HeaderBytes +
      (if (minbits == size * 8) raw.length
       else ((n.toLong * minbits + 7) / 8).toInt))
    out(0) = (minbits & 0xFF).toByte
    out(1) = ((minbits >>> 8) & 0xFF).toByte
    out(2) = ((minbits >>> 16) & 0xFF).toByte
    out(3) = ((minbits >>> 24) & 0xFF).toByte
    out(4) = size.toByte
    var k = 0
    while (k < size) {
      out(5 + k) = ((minBitsPattern >>> (k * 8)) & 0xFF).toByte
      k += 1
    }
    if (minbits == size * 8) {
      System.arraycopy(raw, 0, out, HeaderBytes, raw.length)
    } else {
      val w = new BitStream.Writer(n.toLong * minbits)
      val sentinel = (1L << minbits) - 1
      var e = 0
      while (e < n) {
        val v = elemAt(e)
        w.put(
          if (isFill(v)) sentinel
          else math.round(v * p10 - min * p10), minbits)
        e += 1
      }
      System.arraycopy(w.bytes, 0, out, HeaderBytes, w.bytes.length)
    }
    out
  }
}

/** NBit filter (H5Z id 5): stores only each element's significant
  * `precision` bits at bit `offset` (set with H5Tset_precision /
  * H5Tset_offset on the dataset type), MSB-first.
  *
  * Client data (H5Z__set_local_nbit, atomic types): [0] total parameter
  * count, [1] need-not-compress flag, [2] chunk element count, then the
  * datatype description from [3]: class (1 = atomic), size, byte order
  * (0 LE / 1 BE), precision, offset. Compound (3) and array (2) type
  * descriptions are not supported — named error.
  *
  * The restored element carries zero padding outside the precision
  * field, exactly like H5Z__nbit_decompress; sign extension of reduced-
  * precision SIGNED integers happens in the reader's type conversion
  * (H5T semantics), not here.
  */
object Nbit {
  val ClassAtomic = 1
  val ClassArray = 2
  val ClassCompound = 3
  val ClassNoOp = 4

  /** cd_values for the filter-pipeline message (atomic type). */
  def cdValues(size: Int, littleEndian: Boolean, precision: Int,
               offset: Int, nelmts: Int): Vector[Int] = {
    val noop = if (offset == 0 && precision == size * 8) 1 else 0
    Vector(8, noop, nelmts, ClassAtomic, size,
      if (littleEndian) 0 else 1, precision, offset)
  }

  def decompress(data: Array[Byte], cd: Vector[Int]): Array[Byte] = {
    require(cd.length >= 3,
      s"nbit filter carries ${cd.length} client values (need >= 3)")
    if (cd(1) != 0) return data // need-not-compress: stored raw
    require(cd.length >= 8,
      s"nbit filter carries ${cd.length} client values (need 8 for atomic)")
    val nelmts = cd(2)
    val cls = cd(3)
    require(cls == ClassAtomic,
      s"nbit filter: only atomic datatypes are supported, this dataset " +
        s"uses class $cls (${if (cls == ClassCompound) "compound"
        else if (cls == ClassArray) "array" else "no-op"}) — repack the " +
        "file (h5repack -f GZIP=4) to read it")
    val size = cd(4)
    val le = cd(5) == 0
    val precision = cd(6)
    val offset = cd(7)
    require(size >= 1 && size <= 8, s"nbit element size $size")
    require(precision >= 1 && offset >= 0 && precision + offset <= size * 8,
      s"corrupt nbit parameters: precision $precision at offset $offset " +
        s"in $size-byte elements")
    require(nelmts >= 0 && nelmts.toLong * size <= (1L << 31) - 1,
      s"nbit chunk claims $nelmts x $size bytes")
    val out = new Array[Byte](nelmts * size)
    val rdr = new BitStream.Reader(data, 0)
    var e = 0
    while (e < nelmts) {
      val field = rdr.get(precision)
      val v = field << offset
      var k = 0
      while (k < size) {
        val shift = if (le) k else size - 1 - k
        out(e * size + k) = ((v >>> (shift * 8)) & 0xFF).toByte
        k += 1
      }
      e += 1
    }
    out
  }

  /** H5T conversion semantics for reduced-precision FIXED-POINT data:
    * reading a file type (precision p at offset o) into the full-width
    * native integer extracts the field and sign-extends signed values
    * (zero-extends unsigned). The filter itself only restores padded
    * bits; this is the conversion step h5py gets from H5T_conv_i_i. */
  def convertFixedPoint(data: Array[Byte], cd: Vector[Int],
                        signed: Boolean): Array[Byte] = {
    if (cd.length < 8 || cd(1) != 0 || cd(3) != ClassAtomic) return data
    val size = cd(4); val le = cd(5) == 0
    val precision = cd(6); val offset = cd(7)
    if (precision == size * 8 && offset == 0) return data
    val mask = (1L << precision) - 1
    val n = data.length / size
    val out = new Array[Byte](data.length)
    var e = 0
    while (e < n) {
      var v = 0L
      var k = 0
      while (k < size) {
        v = (v << 8) | (data(e * size + (if (le) size - 1 - k else k)) & 0xFFL)
        k += 1
      }
      var field = (v >>> offset) & mask
      if (signed && ((field >>> (precision - 1)) & 1L) == 1L)
        field |= ~mask // sign-extend
      var k2 = 0
      while (k2 < size) {
        val shift = if (le) k2 else size - 1 - k2
        out(e * size + k2) = ((field >>> (shift * 8)) & 0xFF).toByte
        k2 += 1
      }
      e += 1
    }
    out
  }

  /** Encode one chunk (fixture writer twin). Values must already fit
    * their precision field — enforced, not truncated; a SIGNED value is
    * valid when it is the sign extension of its field (the storage form
    * of negatives under reduced precision). */
  def compress(raw: Array[Byte], size: Int, le: Boolean, precision: Int,
               offset: Int, signed: Boolean = false): Array[Byte] = {
    require(raw.length % size == 0, "nbit: partial element")
    require(precision >= 1 && offset >= 0 && precision + offset <= size * 8,
      s"nbit: precision $precision at offset $offset in $size-byte elements")
    val n = raw.length / size
    if (offset == 0 && precision == size * 8) return raw // no-op case
    val mask = if (precision == 64) -1L else (1L << precision) - 1
    val w = new BitStream.Writer(n.toLong * precision)
    var e = 0
    while (e < n) {
      var v = 0L
      var k = 0
      while (k < size) {
        val byte = raw(e * size + (if (le) size - 1 - k else k)) & 0xFFL
        v = (v << 8) | byte
        k += 1
      }
      if (signed && size < 8) { // interpret the element as signed
        val sh = 64 - size * 8
        v = (v << sh) >> sh
      }
      val field = (v >>> offset) & mask
      val restored =
        if (signed && ((field >>> (precision - 1)) & 1L) == 1L)
          (field | ~mask) << offset
        else field << offset
      require(restored == v,
        s"nbit: element $e value 0x${v.toHexString} has bits outside " +
          s"the [$offset, ${offset + precision}) field")
      w.put(field, precision)
      e += 1
    }
    w.bytes
  }
}
