package graft.hdf5

/** LZF block codec — the compression h5py registers as HDF5 filter id
  * 32000 (`pangeo_forge_recipes` reads h5py output, and lzf is h5py's
  * built-in alternative to gzip, so wild netCDF-4/HDF5 files carry it).
  *
  * Re-implemented from the public liblzf stream format description (the
  * format is fixed by the decoder contract; this is not a translation):
  *
  *   - ctrl byte < 0x20: a literal run of `ctrl + 1` bytes follows.
  *   - ctrl byte >= 0x20: a back-reference. `len = ctrl >> 5`; if
  *     `len == 7` the next byte extends it (`len += next`). The low five
  *     ctrl bits are the high bits of a 13-bit offset whose low byte
  *     follows: `off = ((ctrl & 0x1f) << 8) | next`. Copy `len + 2`
  *     bytes starting at `out[pos - off - 1]`, byte-sequentially (so
  *     overlapping copies repeat recent output, RLE-style).
  *
  * The HDF5 filter stores an undecorated stream — no length header; the
  * decoded size is the chunk's byte size, which the caller knows from
  * the chunk shape. Chunks the compressor could not shrink are stored
  * raw with the chunk's filter-mask bit set, so decompress always sees a
  * genuine stream (HDF5.defilter skips masked filters).
  */
object Lzf {

  private final val MaxLiteral = 32        // ctrl 0x00..0x1f → 1..32 bytes
  private final val MaxDistance = 8192     // 13-bit offset + 1
  private final val MaxMatch = 264         // 2 + 7 + 255

  /** Decode `in` into exactly `outLen` bytes; corrupt streams raise. */
  def decompress(in: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var ip = 0
    var op = 0
    while (ip < in.length) {
      val ctrl = in(ip) & 0xFF
      ip += 1
      if (ctrl < 0x20) {
        val len = ctrl + 1
        if (ip + len > in.length || op + len > outLen)
          throw new IllegalStateException("corrupt lzf stream: literal run overruns")
        System.arraycopy(in, ip, out, op, len)
        ip += len; op += len
      } else {
        var len = ctrl >> 5
        if (len == 7) {
          if (ip >= in.length)
            throw new IllegalStateException("corrupt lzf stream: truncated length")
          len += in(ip) & 0xFF; ip += 1
        }
        len += 2
        if (ip >= in.length)
          throw new IllegalStateException("corrupt lzf stream: truncated offset")
        val dist = (((ctrl & 0x1F) << 8) | (in(ip) & 0xFF)) + 1
        ip += 1
        var ref = op - dist
        if (ref < 0 || op + len > outLen)
          throw new IllegalStateException("corrupt lzf stream: bad back-reference")
        var i = 0
        while (i < len) { out(op) = out(ref); op += 1; ref += 1; i += 1 }
      }
    }
    if (op != outLen)
      throw new IllegalStateException(s"lzf stream decoded $op bytes, expected $outLen")
    out
  }

  /** Greedy single-pass compressor (3-byte hash table, most-recent match
    * only — the classic LZF speed/ratio point). Returns None when the
    * encoded form would not be smaller, mirroring the HDF5 filter
    * convention of storing such chunks raw with the mask bit set. */
  def compress(in: Array[Byte]): Option[Array[Byte]] = {
    val n = in.length
    if (n < 4) return None
    val out = new java.io.ByteArrayOutputStream(n)
    val htab = new Array[Int](1 << 14)
    java.util.Arrays.fill(htab, -1)
    @inline def hash(p: Int): Int = {
      val h = ((in(p) & 0xFF) << 16) | ((in(p + 1) & 0xFF) << 8) | (in(p + 2) & 0xFF)
      ((h * 2654435761L) >>> 18).toInt & (htab.length - 1)
    }
    var ip = 0
    var litStart = 0
    @inline def flushLiterals(until: Int): Unit = {
      var s = litStart
      while (s < until) {
        val run = math.min(MaxLiteral, until - s)
        out.write(run - 1)
        out.write(in, s, run)
        s += run
      }
      litStart = until
    }
    while (ip + 2 < n) {
      val h = hash(ip)
      val ref = htab(h)
      htab(h) = ip
      if (ref >= 0 && ip - ref <= MaxDistance &&
          in(ref) == in(ip) && in(ref + 1) == in(ip + 1) && in(ref + 2) == in(ip + 2)) {
        var len = 3
        val maxLen = math.min(MaxMatch, n - ip)
        while (len < maxLen && in(ref + len) == in(ip + len)) len += 1
        flushLiterals(ip)
        val dist = ip - ref - 1
        val enc = len - 2
        if (enc < 7) {
          out.write((enc << 5) | (dist >> 8))
          out.write(dist & 0xFF)
        } else {
          out.write((7 << 5) | (dist >> 8))
          out.write(enc - 7)
          out.write(dist & 0xFF)
        }
        // seed the table across the matched span so later matches can
        // reference into it (cheap; keeps ratio on periodic data)
        val stop = math.min(ip + len, n - 3)
        var p = ip + 1
        while (p < stop) { htab(hash(p)) = p; p += 1 }
        ip += len
        litStart = ip
      } else {
        ip += 1
      }
    }
    flushLiterals(n)
    val bytes = out.toByteArray
    if (bytes.length < n) Some(bytes) else None
  }
}
