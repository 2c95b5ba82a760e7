package graft.hdf5

import graft.core._
import graft.core.Attrs.Attrs
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal HDF5 writer producing the SAME on-disk structures libnetcdf
  * emits for netCDF-4 classic-model files — superblock v0, v1 object
  * headers, a symbol-table root group (B-tree v1 + local heap + SNOD),
  * dimension-scale datasets, DIMENSION_LIST vlen-of-object-reference
  * attributes through a global heap, contiguous coordinates and chunked
  * data variables indexed by a v1 B-tree, with optional deflate.
  *
  * Exists so the HDF5 reader and kerchunk scanner are exercised against
  * the real netCDF-4 layout machinery offline (no HDF5 library in this
  * build); written from the public HDF5 File Format Specification.
  */
object HDF5Writer {
  import HDF5.{Signature, Undefined}

  private def pad8(n: Int): Int = (n + 7) & ~7

  // ------------------------------------------------- extensible array

  /** Extensible Array creation parameters (File Format Spec, "Disk
    * Format: Level 1H" + v4 Data Layout message). Defaults are the
    * libhdf5 chunk-index values; specs pass small ones so a few dozen
    * chunks exercise index-block elements, index-block data blocks,
    * secondary ("super") blocks and paged data blocks. */
  final case class EaParams(maxBits: Int = 32, idxBlkElmts: Int = 4,
                            minPtrs: Int = 4, minElmts: Int = 16,
                            pageBits: Int = 10)

  /** One super block's geometry: super block u holds `ndblks` = 2^(u/2)
    * data blocks of `dblkElmts` = 2^((u+1)/2)·minElmts elements;
    * `startIdx`/`startDblk` are its first element (counting from the
    * start of the post-index-block element space) and first data block
    * ordinal. The index block stores the first `idxBlkElmts` elements
    * inline, the data-block addresses of the first 2·log2(minPtrs)
    * super blocks (= 2·(minPtrs−1) addresses), and secondary-block
    * pointers for the remaining nsblks − 2·log2(minPtrs), where
    * nsblks = 1 + maxBits − log2(minElmts) (the smallest count whose
    * total capacity reaches 2^maxBits elements). */
  final case class EaSblk(u: Int, ndblks: Int, dblkElmts: Int,
                          startIdx: Long, startDblk: Long)

  private[hdf5] def eaLog2(v: Int, what: String): Int = {
    require(v >= 1 && (v & (v - 1)) == 0,
      s"extensible array: $what must be a power of two, got $v")
    java.lang.Integer.numberOfTrailingZeros(v)
  }

  private[hdf5] def eaSblkInfos(p: EaParams): Vector[EaSblk] = {
    require(p.maxBits >= 1 && p.maxBits <= 64,
      s"extensible array: max bits ${p.maxBits}")
    require(p.idxBlkElmts >= 0 && p.idxBlkElmts <= 255,
      s"extensible array: index block elements ${p.idxBlkElmts}")
    val nsblks = 1 + p.maxBits - eaLog2(p.minElmts, "data block min elements")
    require(nsblks >= 1 && nsblks <= 128,
      s"extensible array: $nsblks super blocks out of range")
    var startIdx = 0L; var startDblk = 0L
    (0 until nsblks).toVector.map { u =>
      require(u / 2 < 31 && (u + 1) / 2 < 31,
        s"extensible array: super block $u too deep")
      val nd = 1 << (u / 2)
      val ne = (1 << ((u + 1) / 2)) * p.minElmts
      val s = EaSblk(u, nd, ne, startIdx, startDblk)
      startIdx += nd.toLong * ne
      startDblk += nd
      s
    }
  }

  /** Number of super blocks whose data-block addresses live directly in
    * the index block. */
  private[hdf5] def eaIblockNsblks(p: EaParams): Int =
    2 * eaLog2(p.minPtrs, "secondary block min data pointers")

  /** The set of on-disk blocks an EA of `nelems` elements allocates:
    * index-block length, every data block (u, j, firstIdx, paged, len)
    * and every secondary block (u, len). Shared by the writer's alloc
    * and emit passes. */
  private final case class EaBlockPlan(
    ibLen: Long,
    dblks: Vector[(Int, Int, Long, Boolean, Long)],
    sblkLens: Vector[(Int, Long)])

  private def eaBlockPlan(p: EaParams, entrySize: Int,
                          nelems: Int): EaBlockPlan = {
    val sblks = eaSblkInfos(p)
    val iblkN = eaIblockNsblks(p)
    require(iblkN <= sblks.length,
      s"extensible array: min pointers ${p.minPtrs} too large for " +
        s"max bits ${p.maxBits}")
    val ndblkAddrs = 2 * (p.minPtrs - 1)
    val nsblkAddrs = sblks.length - iblkN
    val obBytes = (p.maxBits + 7) / 8
    val pageElems = 1L << p.pageBits
    require(p.idxBlkElmts +
        sblks.map(s => s.ndblks.toLong * s.dblkElmts).sum >= nelems,
      s"extensible array: capacity below $nelems chunks")
    val ibLen = 14L + p.idxBlkElmts.toLong * entrySize +
      (ndblkAddrs + nsblkAddrs) * 8L + 4
    val dblks = for {
      s <- sblks
      j <- (0 until s.ndblks).toVector
      firstIdx = p.idxBlkElmts + s.startIdx + j.toLong * s.dblkElmts
      if firstIdx < nelems
    } yield {
      val paged = s.dblkElmts > pageElems
      val len =
        if (!paged) 14L + obBytes + s.dblkElmts.toLong * entrySize + 4
        else 14L + obBytes + 4 +
          (s.dblkElmts / pageElems) * (pageElems * entrySize + 4)
      (s.u, j, firstIdx, paged, len)
    }
    val sblkLens = sblks.drop(iblkN)
      .filter(s => p.idxBlkElmts + s.startIdx < nelems).map { s =>
        val paged = s.dblkElmts > pageElems
        val npagesPer = if (paged) (s.dblkElmts / pageElems).toInt else 0
        val bm = if (paged) (s.ndblks * npagesPer + 7) / 8 else 0
        (s.u, 14L + obBytes + bm + s.ndblks * 8L + 4)
      }
    EaBlockPlan(ibLen, dblks, sblkLens)
  }

  // ---------------------------------------------------------- type bytes

  private def dtypeBytes(d: DType): Array[Byte] = d match {
    case DType.I1 => fixedBytes(1)
    case DType.U1 => fixedBytes(1, signed = false)
    case DType.I2 => fixedBytes(2)
    case DType.U2 => fixedBytes(2, signed = false)
    case DType.I4 => fixedBytes(4)
    case DType.U4 => fixedBytes(4, signed = false)
    case DType.I8 | DType.M8ns => fixedBytes(8)
    case DType.U8 => fixedBytes(8, signed = false)
    case DType.F4 => floatBytes(4)
    case DType.F8 => floatBytes(8)
  }

  private def fixedBytes(size: Int, signed: Boolean = true,
                         precision: Int = 0): Array[Byte] = {
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x10.toByte) // class 0 v1
    b.put((if (signed) 0x08 else 0x00).toByte) // LE, sign bit-field
    b.put(0.toByte); b.put(0.toByte)
    b.putInt(size)
    // bit offset, precision (an nbit dataset carries its REDUCED
    // precision here — libhdf5 derives the filter's cd_values from it)
    b.putShort(0)
    b.putShort((if (precision > 0) precision else size * 8).toShort)
    b.array()
  }

  private def floatBytes(size: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x11.toByte) // class 1 v1
    b.put(0x20.toByte) // LE, IEEE normalization (msb implied)
    b.put(if (size == 4) 31.toByte else 63.toByte) // sign location
    b.put(0.toByte)
    b.putInt(size)
    b.putShort(0); b.putShort((size * 8).toShort)
    if (size == 4) { b.put(23.toByte); b.put(8.toByte); b.put(0.toByte); b.put(23.toByte); b.putInt(127) }
    else { b.put(52.toByte); b.put(11.toByte); b.put(0.toByte); b.put(52.toByte); b.putInt(1023) }
    b.array()
  }

  /** Enum datatype message (class 8 v1) over an integer base: base
    * message, then null-terminated names padded to 8, then base-sized
    * little-endian values (r14). */
  private def enumTypeBytes(base: DType,
                            members: Vector[(String, Long)]): Array[Byte] = {
    val baseBytes = dtypeBytes(base)
    val sz = base.byteSize
    val n = members.length
    val namesLen = members.map(m => pad8(m._1.length + 1)).sum
    val b = ByteBuffer.allocate(8 + baseBytes.length + namesLen + n * sz)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x18.toByte) // class 8 v1
    b.put((n & 0xFF).toByte); b.put(((n >> 8) & 0xFF).toByte); b.put(0.toByte)
    b.putInt(sz)
    b.put(baseBytes)
    members.foreach { case (name, _) =>
      val nb = name.getBytes("UTF-8")
      b.put(nb); b.put(0.toByte)
      (nb.length + 1 until pad8(nb.length + 1)).foreach(_ => b.put(0.toByte))
    }
    members.foreach { case (_, v) =>
      sz match {
        case 1 => b.put(v.toByte)
        case 2 => b.putShort(v.toShort)
        case 4 => b.putInt(v.toInt)
        case 8 => b.putLong(v)
      }
    }
    b.array()
  }

  /** Compound datatype message (class 6 v1): members packed at
    * cumulative offsets, v1's padded names + zeroed old-style array
    * fields (r14). */
  /** A compound member tree: leaves are scalar dtypes, nests are
    * class-6 sub-messages — ANY depth (r15c; the ICESat-2 family
    * carries struct-of-struct-of-struct records). */
  private sealed trait CMember
  private final case class CLeaf(dtype: DType) extends CMember
  private final case class CNest(members: Vector[(String, CMember)])
    extends CMember
  private def cmSize(m: CMember): Int = m match {
    case CLeaf(d) => d.byteSize
    case CNest(ms) => ms.map(x => cmSize(x._2)).sum
  }

  private def compoundTypeBytes(members: Vector[(String, DType)]): Array[Byte] =
    compoundTypeBytesNested(members.map { case (n, d) => n -> CLeaf(d) })

  /** Compound datatype message (class 6 v1); a CNest member's body is
    * itself a class-6 message, recursively. */
  private def compoundTypeBytesNested(
      members: Vector[(String, CMember)]): Array[Byte] = {
    def sizeOf(m: CMember): Int = cmSize(m)
    val totalSize = members.map(m => sizeOf(m._2)).sum
    val bodies: Vector[Array[Byte]] = members.map {
      case (_, CLeaf(d)) => dtypeBytes(d)
      case (_, CNest(ms)) => compoundTypeBytesNested(ms)
    }
    val len = 8 + members.indices.map { i =>
      pad8(members(i)._1.length + 1) + 4 + 28 + bodies(i).length }.sum
    val b = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x16.toByte) // class 6 v1
    b.put((members.length & 0xFF).toByte)
    b.put(((members.length >> 8) & 0xFF).toByte); b.put(0.toByte)
    b.putInt(totalSize)
    var off = 0
    members.indices.foreach { i =>
      val nb = members(i)._1.getBytes("UTF-8")
      b.put(nb); b.put(0.toByte)
      (nb.length + 1 until pad8(nb.length + 1)).foreach(_ => b.put(0.toByte))
      b.putInt(off)
      // v1 old-style member array fields: dimensionality 0 + reserved +
      // permutation + reserved + 4 dim sizes, all zero
      (0 until 28).foreach(_ => b.put(0.toByte))
      b.put(bodies(i))
      off += sizeOf(members(i)._2)
    }
    b.array()
  }

  /** Group a flat (dotted-leaf-name, dtype) list into a nesting TREE:
    * a run of consecutive "pfx.…" names becomes one nested-compound
    * member `pfx`, recursively ("a.b.c" nests two deep). The
    * interleaved DATA layout is unchanged — nesting only restructures
    * the datatype message. */
  private def groupCompoundMembers(
      members: Vector[(String, DType)]): Vector[(String, CMember)] = {
    val out = Vector.newBuilder[(String, CMember)]
    var i = 0
    while (i < members.length) {
      val (nm, d) = members(i)
      val dot = nm.indexOf('.')
      if (dot < 0) { out += nm -> CLeaf(d); i += 1 }
      else {
        val pfx = nm.substring(0, dot)
        val run = members.drop(i).takeWhile(_._1.startsWith(pfx + "."))
        out += pfx -> CNest(groupCompoundMembers(run.map { case (n2, d2) =>
          n2.substring(pfx.length + 1) -> d2 }))
        i += run.length
      }
    }
    out.result()
  }

  /** Array datatype message (class 10 v2) over a scalar base (r14). */
  private def arrayTypeBytes(base: DType, dims: Vector[Int]): Array[Byte] = {
    val baseBytes = dtypeBytes(base)
    val b = ByteBuffer.allocate(8 + 4 + dims.length * 8 + baseBytes.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x2A.toByte) // class 10 v2
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putInt(base.byteSize * dims.product)
    b.put(dims.length.toByte)
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // reserved
    dims.foreach(b.putInt)
    dims.indices.foreach(b.putInt) // v2 permutation indices (unused)
    b.put(baseBytes)
    b.array()
  }

  /** Element-wise byte interleave of equally-shaped member planes —
    * the compound dataset's wire layout. */
  private def interleave(parts: Vector[Array[Byte]],
                         sizes: Vector[Int]): Array[Byte] = {
    val n = parts.head.length / sizes.head
    parts.indices.foreach(i => require(parts(i).length == n * sizes(i),
      "compound members must share a shape"))
    val s = sizes.sum
    val out = new Array[Byte](n * s)
    var i = 0
    while (i < n) {
      var o = i * s
      var j = 0
      while (j < parts.length) {
        System.arraycopy(parts(j), i * sizes(j), out, o, sizes(j))
        o += sizes(j)
        j += 1
      }
      i += 1
    }
    out
  }

  private def stringTypeBytes(size: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x13.toByte) // class 3 v1
    b.put(0.toByte) // null-terminated, ASCII
    b.put(0.toByte); b.put(0.toByte)
    b.putInt(size)
    b.array()
  }

  /** vlen(sequence) of object reference — the DIMENSION_LIST type. */
  private def vlenRefTypeBytes: Array[Byte] = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x19.toByte) // class 9 v1
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // sequence
    b.putInt(16) // element: len(4) + gheap addr(8) + index(4)
    b.put(0x17.toByte) // base: class 7 reference v1
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // object reference
    b.putInt(8)
    b.array()
  }

  private def dataspaceBytes(dims: Vector[Int]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + dims.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(dims.length.toByte); b.put(0.toByte)
    b.position(8)
    dims.foreach(d => b.putLong(d.toLong))
    b.array()
  }

  // ---------------------------------------------------------- attributes

  /** v1 attribute message body. */
  private def attrBytes(name: String, dtype: Array[Byte], dspace: Array[Byte],
                        data: Array[Byte]): Array[Byte] = {
    val nameBytes = name.getBytes("UTF-8") :+ 0.toByte
    val size = 8 + pad8(nameBytes.length) + pad8(dtype.length) +
      pad8(dspace.length) + data.length
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(nameBytes.length.toShort)
    b.putShort(dtype.length.toShort)
    b.putShort(dspace.length.toShort) // v1: dataspace size is 2 bytes
    b.put(nameBytes); b.position(8 + pad8(nameBytes.length))
    b.put(dtype); b.position(8 + pad8(nameBytes.length) + pad8(dtype.length))
    b.put(dspace)
    b.position(8 + pad8(nameBytes.length) + pad8(dtype.length) + pad8(dspace.length))
    b.put(data)
    b.array()
  }

  private def strAttr(name: String, v: String): Array[Byte] = {
    val data = v.getBytes("UTF-8") :+ 0.toByte
    attrBytes(name, stringTypeBytes(data.length), dataspaceBytes(Vector.empty), data)
  }

  private def attrValueBytes(name: String, v: AttrValue): Array[Byte] = v match {
    case AttrValue.AStr(s) => strAttr(name, s)
    case AttrValue.AInt(l) =>
      val d = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); d.putLong(l)
      attrBytes(name, fixedBytes(8), dataspaceBytes(Vector.empty), d.array())
    case AttrValue.ANum(x) =>
      val d = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); d.putDouble(x)
      attrBytes(name, floatBytes(8), dataspaceBytes(Vector.empty), d.array())
    case AttrValue.ABool(x) =>
      val d = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      d.putLong(if (x) 1L else 0L)
      attrBytes(name, fixedBytes(8), dataspaceBytes(Vector.empty), d.array())
    case AttrValue.AList(xs) if xs.forall(_.isInstanceOf[AttrValue.AInt]) =>
      val d = ByteBuffer.allocate(8 * xs.length).order(ByteOrder.LITTLE_ENDIAN)
      xs.foreach { case AttrValue.AInt(l) => d.putLong(l); case _ => }
      attrBytes(name, fixedBytes(8), dataspaceBytes(Vector(xs.length)), d.array())
    case AttrValue.AList(xs) =>
      val d = ByteBuffer.allocate(8 * xs.length).order(ByteOrder.LITTLE_ENDIAN)
      xs.foreach {
        case AttrValue.ANum(x) => d.putDouble(x)
        case AttrValue.AInt(l) => d.putDouble(l.toDouble)
        case other => throw new IllegalArgumentException(s"attr list $other")
      }
      attrBytes(name, floatBytes(8), dataspaceBytes(Vector(xs.length)), d.array())
    case AttrValue.ANull =>
      throw new IllegalArgumentException(s"null attr $name")
  }

  /** Minimal bytes to encode `v` (H5VM_limit_enc_size). */
  private def lenBytesFor(v: Long): Int = {
    var n = 1; var x = v >>> 8
    while (x != 0) { n += 1; x >>>= 8 }
    n
  }

  /** Extended-tiny heap-id width used by `denseTinyLinkIds`: > 18 bytes
    * switches the tiny encoding to its 12-bit-length form, giving a
    * 46-byte inline payload — room for any short-named link message. */
  private[hdf5] val TinyLinkIdLen = 48

  /** One planned v2 B-tree node: `recs` are indices into the SORTED
    * record stream; leaves have no children. Built bottom-up by
    * [[planBtree]] with separators pulled up one per sibling boundary at
    * every level (the bulk-load shape libhdf5 produces). */
  private final case class BtNodePlan(name: String, recs: Vector[Int],
                                      children: Vector[BtNodePlan]) {
    def depth: Int = if (children.isEmpty) 0 else children.head.depth + 1
    def totalRecs: Long = recs.length + children.map(_.totalRecs).sum
  }

  /** Plan a v2 B-tree over `n` sorted records at ANY depth. Returns the
    * root plus the spec capacity ladder (maxNrec(d), maxTot(d)) the
    * child-pointer field widths derive from — the same formulas the
    * reader's walkV2Btree applies, so geometry round-trips by
    * construction. */
  private def planBtree(n: Int, nodeSize: Int, recSize: Int)
      : (BtNodePlan, Vector[Long], Vector[Long]) = {
    val leafCap = (nodeSize - 10) / recSize
    require(leafCap >= 1, s"v2 btree node size $nodeSize too small for " +
      s"record size $recSize")
    val maxNrec = scala.collection.mutable.ArrayBuffer[Long](leafCap.toLong)
    val maxTot = scala.collection.mutable.ArrayBuffer[Long](leafCap.toLong)
    if (n <= leafCap) {
      // the BTHD "records in root node" field is u16
      require(n <= 65535,
        s"v2 btree single-leaf root cannot hold $n records (u16 cap); " +
          "use a smaller node size so the plan goes multi-level")
      return (BtNodePlan("btlf:0", (0 until n).toVector, Vector.empty),
        maxNrec.toVector, maxTot.toVector)
    }
    val chunks = (0 until n).toVector.grouped(leafCap).toVector
    var nodes: Vector[BtNodePlan] = chunks.zipWithIndex.map { case (c, i) =>
      BtNodePlan(s"btlf:$i", if (i == 0) c else c.tail, Vector.empty) }
    var seps: Vector[Int] = chunks.tail.map(_.head)
    var depth = 0
    while (nodes.length > 1) {
      depth += 1
      val ptr = 8 + lenBytesFor(maxNrec(depth - 1)) +
        (if (depth >= 2) lenBytesFor(maxTot(depth - 1)) else 0)
      val cap = (nodeSize - 10 - ptr) / (recSize + ptr)
      require(cap >= 1,
        s"v2 btree internal capacity 0 at depth $depth (node $nodeSize)")
      maxNrec += cap.toLong
      maxTot += cap + (cap + 1L) * maxTot(depth - 1)
      val m = nodes.length
      val gcount = (m + cap) / (cap + 1)
      val base = m / gcount; val extra = m % gcount
      val sizes = Vector.tabulate(gcount)(g => base + (if (g < extra) 1 else 0))
      require(sizes.forall(_ >= 2),
        s"v2 btree geometry yields a 1-child internal node " +
          s"($m children over $gcount nodes at depth $depth) — " +
          "pick a larger node size")
      var cursor = 0
      val newSeps = scala.collection.mutable.ArrayBuffer.empty[Int]
      val parents = sizes.zipWithIndex.map { case (sz, gi) =>
        if (gi > 0) newSeps += seps(cursor - 1)
        val kids = nodes.slice(cursor, cursor + sz)
        val recsHere = (cursor until cursor + sz - 1).map(seps).toVector
        cursor += sz
        BtNodePlan(s"btin:$depth:$gi", recsHere, kids)
      }
      nodes = parents
      seps = newSeps.toVector
    }
    (nodes.head, maxNrec.toVector, maxTot.toVector)
  }

  /** Byte size of one planned node (header + records + child pointers +
    * checksum), for the allocation pass. */
  private def btNodeBytes(node: BtNodePlan, recSize: Int,
                          maxNrec: Vector[Long], maxTot: Vector[Long]): Long =
    if (node.children.isEmpty) (6 + node.recs.length * recSize + 4).toLong
    else {
      val d = node.depth
      val ptr = 8 + lenBytesFor(maxNrec(d - 1)) +
        (if (d >= 2) lenBytesFor(maxTot(d - 1)) else 0)
      (6 + node.recs.length * recSize +
        node.children.length * ptr + 4).toLong
    }

  // ------------------------------------------------- Jenkins lookup3
  /** Jenkins lookup3 hashlittle (Bob Jenkins, public domain, May 2006) —
    * HDF5's H5_checksum_lookup3: the v2-btree/fractal-heap metadata
    * checksum AND the dense link-name index hash. */
  private[hdf5] def lookup3(data: Array[Byte], initval: Int = 0): Int = {
    var a = 0xdeadbeef + data.length + initval
    var b = a
    var c = a
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    var i = 0
    def u(j: Int): Int = data(j) & 0xff
    var len = data.length
    while (len > 12) {
      a += u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
      b += u(i + 4) | (u(i + 5) << 8) | (u(i + 6) << 16) | (u(i + 7) << 24)
      c += u(i + 8) | (u(i + 9) << 8) | (u(i + 10) << 16) | (u(i + 11) << 24)
      // mix
      a -= c; a ^= rot(c, 4);  c += b
      b -= a; b ^= rot(a, 6);  a += c
      c -= b; c ^= rot(b, 8);  b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4);  b += a
      i += 12; len -= 12
    }
    // final 1..12 bytes (fallthrough switch of the reference C)
    if (len > 0) {
      if (len >= 12) c += u(i + 11) << 24
      if (len >= 11) c += u(i + 10) << 16
      if (len >= 10) c += u(i + 9) << 8
      if (len >= 9)  c += u(i + 8)
      if (len >= 8)  b += u(i + 7) << 24
      if (len >= 7)  b += u(i + 6) << 16
      if (len >= 6)  b += u(i + 5) << 8
      if (len >= 5)  b += u(i + 4)
      if (len >= 4)  a += u(i + 3) << 24
      if (len >= 3)  a += u(i + 2) << 16
      if (len >= 2)  a += u(i + 1) << 8
      if (len >= 1)  a += u(i)
      // final mix
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c
  }

  // ------------------------------------------------------------ messages

  /** One v1 header message: (type, body). */
  private type Msg = (Int, Array[Byte])

  private def headerBytes(msgs: Vector[Msg]): Array[Byte] = {
    val msgBlock = msgs.map { case (_, body) => 8 + pad8(body.length) }.sum
    val b = ByteBuffer.allocate(16 + msgBlock).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(msgs.length.toShort)
    b.putInt(1) // reference count
    b.putInt(msgBlock)
    b.position(16)
    msgs.foreach { case (t, body) =>
      b.putShort(t.toShort)
      b.putShort(pad8(body.length).toShort)
      b.put(0.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
      val at = b.position()
      b.put(body)
      b.position(at + pad8(body.length))
    }
    b.array()
  }

  // --------------------------------------------------------------- write

  private def encodeData(arr: NDArray): Array[Byte] = {
    val b = ByteBuffer.allocate(arr.size * arr.dtype.byteSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    arr.data match {
      case a: Array[Int] => b.asIntBuffer().put(a)
      case a: Array[Long] => b.asLongBuffer().put(a)
      case a: Array[Float] => b.asFloatBuffer().put(a)
      case a: Array[Double] => b.asDoubleBuffer().put(a)
      case a: Array[Short] => b.asShortBuffer().put(a)
      case a: Array[Byte] => b.put(a)
    }
    b.array()
  }

  private def deflate(bytes: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level)
    d.setInput(bytes); d.finish()
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val buf = new Array[Byte](65536)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  /** The registered lz4 filter's n-block layout: BE 8-byte original size,
    * BE 4-byte block size, then per block a BE 4-byte compressed size and
    * an lz4 BLOCK payload (raw when compression would not shrink it).
    * None when the whole filter output is not smaller than the input —
    * the chunk is then stored raw with its mask bit set. */
  private def lz4Encode(bytes: Array[Byte]): Option[Array[Byte]] = {
    val blockSize = math.min(bytes.length, 1 << 30)
    val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val head = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
    head.putLong(bytes.length.toLong); head.putInt(blockSize)
    bos.write(head.array())
    var off = 0
    val be4 = new Array[Byte](4)
    while (off < bytes.length) {
      val n = math.min(blockSize, bytes.length - off)
      val c = comp.compress(bytes, off, n)
      val csize = if (c.length < n) c.length else n
      be4(0) = (csize >> 24).toByte; be4(1) = (csize >> 16).toByte
      be4(2) = (csize >> 8).toByte; be4(3) = csize.toByte
      bos.write(be4)
      if (c.length < n) bos.write(c) else bos.write(bytes, off, n)
      off += n
    }
    val enc = bos.toByteArray
    if (enc.length < bytes.length) Some(enc) else None
  }

  private def shuffleBytes(bytes: Array[Byte], es: Int): Array[Byte] = {
    val n = bytes.length / es
    val out = new Array[Byte](bytes.length)
    var i = 0
    while (i < n) {
      var b = 0
      while (b < es) { out(b * n + i) = bytes(i * es + b); b += 1 }
      i += 1
    }
    System.arraycopy(bytes, n * es, out, n * es, bytes.length - n * es)
    out
  }

  /** Write `f` as a netCDF-4-style HDF5 file. `chunks` selects chunked
    * layout per data variable (chunk shape in elements); unlisted
    * variables are contiguous. `deflateLevel` gzips every chunked
    * variable's chunks; `shuffle` byte-transposes them first (the
    * libnetcdf shuffle+deflate default for compressed variables). */
  def write(path: String, f: Fragment,
            chunks: Map[String, Vector[Int]] = Map.empty,
            deflateLevel: Option[Int] = None,
            shuffle: Boolean = false,
            lzf: Boolean = false,
            zstdLevel: Option[Int] = None,
            blosc: Option[graft.zarr.Blosc.Params] = None,
            lz4: Boolean = false,
            szip: Option[Int] = None,
            scaleOffset: Boolean = false,
            // float D-scale scale-offset (r14): decimal digits kept
            scaleOffsetFloatD: Option[Int] = None,
            nbitPrecision: Option[Int] = None,
            denseRootLinks: Boolean = false,
            denseStartBlockSize: Long = 0L,
            denseBtNodeSize: Int = 0,
            denseTinyLinkIds: Boolean = false,
            denseMaxDirectBlockSize: Long = 0L,
            denseFilteredHeap: Boolean = false,
            denseAttrObjects: Set[String] = Set.empty,
            // r14 exotic-datatype fixtures: vars whose datatype message
            // becomes an ENUM over their integer dtype; vars whose k
            // TRAILING dims move into an ARRAY datatype; COMPOUND
            // datasets assembled by interleaving named member vars
            // (the members stop being standalone datasets)
            enumVars: Map[String, Vector[(String, Long)]] = Map.empty,
            arrayVarDims: Map[String, Int] = Map.empty,
            compoundVars: Map[String, Vector[String]] = Map.empty,
            // r15: compound datasets emitted with NO data (layout address
            // undefined — the never-written/late-allocation shape) and
            // an optional record-sized fill-value message
            compoundUnwritten: Set[String] = Set.empty,
            compoundFill: Map[String, Array[Byte]] = Map.empty,
            // r14: emit the libhdf5-1.10+ v4 layout message for these
            // chunked vars — index type 1 (single chunk), 2 (implicit)
            // or 3 (fixed array); faPageBits sizes the fixed-array data
            // block pages (small values force the PAGED layout)
            chunkIndexV4: Map[String, Int] = Map.empty,
            faPageBits: Int = 10,
            // index type 4 (extensible array) creation parameters;
            // defaults mirror libhdf5's chunk-index values, specs pass
            // small ones to reach secondary blocks and paged data
            // blocks with a handful of chunks
            eaParams: EaParams = EaParams()): Unit = {
    require(!(denseFilteredHeap && (denseTinyLinkIds ||
      denseMaxDirectBlockSize > 0)),
      "denseFilteredHeap composes with the FLAT heap plan only")
    require(Seq(deflateLevel.isDefined, lzf, zstdLevel.isDefined,
      blosc.isDefined, lz4, szip.isDefined).count(identity) <= 1,
      "deflate, lzf, zstd, blosc, lz4, and szip are alternative block " +
        "codecs; pick one")
    require(Seq(scaleOffset, scaleOffsetFloatD.isDefined,
      nbitPrecision.isDefined).count(identity) <= 1,
      "scale-offset (int), scale-offset (float D-scale) and nbit are " +
        "alternative element-packing filters")
    val anyCodec = deflateLevel.isDefined || shuffle || lzf ||
      zstdLevel.isDefined || blosc.isDefined || lz4 || szip.isDefined ||
      scaleOffset || scaleOffsetFloatD.isDefined || nbitPrecision.isDefined
    chunkIndexV4.foreach { case (name, t) =>
      require(t == 1 || t == 2 || t == 3 || t == 4 || t == 5,
        s"chunkIndexV4: $name index type $t (1/2/3/4/5)")
      require(chunks.contains(name), s"chunkIndexV4: $name must be chunked")
      require(t != 2 || !anyCodec,
        s"chunkIndexV4: implicit index for $name cannot carry filters " +
          "(the libhdf5 rule)")
    }
    // the element-packing filters apply to integer data (the libhdf5
    // integer paths); they run FIRST in the pipeline, like netCDF-4's
    // scaleoffset-then-deflate combination
    def intParams(d: DType): (Int, Boolean) = d match {
      case DType.I1 => (1, true);  case DType.U1 => (1, false)
      case DType.I2 => (2, true);  case DType.U2 => (2, false)
      case DType.I4 => (4, true);  case DType.U4 => (4, false)
      case DType.I8 => (8, true);  case DType.U8 => (8, false)
      case other => throw new IllegalArgumentException(
        s"scale-offset/nbit fixtures support integer data, not ${other.name}")
    }
    // szip scanline geometry per chunked variable, the H5Z__set_local_szip
    // rule: the scanline is the chunk's fastest-varying dimension (widened
    // to min(ppb·128, npoints) when it is narrower than a block, capped at
    // 128 blocks) — it need NOT divide the chunk; the codec pads partial
    // scanlines/blocks per the libaec RSI rule
    def szipGeom(cs: Vector[Int], byteSize: Int, ppb: Int): (Int, Int) = {
      require(byteSize <= 4, s"szip supports <= 32-bit samples, not $byteSize bytes")
      val npoints = cs.product
      require(npoints >= ppb,
        s"szip: $ppb pixels per block exceeds the $npoints-sample chunk")
      val scanline = cs.last
      val pps =
        if (scanline < ppb) math.min(ppb * 128, npoints)
        else math.min(ppb * 128, scanline)
      (byteSize * 8, pps)
    }
    // this writer emits little-endian datatypes, so H5Z__set_local_szip
    // would pick the LSB sample byte order
    val SzipMask = Szip.MaskNN | Szip.MaskEC | Szip.MaskLSB | Szip.MaskRaw
    // dims in deterministic order; phantom scales for coordinate-less dims
    val dimNames = f.dims.keys.toVector.sorted
    // compound members live INSIDE their dataset, not as standalone objects
    val memberVars: Set[String] = compoundVars.values.flatten.toSet
    val varNames = (f.coords.keySet ++ f.dataVars.keySet).toVector.sorted
      .filterNot(memberVars.contains)
    val phantomDims = dimNames.filterNot(f.coords.contains)
    compoundVars.foreach { case (name, members) =>
      require(members.nonEmpty && members.forall(m =>
        f.coords.contains(m) || f.dataVars.contains(m)),
        s"compoundVars: $name members must be fragment variables")
      require(!chunks.contains(name) && members.forall(!chunks.contains(_)),
        s"compoundVars: $name must be contiguous")
    }
    compoundUnwritten.foreach(n => require(compoundVars.contains(n),
      s"compoundUnwritten: $n is not a compound var"))
    compoundFill.foreach { case (name, fb) =>
      require(compoundVars.contains(name),
        s"compoundFill: $name is not a compound var")
      val recSize = compoundVars(name)
        .map(m => f.coords.getOrElse(m, f.dataVars(m)).dtype.byteSize).sum
      require(fb.length == recSize,
        s"compoundFill: $name fill is ${fb.length} B, record is $recSize B")
    }
    arrayVarDims.foreach { case (name, k) =>
      val v = f.coords.getOrElse(name, f.dataVars(name))
      require(k >= 1 && k < v.shape.length,
        s"arrayVarDims: $name wants $k trailing dims of rank ${v.shape.length}")
      require(!chunks.contains(name), s"arrayVarDims: $name must be contiguous")
    }
    // file objects: every dim has a scale dataset; data vars follow
    val objNames: Vector[String] =
      (dimNames ++ varNames.filterNot(dimNames.contains) ++
        compoundVars.keys).distinct.sorted

    // ---- plan block addresses ----
    var cursor = 0L
    val addrs = scala.collection.mutable.Map.empty[String, Long]
    def alloc(key: String, size: Long): Long = {
      val a = cursor; addrs(key) = a; cursor += ((size + 7) & ~7L); a
    }

    // per-variable raw data (encoded, possibly chunk-split + deflated)
    final case class ChunkPlan(offsets: Vector[Int], bytes: Array[Byte],
                               mask: Int = 0)
    val compoundData: Map[String, Either[Array[Byte], Vector[ChunkPlan]]] =
      compoundVars.map { case (name, members) =>
        val vs = members.map(m => f.coords.getOrElse(m, f.dataVars(m)))
        require(vs.map(_.shape).distinct.length == 1,
          s"compoundVars: $name members must share one shape")
        name -> Left(
          if (compoundUnwritten.contains(name)) Array.emptyByteArray
          else interleave(vs.map(v => encodeData(v.data)),
            vs.map(_.dtype.byteSize)))
      }
    val varData: Map[String, Either[Array[Byte], Vector[ChunkPlan]]] =
      compoundData ++
      ((f.coords ++ f.dataVars) -- memberVars).map { case (name, v) =>
        chunks.get(name) match {
          case None => name -> Left(encodeData(v.data))
          case Some(cs) =>
            require(cs.length == v.shape.length, s"chunk rank for $name")
            val grids = v.shape.indices.map(d =>
              (0 until v.shape(d) by cs(d)).toVector).toVector
            val cells = grids.foldLeft(Vector(Vector.empty[Int])) {
              (acc, g) => acc.flatMap(p => g.map(p :+ _)) }
            val plans = cells.map { lo =>
              // chunks are stored FULL-SIZE; edge chunks padded (HDF5 rule)
              val full = NDArray.zeros(v.dtype, cs.toVector)
              val valid = lo.indices.map(d => Slc(lo(d),
                math.min(lo(d) + cs(d), v.shape(d)))).toVector
              full.assign(Vector.fill(cs.length)(0), v.data.slice(valid))
              // pipeline order on encode: scale-offset|nbit, then
              // shuffle, then deflate|lzf|zstd
              var enc = encodeData(full)
              if (scaleOffset) {
                val (sz, signed) = intParams(v.dtype)
                enc = ScaleOffset.compress(enc, sz, signed, le = true, None)
              }
              scaleOffsetFloatD.foreach { d =>
                require(v.dtype == DType.F4 || v.dtype == DType.F8,
                  s"scaleOffsetFloatD applies to float data, not ${v.dtype.name}")
                enc = ScaleOffset.compressFloatD(enc, v.dtype.byteSize,
                  le = true, d, None)
              }
              nbitPrecision.foreach { p =>
                val (sz, signed) = intParams(v.dtype)
                enc = Nbit.compress(enc, sz, le = true, p, 0, signed)
              }
              if (shuffle) enc = shuffleBytes(enc, v.dtype.byteSize)
              deflateLevel.foreach(lvl => enc = deflate(enc, lvl))
              var mask = 0
              // incompressible chunks are stored raw with the mask bit of
              // the codec's pipeline position (after any packing filter
              // and shuffle) set
              val codecBit = 1 << ((if (scaleOffset ||
                scaleOffsetFloatD.isDefined ||
                nbitPrecision.isDefined) 1 else 0) + (if (shuffle) 1 else 0))
              if (lzf) Lzf.compress(enc) match {
                case Some(c) => enc = c
                case None => mask = codecBit
              }
              zstdLevel.foreach { lvl =>
                val c = com.github.luben.zstd.Zstd.compress(enc, lvl)
                if (c.length < enc.length) enc = c else mask = codecBit
              }
              // blosc frames are self-contained (memcpy mode inside the
              // frame covers incompressible chunks) — no mask needed,
              // matching the hdf5plugin filter exactly
              blosc.foreach(p => enc =
                graft.zarr.Blosc.compress(enc, v.dtype.byteSize, p))
              if (lz4) lz4Encode(enc) match {
                case Some(c) => enc = c
                case None => mask = codecBit
              }
              szip.foreach { ppb =>
                val (bits, pps) = szipGeom(cs.toVector, v.dtype.byteSize, ppb)
                val ccsds = Szip.compress(enc, SzipMask, bits, ppb, pps)
                // H5Z__filter_szip framing: 4-byte LE uncompressed size
                val framed = new Array[Byte](ccsds.length + 4)
                framed(0) = (enc.length & 0xFF).toByte
                framed(1) = ((enc.length >>> 8) & 0xFF).toByte
                framed(2) = ((enc.length >>> 16) & 0xFF).toByte
                framed(3) = ((enc.length >>> 24) & 0xFF).toByte
                System.arraycopy(ccsds, 0, framed, 4, ccsds.length)
                enc = framed
              }
              ChunkPlan(lo, enc, mask)
            }
            name -> Right(plans)
        }
      }

    // ---- build messages per object (addresses patched later) ----
    def varOf(name: String): Option[Variable] =
      f.coords.get(name).orElse(f.dataVars.get(name))

    def messagesFor(name: String): Vector[Msg] = {
      compoundVars.get(name).foreach { members =>
        // compound dataset: member-interleaved contiguous data, no
        // dimension scales, no user attrs (fixture surface); dotted
        // member names group into ONE level of nesting, and an optional
        // v3 fill-value message covers the never-written shape
        val vs = members.map(m => f.coords.getOrElse(m, f.dataVars(m)))
        return Vector[Msg](
          0x0001 -> dataspaceBytes(vs.head.shape),
          0x0003 -> compoundTypeBytesNested(groupCompoundMembers(
            members.zip(vs).map { case (m, mv) => (m, mv.dtype) })),
          0x0008 -> new Array[Byte](18)) ++
          compoundFill.get(name).map { fb =>
            val fm = ByteBuffer.allocate(6 + fb.length)
              .order(ByteOrder.LITTLE_ENDIAN)
            fm.put(3.toByte)    // fill-value message v3
            fm.put(0x20.toByte) // flags: fill value defined
            fm.putInt(fb.length)
            fm.put(fb)
            (0x0005, fm.array()): Msg
          }.toVector
      }
      val isDim = dimNames.contains(name)
      val isPhantom = phantomDims.contains(name)
      val v = varOf(name)
      val shape: Vector[Int] =
        if (isPhantom) Vector(f.dims(name)) else v.get.shape
      val dtype: DType = if (isPhantom) DType.F4 else v.get.dtype
      // nbit-filtered chunked integer vars carry the reduced precision
      // in their datatype message (self-consistent with the filter cd)
      val typeBytes: Array[Byte] = nbitPrecision match {
        case Some(p) if varData.get(name).exists(_.isRight) =>
          val (sz, signed) = intParams(dtype)
          fixedBytes(sz, signed, precision = p)
        case _ => enumVars.get(name) match {
          case Some(members) =>
            require(dtype.byteSize <= 8 && dtype != DType.F4 &&
              dtype != DType.F8, s"enumVars: $name must be integer")
            enumTypeBytes(dtype, members)
          case None => arrayVarDims.get(name) match {
            case Some(k) => arrayTypeBytes(dtype, v.get.shape.takeRight(k))
            case None => dtypeBytes(dtype)
          }
        }
      }
      // an array datatype moves the trailing dims OUT of the dataspace
      val dsShape = arrayVarDims.get(name)
        .map(k => shape.dropRight(k)).getOrElse(shape)
      val base = Vector[Msg](
        0x0001 -> dataspaceBytes(dsShape),
        0x0003 -> typeBytes,
        // layout body is a placeholder here; patched after layout
        0x0008 -> (varData.get(name) match {
          case Some(Right(_)) =>
            val rank = shape.length
            chunkIndexV4.get(name) match {
              case Some(t) =>
                // v4: ver+class+flags+ndims+encLen + (rank+1)*8 dims +
                // idxType + params + address
                val params = t match {
                  case 1 if anyCodec => 12
                  case 3 => 1
                  case 4 => 5
                  case 5 => 6
                  case _ => 0
                }
                new Array[Byte](5 + (rank + 1) * 8 + 1 + params + 8)
              case None => new Array[Byte](11 + (rank + 1) * 4)
            }
          case _ => new Array[Byte](18)
        }))
      val filterMsg: Vector[Msg] =
        if (varData.get(name).exists(_.isRight) &&
            (deflateLevel.isDefined || shuffle || lzf ||
              zstdLevel.isDefined || blosc.isDefined || lz4 ||
              szip.isDefined || scaleOffset || scaleOffsetFloatD.isDefined ||
              nbitPrecision.isDefined)) {
          // pipeline in encode order: shuffle (id 2), then deflate (id 1)
          // or lzf (id 32000) or zstd (id 32015) — registered filters
          // carry a name in v1 entries. Each v1 entry: id, namelen,
          // flags, nvalues, name pad8, values + pad to even count.
          final case class Entry(id: Int, name: String, values: Vector[Int])
          val entries =
            // element-packing filters first (the netCDF-4 pipeline order)
            (if (scaleOffset) {
              val (sz, signed) = intParams(dtype)
              Vector(Entry(6, "", ScaleOffset.cdValues(sz, signed,
                littleEndian = true, chunks(name).product, None)))
            } else Vector.empty) ++
            scaleOffsetFloatD.map { d =>
              Entry(6, "", ScaleOffset.cdValuesFloat(dtype.byteSize,
                littleEndian = true, chunks(name).product, d, None))
            }.toVector ++
            nbitPrecision.map { p =>
              val (sz, _) = intParams(dtype)
              Entry(5, "", Nbit.cdValues(sz, littleEndian = true, p, 0,
                chunks(name).product))
            }.toVector ++
            (if (shuffle) Vector(Entry(2, "", Vector(dtype.byteSize))) else Vector.empty) ++
            deflateLevel.map(lvl => Entry(1, "", Vector(lvl))).toVector ++
            (if (lzf) Vector(Entry(32000, "lzf", Vector.empty)) else Vector.empty) ++
            zstdLevel.map(lvl => Entry(32015, "zstd", Vector(lvl))).toVector ++
            // hdf5plugin blosc cd_values: filter version, blosc version,
            // typesize, chunk bytes, clevel, shuffle, compressor code —
            // the code is c-blosc's COMPNAME enum (blosclz=0, lz4=1,
            // lz4hc=2, snappy=3, zlib=4, zstd=5), NOT the 3-bit frame
            // flag code the blosc1 header itself uses
            blosc.map { p =>
              val code = p.cname match {
                case "lz4" => 1; case "lz4hc" => 2; case "snappy" => 3
                case "zlib" => 4; case "zstd" => 5; case _ => 0
              }
              Entry(32001, "blosc", Vector(2, 2, dtype.byteSize, 0,
                p.clevel, if (p.bitShuffle) 2 else if (p.shuffle) 1 else 0, code))
            }.toVector ++
            // lz4 cd_values: the block size (the filter's only parameter)
            (if (lz4) Vector(Entry(32004, "lz4", Vector(1 << 30)))
             else Vector.empty) ++
            // szip cd_values: options mask, bits/pixel, pixels/block,
            // pixels/scanline (the H5Z-szip client-data layout)
            szip.map { ppb =>
              val (bits, pps) =
                szipGeom(chunks(name).toVector, dtype.byteSize, ppb)
              Entry(4, "", Vector(SzipMask, bits, ppb, pps))
            }.toVector
          val size = 8 + entries.map { e =>
            val nb = if (e.name.isEmpty) 0 else pad8(e.name.length + 1)
            8 + nb + e.values.length * 4 + (if (e.values.length % 2 == 1) 4 else 0)
          }.sum
          val fb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
          fb.put(1.toByte); fb.put(entries.length.toByte); fb.position(8)
          entries.foreach { e =>
            // v1 name length is stored ALREADY padded to a multiple of 8
            // (libhdf5 H5O__pline_decode hard-rejects name_length % 8 != 0)
            val nameLen = if (e.name.isEmpty) 0 else pad8(e.name.length + 1)
            fb.putShort(e.id.toShort); fb.putShort(nameLen.toShort)
            fb.putShort(if (e.id >= 256) 1 else 0) // optional-filter flag
            fb.putShort(e.values.length.toShort)
            if (nameLen > 0) {
              fb.put(e.name.getBytes("ASCII"))
              (e.name.length until nameLen).foreach(_ => fb.put(0.toByte))
            }
            e.values.foreach(fb.putInt)
            if (e.values.length % 2 == 1) fb.putInt(0)
          }
          Vector(0x000B -> fb.array())
        } else Vector.empty
      val scaleAttrs: Vector[Msg] =
        if (isDim) Vector(
          0x000C -> strAttr("CLASS", "DIMENSION_SCALE"),
          0x000C -> strAttr("NAME",
            if (isPhantom)
              "This is a netCDF dimension but not a netCDF variable." +
                f"%n${f.dims(name)}"
            else name))
        else Vector.empty
      val dimList: Vector[Msg] = v match {
        // array-datatype vars skip DIMENSION_LIST: their variable dims
        // include the trailing element dims, which have no scale objects
        case Some(vr) if !isDim && !arrayVarDims.contains(name) =>
          // vlen data: per dim (len=1, gheap addr, gheap index) — patched
          Vector(0x000C -> attrBytes("DIMENSION_LIST", vlenRefTypeBytes,
            dataspaceBytes(Vector(vr.dims.length)),
            new Array[Byte](vr.dims.length * 16)))
        case _ => Vector.empty
      }
      val userAttrs: Vector[Msg] = v.map(_.attrs.toVector.sortBy(_._1).map {
        case (k, av) => 0x000C -> attrValueBytes(k, av) }).getOrElse(Vector.empty)
      base ++ filterMsg ++ scaleAttrs ++ dimList ++ userAttrs
    }

    val objMsgs: Map[String, Vector[Msg]] =
      objNames.map(n => n -> messagesFor(n)).toMap

    // ---- dense-attribute plan (r10) ----
    // denseAttrObjects: the selected objects store ALL their attributes
    // DENSELY — every 0x000C message moves into a per-object fractal
    // heap indexed by a type-8 v2 B-tree, and the header carries an
    // Attribute Info (0x0015) message instead: the layout libhdf5
    // switches to past 8 compact attributes (DIMENSION_LIST included,
    // exactly as libhdf5 moves it). One pow2-cover root direct block +
    // a single-leaf name index — attribute counts are object-scoped
    // (the indirect/depth-1 geometry is exercised on the link side and
    // the reader shares the machinery).
    val denseAttrBodies: Map[String, Vector[Array[Byte]]] =
      denseAttrObjects.toVector.sorted.map { n =>
        require(objNames.contains(n), s"denseAttrObjects: unknown object $n")
        val bodies = objMsgs(n).collect { case (0x000C, body) => body }
        require(bodies.nonEmpty, s"denseAttrObjects: $n has no attributes")
        n -> bodies
      }.toMap
    def attrMsgName(body: Array[Byte]): String = {
      // v1 attribute message: name size at offset 2, name at offset 8
      val nameLen = (body(2) & 0xFF) | ((body(3) & 0xFF) << 8)
      new String(body, 8, nameLen, "UTF-8").takeWhile(_ != 0)
    }
    val attrFhdbDataStart = 13 + 4 // sig+ver+heapAddr+blockOffset(4)
    // attribute messages above the 4 KiB managed ceiling go HUGE (the
    // libhdf5 behavior for e.g. a long history attribute on a densely-
    // attributed object): standalone blocks keyed by a type-1 v2 B-tree,
    // heap ids carrying the huge-object id instead of (offset, length)
    val denseAttrMaxManaged = 4096L
    // per object: heap-space offset of each MANAGED body (-1 = huge) +
    // the block size
    val denseAttrGeom: Map[String, (Vector[Long], Long)] =
      denseAttrBodies.map { case (n, bodies) =>
        var pos = attrFhdbDataStart.toLong
        val offs = bodies.map { b =>
          if (b.length > denseAttrMaxManaged) -1L
          else { val o = pos; pos += b.length; o }
        }
        val bsize = math.max(512L, java.lang.Long.highestOneBit(pos - 1) * 2)
        n -> (offs, bsize)
      }
    // per object: body indices stored huge (ids are 1-based, in order)
    val denseAttrHuge: Map[String, Vector[Int]] =
      denseAttrBodies.map { case (n, bodies) =>
        n -> bodies.indices.filter(i =>
          bodies(i).length > denseAttrMaxManaged).toVector
      }
    val objHeaderMsgs: Map[String, Vector[Msg]] = objMsgs.map { case (n, ms) =>
      if (denseAttrBodies.contains(n))
        // 20-byte body: the TRACKED variant (flags bit 0 + max creation
        // index) — what netCDF-4 emits (nc4 sets attr creation-order
        // tracking), exercising the reader's flag-dependent offsets
        n -> (ms.filterNot(_._1 == 0x000C) :+ ((0x0015, new Array[Byte](20))))
      else n -> ms
    }

    // ---- root group messages ----
    // denseRootLinks: the root group stores its links DENSELY (Link Info
    // message -> fractal heap + v2 btree name index) instead of via the
    // v1 symbol table — the layout netCDF-4 writers switch to past the
    // compact-link threshold, emitted here so the reader's dense path
    // has a self-made fixture (the reference gets these files from
    // h5py/libhdf5).
    val rootMsgs: Vector[Msg] =
      (if (denseRootLinks)
        Vector[Msg](0x0002 -> new Array[Byte](18),
          0x000A -> Array[Byte](0, 0))
      else Vector[Msg](0x0011 -> new Array[Byte](16))) ++
        f.attrs.toVector.sortBy(_._1).map { case (k, v) =>
          0x000C -> attrValueBytes(k, v) }

    // ---- heap data: object names ----
    val heapOffsets = scala.collection.mutable.Map.empty[String, Long]
    val heapData = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(new Array[Byte](8)) // offset 0 reserved
      objNames.foreach { n =>
        heapOffsets(n) = bos.size().toLong
        bos.write(n.getBytes("UTF-8")); bos.write(0)
        while (bos.size() % 8 != 0) bos.write(0)
      }
      bos.toByteArray
    }

    // ---- allocate all blocks ----
    alloc("superblock", 96)
    alloc("root", headerBytes(rootMsgs).length.toLong)
    // dense-link geometry (used only when denseRootLinks): serialized v1
    // link messages packed into fractal-heap direct blocks after each
    // 17-byte FHDB header. `denseStartBlockSize` forces libhdf5's real
    // doubling-table shape (512-byte starting blocks -> an INDIRECT root
    // once links outgrow one block); 0 = one pow2-cover direct root.
    // `denseBtNodeSize` similarly forces a depth-1 name index.
    val linkMsgSizes: Vector[Int] = objNames.map { n =>
      val nb = n.getBytes("UTF-8")
      require(nb.length <= 255, s"dense link name too long: $n")
      1 + 1 + 1 + nb.length + 8
    }
    val fhdbDataStart = 13 + 4 // sig+ver+hdrAddr+blockOffset(4)
    val fhdbNeed = fhdbDataStart + linkMsgSizes.sum
    val denseSbs =
      if (denseStartBlockSize > 0L) denseStartBlockSize
      else math.max(512L, java.lang.Long.highestOneBit(fhdbNeed - 1) * 2)
    def denseRowSize(r: Int): Long =
      if (r < 2) denseSbs else denseSbs << (r - 1)
    // greedy block plan: (blockOff, blockSize) per direct block plus each
    // object's heap offset (heap space INCLUDES block headers)
    val denseBlocks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val denseObjOff = new Array[Long](linkMsgSizes.length)
    if (denseRootLinks && denseTinyLinkIds) {
      // every link message rides INLINE in its (extended-tiny) heap id —
      // the heap has no blocks at all; ids are 48 bytes, messages must
      // fit the 46-byte payload (2 header bytes: flags + low length)
      linkMsgSizes.zip(objNames).foreach { case (m, n) =>
        require(m <= TinyLinkIdLen - 2,
          s"denseTinyLinkIds: link message for $n is $m bytes > " +
            s"${TinyLinkIdLen - 2} (tiny-id payload)")
      }
    } else if (denseRootLinks && denseMaxDirectBlockSize > 0) {
      // NESTED doubling-table plan: capping the max direct block size
      // forces rows past maxDirectRows to hold child INDIRECT blocks —
      // the geometry real libhdf5 link heaps reach past a few thousand
      // links. The builder lives below (needs the row math); denseBlocks
      // and denseObjOff are filled by it.
    } else if (denseRootLinks) {
      var pos = 0L // within-block cursor (absolute heap offset)
      var blockEnd = 0L
      linkMsgSizes.zipWithIndex.foreach { case (m, i) =>
        if (denseBlocks.isEmpty || pos + m > blockEnd) {
          val bOff = if (denseBlocks.isEmpty) 0L
                     else denseBlocks.last._1 + denseBlocks.last._2
          val bSize = denseRowSize(denseBlocks.length / 4)
          require(fhdbDataStart + m <= bSize,
            s"dense link message ($m bytes) exceeds block size $bSize")
          denseBlocks += ((bOff, bSize))
          pos = bOff + fhdbDataStart
          blockEnd = bOff + bSize
        }
        denseObjOff(i) = pos
        pos += m
      }
      if (denseBlocks.isEmpty) denseBlocks += ((0L, denseSbs))
    }
    val denseNested = denseRootLinks && denseMaxDirectBlockSize > 0
    // ---- nested-mode heap plan (denseMaxDirectBlockSize knob) ----
    final case class HeapIb(id: Int, baseOff: Long, rows: Int,
                            entries: Vector[Option[Either[Int, HeapIb]]])
    val heapRoot: Option[HeapIb] = if (!denseNested) None else {
      val M = denseMaxDirectBlockSize
      val W = 4
      require(java.lang.Long.bitCount(denseSbs) == 1 &&
        java.lang.Long.bitCount(M) == 1 && M >= denseSbs,
        s"nested heap wants power-of-2 start/max, got $denseSbs/$M")
      def log2(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val maxDR = log2(M) - log2(denseSbs) + 2
      linkMsgSizes.zip(objNames).foreach { case (m, n) =>
        require(fhdbDataStart + m <= M,
          s"dense link message for $n ($m bytes) exceeds max direct $M")
      }
      var msgIdx = 0
      var heapOff = 0L
      var ibId = 0
      def rowSizeOf(r: Int): Long =
        if (r < 2) denseSbs else denseSbs << (r - 1)
      def fillDirect(size: Long): Option[Int] = {
        val base = heapOff
        var pos = base + fhdbDataStart
        var used = false
        while (msgIdx < linkMsgSizes.length &&
          pos + linkMsgSizes(msgIdx) <= base + size) {
          denseObjOff(msgIdx) = pos
          pos += linkMsgSizes(msgIdx); msgIdx += 1; used = true
        }
        heapOff += size
        if (used) { denseBlocks += ((base, size)); Some(denseBlocks.length - 1) }
        else None
      }
      def buildIb(nrowsCap: Int, fixedRows: Boolean): HeapIb = {
        val id = ibId; ibId += 1
        val base = heapOff
        val entries = scala.collection.mutable
          .ArrayBuffer.empty[Option[Either[Int, HeapIb]]]
        var r = 0
        while (r < nrowsCap &&
          (fixedRows || msgIdx < linkMsgSizes.length)) {
          val sz = rowSizeOf(r)
          (0 until W).foreach { _ =>
            if (r < maxDR) {
              if (msgIdx < linkMsgSizes.length)
                entries += fillDirect(sz).map(Left(_))
              else { heapOff += sz; entries += None }
            } else {
              if (msgIdx < linkMsgSizes.length) {
                val childRows = log2(sz) - log2(denseSbs) - log2(W.toLong) + 1
                entries += Some(Right(buildIb(childRows, fixedRows = true)))
              } else { heapOff += sz; entries += None }
            }
          }
          r += 1
        }
        HeapIb(id, base, r, entries.toVector)
      }
      val root = buildIb(64, fixedRows = false)
      require(msgIdx == linkMsgSizes.length,
        s"nested heap plan placed $msgIdx of ${linkMsgSizes.length} links")
      Some(root)
    }
    val denseRows =
      if (denseNested) heapRoot.get.rows
      else if (denseBlocks.length <= 1) 0
      else (denseBlocks.length + 3) / 4
    val denseMaxDirect =
      if (denseNested) denseMaxDirectBlockSize
      else if (denseRows <= 2) denseSbs
      else denseSbs << (denseRows - 2)
    val denseMaxManaged = 4096L
    val denseLenW = lenBytesFor(math.min(denseMaxDirect, denseMaxManaged))
    val heapIdLenW =
      if (denseTinyLinkIds) TinyLinkIdLen else 1 + 4 + denseLenW
    val btRecSize = 4 + heapIdLenW
    // name-index plan: a v2 B-tree at whatever depth the node size
    // dictates (depth 2 appears past leafCap·(intCap+1) links — forced
    // in fixtures by a small denseBtNodeSize, reached in the wild past
    // ~10⁵ links)
    // The default is a single leaf sized to the corpus — but the BTHD
    // root record count is u16, so past 65,535 records the leaf is
    // CAPPED and the plan goes multi-level (the r13 100k-link fix: a
    // 65,536-record single-leaf root wrapped rootNRec to 0 and the
    // reader saw an empty group)
    val denseNodeSize =
      if (denseBtNodeSize > 0) denseBtNodeSize
      else math.max(2048,
        6 + math.min(objNames.length, 65535) * btRecSize + 4 + 8)
    val (denseBtRoot, denseBtMaxNrec, denseBtMaxTot) =
      if (denseRootLinks) planBtree(objNames.length, denseNodeSize, btRecSize)
      else (BtNodePlan("btlf:0", Vector.empty, Vector.empty),
        Vector(1L), Vector(1L))
    def allocBtNodes(node: BtNodePlan): Unit = {
      alloc(node.name, btNodeBytes(node, btRecSize, denseBtMaxNrec, denseBtMaxTot))
      node.children.foreach(allocBtNodes)
    }
    // filter-pipeline info for filtered heaps: one v2 deflate entry
    val heapFilterInfo: Array[Byte] =
      if (!denseFilteredHeap) Array.emptyByteArray
      else {
        val b = java.nio.ByteBuffer.allocate(12)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put(2.toByte); b.put(1.toByte) // version 2, one filter
        b.putShort(1)                    // deflate
        b.putShort(0)                    // flags: mandatory
        b.putShort(1)                    // one client value
        b.putInt(6)                      // level
        b.array()
      }
    val heapRootIsDirect = denseRows == 0
    val frhpExtraLen =
      if (!denseFilteredHeap) 0
      else (if (heapRootIsDirect) 12 else 0) + heapFilterInfo.length
    if (denseRootLinks) {
      alloc("fheap", 146L + frhpExtraLen)
      if (!denseFilteredHeap)
        denseBlocks.indices.foreach(k => alloc(s"fhdb:$k", denseBlocks(k)._2))
      if (denseNested) {
        def allocIb(ib: HeapIb): Unit = {
          alloc(s"fhib:${ib.id}", 13L + 4 + ib.rows * 4 * 8 + 4)
          ib.entries.foreach {
            case Some(Right(child)) => allocIb(child)
            case _ =>
          }
        }
        allocIb(heapRoot.get)
      } else if (denseRows > 0)
        alloc("fhib", 13L + 4 +
          denseRows * 4 * (if (denseFilteredHeap) 20 else 8) + 4)
      alloc("bthd", 38)
      allocBtNodes(denseBtRoot)
    } else {
      alloc("heap", 32)
      alloc("heapdata", heapData.length.toLong)
      alloc("btree", 24 + 24) // one leaf entry: key,child,key
      alloc("snod", 8 + objNames.length * 40)
    }
    objNames.foreach(n =>
      alloc(s"obj:$n", headerBytes(objHeaderMsgs(n)).length.toLong))
    // per-object dense-attribute structures: heap header + one direct
    // block + btree header + one leaf (type-8 records are 17 bytes:
    // 8-byte heap-id field + flags + corder + hash)
    denseAttrBodies.toVector.sortBy(_._1).foreach { case (n, bodies) =>
      alloc(s"afheap:$n", 146)
      alloc(s"afhdb:$n", denseAttrGeom(n)._2)
      alloc(s"abthd:$n", 38)
      alloc(s"abtlf:$n", (6 + bodies.length * 17 + 4).toLong)
      val huge = denseAttrHuge(n)
      if (huge.nonEmpty) {
        huge.foreach(i => alloc(s"ahuge:$n:$i", bodies(i).length.toLong))
        alloc(s"ahugebt:$n", 38)
        alloc(s"ahugelf:$n", (6 + huge.length * 24 + 4).toLong)
      }
    }
    // global heap: one object per (data var, dim), SHARDED into 4 KiB
    // collections like libhdf5 (H5HG_SIZE_HINT) — a single collection's
    // u16 index caps at 65,535 entries, which a 100k-var group exceeds
    // (SCALE_r12 §4); sharding removes the ceiling and the reader
    // already resolves references per collection address
    val gheapEntries: Vector[(String, Int)] = varNames.flatMap { n =>
      varOf(n) match {
        case Some(vr) if !dimNames.contains(n) =>
          vr.dims.indices.map(d => (n, d))
        case _ => Vector.empty
      }
    }
    // per 4 KiB collection: 16-byte header + entries (16-byte object
    // header + 8-byte payload) + 16-byte free-space tail
    val GcolEntryCap = (4096 - 16 - 16) / 24
    val gheapShards: Vector[Vector[(String, Int)]] =
      gheapEntries.grouped(GcolEntryCap).toVector
    def gheapShardSize(entries: Int): Int = 16 + entries * 24 + 16
    gheapShards.zipWithIndex.foreach { case (sh, si) =>
      alloc(s"gheap:$si", gheapShardSize(sh.length).toLong)
    }
    // chunk btrees + data
    objNames.foreach { n =>
      varData.get(n) match {
        case Some(Left(bytes)) =>
          if (bytes.nonEmpty) alloc(s"data:$n", bytes.length.toLong)
        case Some(Right(plans)) =>
          chunkIndexV4.get(n) match {
            case Some(1) =>
              require(plans.length == 1,
                s"chunkIndexV4: $n has ${plans.length} chunks; the single-" +
                  "chunk index needs chunk dims covering the dataspace")
              alloc(s"chunk:$n:0", plans.head.bytes.length.toLong)
            case Some(2) =>
              // implicit: one packed region, stride = full chunk bytes
              val cb = chunks(n).map(_.toLong).product *
                varOf(n).get.dtype.byteSize
              plans.foreach(p => require(p.bytes.length.toLong == cb,
                s"implicit index chunks must be raw full-size"))
              alloc(s"impl:$n", cb * plans.length)
            case Some(5) =>
              val rank = varOf(n).get.shape.length
              val recSize = if (anyCodec) 8 + 8 + 4 + 8 * rank
                            else 8 + 8 * rank
              alloc(s"cb2hd:$n", 38L)
              alloc(s"cb2lf:$n", 6L + plans.length * recSize + 4)
              plans.zipWithIndex.foreach { case (p, i) =>
                alloc(s"chunk:$n:$i", p.bytes.length.toLong) }
            case Some(4) =>
              val entrySize = if (anyCodec) 20 else 8
              alloc(s"eahd:$n", 72L)
              val bp = eaBlockPlan(eaParams, entrySize, plans.length)
              alloc(s"eaib:$n", bp.ibLen)
              bp.dblks.foreach { case (u, j, _, _, len) =>
                alloc(s"eadb:$n:$u:$j", len) }
              bp.sblkLens.foreach { case (u, len) =>
                alloc(s"easb:$n:$u", len) }
              plans.zipWithIndex.foreach { case (p, i) =>
                alloc(s"chunk:$n:$i", p.bytes.length.toLong) }
            case Some(3) =>
              val entrySize = if (anyCodec) 20 else 8
              alloc(s"fahd:$n", 28L)
              val pageElems = 1L << faPageBits
              val fadbLen =
                if (plans.length <= pageElems)
                  14L + plans.length.toLong * entrySize + 4
                else {
                  val npages = (plans.length + pageElems - 1) / pageElems
                  val bm = (npages + 7) / 8
                  14L + bm + 4 + (0L until npages).map { pg =>
                    math.min(pageElems, plans.length - pg * pageElems) *
                      entrySize + 4
                  }.sum
                }
              alloc(s"fadb:$n", fadbLen)
              plans.zipWithIndex.foreach { case (p, i) =>
                alloc(s"chunk:$n:$i", p.bytes.length.toLong) }
            case None =>
              val rank = (if (phantomDims.contains(n)) 1 else varOf(n).get.shape.length)
              val keySize = 8 + (rank + 1) * 8
              alloc(s"cbt:$n", 24 + plans.length * (keySize + 8) + keySize)
              plans.zipWithIndex.foreach { case (p, i) =>
                alloc(s"chunk:$n:$i", p.bytes.length.toLong) }
          }
        case None => // phantom dim: no data
      }
    }
    // link messages (dense roots): content needs every object address,
    // so they materialize after the object allocs — and the FILTERED
    // heap's compressed direct blocks allocate at the file tail because
    // their sizes are content-dependent
    val linkMsgs: Vector[Array[Byte]] =
      if (!denseRootLinks) Vector.empty
      else objNames.map { n =>
        val nb = n.getBytes("UTF-8")
        val b = ByteBuffer.allocate(1 + 1 + 1 + nb.length + 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        b.put(1.toByte)            // link message version
        b.put(0.toByte)            // flags: 1-byte name length, hard link
        b.put(nb.length.toByte)
        b.put(nb)
        b.putLong(addrs(s"obj:$n"))
        b.array()
      }
    def fhdbLogicalBlock(bOff: Long, bSize: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(bSize.toInt).order(ByteOrder.LITTLE_ENDIAN)
      b.put("FHDB".getBytes("ASCII"))
      b.put(0.toByte)
      b.putLong(addrs("fheap"))
      b.putInt(bOff.toInt) // block offset (4-byte width, 32-bit max heap)
      linkMsgs.indices.foreach { i =>
        val off = denseObjOff(i)
        if (off >= bOff && off < bOff + bSize) {
          b.position((off - bOff).toInt)
          b.put(linkMsgs(i))
        }
      }
      b.array()
    }
    val filteredFhdb: Vector[Array[Byte]] =
      if (!(denseRootLinks && denseFilteredHeap)) Vector.empty
      else denseBlocks.toVector.map { case (bOff, bSize) =>
        val d = new java.util.zip.Deflater(6)
        d.setInput(fhdbLogicalBlock(bOff, bSize)); d.finish()
        val outB = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) outB.write(buf, 0, d.deflate(buf))
        d.end()
        outB.toByteArray
      }
    filteredFhdb.zipWithIndex.foreach { case (bs, k) =>
      alloc(s"fhdb:$k", bs.length.toLong) }
    val eof = cursor

    // ---- emit ----
    val out = ByteBuffer.allocate(eof.toInt).order(ByteOrder.LITTLE_ENDIAN)
    def put(addr: Long, bytes: Array[Byte]): Unit = {
      out.position(addr.toInt); out.put(bytes)
    }

    // superblock v0
    {
      val b = ByteBuffer.allocate(96).order(ByteOrder.LITTLE_ENDIAN)
      b.put(Signature)
      b.put(0.toByte) // superblock v0
      b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // freespace, root STE v, reserved
      b.put(0.toByte); b.put(8.toByte); b.put(8.toByte); b.put(0.toByte)
      b.putShort(4); b.putShort(16) // group leaf/internal K
      b.putInt(0) // consistency flags
      b.putLong(0L) // base address
      b.putLong(Undefined) // free space
      b.putLong(eof) // end of file
      b.putLong(Undefined) // driver info
      // root group symbol table entry (dense roots carry no cached
      // symbol-table scratch: cache type 0)
      b.putLong(0L) // link name offset
      b.putLong(addrs("root"))
      if (denseRootLinks) {
        b.putInt(0); b.putInt(0)
        b.putLong(0L); b.putLong(0L)
      } else {
        b.putInt(1) // cached stab
        b.putInt(0)
        b.putLong(addrs("btree")); b.putLong(addrs("heap")) // scratch
      }
      put(0, b.array())
    }

    // root header: patch the group-storage message with real addresses
    {
      val msgs =
        if (denseRootLinks) rootMsgs.updated(0, {
          val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
          b.put(0.toByte) // link info version
          b.put(0.toByte) // flags: no creation-order tracking/index
          b.putLong(addrs("fheap"))
          b.putLong(addrs("bthd"))
          (0x0002, b.array())
        })
        else rootMsgs.updated(0, {
          val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
          b.putLong(addrs("btree")); b.putLong(addrs("heap"))
          (0x0011, b.array())
        })
      put(addrs("root"), headerBytes(msgs))
    }

    if (denseRootLinks) {
      // serialized v1 link messages, packed into the planned blocks
      val rootBlockAddr =
        if (denseTinyLinkIds) Undefined // all objects ride inline: no blocks
        else if (denseNested) addrs(s"fhib:${heapRoot.get.id}")
        else if (denseRows == 0) addrs("fhdb:0")
        else addrs("fhib")
      // fractal heap header (FRHP)
      locally {
        val managed = denseBlocks.map(_._2).sum
        val nManaged = if (denseTinyLinkIds) 0L else objNames.length.toLong
        val tinySize = if (denseTinyLinkIds) linkMsgSizes.sum.toLong else 0L
        val nTiny = if (denseTinyLinkIds) objNames.length.toLong else 0L
        val b = ByteBuffer.allocate(146 + frhpExtraLen)
          .order(ByteOrder.LITTLE_ENDIAN)
        b.put("FRHP".getBytes("ASCII"))
        b.put(0.toByte)                    // version
        b.putShort(heapIdLenW.toShort)     // heap id length
        b.putShort(heapFilterInfo.length.toShort) // io filter encoded length
        b.put(0.toByte)                    // flags: no checksums on blocks
        b.putInt(denseMaxManaged.toInt)    // max size of managed objects
        b.putLong(0L)                      // next huge id
        b.putLong(Undefined)               // huge btree
        b.putLong(if (nManaged > 0) managed - fhdbNeed else 0L) // free space
        b.putLong(Undefined)               // free-space manager
        b.putLong(if (nManaged > 0) managed else 0L) // managed space
        b.putLong(if (nManaged > 0) managed else 0L) // allocated managed
        b.putLong(if (nManaged > 0) fhdbNeed.toLong else 0L) // iterator off
        b.putLong(nManaged)                // managed objects
        b.putLong(0L); b.putLong(0L)       // huge size / count
        b.putLong(tinySize); b.putLong(nTiny) // tiny size / count
        b.putShort(4)                      // table width
        b.putLong(denseSbs)                // starting block size
        b.putLong(denseMaxDirect)          // max direct block size
        b.putShort(32)                     // max heap size (bits)
        b.putShort(1)                      // starting rows in root iblock
        b.putLong(rootBlockAddr)           // root block address
        b.putShort(denseRows.toShort)      // current rows (0 = root DIRECT)
        if (denseFilteredHeap) {
          if (heapRootIsDirect) {
            b.putLong(filteredFhdb.head.length.toLong) // filtered root size
            b.putInt(0)                                // root filter mask
          }
          b.put(heapFilterInfo)
        }
        b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0,
          142 + frhpExtraLen)))
        put(addrs("fheap"), b.array())
      }
      // direct blocks (flags bit1 unset -> no block checksums): headers +
      // objects at their planned absolute heap offsets — deflate-coded
      // wholesale on FILTERED heaps (compressed in the alloc phase)
      if (denseFilteredHeap)
        filteredFhdb.zipWithIndex.foreach { case (bs, k) =>
          put(addrs(s"fhdb:$k"), bs) }
      else denseBlocks.zipWithIndex.foreach { case ((bOff, bSize), k) =>
        put(addrs(s"fhdb:$k"), fhdbLogicalBlock(bOff, bSize))
      }
      // root INDIRECT block when the plan spans multiple direct blocks
      if (denseNested) {
        // nested mode: every planned indirect block, entries pointing at
        // direct blocks, child indirect blocks, or Undefined
        def emitIb(ib: HeapIb): Unit = {
          val sz = 13 + 4 + ib.rows * 4 * 8 + 4
          val b = ByteBuffer.allocate(sz).order(ByteOrder.LITTLE_ENDIAN)
          b.put("FHIB".getBytes("ASCII"))
          b.put(0.toByte)
          b.putLong(addrs("fheap"))
          b.putInt(ib.baseOff.toInt) // linear heap offset of this iblock
          (0 until ib.rows * 4).foreach { k =>
            b.putLong(ib.entries.lift(k).flatten match {
              case Some(Left(d)) => addrs(s"fhdb:$d")
              case Some(Right(child)) => addrs(s"fhib:${child.id}")
              case None => Undefined
            })
          }
          b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, sz - 4)))
          put(addrs(s"fhib:${ib.id}"), b.array())
          ib.entries.foreach {
            case Some(Right(child)) => emitIb(child)
            case _ =>
          }
        }
        emitIb(heapRoot.get)
      } else if (denseRows > 0) {
        val entryW = if (denseFilteredHeap) 20 else 8
        val sz = 13 + 4 + denseRows * 4 * entryW + 4
        val b = ByteBuffer.allocate(sz).order(ByteOrder.LITTLE_ENDIAN)
        b.put("FHIB".getBytes("ASCII"))
        b.put(0.toByte)
        b.putLong(addrs("fheap"))
        b.putInt(0) // block offset of the root indirect block
        (0 until denseRows * 4).foreach { k =>
          b.putLong(if (k < denseBlocks.length) addrs(s"fhdb:$k") else Undefined)
          if (denseFilteredHeap) { // (stored size, filter mask) per entry
            b.putLong(if (k < denseBlocks.length)
              filteredFhdb(k).length.toLong else 0L)
            b.putInt(0)
          }
        }
        b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, sz - 4)))
        put(addrs("fhib"), b.array())
      }
      // v2 btree name index: records sorted by lookup3(name), emitted
      // from the generalized plan (ANY depth — the reader's capacity
      // formulas dictate the child-pointer widths)
      val recs: Vector[(Int, String, Long, Int, Int)] =
        objNames.zipWithIndex.map { case (n, i) =>
          (lookup3(n.getBytes("UTF-8")), n, denseObjOff(i), linkMsgSizes(i), i)
        }.sortBy { case (h, n, _, _, _) => (h & 0xFFFFFFFFL, n) }
      def recBytes(b: ByteBuffer, r: (Int, String, Long, Int, Int)): Unit = {
        b.putInt(r._1)
        if (denseTinyLinkIds) {
          // extended-tiny id: the link message rides INLINE
          val msg = linkMsgs(r._5)
          b.put((0x20 | ((msg.length - 1) >> 8)).toByte)
          b.put(((msg.length - 1) & 0xFF).toByte)
          b.put(msg)
          (0 until heapIdLenW - 2 - msg.length).foreach(_ => b.put(0.toByte))
        } else {
          b.put(0.toByte)               // heap id: version/type = managed
          b.putInt(r._3.toInt)          // offset (4 bytes)
          var v = r._4.toLong
          (0 until denseLenW).foreach { _ => b.put((v & 0xFF).toByte); v >>= 8 }
        }
      }
      def putLE(b: ByteBuffer, v0: Long, w: Int): Unit = {
        var v = v0
        (0 until w).foreach { _ => b.put((v & 0xFF).toByte); v >>= 8 }
      }
      def emitBtNode(node: BtNodePlan): Unit = {
        val sz = btNodeBytes(node, btRecSize, denseBtMaxNrec,
          denseBtMaxTot).toInt
        val b = ByteBuffer.allocate(sz).order(ByteOrder.LITTLE_ENDIAN)
        if (node.children.isEmpty) {
          b.put("BTLF".getBytes("ASCII"))
          b.put(0.toByte); b.put(5.toByte)
          node.recs.foreach(i => recBytes(b, recs(i)))
        } else {
          node.children.foreach(emitBtNode)
          val d = node.depth
          val nrecW = lenBytesFor(denseBtMaxNrec(d - 1))
          val totW = if (d >= 2) lenBytesFor(denseBtMaxTot(d - 1)) else 0
          b.put("BTIN".getBytes("ASCII"))
          b.put(0.toByte); b.put(5.toByte)
          node.recs.foreach(i => recBytes(b, recs(i)))
          node.children.foreach { c =>
            b.putLong(addrs(c.name))
            putLE(b, c.recs.length.toLong, nrecW)
            if (totW > 0) putLE(b, c.totalRecs, totW)
          }
        }
        b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, sz - 4)))
        put(addrs(node.name), b.array())
      }
      emitBtNode(denseBtRoot)
      locally {
        val b = ByteBuffer.allocate(38).order(ByteOrder.LITTLE_ENDIAN)
        b.put("BTHD".getBytes("ASCII"))
        b.put(0.toByte)                  // version
        b.put(5.toByte)                  // type 5: group link name index
        b.putInt(denseNodeSize)          // node size
        b.putShort(btRecSize.toShort)
        b.putShort(denseBtRoot.depth.toShort)
        b.put(100.toByte); b.put(40.toByte) // split / merge %
        b.putLong(addrs(denseBtRoot.name))
        b.putShort(denseBtRoot.recs.length.toShort)
        b.putLong(objNames.length.toLong)
        b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, 34)))
        put(addrs("bthd"), b.array())
      }
    } else {
    // local heap
    {
      val b = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
      b.put("HEAP".getBytes("ASCII"))
      b.put(0.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
      b.putLong(heapData.length.toLong)
      b.putLong(Undefined) // no free list
      b.putLong(addrs("heapdata"))
      put(addrs("heap"), b.array())
      put(addrs("heapdata"), heapData)
    }

    // group btree (single leaf pointing at one SNOD)
    {
      val b = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
      b.put("TREE".getBytes("ASCII"))
      b.put(0.toByte); b.put(0.toByte) // type 0, level 0
      b.putShort(1)
      b.putLong(Undefined); b.putLong(Undefined)
      b.putLong(0L) // key 0: least name offset
      b.putLong(addrs("snod"))
      b.putLong(heapOffsets(objNames.last)) // key 1
      put(addrs("btree"), b.array())
    }

    // SNOD (entries sorted by name — objNames already sorted)
    {
      val b = ByteBuffer.allocate(8 + objNames.length * 40)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put("SNOD".getBytes("ASCII"))
      b.put(1.toByte); b.put(0.toByte)
      b.putShort(objNames.length.toShort)
      objNames.foreach { n =>
        b.putLong(heapOffsets(n))
        b.putLong(addrs(s"obj:$n"))
        b.putInt(0); b.putInt(0)
        b.put(new Array[Byte](16))
      }
      put(addrs("snod"), b.array())
    }
    }

    // global heap shards: (collection address key, 1-based index)
    val gheapIndex: Map[(String, Int), (Int, Int)] =
      gheapShards.zipWithIndex.flatMap { case (sh, si) =>
        sh.zipWithIndex.map { case (e, i) => e -> (si, i + 1) }
      }.toMap
    gheapShards.zipWithIndex.foreach { case (sh, si) =>
      val size = gheapShardSize(sh.length)
      val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
      b.put("GCOL".getBytes("ASCII"))
      b.put(1.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
      b.position(8); b.putLong(size.toLong)
      sh.zipWithIndex.foreach { case ((vn, d), i) =>
        b.putShort((i + 1).toShort)
        b.putShort(1) // refcount
        b.putInt(0)
        b.putLong(8L) // object size: one 8-byte reference
        b.putLong(addrs(s"obj:${varOf(vn).get.dims(d)}"))
      }
      // terminal free-space object
      b.putShort(0); b.putShort(0); b.putInt(0); b.putLong(16L)
      put(addrs(s"gheap:$si"), b.array())
    }

    // the real DIMENSION_LIST body (gheap references) — shared by the
    // compact in-header patch and the dense-attr heap emission
    def dimListBody(n: String): Array[Byte] = {
      val vr = varOf(n).get
      val data = ByteBuffer.allocate(vr.dims.length * 16)
        .order(ByteOrder.LITTLE_ENDIAN)
      vr.dims.indices.foreach { d =>
        val (si, idx) = gheapIndex((n, d))
        data.putInt(1)
        data.putLong(addrs(s"gheap:$si"))
        data.putInt(idx)
      }
      attrBytes("DIMENSION_LIST", vlenRefTypeBytes,
        dataspaceBytes(Vector(vr.dims.length)), data.array())
    }

    // dataset headers with patched layout + DIMENSION_LIST, then data
    objNames.foreach { n =>
      val isPhantom = phantomDims.contains(n)
      val v = varOf(n)
      val shape: Vector[Int] =
        if (isPhantom) Vector(f.dims(n))
        else compoundVars.get(n) match {
          case Some(members) =>
            f.coords.getOrElse(members.head, f.dataVars(members.head)).shape
          case None => v.get.shape
        }
      val patched = objHeaderMsgs(n).map {
        case (0x0008, body) =>
          varData.get(n) match {
            case Some(Left(bytes)) =>
              val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
              b.put(3.toByte); b.put(1.toByte)
              b.putLong(if (bytes.isEmpty) Undefined else addrs(s"data:$n"))
              b.putLong(bytes.length.toLong)
              (0x0008, b.array())
            case Some(Right(plans)) =>
              val cs = chunks(n)
              val elemSize = v.get.dtype.byteSize
              chunkIndexV4.get(n) match {
                case Some(t) =>
                  val params = t match {
                    case 1 if anyCodec => 12
                    case 3 => 1
                    case 4 => 5
                    case 5 => 6
                    case _ => 0
                  }
                  val b = ByteBuffer.allocate(5 + (cs.length + 1) * 8 +
                    1 + params + 8).order(ByteOrder.LITTLE_ENDIAN)
                  b.put(4.toByte); b.put(2.toByte) // v4 chunked
                  // flags: bit 1 = single chunk carries size+mask
                  b.put((if (t == 1 && anyCodec) 0x02 else 0x00).toByte)
                  b.put((cs.length + 1).toByte)
                  b.put(8.toByte) // 8-byte dim encoding
                  cs.foreach(c => b.putLong(c.toLong))
                  b.putLong(elemSize.toLong)
                  b.put(t.toByte)
                  t match {
                    case 1 if anyCodec =>
                      b.putLong(plans.head.bytes.length.toLong)
                      b.putInt(plans.head.mask)
                    case 3 => b.put(faPageBits.toByte)
                    case 4 =>
                      b.put(eaParams.maxBits.toByte)
                      b.put(eaParams.idxBlkElmts.toByte)
                      b.put(eaParams.minPtrs.toByte)
                      b.put(eaParams.minElmts.toByte)
                      b.put(eaParams.pageBits.toByte)
                    case 5 =>
                      b.putInt(2048) // node size
                      b.put(100.toByte); b.put(40.toByte) // split/merge %
                    case _ =>
                  }
                  b.putLong(t match {
                    case 1 => addrs(s"chunk:$n:0")
                    case 2 => addrs(s"impl:$n")
                    case 3 => addrs(s"fahd:$n")
                    case 4 => addrs(s"eahd:$n")
                    case _ => addrs(s"cb2hd:$n")
                  })
                  (0x0008, b.array())
                case None =>
                  val b = ByteBuffer.allocate(11 + (cs.length + 1) * 4)
                    .order(ByteOrder.LITTLE_ENDIAN)
                  b.put(3.toByte); b.put(2.toByte)
                  b.put((cs.length + 1).toByte)
                  b.putLong(addrs(s"cbt:$n"))
                  cs.foreach(b.putInt); b.putInt(elemSize)
                  (0x0008, b.array())
              }
            case None => // phantom: contiguous, never written
              val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
              b.put(3.toByte); b.put(1.toByte)
              b.putLong(Undefined); b.putLong(0L)
              (0x0008, b.array())
          }
        case (0x000C, body) if isDimListAttr(body) =>
          (0x000C, dimListBody(n))
        case (0x0015, _) =>
          val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
          b.put(0.toByte) // attribute info version
          b.put(1.toByte) // flags: creation order TRACKED (netCDF-4 does)
          b.putShort(denseAttrBodies(n).length.toShort) // max creation index
          b.putLong(addrs(s"afheap:$n"))
          b.putLong(addrs(s"abthd:$n"))
          (0x0015, b.array())
        case other => other
      }
      put(addrs(s"obj:$n"), headerBytes(patched))
      varData.get(n) match {
        case Some(Left(bytes)) if bytes.nonEmpty => put(addrs(s"data:$n"), bytes)
        case Some(Right(plans)) if chunkIndexV4.contains(n) =>
          chunkIndexV4(n) match {
            case 1 => put(addrs(s"chunk:$n:0"), plans.head.bytes)
            case 2 =>
              val cb = chunks(n).map(_.toLong).product *
                varOf(n).get.dtype.byteSize
              val base = addrs(s"impl:$n")
              plans.zipWithIndex.foreach { case (p, i) =>
                put(base + i * cb, p.bytes) }
            case 5 =>
              // v2 B-tree chunk index: one depth-0 leaf of type-10/11
              // records (addr [+ size + mask] + SCALED coordinates)
              val rank = shape.length
              val cs = chunks(n)
              val recSize = if (anyCodec) 8 + 8 + 4 + 8 * rank
                            else 8 + 8 * rank
              val recType = if (anyCodec) 11 else 10
              locally {
                val sz = 6 + plans.length * recSize + 4
                val b = ByteBuffer.allocate(sz).order(ByteOrder.LITTLE_ENDIAN)
                b.put("BTLF".getBytes("ASCII"))
                b.put(0.toByte); b.put(recType.toByte)
                plans.zipWithIndex.foreach { case (pl, i) =>
                  b.putLong(addrs(s"chunk:$n:$i"))
                  if (anyCodec) {
                    b.putLong(pl.bytes.length.toLong)
                    b.putInt(pl.mask)
                  }
                  pl.offsets.zipWithIndex.foreach { case (o, d) =>
                    b.putLong(o.toLong / cs(d)) } // scaled coordinates
                }
                b.putInt(lookup3(
                  java.util.Arrays.copyOfRange(b.array(), 0, sz - 4)))
                put(addrs(s"cb2lf:$n"), b.array())
              }
              locally {
                val b = ByteBuffer.allocate(38).order(ByteOrder.LITTLE_ENDIAN)
                b.put("BTHD".getBytes("ASCII"))
                b.put(0.toByte)
                b.put(recType.toByte)
                b.putInt(2048)
                b.putShort(recSize.toShort)
                b.putShort(0) // depth 0
                b.put(100.toByte); b.put(40.toByte)
                b.putLong(addrs(s"cb2lf:$n"))
                b.putShort(plans.length.toShort)
                b.putLong(plans.length.toLong)
                b.putInt(lookup3(
                  java.util.Arrays.copyOfRange(b.array(), 0, 34)))
                put(addrs(s"cb2hd:$n"), b.array())
              }
              plans.zipWithIndex.foreach { case (pl, i) =>
                put(addrs(s"chunk:$n:$i"), pl.bytes) }
            case 4 =>
              // extensible array: EAHD + EAIB (+ EASB secondary blocks)
              // + EADB data blocks, paged when a data block exceeds
              // 2^pageBits elements; every structure closed by a
              // lookup3 checksum, bitmaps all-initialized (the writer
              // emits every page)
              val entrySize = if (anyCodec) 20 else 8
              val p = eaParams
              val sblks = eaSblkInfos(p)
              val iblkN = eaIblockNsblks(p)
              val ndblkAddrs = 2 * (p.minPtrs - 1)
              val nsblkAddrs = sblks.length - iblkN
              val obBytes = (p.maxBits + 7) / 8
              val pageElems = 1L << p.pageBits
              val nelems = plans.length
              val client = (if (anyCodec) 1 else 0).toByte
              val bp = eaBlockPlan(p, entrySize, nelems)
              def entryAt(bb: ByteBuffer, idx: Long): Unit =
                if (idx < nelems) {
                  val i = idx.toInt
                  bb.putLong(addrs(s"chunk:$n:$i"))
                  if (anyCodec) {
                    bb.putLong(plans(i).bytes.length.toLong)
                    bb.putInt(plans(i).mask)
                  }
                } else { // beyond the written extent: unallocated element
                  bb.putLong(Undefined)
                  if (anyCodec) { bb.putLong(0L); bb.putInt(0) }
                }
              def putOb(bb: ByteBuffer, v: Long): Unit =
                (0 until obBytes).foreach(k =>
                  bb.put(((v >> (8 * k)) & 0xFF).toByte))
              def sealBlk(bb: ByteBuffer, len: Int, key: String): Unit = {
                val arr = bb.array()
                bb.putInt(len - 4,
                  lookup3(java.util.Arrays.copyOf(arr, len - 4)))
                put(addrs(key), arr)
              }
              // EAHD: creation params + statistics + iblock address
              locally {
                val hd = ByteBuffer.allocate(72)
                  .order(ByteOrder.LITTLE_ENDIAN)
                hd.put("EAHD".getBytes("ASCII"))
                hd.put(0.toByte); hd.put(client)
                hd.put(entrySize.toByte); hd.put(p.maxBits.toByte)
                hd.put(p.idxBlkElmts.toByte); hd.put(p.minElmts.toByte)
                hd.put(p.minPtrs.toByte); hd.put(p.pageBits.toByte)
                hd.putLong(bp.sblkLens.length.toLong) // secondary blks
                hd.putLong(bp.sblkLens.map(_._2).sum) // their bytes
                hd.putLong(bp.dblks.length.toLong)    // data blks
                hd.putLong(bp.dblks.map(_._5).sum)    // their bytes
                hd.putLong(nelems.toLong)             // max index set
                hd.putLong(nelems.toLong)             // elements realized
                hd.putLong(addrs(s"eaib:$n"))
                sealBlk(hd, 72, s"eahd:$n")
              }
              // EAIB: inline elements, resident dblk addrs, sblk addrs
              locally {
                val len = bp.ibLen.toInt
                val ib = ByteBuffer.allocate(len)
                  .order(ByteOrder.LITTLE_ENDIAN)
                ib.put("EAIB".getBytes("ASCII"))
                ib.put(0.toByte); ib.put(client)
                ib.putLong(addrs(s"eahd:$n"))
                (0 until p.idxBlkElmts).foreach(i => entryAt(ib, i.toLong))
                sblks.take(iblkN).foreach { s =>
                  (0 until s.ndblks).foreach { j =>
                    val firstIdx =
                      p.idxBlkElmts + s.startIdx + j.toLong * s.dblkElmts
                    ib.putLong(if (firstIdx < nelems)
                      addrs(s"eadb:$n:${s.u}:$j") else Undefined)
                  }
                }
                sblks.drop(iblkN).foreach { s =>
                  ib.putLong(if (p.idxBlkElmts + s.startIdx < nelems)
                    addrs(s"easb:$n:${s.u}") else Undefined)
                }
                sealBlk(ib, len, s"eaib:$n")
              }
              // EASB secondary blocks: block offset + page bitmap +
              // data block addresses
              bp.sblkLens.foreach { case (u, lenL) =>
                val s = sblks(u)
                val len = lenL.toInt
                val paged = s.dblkElmts > pageElems
                val npagesPer =
                  if (paged) (s.dblkElmts / pageElems).toInt else 0
                val bm = if (paged) (s.ndblks * npagesPer + 7) / 8 else 0
                val sb = ByteBuffer.allocate(len)
                  .order(ByteOrder.LITTLE_ENDIAN)
                sb.put("EASB".getBytes("ASCII"))
                sb.put(0.toByte); sb.put(client)
                sb.putLong(addrs(s"eahd:$n"))
                putOb(sb, p.idxBlkElmts + s.startIdx)
                (0 until s.ndblks).foreach { j =>
                  val firstIdx =
                    p.idxBlkElmts + s.startIdx + j.toLong * s.dblkElmts
                  if (paged && firstIdx < nelems) // all pages written
                    (0 until npagesPer).foreach { pg =>
                      val bit = j * npagesPer + pg
                      sb.put(14 + obBytes + bit / 8,
                        (sb.get(14 + obBytes + bit / 8) |
                          (1 << (bit % 8))).toByte)
                    }
                }
                (0 until s.ndblks).foreach { j =>
                  val firstIdx =
                    p.idxBlkElmts + s.startIdx + j.toLong * s.dblkElmts
                  sb.putLong(14 + obBytes + bm + j * 8,
                    if (firstIdx < nelems) addrs(s"eadb:$n:${s.u}:$j")
                    else Undefined)
                }
                sealBlk(sb, len, s"easb:$n:$u")
              }
              // EADB data blocks (paged: checksummed prefix + pages)
              bp.dblks.foreach { case (u, j, firstIdx, paged, lenL) =>
                val s = sblks(u)
                if (!paged) {
                  val len = lenL.toInt
                  val db = ByteBuffer.allocate(len)
                    .order(ByteOrder.LITTLE_ENDIAN)
                  db.put("EADB".getBytes("ASCII"))
                  db.put(0.toByte); db.put(client)
                  db.putLong(addrs(s"eahd:$n"))
                  putOb(db, firstIdx)
                  (0 until s.dblkElmts).foreach(i =>
                    entryAt(db, firstIdx + i))
                  sealBlk(db, len, s"eadb:$n:$u:$j")
                } else {
                  val headLen = 14 + obBytes + 4
                  val db = ByteBuffer.allocate(headLen)
                    .order(ByteOrder.LITTLE_ENDIAN)
                  db.put("EADB".getBytes("ASCII"))
                  db.put(0.toByte); db.put(client)
                  db.putLong(addrs(s"eahd:$n"))
                  putOb(db, firstIdx)
                  val headArr = db.array()
                  db.putInt(headLen - 4,
                    lookup3(java.util.Arrays.copyOf(headArr, headLen - 4)))
                  put(addrs(s"eadb:$n:$u:$j"), headArr)
                  val npages = (s.dblkElmts / pageElems).toInt
                  val pageLen = pageElems.toInt * entrySize + 4
                  var pos = addrs(s"eadb:$n:$u:$j") + headLen
                  (0 until npages).foreach { pg =>
                    val pb = ByteBuffer.allocate(pageLen)
                      .order(ByteOrder.LITTLE_ENDIAN)
                    (0 until pageElems.toInt).foreach(i =>
                      entryAt(pb, firstIdx + pg * pageElems + i))
                    val parr = pb.array()
                    pb.putInt(pageLen - 4,
                      lookup3(java.util.Arrays.copyOf(parr, pageLen - 4)))
                    put(pos, parr)
                    pos += pageLen
                  }
                }
              }
              plans.zipWithIndex.foreach { case (pl, i) =>
                put(addrs(s"chunk:$n:$i"), pl.bytes) }
            case _ =>
              val entrySize = if (anyCodec) 20 else 8
              // FAHD
              val hd = ByteBuffer.allocate(28).order(ByteOrder.LITTLE_ENDIAN)
              hd.put("FAHD".getBytes("ASCII"))
              hd.put(0.toByte)
              hd.put((if (anyCodec) 1 else 0).toByte) // client id
              hd.put(entrySize.toByte)
              hd.put(faPageBits.toByte)
              hd.putLong(plans.length.toLong)
              hd.putLong(addrs(s"fadb:$n"))
              val hdArr = hd.array()
              val hcks = lookup3(java.util.Arrays.copyOf(hdArr, 24))
              hd.putInt(24, hcks)
              put(addrs(s"fahd:$n"), hdArr)
              // FADB (paged when the grid exceeds one page)
              def entry(bb: ByteBuffer, i: Int): Unit = {
                bb.putLong(addrs(s"chunk:$n:$i"))
                if (anyCodec) {
                  bb.putLong(plans(i).bytes.length.toLong)
                  bb.putInt(plans(i).mask)
                }
              }
              val pageElems = 1L << faPageBits
              if (plans.length <= pageElems) {
                val len = 14 + plans.length * entrySize + 4
                val db = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
                db.put("FADB".getBytes("ASCII"))
                db.put(0.toByte)
                db.put((if (anyCodec) 1 else 0).toByte)
                db.putLong(addrs(s"fahd:$n"))
                plans.indices.foreach(entry(db, _))
                val arr = db.array()
                db.putInt(len - 4, lookup3(java.util.Arrays.copyOf(arr, len - 4)))
                put(addrs(s"fadb:$n"), arr)
              } else {
                val npages = ((plans.length + pageElems - 1) / pageElems).toInt
                val bm = (npages + 7) / 8
                val headLen = 14 + bm + 4
                val db = ByteBuffer.allocate(headLen).order(ByteOrder.LITTLE_ENDIAN)
                db.put("FADB".getBytes("ASCII"))
                db.put(0.toByte)
                db.put((if (anyCodec) 1 else 0).toByte)
                db.putLong(addrs(s"fahd:$n"))
                (0 until npages).foreach(pg => // all pages initialized
                  db.put(14 + pg / 8,
                    (db.get(14 + pg / 8) | (1 << (pg % 8))).toByte))
                val headArr = db.array()
                db.putInt(headLen - 4,
                  lookup3(java.util.Arrays.copyOf(headArr, headLen - 4)))
                put(addrs(s"fadb:$n"), headArr)
                var pos = addrs(s"fadb:$n") + headLen
                var idx = 0
                (0 until npages).foreach { _ =>
                  val count = math.min(pageElems, plans.length - idx).toInt
                  val plen = count * entrySize + 4
                  val pb = ByteBuffer.allocate(plen).order(ByteOrder.LITTLE_ENDIAN)
                  (0 until count).foreach(i => entry(pb, idx + i))
                  val parr = pb.array()
                  pb.putInt(plen - 4,
                    lookup3(java.util.Arrays.copyOf(parr, plen - 4)))
                  put(pos, parr)
                  pos += plen
                  idx += count
                }
              }
              plans.zipWithIndex.foreach { case (p, i) =>
                put(addrs(s"chunk:$n:$i"), p.bytes) }
          }
        case Some(Right(plans)) =>
          val rank = shape.length
          val keySize = 8 + (rank + 1) * 8
          val b = ByteBuffer.allocate(24 + plans.length * (keySize + 8) + keySize)
            .order(ByteOrder.LITTLE_ENDIAN)
          b.put("TREE".getBytes("ASCII"))
          b.put(1.toByte); b.put(0.toByte) // type 1, level 0
          b.putShort(plans.length.toShort)
          b.putLong(Undefined); b.putLong(Undefined)
          plans.zipWithIndex.foreach { case (p, i) =>
            b.putInt(p.bytes.length)
            b.putInt(p.mask) // filter mask (bit i set = entry i skipped)
            p.offsets.foreach(o => b.putLong(o.toLong))
            b.putLong(0L) // element-size dimension offset
            b.putLong(addrs(s"chunk:$n:$i"))
          }
          // final key: one past the end in dim 0
          b.putInt(0); b.putInt(0)
          b.putLong(shape.head.toLong)
          (1 until rank).foreach(_ => b.putLong(0L))
          b.putLong(0L)
          put(addrs(s"cbt:$n"), b.array())
          plans.zipWithIndex.foreach { case (p, i) =>
            put(addrs(s"chunk:$n:$i"), p.bytes) }
        case _ =>
      }
    }

    // dense-attribute heaps + type-8 name indexes (DIMENSION_LIST bodies
    // patched with the real gheap references, same as the compact path)
    denseAttrBodies.toVector.sortBy(_._1).foreach { case (n, bodies0) =>
      val bodies = bodies0.map(b => if (isDimListAttr(b)) dimListBody(n) else b)
      val (offs, bsize) = denseAttrGeom(n)
      val huge = denseAttrHuge(n)
      val hugeId: Map[Int, Long] = huge.zipWithIndex.map {
        case (i, k) => i -> (k + 1L) }.toMap
      val need = bodies.indices.collect {
        case i if offs(i) >= 0 => offs(i) + bodies(i).length
      }.foldLeft(attrFhdbDataStart.toLong)(math.max)
      val lenW = lenBytesFor(math.min(bsize, denseAttrMaxManaged))
      // fractal heap header — the attribute-heap convention pads the
      // heap id to a fixed 8 bytes (libhdf5 H5A_DENSE_FHEAP_ID_LEN)
      locally {
        val b = ByteBuffer.allocate(146).order(ByteOrder.LITTLE_ENDIAN)
        b.put("FRHP".getBytes("ASCII"))
        b.put(0.toByte)
        b.putShort(8)                 // heap id length (padded)
        b.putShort(0)                 // io filter encoded length
        b.put(0.toByte)               // flags: no block checksums
        b.putInt(denseAttrMaxManaged.toInt) // max managed object size
        b.putLong(huge.length + 1L)   // next huge id
        b.putLong(if (huge.nonEmpty) addrs(s"ahugebt:$n") else Undefined)
        b.putLong(bsize - need)       // free space
        b.putLong(Undefined)          // free-space manager
        b.putLong(bsize)              // managed space
        b.putLong(bsize)              // allocated managed space
        b.putLong(need)               // direct-block iterator offset
        b.putLong((bodies.length - huge.length).toLong) // managed objects
        b.putLong(huge.map(bodies(_).length.toLong).sum) // huge size
        b.putLong(huge.length.toLong) // huge count
        b.putLong(0L); b.putLong(0L)  // tiny size / count
        b.putShort(4)                 // table width
        b.putLong(bsize)              // starting block size
        b.putLong(bsize)              // max direct block size
        b.putShort(32)                // max heap size (bits)
        b.putShort(1)                 // starting rows in root iblock
        b.putLong(addrs(s"afhdb:$n")) // root block (DIRECT: cur rows 0)
        b.putShort(0)
        b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, 142)))
        put(addrs(s"afheap:$n"), b.array())
      }
      // the single direct block holding the attribute messages
      locally {
        val b = ByteBuffer.allocate(bsize.toInt).order(ByteOrder.LITTLE_ENDIAN)
        b.put("FHDB".getBytes("ASCII"))
        b.put(0.toByte)
        b.putLong(addrs(s"afheap:$n"))
        b.putInt(0) // block offset
        bodies.indices.foreach { i =>
          if (offs(i) >= 0) {
            b.position(offs(i).toInt)
            b.put(bodies(i))
          }
        }
        put(addrs(s"afhdb:$n"), b.array())
      }
      // huge attribute bodies: standalone blocks + a type-1 v2 btree
      // mapping huge id -> (address, length)
      if (huge.nonEmpty) {
        huge.foreach(i => put(addrs(s"ahuge:$n:$i"), bodies(i)))
        locally {
          val sz = 6 + huge.length * 24 + 4
          val b = ByteBuffer.allocate(sz).order(ByteOrder.LITTLE_ENDIAN)
          b.put("BTLF".getBytes("ASCII"))
          b.put(0.toByte); b.put(1.toByte) // type 1: huge, indirect
          huge.foreach { i =>
            b.putLong(addrs(s"ahuge:$n:$i"))
            b.putLong(bodies(i).length.toLong)
            b.putLong(hugeId(i))
          }
          b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, sz - 4)))
          put(addrs(s"ahugelf:$n"), b.array())
        }
        locally {
          val b = ByteBuffer.allocate(38).order(ByteOrder.LITTLE_ENDIAN)
          b.put("BTHD".getBytes("ASCII"))
          b.put(0.toByte)
          b.put(1.toByte)          // type 1: huge objects, indirect
          b.putInt(math.max(512, 6 + huge.length * 24 + 4 + 8))
          b.putShort(24)           // record size: addr8 + len8 + id8
          b.putShort(0)            // depth 0
          b.put(100.toByte); b.put(40.toByte)
          b.putLong(addrs(s"ahugelf:$n"))
          b.putShort(huge.length.toShort)
          b.putLong(huge.length.toLong)
          b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, 34)))
          put(addrs(s"ahugebt:$n"), b.array())
        }
      }
      // type-8 name index: [8-byte heap-id field][msg flags][corder]
      // [hash], records sorted by (lookup3(name), name); single leaf
      val recs = bodies.indices.map { i =>
        val name = attrMsgName(bodies(i))
        (lookup3(name.getBytes("UTF-8")), name, offs(i), bodies(i).length, i)
      }.sortBy { case (h, nm, _, _, _) => (h & 0xFFFFFFFFL, nm) }
      def recBytes(b: ByteBuffer, r: (Int, String, Long, Int, Int)): Unit = {
        if (r._3 < 0) { // huge: [flags type=1][huge id in 7 bytes]
          b.put(0x10.toByte)
          var v = hugeId(r._5)
          (0 until 7).foreach { _ => b.put((v & 0xFF).toByte); v >>= 8 }
        } else {
          b.put(0.toByte)           // heap id: version/type managed
          b.putInt(r._3.toInt)      // offset (4 bytes)
          var v = r._4.toLong
          (0 until lenW).foreach { _ => b.put((v & 0xFF).toByte); v >>= 8 }
          (0 until 8 - 5 - lenW).foreach(_ => b.put(0.toByte)) // pad id to 8
        }
        b.put(0.toByte)           // message flags
        b.putInt(r._5)            // creation order
        b.putInt(r._1)            // hash of name
      }
      locally {
        val sz = 6 + recs.length * 17 + 4
        val b = ByteBuffer.allocate(sz).order(ByteOrder.LITTLE_ENDIAN)
        b.put("BTLF".getBytes("ASCII"))
        b.put(0.toByte); b.put(8.toByte)
        recs.foreach(recBytes(b, _))
        b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, sz - 4)))
        put(addrs(s"abtlf:$n"), b.array())
      }
      locally {
        val b = ByteBuffer.allocate(38).order(ByteOrder.LITTLE_ENDIAN)
        b.put("BTHD".getBytes("ASCII"))
        b.put(0.toByte)
        b.put(8.toByte)           // type 8: attribute name index
        b.putInt(math.max(512, 6 + recs.length * 17 + 4 + 8))
        b.putShort(17)            // record size
        b.putShort(0)             // depth 0
        b.put(100.toByte); b.put(40.toByte) // split / merge %
        b.putLong(addrs(s"abtlf:$n"))
        b.putShort(recs.length.toShort)
        b.putLong(recs.length.toLong)
        b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, 34)))
        put(addrs(s"abthd:$n"), b.array())
      }
    }

    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, out.array())
  }

  private def isDimListAttr(body: Array[Byte]): Boolean = {
    // v1 attribute: name starts at offset 8
    body.length > 8 + 14 &&
      new String(body, 8, 14, "UTF-8") == "DIMENSION_LIST"
  }
}
