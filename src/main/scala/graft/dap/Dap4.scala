package graft.dap

import java.nio.{ByteBuffer, ByteOrder}
import graft.core._
import graft.core.Attrs.Attrs

/** Clean-room DAP4 client (OPeNDAP 4 protocol — what newer Hyrax and
  * TDS servers prefer over the DAP2 endpoints the reference exercises,
  * openers.py:83-86): fetches the `.dmr` XML metadata document and the
  * `.dap` chunked binary response and materializes the same Fragment
  * shape as [[Dap2.read]].
  *
  * Protocol surface (DAP4 specification, volumes 1-2):
  *  - DMR: `<Dataset>` with dataset-level `<Dimension name size/>`,
  *    typed variable elements (`<Float64 name=...>` etc.) carrying
  *    `<Dim name="/time"/>` references and `<Attribute>` children, plus
  *    dataset-level attributes. Parsed with the JDK's DOM parser —
  *    namespace-tolerant, entity/DTD resolution disabled (remote XML is
  *    untrusted input).
  *  - `.dap` response: CHUNKED framing — each chunk has a 4-byte
  *    big-endian header whose high byte is flags (bit 0 LAST_CHUNK,
  *    bit 1 ERROR, bit 2 little-endian data) and low 24 bits the byte
  *    length. The first chunk(s) carry the response DMR text terminated
  *    by CRLF; the remainder is the data section: top-level variables in
  *    DMR order, row-major fixed-size atomics in the flagged byte order,
  *    each followed by a CRC32 checksum when `dap4.checksum=true` was
  *    requested (this client always requests and VERIFIES checksums —
  *    fail by name beats silently truncated science data).
  *  - An ERROR chunk surfaces its payload as the exception message.
  *
  * The fixture encoder ([[encode]]) emits the same documents the tests
  * serve over a local HTTP server — the [[Dap2.encode]] pattern; a real
  * deployment points at any public DAP4 endpoint instead. */
object Dap4 {

  final case class DmrVar(dapType: String, name: String,
                          dims: Vector[(String, Int)], attrs: Attrs)
  final case class Dmr(name: String, dims: Vector[(String, Int)],
                       vars: Vector[DmrVar], attrs: Attrs)

  private val TypeBytes: Map[String, Int] = Map(
    "Int8" -> 1, "UInt8" -> 1, "Byte" -> 1, "Char" -> 1,
    "Int16" -> 2, "UInt16" -> 2, "Int32" -> 4, "UInt32" -> 4,
    "Int64" -> 8, "UInt64" -> 8, "Float32" -> 4, "Float64" -> 8)

  private def engineDType(t: String): DType = t match {
    case "Int8" => DType.I1
    case "UInt8" | "Byte" | "Char" => DType.U1
    case "Int16" => DType.I2
    case "UInt16" => DType.U2
    case "Int32" => DType.I4
    case "UInt32" => DType.U4
    case "Int64" => DType.I8
    case "UInt64" => DType.U8
    case "Float32" => DType.F4
    case "Float64" => DType.F8
    case other => throw new IllegalArgumentException(
      s"DAP4: unsupported variable type $other")
  }

  private def dapType(d: DType): String = d match {
    case DType.I1 => "Int8"
    case DType.U1 => "UInt8"
    case DType.I2 => "Int16"
    case DType.U2 => "UInt16"
    case DType.I4 => "Int32"
    case DType.U4 => "UInt32"
    case DType.I8 => "Int64"
    case DType.U8 => "UInt64"
    case DType.F4 => "Float32"
    case DType.F8 => "Float64"
  }

  // ------------------------------------------------------------ DMR parse

  private def domOf(xml: String): org.w3c.dom.Element = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // remote XML is untrusted: no DTDs, no external entities
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.setNamespaceAware(false)
    f.newDocumentBuilder()
      .parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))
      .getDocumentElement
  }

  private def childElems(e: org.w3c.dom.Element): Vector[org.w3c.dom.Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).flatMap { i =>
      nl.item(i) match {
        case el: org.w3c.dom.Element => Some(el)
        case _ => None
      }
    }.toVector
  }

  private def parseAttrs(e: org.w3c.dom.Element): Attrs =
    childElems(e).filter(_.getTagName == "Attribute").map { a =>
      val name = a.getAttribute("name")
      val typ = a.getAttribute("type")
      val values = childElems(a).filter(_.getTagName == "Value")
        .map(_.getTextContent)
      val v: AttrValue =
        if (values.isEmpty) AttrValue.ANull
        else {
          def one(s: String): AttrValue = typ match {
            case "String" | "URL" | "" => AttrValue.AStr(s)
            case "Float32" | "Float64" => AttrValue.ANum(s.trim.toDouble)
            case _ => AttrValue.AInt(s.trim.toLong)
          }
          if (values.length == 1) one(values.head)
          else AttrValue.AList(values.map(one).toVector)
        }
      name -> v
    }.toMap

  /** Parse a DMR document. Groups beyond the root are rejected by name
    * (the reference's DAP sources are flat netCDF-shaped datasets). */
  def parseDmr(xml: String): Dmr = {
    val root = domOf(xml)
    require(root.getTagName == "Dataset",
      s"DAP4 DMR root is <${root.getTagName}>, want <Dataset>")
    val kids = childElems(root)
    require(!kids.exists(_.getTagName == "Group"),
      "DAP4: nested groups not supported (flat netCDF-shaped datasets only)")
    val dims = kids.filter(_.getTagName == "Dimension").map { d =>
      d.getAttribute("name") -> d.getAttribute("size").toInt
    }
    val dimSize = dims.toMap
    val vars = kids.filter(k => TypeBytes.contains(k.getTagName)).map { v =>
      val vdims = childElems(v).filter(_.getTagName == "Dim").map { d =>
        val ref = d.getAttribute("name").stripPrefix("/")
        ref -> dimSize.getOrElse(ref, throw new IllegalArgumentException(
          s"DAP4: <Dim name=/$ref> names no dataset <Dimension>"))
      }
      DmrVar(v.getTagName, v.getAttribute("name"), vdims, parseAttrs(v))
    }
    Dmr(root.getAttribute("name"), dims, vars, parseAttrs(root))
  }

  // ------------------------------------------------------- chunked framing

  private val FlagLast = 0x01
  private val FlagError = 0x02
  private val FlagLittleEndian = 0x04

  /** De-frame a `.dap` response: returns (DMR text, data bytes, data
    * byte order). An ERROR chunk raises with its payload text. */
  private[graft] def deframe(resp: Array[Byte]): (String, Array[Byte], ByteOrder) = {
    var pos = 0
    var order: ByteOrder = ByteOrder.BIG_ENDIAN
    val body = new java.io.ByteArrayOutputStream()
    var last = false
    while (!last) {
      require(pos + 4 <= resp.length, "DAP4: truncated chunk header")
      val hdr = ((resp(pos) & 0xFF) << 24) | ((resp(pos + 1) & 0xFF) << 16) |
        ((resp(pos + 2) & 0xFF) << 8) | (resp(pos + 3) & 0xFF)
      val flags = hdr >>> 24
      val len = hdr & 0xFFFFFF
      pos += 4
      require(pos + len <= resp.length,
        s"DAP4: chunk length $len overruns the response")
      if ((flags & FlagError) != 0)
        throw new java.io.IOException("DAP4 server error: " +
          new String(resp, pos, len, "UTF-8").take(500))
      if ((flags & FlagLittleEndian) != 0) order = ByteOrder.LITTLE_ENDIAN
      body.write(resp, pos, len)
      pos += len
      last = (flags & FlagLast) != 0
    }
    val all = body.toByteArray
    val marker = "</Dataset>".getBytes("UTF-8")
    val at = indexOf(all, marker)
    require(at >= 0, "DAP4: no </Dataset> in the response DMR part")
    // The DMR/data separator is exactly ONE CRLF (DAP4 spec §9.3).  A
    // serialized DMR may itself end with a trailing newline
    // ("</Dataset>\n" — our encoder and TDS both emit it); that byte is
    // DMR text, not separator.  Consume at most [optional '\n'] + CRLF,
    // never more: packed little-endian data legitimately starts with
    // 0x0A/0x0D bytes (Int8 values 10/13, float fractions) and a greedy
    // skip would shift the stream and fail every checksum downstream.
    var sep = at + marker.length
    if (sep < all.length && all(sep) == '\n') sep += 1
    require(sep + 2 <= all.length && all(sep) == '\r' && all(sep + 1) == '\n',
      "DAP4: missing CRLF separator between DMR and data")
    val dataStart = sep + 2
    (new String(all, 0, at + marker.length, "UTF-8"),
      java.util.Arrays.copyOfRange(all, dataStart, all.length), order)
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  // --------------------------------------------------------- data decode

  /** Decode the data section: top-level variables in DMR order, each an
    * `n`-element packed atomic array followed by a CRC32 when
    * `checksums` is set (verified — mismatch fails by name). */
  private[graft] def decodeData(dmr: Dmr, data: Array[Byte], order: ByteOrder,
                              checksums: Boolean): Map[String, (DType, AnyRef)] = {
    val buf = ByteBuffer.wrap(data).order(order)
    dmr.vars.map { v =>
      val n = v.dims.map(_._2.toLong).product max 1L
      val eb = TypeBytes(v.dapType)
      require(n * eb <= buf.remaining(),
        s"DAP4: variable ${v.name} needs ${n * eb} bytes, " +
          s"${buf.remaining()} remain")
      val start = buf.position()
      val dt = engineDType(v.dapType)
      val out: AnyRef = dt match {
        case DType.I1 | DType.U1 =>
          val a = new Array[Byte](n.toInt); buf.get(a); a
        case DType.I2 | DType.U2 =>
          val a = new Array[Short](n.toInt)
          var i = 0; while (i < a.length) { a(i) = buf.getShort(); i += 1 }; a
        case DType.I4 | DType.U4 =>
          val a = new Array[Int](n.toInt)
          var i = 0; while (i < a.length) { a(i) = buf.getInt(); i += 1 }; a
        case DType.I8 | DType.U8 =>
          val a = new Array[Long](n.toInt)
          var i = 0; while (i < a.length) { a(i) = buf.getLong(); i += 1 }; a
        case DType.F4 =>
          val a = new Array[Float](n.toInt)
          var i = 0; while (i < a.length) { a(i) = buf.getFloat(); i += 1 }; a
        case DType.F8 =>
          val a = new Array[Double](n.toInt)
          var i = 0; while (i < a.length) { a(i) = buf.getDouble(); i += 1 }; a
      }
      if (checksums) {
        val crc = new java.util.zip.CRC32()
        crc.update(data, start, (n * eb).toInt)
        require(buf.remaining() >= 4,
          s"DAP4: variable ${v.name} checksum missing")
        val got = buf.getInt() & 0xFFFFFFFFL
        require(got == crc.getValue,
          s"DAP4: variable ${v.name} checksum mismatch " +
            f"(got 0x$got%08x, computed 0x${crc.getValue}%08x)")
      }
      v.name -> (dt, out)
    }.toMap
  }

  private def httpGet(url: String): Array[Byte] = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    try {
      require(conn.getResponseCode == 200,
        s"GET $url -> ${conn.getResponseCode}")
      val in = conn.getInputStream
      try in.readAllBytes() finally in.close()
    } finally conn.disconnect()
  }

  /** Open a DAP4 dataset URL as a Fragment (the `.dmr` metadata is
    * authoritative for dims/attrs; the `.dap` response DMR must agree on
    * the variable inventory). Like the DAP2 path, opendap data is never
    * copied to local files (openers.py:229-238). */
  def read(url: String): Fragment = read(url, Map.empty[String, Hyperslab])

  /** Constrained open: render the dimension-keyed `region` as a
    * `dap4.ce` projection list so the server returns only the
    * requested hyperslabs (lazy index-space subsetting — the
    * xarray/netCDF4 behavior the reference's opendap path inherits).
    * The response DMR must carry exactly the CONSTRAINED shapes; any
    * disagreement is a named protocol error. */
  def read(url: String, region: Map[String, Hyperslab]): Fragment = {
    val dmr = parseDmr(new String(httpGet(url + ".dmr"), "UTF-8"))
    val ceSuffix =
      if (region.isEmpty) ""
      else "&dap4.ce=" + java.net.URLEncoder.encode(
        Constraint.dap4Ce(dmr.vars.map(v => v.name -> v.dims), region),
        "UTF-8")
    val (respDmrText, data, order) =
      deframe(httpGet(url + ".dap?dap4.checksum=true" + ceSuffix))
    val respDmr = parseDmr(respDmrText)
    require(respDmr.vars.map(_.name).toSet == dmr.vars.map(_.name).toSet,
      "DAP4: .dap response DMR names different variables than .dmr")
    // per-variable dims AFTER the region is applied — what the server
    // must echo back in the response DMR
    def slicedDims(v: DmrVar): Vector[(String, Int)] =
      v.dims.map { case (d, n) =>
        (d, region.get(d).map(_.length).getOrElse(n)) }
    // Values are decoded with the RESPONSE DMR's types/shapes but wrapped
    // in NDArrays built from the .dmr dims — a disagreement must be a
    // named protocol error, not a size/type mismatch downstream.
    val respByName = respDmr.vars.map(v => v.name -> v).toMap
    dmr.vars.foreach { v =>
      val r = respByName(v.name)
      require(r.dapType == v.dapType,
        s"DAP4: variable ${v.name} type differs between .dmr " +
          s"(${v.dapType}) and .dap response DMR (${r.dapType})")
      val want = slicedDims(v).map(_._2)
      require(r.dims.map(_._2) == want,
        s"DAP4: variable ${v.name} shape differs: expected " +
          s"${want.mkString("x")} (constrained .dmr), .dap response DMR " +
          s"has ${r.dims.map(_._2).mkString("x")}")
    }
    val values = decodeData(respDmr, data, order, checksums = true)
    val vars: Map[String, Variable] = dmr.vars.map { v =>
      val (dt, arr) = values(v.name)
      val dims = slicedDims(v)
      v.name -> Variable(dims.map(_._1), NDArray(dt, dims.map(_._2), arr),
        v.attrs)
    }.toMap
    val (coords, dataVars) = vars.partition { case (n, v) => v.dims == Vector(n) }
    val fragDims = dmr.dims.map { case (d, n) =>
      (d, region.get(d).map(_.length).getOrElse(n)) }.toMap
    Fragment(fragDims, coords, dataVars, dmr.attrs)
  }

  // ----------------------------------------------------- server encoding

  /** Render a Fragment as the two DAP4 documents — the test-server twin
    * of [[read]] (the [[Dap2.encode]] pattern): the `.dmr` XML and the
    * chunked `.dap` body (response DMR + CRLF + packed big-endian data,
    * checksums per `withChecksums`), framed as `chunkSize`-byte chunks
    * so multi-chunk reassembly is exercised. */
  def encode(f: Fragment, datasetName: String, withChecksums: Boolean = true,
             chunkSize: Int = 4096): (String, Array[Byte]) = {
    val names = f.coords.keys.toVector.sorted ++ f.dataVars.keys.toVector.sorted
    def varOf(n: String): Variable = (f.coords ++ f.dataVars)(n)
    def xmlEscape(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
    def attrXml(attrs: Attrs, indent: String): String =
      attrs.toVector.sortBy(_._1).map { case (k, v) =>
        val (t, vals) = v match {
          case AttrValue.AStr(s) => ("String", Vector(s))
          case AttrValue.ANum(d) => ("Float64", Vector(d.toString))
          case AttrValue.AInt(l) => ("Int64", Vector(l.toString))
          case AttrValue.ABool(b) => ("String", Vector(b.toString))
          case AttrValue.AList(xs) => ("String", xs.map {
            case AttrValue.AStr(v) => v
            case AttrValue.ANum(v) => v.toString
            case AttrValue.AInt(v) => v.toString
            case AttrValue.ABool(v) => v.toString
            case AttrValue.AList(_) | AttrValue.ANull => ""
          })
          case AttrValue.ANull => ("String", Vector.empty[String])
        }
        s"""$indent<Attribute name="${xmlEscape(k)}" type="$t">\n""" +
          vals.map(x => s"$indent  <Value>${xmlEscape(x)}</Value>\n").mkString +
          s"$indent</Attribute>\n"
      }.mkString
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append(s"""<Dataset xmlns="http://xml.opendap.org/ns/DAP/4.0#" """ +
      s"""dapVersion="4.0" dmrVersion="1.0" name="${xmlEscape(datasetName)}">\n""")
    f.dims.toVector.sortBy(_._1).foreach { case (d, n) =>
      sb.append(s"""  <Dimension name="${xmlEscape(d)}" size="$n"/>\n""")
    }
    names.foreach { n =>
      val v = varOf(n)
      sb.append(s"""  <${dapType(v.dtype)} name="${xmlEscape(n)}">\n""")
      v.dims.foreach(d => sb.append(s"""    <Dim name="/${xmlEscape(d)}"/>\n"""))
      sb.append(attrXml(v.attrs, "    "))
      sb.append(s"  </${dapType(v.dtype)}>\n")
    }
    sb.append(attrXml(f.attrs, "  "))
    sb.append("</Dataset>\n")
    val dmr = sb.toString

    // data section: big-endian packed atomics (+ per-variable CRC32)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(dmr.getBytes("UTF-8"))
    bos.write('\r'); bos.write('\n')
    names.foreach { n =>
      val v = varOf(n)
      val eb = TypeBytes(dapType(v.dtype))
      val b = ByteBuffer.allocate(v.data.size * eb).order(ByteOrder.BIG_ENDIAN)
      var i = 0
      while (i < v.data.size) {
        v.dtype match {
          case DType.I1 | DType.U1 => b.put(v.data.getLong(i).toByte)
          case DType.I2 | DType.U2 => b.putShort(v.data.getLong(i).toShort)
          case DType.I4 | DType.U4 => b.putInt(v.data.getLong(i).toInt)
          case DType.I8 | DType.U8 => b.putLong(v.data.getLong(i))
          case DType.F4 => b.putFloat(v.data.getDouble(i).toFloat)
          case DType.F8 => b.putDouble(v.data.getDouble(i))
        }
        i += 1
      }
      bos.write(b.array())
      if (withChecksums) {
        val crc = new java.util.zip.CRC32()
        crc.update(b.array())
        val cb = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        cb.putInt(crc.getValue.toInt)
        bos.write(cb.array())
      }
    }
    val body = bos.toByteArray
    // frame into chunks
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < body.length || pos == 0) {
      val len = math.min(chunkSize, body.length - pos)
      val lastChunk = pos + len >= body.length
      val hdr = ((if (lastChunk) FlagLast else 0) << 24) | len
      out.write(hdr >>> 24); out.write((hdr >>> 16) & 0xFF)
      out.write((hdr >>> 8) & 0xFF); out.write(hdr & 0xFF)
      out.write(body, pos, len)
      pos += len
      if (lastChunk) pos = body.length + 1
    }
    (dmr, out.toByteArray)
  }
}
