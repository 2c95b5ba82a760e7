package graft.dap

import graft.core._
import graft.core.Attrs.Attrs
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM OPeNDAP (DAP2) client + server-side encoder — the reference's
  * opendap input path (openers.py:83-86 routes file_type="opendap" to
  * xarray's netcdf4 engine over a DAP URL; pattern fixture at
  * patterns.py:142-146). Implemented from the public DAP 2.0 protocol
  * specification (ESE-RFC-004): a dataset is served as three documents —
  *
  *   <url>.dds   dataset descriptor (types + shapes, text)
  *   <url>.das   attributes (text)
  *   <url>.dods  DDS text + "Data:" + XDR-encoded array values
  *
  * Supported types: Byte, Int16, UInt16, Int32, UInt32, Float32, Float64
  * atomic arrays and Grid constructors (the netCDF-over-DAP shape).
  * DAP2 has no 64-bit integer type (protocol limitation) — int64 data
  * must travel as Float64, like public OPeNDAP servers do.
  */
object Dap2 {

  // ------------------------------------------------------------ DDS model

  final case class DdsArray(dapType: String, name: String,
                            dims: Vector[(String, Int)])
  /** A top-level DDS declaration: an atomic array or a Grid (array+maps). */
  final case class DdsVar(array: DdsArray, maps: Vector[DdsArray],
                          isGrid: Boolean)
  final case class Dds(name: String, vars: Vector[DdsVar])

  private def elemBytes(t: String): Int = t match {
    case "Byte" => 1 // XDR-padded on the wire
    case "Int16" | "UInt16" | "Int32" | "UInt32" | "Float32" => 4
    case "Float64" => 8
    case other => throw new UnsupportedOperationException(s"DAP2 type $other")
  }

  private def engineDType(t: String): DType = t match {
    case "Byte" => DType.U1 // DAP2 Byte is unsigned 8-bit
    case "Int16" => DType.I2
    case "UInt16" => DType.U2
    case "Int32" => DType.I4
    case "UInt32" => DType.U4
    case "Float32" => DType.F4
    case "Float64" => DType.F8
    case other => throw new UnsupportedOperationException(s"DAP2 type $other")
  }

  private def dapType(d: DType): String = d match {
    case DType.U1 => "Byte"
    case DType.I1 => "Int16" // DAP2 has no signed byte; value-preserving
    case DType.I2 => "Int16"
    case DType.U2 => "UInt16"
    case DType.I4 => "Int32"
    case DType.U4 => "UInt32"
    case DType.F4 => "Float32"
    case DType.F8 => "Float64"
    case DType.I8 | DType.U8 | DType.M8ns => throw new IllegalArgumentException(
      "DAP2 has no 64-bit integer type; encode int64 as Float64 or int32 " +
        "(CF time encodings fit int32)")
  }

  // ------------------------------------------------------------ DDS parse

  /** Tolerant recursive-descent parse of the DDS subset netCDF servers
    * emit: atomic array declarations and Grid constructors. */
  def parseDds(text: String): Dds = {
    val tokens = text.replace("{", " { ").replace("}", " } ")
      .replace(";", " ; ").replace("[", " [ ").replace("]", " ] ")
      .replace("=", " = ").split("\\s+").filter(_.nonEmpty).toList

    def parseArray(ts: List[String]): (DdsArray, List[String]) = {
      val dapT = ts.head
      val name = ts.tail.head
      var rest = ts.drop(2)
      val dims = Vector.newBuilder[(String, Int)]
      while (rest.headOption.contains("[")) {
        // [name = N] or [N]
        rest = rest.tail
        if (rest.tail.headOption.contains("=")) {
          dims += ((rest.head, rest.drop(2).head.toInt))
          rest = rest.drop(3)
        } else {
          dims += (("", rest.head.toInt))
          rest = rest.tail
        }
        require(rest.head == "]", s"bad DDS array decl near $rest")
        rest = rest.tail
      }
      require(rest.head == ";", s"expected ; near $rest")
      (DdsArray(dapT, name, dims.result()), rest.tail)
    }

    def parseVar(ts: List[String]): (DdsVar, List[String]) = ts match {
      case "Grid" :: "{" :: rest0 =>
        require(rest0.head == "ARRAY:" || rest0.head == "Array:",
          s"Grid without Array near ${rest0.take(3)}")
        val (arr, rest1) = parseArray(rest0.tail)
        require(rest1.head == "MAPS:" || rest1.head == "Maps:",
          s"Grid without Maps near ${rest1.take(3)}")
        var rest = rest1.tail
        val maps = Vector.newBuilder[DdsArray]
        while (rest.head != "}") {
          val (m, r2) = parseArray(rest); maps += m; rest = r2
        }
        // } name ;
        val name = rest.tail.head
        (DdsVar(arr.copy(name = name), maps.result(), isGrid = true),
          rest.drop(2).dropWhile(_ == ";"))
      case _ =>
        val (arr, rest) = parseArray(ts)
        (DdsVar(arr, Vector.empty, isGrid = false), rest)
    }

    require(tokens.headOption.contains("Dataset") && tokens.tail.headOption.contains("{"),
      "not a DDS document")
    var rest = tokens.drop(2)
    val vars = Vector.newBuilder[DdsVar]
    while (rest.head != "}") {
      val (v, r2) = parseVar(rest); vars += v; rest = r2
    }
    val dsName = rest.tail.head
    Dds(dsName.stripSuffix(";"), vars.result())
  }

  // ------------------------------------------------------------ DAS parse

  /** Parse the DAS attribute document into per-variable attr maps;
    * "NC_GLOBAL" (or "GLOBAL") carries dataset attrs. Quoted values may
    * contain ';', '}' and escaped quotes (CF history attrs routinely do),
    * so both the block and line patterns treat quoted strings atomically. */
  def parseDas(text: String): Map[String, Attrs] = {
    val out = scala.collection.mutable.Map.empty[String, Attrs]
    val body = text.trim.stripPrefix("Attributes").trim
      .stripPrefix("{").stripSuffix("}")
    val qstr = """"(?:[^"\\]|\\.)*""""
    val varPattern = s"""(?s)([\\w.%-]+)\\s*\\{((?:$qstr|[^}])*)\\}""".r
    varPattern.findAllMatchIn(body).foreach { m =>
      val vname = m.group(1)
      val attrs = scala.collection.mutable.Map.empty[String, AttrValue]
      val linePattern = s"""(\\w+)\\s+([\\w.%-]+)\\s+($qstr|[^;]+);""".r
      linePattern.findAllMatchIn(m.group(2)).foreach { am =>
        val (t, name, raw) = (am.group(1), am.group(2), am.group(3).trim)
        val v: AttrValue = t match {
          case "String" | "Url" =>
            AttrValue.AStr(raw.stripPrefix("\"").stripSuffix("\"")
              .replace("\\\"", "\"").replace("\\\\", "\\"))
          case "Byte" | "Int16" | "UInt16" | "Int32" | "UInt32" =>
            val parts = raw.split(",\\s*").map(_.trim.toLong)
            if (parts.length == 1) AttrValue.AInt(parts.head)
            else AttrValue.AList(parts.toVector.map(AttrValue.AInt))
          case "Float32" | "Float64" =>
            val parts = raw.split(",\\s*").map(_.trim.toDouble)
            if (parts.length == 1) AttrValue.ANum(parts.head)
            else AttrValue.AList(parts.toVector.map(AttrValue.ANum))
          case _ => AttrValue.AStr(raw)
        }
        attrs(name) = v
      }
      out(vname) = attrs.toMap
    }
    out.toMap
  }

  // ----------------------------------------------------------- XDR decode

  private final class Xdr(buf: ByteBuffer) {
    def decodeArray(t: String, n: Int): NDArray1 = {
      // XDR array: element count transmitted twice (DAP2 convention)
      val c1 = buf.getInt(); val c2 = buf.getInt()
      require(c1 == n && c2 == n, s"XDR count $c1/$c2 != declared $n")
      t match {
        case "Byte" => // unsigned 8-bit, XDR-packed
          val a = new Array[Byte](n)
          buf.get(a)
          // pad to 4-byte boundary
          val pad = (4 - (n % 4)) % 4
          buf.position(buf.position() + pad)
          NDArray1(DType.U1, a)
        case "Int16" => // 4 bytes on the wire, int16 in the model
          val a = new Array[Short](n)
          var i = 0
          while (i < n) { a(i) = buf.getInt().toShort; i += 1 }
          NDArray1(DType.I2, a)
        case "Int32" =>
          val a = new Array[Int](n)
          var i = 0
          while (i < n) { a(i) = buf.getInt(); i += 1 }
          NDArray1(DType.I4, a)
        case "UInt16" =>
          val a = new Array[Short](n)
          var i = 0
          while (i < n) { a(i) = (buf.getInt() & 0xFFFF).toShort; i += 1 }
          NDArray1(DType.U2, a)
        case "UInt32" =>
          val a = new Array[Int](n)
          var i = 0
          while (i < n) { a(i) = buf.getInt(); i += 1 }
          NDArray1(DType.U4, a)
        case "Float32" =>
          val a = new Array[Float](n)
          var i = 0
          while (i < n) { a(i) = buf.getFloat(); i += 1 }
          NDArray1(DType.F4, a)
        case "Float64" =>
          val a = new Array[Double](n)
          var i = 0
          while (i < n) { a(i) = buf.getDouble(); i += 1 }
          NDArray1(DType.F8, a)
        case other => throw new UnsupportedOperationException(s"DAP2 type $other")
      }
    }
  }

  final case class NDArray1(dtype: DType, data: AnyRef)

  /** Decode a complete .dods response (DDS header + XDR payload). */
  def parseDods(bytes: Array[Byte]): (Dds, Map[String, (DType, AnyRef)]) = {
    // split at the "Data:\n" marker
    val marker = "\nData:\n".getBytes("ASCII")
    val idx = indexOf(bytes, marker)
    require(idx >= 0, "no Data: marker in .dods response")
    val dds = parseDds(new String(bytes, 0, idx, "UTF-8"))
    val xdr = new Xdr(ByteBuffer.wrap(bytes, idx + marker.length,
      bytes.length - idx - marker.length).order(ByteOrder.BIG_ENDIAN))
    val values = scala.collection.mutable.Map.empty[String, (DType, AnyRef)]
    dds.vars.foreach { v =>
      val n = v.array.dims.map(_._2).product
      val arr = xdr.decodeArray(v.array.dapType, n)
      values(v.array.name) = (arr.dtype, arr.data)
      v.maps.foreach { m =>
        if (!values.contains(m.name)) {
          val mv = xdr.decodeArray(m.dapType, m.dims.map(_._2).product)
          values(m.name) = (mv.dtype, mv.data)
        } else {
          // maps repeat per grid: decode and discard duplicates
          xdr.decodeArray(m.dapType, m.dims.map(_._2).product)
        }
      }
    }
    (dds, values.toMap)
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

  // ------------------------------------------------------------- client

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

  /** Open a DAP2 dataset URL as a Fragment: fetch .dods (authoritative
    * types + values) and .das (attributes), resolve dims from the DDS
    * declarations. The opendap FileType deliberately skips the local
    * cache (openers.py:229-238: "loading data from an opendap endpoint"
    * is never copied to local files). */
  def read(url: String): Fragment = {
    val (dds, values) = parseDods(httpGet(url + ".dods"))
    assemble(dds, values,
      parseDas(new String(httpGet(url + ".das"), "UTF-8")))
  }

  /** Constrained open: fetch the (cheap) `.dds` for shapes, render the
    * dimension-keyed `region` as hyperslab projections, and fetch
    * `.dods?<ce>` — the server returns ONLY the requested elements
    * (the xarray/netCDF4 lazy-subsetting behavior the reference's
    * opendap path inherits, openers.py:40-47). The response DDS
    * carries the constrained shapes, which [[assemble]] verifies
    * against the request. */
  def read(url: String, region: Map[String, Hyperslab]): Fragment = {
    if (region.isEmpty) return read(url)
    val dds = parseDds(new String(httpGet(url + ".dds"), "UTF-8"))
    val ce = Constraint.dap2Ce(dds, region)
    val enc = java.net.URLEncoder.encode(ce, "UTF-8")
    val (rdds, values) = parseDods(httpGet(url + ".dods?" + enc))
    // the server honored the hyperslabs: every constrained dim in the
    // response is exactly the requested length
    (rdds.vars.map(_.array) ++ rdds.vars.flatMap(_.maps)).foreach { a =>
      a.dims.foreach { case (d, n) =>
        region.get(d).foreach(slab => require(n == slab.length,
          s"DAP2: server returned $d=$n for ${a.name}, " +
            s"requested ${slab.render} (${slab.length})"))
      }
    }
    assemble(rdds, values,
      parseDas(new String(httpGet(url + ".das"), "UTF-8")))
  }

  private def assemble(dds: Dds, values: Map[String, (DType, AnyRef)],
                       das: Map[String, Attrs]): Fragment = {
    val globalAttrs = das.getOrElse("NC_GLOBAL", das.getOrElse("GLOBAL", Attrs.empty))
    val dims = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    dds.vars.foreach { v =>
      (v.array.dims ++ v.maps.flatMap(_.dims)).foreach { case (d, n) =>
        if (d.nonEmpty) dims(d) = n
      }
    }
    val allArrays: Vector[DdsArray] =
      (dds.vars.map(_.array) ++ dds.vars.flatMap(_.maps)).distinctBy(_.name)
    val vars: Map[String, Variable] = allArrays.map { a =>
      val (dt, data) = values(a.name)
      val shape = a.dims.map(_._2)
      val dimNames = a.dims.zipWithIndex.map { case ((d, _), i) =>
        if (d.nonEmpty) d else s"dim_$i" }
      a.name -> Variable(dimNames, NDArray(dt, shape, data),
        das.getOrElse(a.name, Attrs.empty))
    }.toMap
    val (coords, dataVars) = vars.partition { case (n, v) => v.dims == Vector(n) }
    Fragment(dims.toMap, coords, dataVars, globalAttrs)
  }

  // ----------------------------------------------------- server encoding

  /** Render a Fragment as the three DAP2 documents — the test-server twin
    * of `read` (a real deployment would point at any public OPeNDAP
    * server instead). Data vars are served as Grids with coordinate maps,
    * coords as atomic arrays, matching netCDF-over-DAP servers. */
  def encode(f: Fragment, datasetName: String): (String, String, Array[Byte]) = {
    val coordNames = f.coords.keys.toVector.sorted
    val varNames = f.dataVars.keys.toVector.sorted

    def arrayDecl(name: String, v: Variable, indent: String): String = {
      val dims = v.dims.zip(v.shape).map { case (d, n) => s"[$d = $n]" }.mkString
      s"$indent${dapType(v.dtype)} $name$dims;"
    }

    val decls = coordNames.map(n => arrayDecl(n, f.coords(n), "    ")) ++
      varNames.map { n =>
        val v = f.dataVars(n)
        val maps = v.dims.filter(f.coords.contains).map(d =>
          arrayDecl(d, f.coords(d), "        ")).mkString("\n")
        s"""    Grid {
           |      Array:
           |${arrayDecl(n, v, "        ")}
           |      Maps:
           |$maps
           |    } $n;""".stripMargin
      }
    val dds = s"Dataset {\n${decls.mkString("\n")}\n} $datasetName;\n"

    def attrLines(attrs: Attrs, indent: String): String =
      attrs.toSeq.sortBy(_._1).map { case (k, v) =>
        v match {
          case AttrValue.AStr(s) =>
            s"""$indent String $k "${s.replace("\\", "\\\\").replace("\"", "\\\"")}";"""
          case AttrValue.AInt(l) => s"$indent Int32 $k $l;"
          case AttrValue.ANum(d) => s"$indent Float64 $k $d;"
          case AttrValue.ABool(b) => s"$indent Int32 $k ${if (b) 1 else 0};"
          case AttrValue.AList(xs) if xs.forall(_.isInstanceOf[AttrValue.AInt]) =>
            s"$indent Int32 $k ${xs.collect { case AttrValue.AInt(l) => l }.mkString(", ")};"
          case AttrValue.AList(xs) =>
            s"$indent Float64 $k ${xs.collect {
              case AttrValue.ANum(d) => d.toString
              case AttrValue.AInt(l) => l.toString }.mkString(", ")};"
          case AttrValue.ANull => s"""$indent String $k "";"""
        }
      }.mkString("\n")

    val dasBlocks =
      (Seq("NC_GLOBAL" -> f.attrs) ++
        (coordNames.map(n => n -> f.coords(n).attrs) ++
          varNames.map(n => n -> f.dataVars(n).attrs))).collect {
        case (n, attrs) if attrs.nonEmpty || n == "NC_GLOBAL" =>
          s"    $n {\n${attrLines(attrs, "       ")}\n    }"
      }
    val das = s"Attributes {\n${dasBlocks.mkString("\n")}\n}\n"

    // .dods: DDS + Data: + XDR in declaration order (maps re-sent per grid)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(dds.getBytes("UTF-8"))
    bos.write("\nData:\n".getBytes("ASCII"))
    def writeXdr(v: Variable): Unit = {
      val n = v.data.size
      val t = dapType(v.dtype)
      val pad = if (t == "Byte") (4 - (n % 4)) % 4 else 0
      val b = ByteBuffer.allocate(8 + n * elemBytes(t) + pad)
        .order(ByteOrder.BIG_ENDIAN)
      b.putInt(n); b.putInt(n)
      v.data.data match {
        case a: Array[Byte] if t == "Byte" => b.put(a) // XDR-packed + pad
        case a: Array[Byte] => // signed i1 promoted to Int16 on the wire
          a.foreach(x => b.putInt(x.toInt))
        case a: Array[Short] =>
          if (v.dtype == DType.U2) a.foreach(x => b.putInt(x & 0xFFFF))
          else a.foreach(x => b.putInt(x.toInt))
        case a: Array[Int] => a.foreach(b.putInt)
        case a: Array[Float] => a.foreach(b.putFloat)
        case a: Array[Double] => a.foreach(b.putDouble)
        case _: Array[Long] => throw new IllegalArgumentException(
          "DAP2 has no 64-bit integer type")
      }
      bos.write(b.array())
    }
    coordNames.foreach(n => writeXdr(f.coords(n)))
    varNames.foreach { n =>
      writeXdr(f.dataVars(n))
      f.dataVars(n).dims.filter(f.coords.contains).foreach(d => writeXdr(f.coords(d)))
    }
    (dds, das, bos.toByteArray)
  }
}
