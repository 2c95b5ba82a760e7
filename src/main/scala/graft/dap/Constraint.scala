package graft.dap

import graft.core._

/** DAP hyperslab: inclusive-stop index range with stride — the wire
  * convention of both DAP2 `?var[start:stride:stop]` projections and
  * DAP4 `dap4.ce=/var[start:stride:stop]`. */
final case class Hyperslab(start: Int, stop: Int, stride: Int = 1) {
  require(start >= 0 && stop >= start && stride >= 1,
    s"bad hyperslab [$start:$stride:$stop]")
  def length: Int = (stop - start) / stride + 1
  def render: String =
    if (stride == 1) s"[$start:$stop]" else s"[$start:$stride:$stop]"
}

/** Constraint-expression machinery shared by the DAP2 and DAP4 clients
  * and their test-server twins.
  *
  * The reference's opendap path inherits LAZY index-space subsetting
  * from xarray/netCDF4 (openers.py:40-47 + engine `netcdf4`): a recipe
  * that writes one time slice of a large remote aggregation fetches
  * only that slice. At 100 TB the whole-variable fetch is a bandwidth
  * wall, so the clients here emit server-side hyperslab projections —
  * a dimension-keyed region (the StoreToZarr `_region_for` shape)
  * renders as per-variable bracket projections and the server returns
  * only the requested elements. */
object Constraint {

  /** Validate a dimension-keyed region against declared dims: every
    * key must name a real dimension and every slab must fit it. */
  private def validate(region: Map[String, Hyperslab],
                       dims: Map[String, Int]): Unit =
    region.foreach { case (d, slab) =>
      val n = dims.getOrElse(d, throw new IllegalArgumentException(
        s"constraint names unknown dimension '$d' " +
          s"(dataset dims: ${dims.keys.toVector.sorted.mkString(", ")})"))
      require(slab.stop < n,
        s"constraint $d${slab.render} exceeds dimension size $n")
    }

  /** DAP2 CE (the `?proj,proj,...` query): every DDS array touching a
    * constrained dim is projected with a FULL bracket list (DAP2
    * requires all-or-none); untouched arrays project bare so the
    * response keeps the complete variable inventory. */
  def dap2Ce(dds: Dap2.Dds, region: Map[String, Hyperslab]): String = {
    val declared = dds.vars.flatMap(v =>
      (v.array.dims ++ v.maps.flatMap(_.dims)).filter(_._1.nonEmpty)).toMap
    validate(region, declared)
    dds.vars.map { v =>
      val a = v.array
      if (a.dims.exists { case (d, _) => region.contains(d) })
        a.name + a.dims.map { case (d, n) =>
          region.get(d).map(_.render).getOrElse(s"[0:${n - 1}]")
        }.mkString
      else a.name
    }.mkString(",")
  }

  /** DAP4 CE (the `dap4.ce=` value): `;`-separated projections with
    * rooted names. */
  def dap4Ce(vars: Vector[(String, Vector[(String, Int)])],
             region: Map[String, Hyperslab]): String = {
    val declared = vars.flatMap(_._2).toMap
    validate(region, declared)
    vars.map { case (name, dims) =>
      if (dims.exists { case (d, _) => region.contains(d) })
        "/" + name + dims.map { case (d, n) =>
          region.get(d).map(_.render).getOrElse(s"[0:${n - 1}]")
        }.mkString
      else "/" + name
    }.mkString(";")
  }

  /** Parse the projection list of a CE (`sep` = ',' for DAP2, ';' for
    * DAP4): `name[a:b][c:s:d]...` or a bare `name` (→ empty slab
    * list = whole variable). Leading '/' (DAP4 rooted names) is
    * stripped. Selection clauses (`&...`) are not supported — named
    * error, matching the subset the clients emit. */
  def parseProjections(ce: String, sep: Char)
      : Vector[(String, Vector[Hyperslab])] = {
    require(!ce.contains('&'),
      "DAP selection clauses (&expr) are not supported, projections only")
    ce.split(sep).toVector.filter(_.nonEmpty).map { proj =>
      val bracket = proj.indexOf('[')
      val name0 = (if (bracket < 0) proj else proj.substring(0, bracket)).trim
      val name = if (name0.startsWith("/")) name0.substring(1) else name0
      require(name.nonEmpty, s"empty variable name in constraint '$proj'")
      val slabs =
        if (bracket < 0) Vector.empty[Hyperslab]
        else {
          val spec = proj.substring(bracket)
          require(spec.count(_ == '[') == spec.count(_ == ']'),
            s"unbalanced brackets in constraint '$proj'")
          spec.split(']').toVector.filter(_.nonEmpty).map { part =>
            require(part.startsWith("["),
              s"malformed hyperslab in constraint '$proj'")
            val nums = part.substring(1).split(':')
            require(nums.nonEmpty && nums.length <= 3 &&
              nums.forall(s => s.nonEmpty && s.forall(_.isDigit)),
              s"malformed hyperslab '$part]' in constraint '$proj'")
            nums.map(_.toInt) match {
              case Array(i) => Hyperslab(i, i)
              case Array(a, b) => Hyperslab(a, b)
              case Array(a, s, b) => Hyperslab(a, b, s)
            }
          }
        }
      name -> slabs
    }
  }

  /** Strided rectangular slice (copy); stride-1 slabs take the
    * block-copy fast path. */
  def sliceNd(nd: NDArray, slabs: Vector[Hyperslab]): NDArray = {
    require(slabs.length == nd.ndim,
      s"need ${nd.ndim} hyperslabs, got ${slabs.length}")
    slabs.zip(nd.shape).foreach { case (s, n) =>
      require(s.stop < n, s"hyperslab ${s.render} exceeds dim size $n") }
    if (slabs.forall(_.stride == 1))
      nd.slice(slabs.map(s => Slc(s.start, s.stop + 1)))
    else {
      val outShape = slabs.map(_.length)
      val out = NDArray.alloc(nd.dtype, NDArray.sizeOf(outShape))
      val inStrides = nd.strides
      val total = NDArray.sizeOf(outShape)
      val idx = new Array[Int](outShape.length)
      var i = 0
      while (i < total) {
        var flat = 0
        var d = 0
        while (d < idx.length) {
          flat += (slabs(d).start + idx(d) * slabs(d).stride) * inStrides(d)
          d += 1
        }
        java.lang.reflect.Array.set(out, i,
          java.lang.reflect.Array.get(nd.data, flat))
        var c = idx.length - 1
        var carry = true
        while (c >= 0 && carry) {
          idx(c) += 1
          if (idx(c) == outShape(c)) idx(c) = 0 else carry = false
          c -= 1
        }
        i += 1
      }
      NDArray(nd.dtype, outShape, out)
    }
  }

  /** Server twin: apply parsed CE projections to a Fragment — the
    * subsetting a real OPeNDAP server performs. Projected variables are
    * sliced; coordinates riding along as dims of a projected data var
    * (DAP2 grid maps) are kept and sliced consistently; everything else
    * is dropped. Projections constraining the same dimension must
    * agree — a real server would happily return inconsistent shapes,
    * but the clients here never ask for them. */
  def applyProjections(f: Fragment,
                       projs: Vector[(String, Vector[Hyperslab])]): Fragment = {
    val allVars = f.coords ++ f.dataVars
    // dimension-keyed region implied by the projections
    val region = scala.collection.mutable.Map.empty[String, Hyperslab]
    projs.foreach { case (name, slabs) =>
      val v = allVars.getOrElse(name, throw new IllegalArgumentException(
        s"constraint projects unknown variable '$name'"))
      if (slabs.nonEmpty) {
        require(slabs.length == v.dims.length,
          s"variable $name has ${v.dims.length} dims, " +
            s"constraint gives ${slabs.length} hyperslabs")
        v.dims.zip(slabs).foreach { case (d, s) =>
          region.get(d) match {
            case Some(prev) => require(prev == s,
              s"inconsistent hyperslabs for dimension $d: " +
                s"${prev.render} vs ${s.render}")
            case None => region(d) = s
          }
        }
      }
    }
    val projected = projs.map(_._1).toSet
    val keep = allVars.filter { case (name, v) =>
      projected.contains(name) ||
        // grid maps: coords for the dims of any projected data var
        (f.coords.contains(name) &&
          projs.exists { case (p, _) =>
            f.dataVars.get(p).exists(_.dims.contains(name)) })
    }
    val sliced = keep.map { case (name, v) =>
      val slabs = v.dims.zip(v.data.shape).map { case (d, n) =>
        region.getOrElse(d, Hyperslab(0, n - 1))
      }
      name -> Variable(v.dims, sliceNd(v.data, slabs), v.attrs)
    }
    val dims = sliced.values.flatMap(v => v.dims.zip(v.data.shape)).toMap
    val (coords, dataVars) =
      sliced.partition { case (n, v) => v.dims == Vector(n) }
    Fragment(dims, coords, dataVars, f.attrs)
  }
}
