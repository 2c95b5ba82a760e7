package graft.hdf5

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import java.nio.file.Files

/** Writer/reader round trips over the netCDF-4 HDF5 layout (superblock v0,
  * symbol tables, dimension scales, DIMENSION_LIST via global heap, chunked
  * B-tree v1 storage, deflate). */
class Hdf5Spec extends AnyFunSuite {

  private def dir = Files.createTempDirectory("graft_h5").toString

  private def cube(nt: Int = 6, ny: Int = 5, nx: Int = 4): Fragment = {
    val rng = new scala.util.Random(5)
    Fragment(
      dims = Map("time" -> nt, "lat" -> ny, "lon" -> nx),
      coords = Map(
        "time" -> Variable(Vector("time"),
          NDArray(DType.I8, Vector(nt), (0 until nt).map(_.toLong * 86400).toArray),
          Map("units" -> AttrValue("seconds since 2020-01-01"))),
        "lat" -> Variable(Vector("lat"),
          NDArray(DType.F8, Vector(ny), (0 until ny).map(i => -80.0 + 10 * i).toArray)),
        "lon" -> Variable(Vector("lon"),
          NDArray(DType.F8, Vector(nx), (0 until nx).map(i => 5.0 + 10 * i).toArray))),
      dataVars = Map(
        "foo" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.F8, Vector(nt, ny, nx),
            Array.fill(nt * ny * nx)(rng.nextDouble())),
          Map("long_name" -> AttrValue("Fantastic Foo"),
            "scale" -> AttrValue(2.5))),
        "bar" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.I4, Vector(nt, ny, nx),
            Array.fill(nt * ny * nx)(rng.nextInt(100))),
          Map("long_name" -> AttrValue("Beautiful Bar")))),
      attrs = Map("conventions" -> AttrValue("CF 1.6"),
        "version" -> AttrValue(3L)))
  }

  test("contiguous round trip with dimension scales and attrs") {
    val f = cube()
    val path = s"$dir/contig.nc"
    HDF5Writer.write(path, f)
    val back = HDF5.read(path)
    assert(back.sameAs(f), "fragment mismatch")
    assert(back.attrs == f.attrs)
    assert(back.dataVars("foo").attrs == f.dataVars("foo").attrs)
    assert(back.coords("time").attrs == f.coords("time").attrs)
  }

  test("chunked round trip with edge chunks") {
    val f = cube(nt = 10)
    val path = s"$dir/chunked.nc"
    HDF5Writer.write(path, f, chunks = Map(
      "foo" -> Vector(3, 5, 4), // 3 does not divide 10: edge chunk
      "bar" -> Vector(4, 2, 3)))
    val back = HDF5.read(path)
    assert(back.sameAs(f))
  }

  test("deflate round trip") {
    val f = cube(nt = 8)
    val path = s"$dir/deflate.nc"
    HDF5Writer.write(path, f, chunks = Map(
      "foo" -> Vector(2, 5, 4), "bar" -> Vector(8, 5, 4)),
      deflateLevel = Some(4))
    val back = HDF5.read(path)
    assert(back.sameAs(f))
    // compression actually happened: file smaller than raw would be
    val raw = 2L * 8 * 5 * 4 * 8
    assert(Files.size(java.nio.file.Paths.get(path)) > 0)
  }

  test("shuffle + deflate round trip and kerchunk scan (libnetcdf default)") {
    import graft.kerchunk.RefSet
    import graft.zarr.ZarrGroup
    val f = cube(nt = 8)
    val d0 = dir
    val path = s"$d0/shuffled.nc"
    HDF5Writer.write(path, f, chunks = Map(
      "foo" -> Vector(4, 5, 4), "bar" -> Vector(8, 5, 4)),
      deflateLevel = Some(4), shuffle = true)
    assert(HDF5.read(path).sameAs(f))
    // scanned refs carry shuffle+zlib codecs and decode in place
    val virt = s"$d0/virt.zarr"
    RefSet.scanHdf5(path).materialize(virt)
    assert(ZarrGroup(virt).readFragment().sameAs(f))
  }

  test("phantom dimension (no coordinate variable) survives") {
    val f0 = cube()
    val f = f0.copy(coords = f0.coords - "lon")
    val path = s"$dir/phantom.nc"
    HDF5Writer.write(path, f)
    val back = HDF5.read(path)
    assert(back.dims == f.dims)
    assert(back.coords.keySet == Set("time", "lat"))
    assert(back.dataVars("foo").dims == Vector("time", "lat", "lon"))
    assert(back.sameAs(f))
  }

  test("signature and refusal of non-HDF5 input") {
    val path = s"$dir/not_h5.nc"
    Files.write(java.nio.file.Paths.get(path), "CDF garbage".getBytes)
    val e = intercept[IllegalArgumentException](HDF5.read(path))
    assert(e.getMessage.contains("not an HDF5 file"))
  }

  test("kerchunk scan: chunk refs materialize and read back equal") {
    import graft.kerchunk.RefSet
    import graft.zarr.ZarrGroup
    val f = cube(nt = 10)
    val d0 = dir
    val path = s"$d0/scan.nc"
    HDF5Writer.write(path, f, chunks = Map(
      "foo" -> Vector(3, 5, 4), "bar" -> Vector(5, 5, 4)),
      deflateLevel = Some(5))
    val rs = RefSet.scanHdf5(path)
    // per-chunk refs: foo has ceil(10/3)=4 time chunks
    assert(rs.keys.count(_.startsWith("foo/c/")) == 4)
    // json artifact round-trips (inline + pointer refs)
    val back = RefSet.fromJson(RefSet.toJson(rs))
    assert(back.keys == rs.keys)
    val virt = s"$d0/virt.zarr"
    back.materialize(virt)
    val got = ZarrGroup(virt).readFragment()
    assert(got.sameAs(f))
    assert(got.attrs == f.attrs)
  }

  test("kerchunk scan refs concatenate along time") {
    import graft.kerchunk.RefSet
    import graft.zarr.ZarrGroup
    val d0 = dir
    val full = cube(nt = 6)
    val files = (0 until 6 by 2).map { t0 =>
      val slab = full.isel(Map("time" -> Slc(t0, t0 + 2)))
      val p = s"$d0/slab_$t0.nc"
      HDF5Writer.write(p, slab, chunks = Map(
        "foo" -> Vector(1, 5, 4), "bar" -> Vector(2, 5, 4)))
      p
    }.toVector
    val refs = files.map(RefSet.scanHdf5(_))
    val combined = RefSet.concatRefSets(refs, "time",
      identicalDims = Vector("lat", "lon"))
    val virt = s"$d0/cat.zarr"
    combined.materialize(virt)
    assert(ZarrGroup(virt).readFragment().sameAs(full))
  }

  test("float32 and int64 data vars round trip") {
    val f = Fragment(
      dims = Map("n" -> 7),
      coords = Map("n" -> Variable(Vector("n"),
        NDArray(DType.I4, Vector(7), (0 until 7).toArray))),
      dataVars = Map(
        "f4v" -> Variable(Vector("n"),
          NDArray(DType.F4, Vector(7), Array.tabulate(7)(_ * 1.5f))),
        "i8v" -> Variable(Vector("n"),
          NDArray(DType.I8, Vector(7), Array.tabulate(7)(_ * 1L << 40)))),
      attrs = Map.empty)
    val path = s"$dir/types.nc"
    HDF5Writer.write(path, f)
    assert(HDF5.read(path).sameAs(f))
  }
}
