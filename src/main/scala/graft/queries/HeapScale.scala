package graft.queries

import graft.core._

/** Measurement main for the dense-HDF5 big-group path (SCALE_r12 §4):
  * writes groups of N links at libhdf5-like heap geometry (512-byte
  * starting blocks, 4 KiB max direct blocks — the regime where the
  * doubling table NESTS past a few thousand links) and times the full
  * read back, verifying link-count + spot values so the timing measures
  * a correct walk.
  *
  * Usage: sbt "runMain graft.queries.HeapScale [1000 5000 20000]"
  */
object HeapScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(1000, 5000, 20000)
    val dir = java.nio.file.Files.createTempDirectory("graft_heapscale").toString
    sizes.foreach { n =>
      val vars = (0 until n).map { i =>
        f"member_$i%06d" -> Variable(Vector("p"),
          NDArray(DType.I4, Vector(2), Array(i, i * 7)),
          Map("idx" -> AttrValue(i.toLong)))
      }.toMap
      val f = Fragment(
        dims = Map("p" -> 2),
        coords = Map("p" -> Variable(Vector("p"),
          NDArray(DType.I4, Vector(2), Array(0, 1)), Map.empty)),
        dataVars = vars, attrs = Map.empty)
      val path = s"$dir/links_$n.h5"
      val t0 = System.nanoTime()
      graft.hdf5.HDF5Writer.write(path, f, denseRootLinks = true,
        denseStartBlockSize = 512L, denseMaxDirectBlockSize = 4096L)
      val tw = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val back = graft.hdf5.HDF5.read(path)
      val tr = (System.nanoTime() - t1) / 1e9
      require(back.dataVars.size == n, s"$n links: read ${back.dataVars.size}")
      require(back.dataVars(f"member_${n / 2}%06d").data.getLong(1) == (n / 2) * 7L,
        "spot value mismatch")
      val bytes = java.nio.file.Files.size(java.nio.file.Paths.get(path))
      val fhib = {
        val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
        var c = 0; var i = 0
        while (i <= b.length - 4) {
          if (b(i) == 'F' && b(i + 1) == 'H' && b(i + 2) == 'I' && b(i + 3) == 'B') c += 1
          i += 1
        }
        c
      }
      println(f"""{"metric":"heap_scale","links":$n,"file_bytes":$bytes,""" +
        f""""fhib_blocks":$fhib,"write_sec":$tw%.2f,"read_sec":$tr%.2f}""")
    }
  }
}
