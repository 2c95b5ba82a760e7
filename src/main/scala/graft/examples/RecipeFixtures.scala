package graft.examples

import graft.core.Fragment
import graft.zarr.ZarrGroup
import java.nio.file.{Files, Paths}

/** Shared fixture writers for recipe integration checks — used by both the
  * driver-checked `e2e_bake_cli` entry and `BakeSpec`, so the zarr-fragment
  * and runner-config emitters cannot drift apart. */
object RecipeFixtures {

  def writeZarrFragment(f: Fragment, path: String): Unit = {
    val g = ZarrGroup(path)
    g.initGroup(f.attrs)
    f.allVars.foreach { case (name, v) =>
      g.createArray(name, v.shape, v.shape, v.dtype, v.attrs,
        dimensionNames = Some(v.dims))
      g.writeRegion(name, Vector.fill(v.data.ndim)(0), v.data)
    }
  }

  /** Runner-config JSON (the `examples/runner-config/local.json` shape). */
  def writeConfig(path: String,
                  sections: (String, Seq[(String, String)])*): String = {
    val json = sections.map { case (name, kvs) =>
      "\"" + name + "\": {" +
        kvs.map { case (k, v) => "\"" + k + "\": \"" + v + "\"" }.mkString(", ") +
        "}"
    }.mkString("{", ", ", "}")
    Files.writeString(Paths.get(path), json)
    path
  }

  /** Recursive delete for the temp trees bake checks generate. */
  def deleteRecursively(root: String): Unit = {
    val p = Paths.get(root)
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toVector.reverse
        .foreach(q => Files.deleteIfExists(q))
    }
  }
}
