package graft.patterns

import graft.core.{CombineOp, Dimension, Index, Pos}
import java.security.MessageDigest

/** File source model: an n-dimensional matrix of URLs = outer product of
  * combine dimensions (patterns.py:102-332).
  */
sealed trait CombineDim {
  def name: String
  def keys: Vector[String]
  def operation: CombineOp.Value
  def dimension: Dimension = Dimension(name, operation)
}

/** Same variables, concatenated along an axis; `nitemsPerFile` is the
  * static-stats fast path (patterns.py:33-48). */
final case class ConcatDim(name: String, keys: Vector[String],
                           nitemsPerFile: Option[Int] = None) extends CombineDim {
  val operation: CombineOp.Value = CombineOp.Concat
}

/** Distinct variables merged widthwise (patterns.py:52-63). */
final case class MergeDim(name: String, keys: Vector[String]) extends CombineDim {
  val operation: CombineOp.Value = CombineOp.Merge
}

/** FileType registry (patterns.py:92-99). Parquet and Tiff extend the
  * reference enum: the long-view source, and the rasterio/GeoTIFF input
  * family the reference reaches through xarray's engine dispatch
  * (docs/composition/styles.md:8-9). */
object FileType extends Enumeration {
  val Grib, Kerchunk, Netcdf3, Netcdf4, Opendap, Unknown, Zarr, Parquet,
    Tiff = Value
}

final case class FilePattern(
    formatFunction: Map[String, String] => String,
    combineDims: Vector[CombineDim],
    fsspecOpenKwargs: Map[String, String] = Map.empty,
    queryStringSecrets: Map[String, String] = Map.empty,
    fileType: FileType.Value = FileType.Netcdf4) {

  if (fsspecOpenKwargs.nonEmpty && fileType == FileType.Opendap)
    throw new IllegalArgumentException(
      "OPeNDAP inputs are not opened with `fsspec`. " +
        "When passing `fsspec_open_kwargs`, `file_type` cannot be `opendap`.")

  def dims: Map[String, Int] = combineDims.map(d => d.name -> d.keys.length).toMap
  def shape: Vector[Int] = combineDims.map(_.keys.length)
  def mergeDims: Vector[String] =
    combineDims.collect { case d if d.operation == CombineOp.Merge => d.name }
  def concatDims: Vector[String] =
    combineDims.collect { case d if d.operation == CombineOp.Concat => d.name }

  def nitemsPerInput: Map[String, Option[Int]] =
    combineDims.collect { case c: ConcatDim => c.name -> c.nitemsPerFile }.toMap

  def concatSequenceLens: Map[String, Option[Int]] =
    nitemsPerInput.map { case (name, n) => name -> n.map(_ * dims(name)) }

  def combineDimKeys: Vector[Dimension] = combineDims.map(_.dimension)

  /** URL for one index (patterns.py:197-212). */
  def apply(index: Index): String = {
    require(index.size == combineDims.length)
    val kwargs = index.entries.map { case (dimension, position) =>
      val dim = combineDims.find(_.dimension == dimension).getOrElse(
        throw new NoSuchElementException(
          s"Could not find valid combine_dim for dimension $dimension"))
      dim.name -> dim.keys(position.value)
    }
    formatFunction(kwargs)
  }

  /** Cartesian-product enumeration of the index matrix (patterns.py:214-223).
    * Driver-side: the matrix is metadata-sized even at 100 TB data scale. */
  def indices: Iterator[Index] = {
    def product(dims: List[CombineDim]): Iterator[List[Int]] = dims match {
      case Nil => Iterator(Nil)
      case d :: rest =>
        for (v <- (0 until d.keys.length).iterator; tail <- product(rest))
          yield v :: tail
    }
    product(combineDims.toList).map { vals =>
      Index(combineDims.zip(vals).map { case (d, v) =>
        d.dimension -> Pos(v) }.toMap)
    }
  }

  def items: Iterator[(Index, String)] = indices.map(i => (i, apply(i)))

  /** Keep all MergeDims, first `nkeep` keys of each ConcatDim
    * (patterns.py:235-260). */
  def prune(nkeep: Int = 2): FilePattern =
    copy(combineDims = combineDims.map {
      case c: ConcatDim => c.copy(keys = c.keys.take(nkeep))
      case m: MergeDim => m
    })

  /** Merkle chain over (root config, url1, url2, ...) — patterns.py:262-300.
    * Root hash = sha256 of the canonical JSON of non-empty config fields;
    * each later item chains sha256(prev ++ sha256(url)). */
  def merkleList: Vector[Array[Byte]] = {
    val nitems = combineDims.collect {
      case c: ConcatDim if c.nitemsPerFile.isDefined =>
        c.name -> c.nitemsPerFile.get }.toMap
    val rootFields = scala.collection.mutable.TreeMap.empty[String, String]
    if (fsspecOpenKwargs.nonEmpty)
      rootFields += "fsspec_open_kwargs" -> Serialization.jsonObject(fsspecOpenKwargs)
    if (queryStringSecrets.nonEmpty)
      rootFields += "query_string_secrets" -> Serialization.jsonObject(queryStringSecrets)
    rootFields += "file_type" -> s"\"${fileType.toString.toLowerCase}\""
    if (nitems.nonEmpty)
      rootFields += "nitems_per_file" ->
        Serialization.jsonObjectRaw(nitems.map { case (k, v) => k -> v.toString })
    val rootJson = rootFields.map { case (k, v) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    val root = Serialization.sha256(rootJson.getBytes("UTF-8"))
    items.foldLeft(Vector(root)) { case (acc, (_, url)) =>
      acc :+ Serialization.sha256(acc.last ++ Serialization.sha256(url.getBytes("UTF-8")))
    }
  }

  def sha256Hash: Array[Byte] = merkleList.last

  /** Resume point for append jobs: the Index at which the old pattern's
    * final hash matches this pattern's chain (patterns.py:302-318). */
  def startProcessingFrom(oldPatternLastHash: Array[Byte]): Option[Index] =
    indices.zip(merkleList.iterator).collectFirst {
      case (k, h) if java.util.Arrays.equals(h, oldPatternLastHash) => k
    }
}

object FilePattern {
  /** patterns.py:321-332 */
  def fromFileSequence(files: Vector[String], concatDim: String,
                       nitemsPerFile: Option[Int] = None,
                       fileType: FileType.Value = FileType.Netcdf4): FilePattern = {
    val keys = files.indices.map(_.toString).toVector
    FilePattern(
      kw => files(kw(concatDim).toInt),
      Vector(ConcatDim(concatDim, keys, nitemsPerFile)),
      fileType = fileType)
  }

  /** patterns.py:66-82: upgrade a file-ordinal to an element offset given
    * all item lengths, optionally shifted for append jobs. */
  def augmentIndexWithStartStop(position: Pos, itemLens: Vector[Int],
                                appendOffset: Int = 0): Pos = {
    if (position.indexed)
      throw new IllegalArgumentException("This position is already indexed")
    val start = itemLens.take(position.value).sum
    val dimsize = itemLens.sum
    Pos.indexed(start + appendOffset, dimsize + appendOffset)
  }
}

/** Deterministic hashing helpers (serialization.py:9-72). */
object Serialization {
  def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  private def jsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Canonical JSON object of string values: sorted keys, compact separators
    * (the json.dumps(sort_keys=True, separators=(",", ":")) contract). */
  def jsonObject(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${jsonEscape(k)}:${jsonEscape(v)}" }.mkString("{", ",", "}")

  /** Same but values already rendered as JSON literals. */
  def jsonObjectRaw(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${jsonEscape(k)}:$v" }.mkString("{", ",", "}")

  /** sha256 of a canonical-JSON string. */
  def stringDictSha256(m: Map[String, String]): Array[Byte] =
    sha256(jsonObject(m).getBytes("UTF-8"))
}
