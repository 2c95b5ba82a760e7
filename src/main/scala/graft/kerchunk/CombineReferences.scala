package graft.kerchunk

import graft.core.Index
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Order-preserving hierarchical reduction of references
  * (transforms.py:427-554):
  *   (a) global (min, max, count) of positions — one fused built-in agg;
  *   (b) range-bucket each element by position (`ceil(count/maxRefs)` buckets)
  *       — deterministic range partitioning that preserves global order;
  *   (c) per-bucket ordered merge (groupByKey + in-bucket sort);
  *   (d) final global merge of the few bucket results on the driver.
  *
  * The tree fan-in (max_refs_per_merge, default 5 — transforms.py:446) bounds
  * the memory of any single merge, which is what lets this scale to millions
  * of input files: no single task ever holds more than one bucket.
  */
object CombineReferences {

  def combine(refs: Dataset[(Index, RefSet)],
              concatDims: Vector[String],
              identicalDims: Vector[String],
              maxRefsPerMerge: Int = 5): RefSet = {
    val spark = refs.sparkSession
    import spark.implicits._
    val sortDim = concatDims.last // transforms.py:449-452

    // (a) single-pass min/max/count of positions (MinMaxCountCombineFn)
    val positions = refs.map(_._1.findPosition(sortDim))(Encoders.scalaInt).toDF("pos")
    val row = positions.agg(
      min(col("pos")).as("mn"), max(col("pos")).as("mx"), count(lit(1)).as("cnt"))
      .head()
    val (gMin, gMax, gCount) = (row.getInt(0), row.getInt(1), row.getLong(2))

    // (b) bucket assignment (transforms.py:479-521)
    val bucketed = refs.map { case (idx, rs) =>
      (bucketFor(idx.findPosition(sortDim), gMin, gMax, gCount, maxRefsPerMerge),
        (idx.findPosition(sortDim), rs))
    }(Encoders.kryo[(Int, (Int, RefSet))])

    // (c) per-bucket ordered merge
    val bucketMerged = bucketed
      .groupByKey(_._1)(Encoders.scalaInt)
      .mapGroups { (bucket, it) =>
        val sorted = it.toVector.sortBy(_._2._1)
        (bucket, RefSet.concatRefSets(sorted.map(_._2._2), sortDim, identicalDims))
      }(Encoders.kryo[(Int, RefSet)])
      .collect()

    // (d) global merge in bucket order
    val ordered = bucketMerged.sortBy(_._1).map(_._2).toVector
    RefSet.concatRefSets(ordered, sortDim, identicalDims)
  }

  /** transforms.py:479-521 verbatim semantics (incl. float bucket size). */
  def bucketFor(position: Int, gMin: Int, gMax: Int, gCount: Long,
                maxRefsPerMerge: Int): Int = {
    val numBuckets = math.ceil(gCount.toDouble / maxRefsPerMerge).toInt
    val rangeSize = (gMax - gMin).toDouble
    val bucketSize = rangeSize / numBuckets
    ((position - gMin) / bucketSize).toInt
  }

  /** A reference key holding a metadata DOCUMENT (not chunk bytes), in
    * either key dialect: v3 `zarr.json` docs at root or per-variable, and
    * v2 dot-files (`.zgroup`/`.zattrs`/`.zarray`/`.zmetadata`) at root or
    * per-variable. These always ride in the consolidated `.zmetadata` of
    * the parquet artifact and always survive a component-pruned read. */
  private[kerchunk] def isMetadataKey(k: String): Boolean = {
    val base = k.substring(k.lastIndexOf('/') + 1)
    base == "zarr.json" || base.startsWith(".z")
  }

  /** WriteReference (writers.py:132-195): persist as reference.json or as a
    * parquet table (key, url, offset, length, inline). */
  def writeReferenceJson(rs: RefSet, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, RefSet.toJson(rs))
  }

  /** WriteCombinedReference (transforms.py:589-635): CombineReferences |
    * WriteReference, artifact format chosen by extension. Returns the
    * combined RefSet (the singleton "store handle"). `v2Keys` emits the
    * zarr-v2-keyed kerchunk artifact the fsspec ecosystem consumes
    * (RefSet.toKerchunkV2Json) instead of our v3-keyed layout. */
  def writeCombinedReference(refs: Dataset[(Index, RefSet)],
                             concatDims: Vector[String],
                             identicalDims: Vector[String],
                             outputPath: String,
                             maxRefsPerMerge: Int = 5,
                             v2Keys: Boolean = false): RefSet = {
    // validate BEFORE the distributed combine runs
    require(!(v2Keys && outputPath.endsWith(".parquet")),
      "v2Keys applies to the json artifact only; the parquet layout keeps " +
        "our v3 keys")
    val combined = combine(refs, concatDims, identicalDims, maxRefsPerMerge)
    if (outputPath.endsWith(".parquet"))
      writeReferenceParquet(refs.sparkSession, combined, outputPath)
    else if (v2Keys) {
      val p = java.nio.file.Paths.get(outputPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, RefSet.toKerchunkV2Json(combined))
    } else
      writeReferenceJson(combined, outputPath)
    combined
  }

  /** Parquet reference artifact — a REPO-INTERNAL layout INSPIRED BY (not
    * byte-compatible with) the fsspec LazyReferenceMapper record shape
    * (writers.py:137,157-160: `record_size=refs_per_component`, default
    * 10000). What it shares with fsspec's: chunk refs grouped per component
    * (the top-level variable), no record file over `refsPerComponent` rows,
    * and all metadata documents consolidated in one `.zmetadata` JSON with
    * the record size — the properties that keep a single component of a
    * billion-ref store openable without scanning the whole table. What it
    * does NOT share: fsspec writes positional `<var>/refs.N.parq` files
    * whose row index IS the chunk ordinal (columns path/offset/size/raw,
    * zarr-v2 keys); this artifact writes Hive-partitioned
    * `component=<var>/part-*.parquet` with explicit
    * (key, url, offset, length, inline_b64) columns, readable only by
    * [[readReferenceParquet]] (or any parquet reader — the columns are
    * self-describing). For fsspec/kerchunk ecosystem interop, emit the JSON
    * artifact (`writeReferenceJson` / `v2Keys = true`).
    *
    * Metadata routing covers both key dialects: v3 docs (`zarr.json`,
    * `<var>/zarr.json`) and v2 docs (root `.zgroup`/`.zattrs`/`.zmetadata`
    * and per-variable `<var>/.zarray`/`.zattrs`/`.zgroup`) all land in the
    * consolidated `.zmetadata`, never in the chunk records. */
  def writeReferenceParquet(spark: org.apache.spark.sql.SparkSession,
                            rs: RefSet, path: String,
                            refsPerComponent: Int = 10000): Unit = {
    import spark.implicits._
    require(refsPerComponent > 0, "refsPerComponent must be positive")
    val (metaKeys, chunkKeys) = rs.refs.toSeq.sortBy(_._1)
      .partition { case (k, _) => isMetadataKey(k) }
    // consolidated metadata: every zarr.json doc inline, plus record_size
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaRoot = mapper.createObjectNode()
    metaRoot.put("record_size", refsPerComponent)
    val metaRefs = metaRoot.putObject("metadata")
    metaKeys.foreach { case (k, r) =>
      metaRefs.set[com.fasterxml.jackson.databind.node.ObjectNode](
        k, mapper.readTree(r.resolve()))
    }
    // chunk refs: one partition directory per component, files capped at
    // refsPerComponent records (maxRecordsPerFile enforces the cap inside
    // each component's writer task); parquet write FIRST — overwrite mode
    // clears the directory — then the consolidated metadata lands beside it
    chunkKeys.map { case (k, r) =>
      val component = k.split('/').head
      (component, k, r.url.orNull, r.offset, r.length,
        r.inline.map(java.util.Base64.getEncoder.encodeToString).orNull)
    }.toDF("component", "key", "url", "offset", "length", "inline_b64")
      .repartition(col("component"))
      .sortWithinPartitions("key")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", refsPerComponent)
      .partitionBy("component")
      .parquet(path)
    // .zmetadata goes through the same Hadoop FS the parquet records used,
    // so the artifact works on any target (file://, hdfs://, s3a://), not
    // just the local filesystem
    val metaPath = new org.apache.hadoop.fs.Path(path, ".zmetadata")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(metaPath, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(metaRoot).getBytes("UTF-8"))
    finally out.close()
  }

  /** Read the parquet reference artifact back into a [[RefSet]] — the
    * LazyReferenceMapper open path: metadata docs from `.zmetadata`, chunk
    * refs from the per-component parquet records. Component selection
    * (`components`) prunes the read to the named variables' partition
    * directories — the point of the per-component layout: opening one
    * variable of a billion-ref store reads only its own record files. */
  def readReferenceParquet(spark: org.apache.spark.sql.SparkSession,
                           path: String,
                           components: Option[Set[String]] = None): RefSet = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaPath = new org.apache.hadoop.fs.Path(path, ".zmetadata")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(metaPath)
    val metaJson =
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in: java.io.InputStream),
        "UTF-8")
      finally in.close()
    val zm = mapper.readTree(metaJson)
    var refs = Map.empty[String, Ref]
    // Pruned reads keep EVERY root-level metadata doc (v3 "zarr.json" and
    // v2 ".zgroup"/".zattrs"/…): without the root group doc the pruned
    // RefSet is unopenable. Per-variable docs are pruned with their
    // component.
    zm.get("metadata").fields().forEachRemaining { e =>
      val isRootDoc = !e.getKey.contains('/')
      if (components.forall(cs =>
        isRootDoc || cs.contains(e.getKey.split('/').head)))
        refs += e.getKey -> Ref.inline(
          mapper.writeValueAsBytes(e.getValue))
    }
    val table0 = spark.read.parquet(path)
    val table = components match {
      case Some(cs) => // partition filter prunes to the requested dirs
        table0.where(org.apache.spark.sql.functions.col("component")
          .isin(cs.toSeq: _*))
      case None => table0
    }
    table.select("key", "url", "offset", "length", "inline_b64")
      .collect().foreach { r =>
        val inline = Option(r.getString(4))
          .map(java.util.Base64.getDecoder.decode)
        refs += r.getString(0) -> Ref(Option(r.getString(1)),
          r.getLong(2), r.getLong(3), inline)
      }
    RefSet(refs)
  }
}
