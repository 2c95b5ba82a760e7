package graft.storage

import java.net.URI
import java.util.concurrent.ConcurrentHashMap
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import scala.jdk.CollectionConverters._

/** In-JVM S3-shaped Hadoop FileSystem for the `mos://` scheme — the
  * sandbox stand-in for the reference's dockerized MinIO integration leg
  * (tests/test_integration.py): a FLAT key → bytes object store with
  *
  *   - PUT-on-close creates (the object appears atomically when the
  *     output stream closes — no partial objects, no append),
  *   - synthetic directories (a "directory" exists iff some key has it
  *     as a prefix — exactly the s3a illusion),
  *   - prefix listing, recursive prefix delete, positioned range reads.
  *
  * Registered per test session via `spark.hadoop.fs.mos.impl`; state is
  * a JVM-wide map (local-mode executors share it), reset per bucket by
  * [[MockObjectFS.clearBucket]]. Everything the bake path exercises —
  * HadoopIO writes/reads/range-reads/listing through StoreIO, the cache
  * PUT path, consolidation rewrites — runs object-shaped through here. */
class MockObjectFS extends FileSystem {
  private var uri: URI = _
  private var workDir: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    uri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    setConf(conf)
  }

  override def getScheme: String = "mos"
  override def getUri: URI = uri

  /** bucket-qualified flat key for a path. */
  private def keyOf(f: Path): String = {
    val p = f.toUri.getPath
    s"${uri.getAuthority}:${p.stripPrefix("/").stripSuffix("/")}"
  }

  private def store = MockObjectFS.objects

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = Option(store.get(keyOf(f))).getOrElse(
      throw new java.io.FileNotFoundException(f.toString))
    new FSDataInputStream(new MockObjectFS.BytesInputStream(bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    if (!overwrite && store.containsKey(key))
      throw new FileAlreadyExistsException(f.toString)
    val buf = new java.io.ByteArrayOutputStream()
    // PUT-on-close: the object materializes atomically at close time
    val out = new java.io.FilterOutputStream(buf) {
      override def close(): Unit = { super.close(); store.put(key, buf.toByteArray) }
    }
    new FSDataOutputStream(out, null)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("object stores do not append")

  override def rename(src: Path, dst: Path): Boolean = {
    val sk = keyOf(src); val dk = keyOf(dst)
    val exact = Option(store.remove(sk))
    exact match {
      case Some(b) => store.put(dk, b); true
      case None =>
        // directory rename = prefix rewrite (the s3a emulation)
        val pre = sk + "/"
        val hits = store.keys.asScala.filter(_.startsWith(pre)).toVector
        if (hits.isEmpty) false
        else {
          hits.foreach { k =>
            store.put(dk + "/" + k.stripPrefix(pre), store.remove(k))
          }
          true
        }
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = keyOf(f)
    val exact = store.remove(k) != null
    val pre = k + "/"
    val children = store.keys.asScala.filter(_.startsWith(pre)).toVector
    if (children.nonEmpty && !recursive)
      throw new java.io.IOException(s"non-recursive delete of non-empty $f")
    children.foreach(store.remove)
    exact || children.nonEmpty
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = keyOf(f)
    if (store.containsKey(k)) return Array(getFileStatus(f))
    val pre = if (k.endsWith(":")) k else k + "/"
    val names = store.keys.asScala.filter(_.startsWith(pre)).toVector
    if (names.isEmpty) throw new java.io.FileNotFoundException(f.toString)
    // immediate children only: files directly under the prefix, plus one
    // synthetic dir entry per deeper component
    val immediate = names.map(_.stripPrefix(pre)).groupBy(_.takeWhile(_ != '/'))
    immediate.keys.toArray.sorted.map { child =>
      val full = new Path(f, child)
      getFileStatus(full)
    }
  }

  override def setWorkingDirectory(newDir: Path): Unit = workDir = newDir
  override def getWorkingDirectory: Path = workDir
  override def mkdirs(f: Path, permission: FsPermission): Boolean = true

  override def getFileStatus(f: Path): FileStatus = {
    val k = keyOf(f)
    val exact = Option(store.get(k))
    exact match {
      case Some(b) =>
        new FileStatus(b.length.toLong, false, 1, 1L << 20, 0L, f)
      case None =>
        val pre = if (k.endsWith(":")) k else k + "/"
        if (store.keys.asScala.exists(_.startsWith(pre)))
          new FileStatus(0L, true, 1, 1L << 20, 0L, f) // synthetic dir
        else throw new java.io.FileNotFoundException(f.toString)
    }
  }
}

object MockObjectFS {
  /** JVM-wide object map: "bucket:key/path" -> bytes. */
  val objects = new ConcurrentHashMap[String, Array[Byte]]()

  def clearBucket(bucket: String): Unit =
    objects.keys.asScala.filter(_.startsWith(s"$bucket:")).toVector
      .foreach(objects.remove)

  def keysIn(bucket: String): Vector[String] =
    objects.keys.asScala.filter(_.startsWith(s"$bucket:")).toVector.sorted

  /** Seekable + positioned-readable stream over one object's bytes. */
  final class BytesInputStream(bytes: Array[Byte]) extends FSInputStream {
    private var pos = 0L
    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length) throw new java.io.EOFException(s"seek $p")
      pos = p
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int =
      if (pos >= bytes.length) -1
      else { val b = bytes(pos.toInt) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos.toInt)
      System.arraycopy(bytes, pos.toInt, b, off, n)
      pos += n
      n
    }
  }
}
