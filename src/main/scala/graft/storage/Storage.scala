package graft.storage

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.text.Normalizer

/** Storage helpers (storage.py:25-228): cache-file naming, idempotent
  * remote→cache copy with size-based skip, block-streamed copy, and
  * query-string secret injection.
  */
object Storage {

  /** storage.py:212-219: NFKD-normalize, strip non-word chars (keeping
    * ".-_"), so a URL becomes a safe flat filename component. */
  def slugify(value: String): String = {
    val norm = Normalizer.normalize(value, Normalizer.Form.NFKD)
      .replaceAll("[^\\x00-\\x7F]", "")
    norm.replaceAll("[^.\\w\\s-]+", "").trim.replaceAll("[-\\s]+", "-")
  }

  /** storage.py:174-186: md5-prefixed slug capped to 255 bytes. */
  def hashPath(value: String): String = {
    val md5 = MessageDigest.getInstance("MD5")
      .digest(value.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val slug = slugify(value)
    val out = s"$md5-$slug"
    out.substring(0, math.min(out.length, 255))
  }

  /** storage.py:222-228: append secret key/value pairs to a URL's query
    * string at open time. */
  def injectQueryStringSecrets(url: String, secrets: Map[String, String]): String = {
    if (secrets.isEmpty) return url
    val enc = secrets.toSeq.sortBy(_._1).map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    if (url.contains("?")) s"$url&$enc" else s"$url?$enc"
  }

  /** storage.py:25-45: block-streamed copy (10 MB blocks). */
  val BlockSize: Int = 10_000_000

  def copyStream(in: java.io.InputStream, out: java.io.OutputStream,
                 blockSize: Int = BlockSize): Long = {
    val buf = new Array[Byte](blockSize)
    var total = 0L
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      total += n
      n = in.read(buf)
    }
    total
  }

  private def isHttp(url: String): Boolean =
    url.startsWith("http://") || url.startsWith("https://")

  /** Remote size probe: HEAD for http(s) (fsspec `fs.info` analog), stat for
    * local paths. -1 when unknown (then the cache never skips). */
  private def sourceSize(url: String): Long =
    if (isHttp(url)) {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod("HEAD")
        conn.connect()
        if (conn.getResponseCode >= 400) -1L else conn.getContentLengthLong
      } finally conn.disconnect()
    } else Files.size(Paths.get(url))

  private def openSource(url: String): java.io.InputStream =
    if (isHttp(url)) {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      if (conn.getResponseCode >= 400)
        throw new java.io.IOException(
          s"HTTP ${conn.getResponseCode} fetching $url")
      conn.getInputStream
    } else Files.newInputStream(Paths.get(url))

  /** CacheFSSpecTarget.cache_file (storage.py:192-209): copy into the cache
    * under the hashed name, skipping when the size already matches. Secrets
    * are injected into the fetched URL for http(s) sources (openers.py:
    * 16-37 semantics); local paths are read as-is. The cache key is derived
    * from the UN-secreted fname (CacheFSSpecTarget._full_path semantics) so
    * tokens never leak into on-disk names and the key survives secret
    * rotation. */
  def cacheFile(sourceUrl: String, cacheDir: String,
                secrets: Map[String, String] = Map.empty): String = {
    val resolved = injectQueryStringSecrets(sourceUrl, secrets)
    val fetchUrl = if (isHttp(sourceUrl)) resolved else sourceUrl
    if (cacheDir.contains("://")) {
      // scheme'd cache target (s3a://, hdfs://, any registered Hadoop
      // FS): one object PUT per cached file through the same StoreIO
      // transport the zarr writers use; the size-match skip becomes a
      // HEAD-shaped exists+size probe. The cache key stays the hashed
      // UN-secreted name (secrets never reach object keys).
      val io = graft.zarr.StoreIO.forRoot(cacheDir)
      val key = hashPath(sourceUrl)
      val size = sourceSize(fetchUrl)
      if (io.exists(key) && size >= 0 && io.size(key) == size)
        return s"$cacheDir/$key" // size-match skip
      val in = openSource(fetchUrl)
      try {
        val out = io.openWrite(key) // block-streamed; PUT on close
        try copyStream(in, out) finally out.close()
      } finally in.close()
      return s"$cacheDir/$key"
    }
    val target = Paths.get(cacheDir, hashPath(sourceUrl))
    Files.createDirectories(target.getParent)
    val size = sourceSize(fetchUrl)
    if (Files.exists(target) && size >= 0 && Files.size(target) == size)
      return target.toString // size-match skip
    val in = openSource(fetchUrl)
    try {
      val tmp = Files.createTempFile(target.getParent, ".cache", ".tmp")
      val out = Files.newOutputStream(tmp)
      try copyStream(in, out) finally out.close()
      Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
    } finally in.close()
    target.toString
  }

  /** copy_to_local for a scheme'd (object-store) path: spool the object
    * into the executor-local JVM tmpdir under its hashed name (size-skip
    * idempotent, same contract as [[cacheFile]]) so positional decoders
    * (netcdf/hdf5/grib seek into the file) get a real local file —
    * openers.py:229-252's copy_to_local over fsspec paths. */
  def localize(schemedUrl: String): String = {
    require(schemedUrl.contains("://"), s"localize: not a scheme'd URL: $schemedUrl")
    val cut = schemedUrl.lastIndexOf('/')
    val (root, key) = (schemedUrl.substring(0, cut), schemedUrl.substring(cut + 1))
    val io = graft.zarr.StoreIO.forRoot(root)
    val target = Paths.get(sys.props("java.io.tmpdir"), hashPath(schemedUrl))
    val size = io.size(key)
    if (Files.exists(target) && Files.size(target) == size)
      return target.toString
    // block-streamed (the storage.py 10 MB-block contract): a multi-GB
    // cached NetCDF must never be buffered whole on an executor
    val tmp = Files.createTempFile(target.getParent, ".localize", ".tmp")
    val in = io.openRead(key)
    try {
      val out = Files.newOutputStream(tmp)
      try copyStream(in, out) finally out.close()
    } finally in.close()
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
    target.toString
  }
}
