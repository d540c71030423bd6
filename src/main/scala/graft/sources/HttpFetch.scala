package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

/** HTTP(S) dataset ingestion with a local fetch-once cache — the
  * Spark-side analogue of the reference's download manager
  * (reference: download/schema_manager.py:1-127,
  * utils/file_utils.py `cached_path`: fetch a remote data file into
  * a content-addressed cache, then load locally).
  *
  * Semantics mirrored: cache keyed by URL; revalidation via
  * conditional GET (`If-None-Match`/`If-Modified-Since` from the
  * stored ETag / Last-Modified — a 304 reuses the cached bytes, a
  * 200 refreshes them); downloads land atomically (.part → move).
  *
  * Scale note: this is the DRIVER-side convenience path for sidecar
  * and fixture-sized files, exactly like the reference's. Corpus-
  * scale data belongs in object storage that Spark reads natively —
  * BioLoader passes s3a/hdfs/file URIs straight through.
  */
object HttpFetch {

  /** Resolution order: explicit arg → GRAFT_HTTP_CACHE env → a
    * stable per-user cache dir.
    */
  def defaultCacheDir: String =
    sys.env.getOrElse("GRAFT_HTTP_CACHE",
      sys.props.get("user.home").map(h => s"$h/.cache/graft/downloads")
        .getOrElse(sys.props("java.io.tmpdir") + "/graft-http-cache"))

  def isHttp(path: String): Boolean = {
    val p = path.toLowerCase
    p.startsWith("http://") || p.startsWith("https://")
  }

  /** Fetch `url` into the cache (or revalidate what's there) and
    * return the local file path. The cached name keeps the URL's
    * basename so format dispatch by extension still works.
    */
  /** URL basename for cache/destination file naming; format dispatch
    * by extension keeps working off it.
    */
  private def baseNameOf(url: String): String = {
    val raw = url.substring(url.lastIndexOf('/') + 1)
    val clean = raw.takeWhile(c => c != '?' && c != '#')
    if (clean.nonEmpty) clean else "download"
  }

  def cached(url: String, cacheDir: String = defaultCacheDir): String = {
    val dir = Paths.get(cacheDir)
    Files.createDirectories(dir)
    val base = baseNameOf(url)
    val key = sha256Hex(url)
    val target = dir.resolve(s"$key-$base")
    val metaPath = dir.resolve(s"$key-$base.meta")

    val reqB = HttpRequest.newBuilder(URI.create(url)).GET()
    if (Files.exists(target) && Files.exists(metaPath)) {
      val meta = readMeta(metaPath)
      meta.get("etag").foreach(v => reqB.header("If-None-Match", v))
      meta.get("last-modified").foreach(v => reqB.header("If-Modified-Since", v))
    }
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    // per-fetch unique temp: concurrent fetches of the same URL
    // (two processes or two driver threads) must not interleave
    // writes into a shared .part before the atomic move
    val tmp = Files.createTempFile(dir, s"$key-", ".part")
    try {
      val resp = client.send(reqB.build(), HttpResponse.BodyHandlers.ofFile(tmp))
      resp.statusCode() match {
        case 304 =>
          Files.deleteIfExists(tmp) // revalidated: cached bytes stand
        case code if code >= 200 && code < 300 =>
          Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
          writeMeta(metaPath,
            resp.headers().firstValue("ETag").map("etag" -> _).toScala.toMap ++
              resp.headers().firstValue("Last-Modified").map("last-modified" -> _).toScala.toMap)
        case code =>
          Files.deleteIfExists(tmp)
          if (Files.exists(target)) () // stale cache beats a hard failure on refresh
          else throw new java.io.IOException(s"GET $url returned $code and no cached copy exists")
      }
    } catch {
      case e: Throwable => Files.deleteIfExists(tmp); throw e
    }
    target.toString
  }

  /** BioLoader hook: remote URLs through the cache, everything else
    * untouched.
    */
  def localize(paths: Seq[String], cacheDir: String = defaultCacheDir): Seq[String] =
    paths.map(p => if (isHttp(p)) cached(p, cacheDir) else p)

  /** DISTRIBUTED fetch of a URL list — the many-files side of the
    * reference's download manager, shaped for a cluster: each task
    * fetches its partition's URLs and lands the bytes in `destDir`
    * through the Hadoop FileSystem (shared storage on a real
    * cluster), content-addressed by URL so re-runs skip files
    * already landed. Bodies STREAM from the socket to the
    * filesystem (never buffered whole — media files exceed heap);
    * per-file temp+rename gives the same task-commit safety as the
    * arrow writer. Fetch failures never kill the job: each URL
    * reports its own `status` (HTTP code, or -1 for transport
    * errors) with a null `path`, so one dead link in a million-URL
    * corpus costs one report row, not the job. Timeouts bound the
    * damage an unresponsive host can do to a task.
    *
    * Returns (url, path, n_bytes, status, task) — `task` is the
    * fetching partition, useful for probing distribution.
    *
    * This is the `readMediaDir`-style ingestion path: fetch the
    * corpus once onto storage Spark reads natively, then load with
    * BioLoader/binaryFile readers. The driver-side [[cached]] stays
    * the right call for single sidecar/fixture files.
    */
  def fetchToDir(
      urls: org.apache.spark.sql.DataFrame,
      urlCol: String,
      destDir: String,
      connectTimeout: java.time.Duration = java.time.Duration.ofSeconds(30),
      requestTimeout: java.time.Duration = java.time.Duration.ofMinutes(10)
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    val spark = urls.sparkSession
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val connectMs = connectTimeout.toMillis
    val requestMs = requestTimeout.toMillis
    val rows = urls.select(org.apache.spark.sql.functions.col(urlCol).cast("string"))
      .rdd.mapPartitions { it =>
        val dest = new HPath(destDir)
        val fs = dest.getFileSystem(confSer.value)
        fs.mkdirs(dest)
        val client = HttpClient.newBuilder()
          .followRedirects(HttpClient.Redirect.NORMAL)
          .connectTimeout(java.time.Duration.ofMillis(connectMs))
          .build()
        val task = Option(org.apache.spark.TaskContext.get()).map(_.partitionId()).getOrElse(-1)
        it.map { r =>
          val url = r.getString(0)
          val target = new HPath(dest, s"${sha256Hex(url)}-${baseNameOf(url)}")
          if (fs.exists(target))
            org.apache.spark.sql.Row(url, target.toString, fs.getFileStatus(target).getLen, 200, task)
          else {
            try {
              val req = HttpRequest.newBuilder(URI.create(url)).GET()
                .timeout(java.time.Duration.ofMillis(requestMs)).build()
              val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
              val code = resp.statusCode()
              if (code < 200 || code >= 300) {
                resp.body().close()
                org.apache.spark.sql.Row(url, null, 0L, code, task)
              } else {
                val tmp = new HPath(dest, s".${sha256Hex(url)}-${baseNameOf(url)}.${java.util.UUID.randomUUID()}.tmp")
                val out = fs.create(tmp, true)
                val in = resp.body()
                var n = 0L
                try {
                  val buf = new Array[Byte](64 * 1024)
                  var read = in.read(buf)
                  while (read >= 0) {
                    if (read > 0) { out.write(buf, 0, read); n += read }
                    read = in.read(buf)
                  }
                } finally { in.close(); out.close() }
                if (fs.exists(target) || !fs.rename(tmp, target)) fs.delete(tmp, false)
                org.apache.spark.sql.Row(url, target.toString, n, code, task)
              }
            } catch {
              case scala.util.control.NonFatal(_) =>
                org.apache.spark.sql.Row(url, null, 0L, -1, task)
            }
          }
        }
      }
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("n_bytes", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("status", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("task", org.apache.spark.sql.types.IntegerType, nullable = false))))
  }

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString.take(32)

  private def readMeta(p: Path): Map[String, String] =
    Files.readAllLines(p).toArray(Array.empty[String]).flatMap { line =>
      line.split("\t", 2) match {
        case Array(k, v) => Some(k -> v)
        case _           => None
      }
    }.toMap

  private def writeMeta(p: Path, kv: Map[String, String]): Unit =
    Files.writeString(p, kv.map { case (k, v) => s"$k\t$v" }.mkString("\n"))

  private implicit class OptToScala[T](o: java.util.Optional[T]) {
    def toScala: Option[T] = if (o.isPresent) Some(o.get) else None
  }
}
