package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pure-Scala reader for scipy-sparse `.npz` files (reference:
  * packaged_modules/npz/npz.py:82-161 reads csr/csc/coo/dia via
  * scipy and yields dense row batches).
  *
  * graft instead emits the LONG format `(file_id, row, col, value)`
  * — at 100 TB a sparse matrix must stay sparse; densification is a
  * [[graft.operators.ReshapeOps.pivot]] the caller opts into.
  *
  * Scale model: one task per file (files are the parallel unit, as
  * in the reference's multi-file splits). Each task streams the zip
  * members sequentially — no scipy, no driver materialization.
  *
  * NPY parsing follows the public NPY format spec v1/v2
  * (numpy/lib/format.py documentation): magic \x93NUMPY, version,
  * little-endian header length, ASCII dict header with descr /
  * fortran_order / shape.
  */
object NpzReader {

  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val indexed = paths.zipWithIndex.map { case (p, i) => (i.toLong, p) }
    spark.sparkContext
      .parallelize(indexed, indexed.size)
      .flatMap { case (fileId, path) => readOne(fileId, path) }
      .toDF("file_id", "row", "col", "value")
  }

  /** Row-range-parallel CSR read of ONE large npz: the driver
    * parses only the small members (format/shape/indptr — the
    * reference batches exactly this way, npz.py:126-140), splits
    * the row space into `rowsPerTask` ranges, and each task streams
    * just its `indptr[lo]..indptr[hi]` slice of data/indices.
    * Memory per task is bounded by the range, not the file — the
    * path a 1 TB single-file matrix needs. Non-CSR formats fall
    * back to [[read]].
    */
  def readSplit(spark: SparkSession, path: String, rowsPerTask: Int = 100000): DataFrame = {
    import spark.implicits._
    val small = readNpzArrays(path, only = Some(Set("format", "shape", "indptr")))
    val isCsr = small.get("format").exists(_.asString == "csr")
    if (!isCsr) return read(spark, Seq(path))
    val indptr = small("indptr").asLongs
    val nRows = indptr.length - 1
    val ranges = (0 until nRows by rowsPerTask).map(lo => (lo, math.min(lo + rowsPerTask, nRows)))
    spark.sparkContext
      .parallelize(ranges, ranges.size)
      .flatMap { case (lo, hi) => readCsrRange(path, lo, hi) }
      .toDF("file_id", "row", "col", "value")
  }

  /** Stream one CSR row range out of the zip: values/indices are
    * skipped up to indptr(lo) and read through indptr(hi).
    */
  private[sources] def readCsrRange(path: String, lo: Int, hi: Int): Iterator[(Long, Long, Long, Double)] = {
    val small = readNpzArrays(path, only = Some(Set("indptr")))
    val indptr = small("indptr").asLongs
    val from = indptr(lo)
    val until = indptr(hi)
    val count = (until - from).toInt
    if (count == 0) return Iterator.empty

    def slice(member: String): NpyArray = {
      val zf = new java.util.zip.ZipFile(path)
      try {
        val entry = zf.getEntry(s"$member.npy")
        val in = zf.getInputStream(entry)
        try {
          val header = readNpyHeader(in)
          val width = byteWidth(header.descr)
          skipFully(in, from * width)
          val bytes = new Array[Byte](count * width)
          new DataInputStream(in).readFully(bytes)
          NpyArray(header.descr, Array(count.toLong), bytes)
        } finally in.close()
      } finally zf.close()
    }
    val data = slice("data").asDoubles
    val indices = slice("indices").asLongs
    (lo until hi).iterator.flatMap { m =>
      (indptr(m) until indptr(m + 1)).iterator.map { k =>
        val off = (k - from).toInt
        (0L, m.toLong, indices(off), data(off))
      }
    }
  }

  /** One file → COO triples iterator. CSR/CSC expanded via indptr. */
  private[sources] def readOne(fileId: Long, path: String): Iterator[(Long, Long, Long, Double)] = {
    val arrays = readNpzArrays(path)
    def arr(name: String): NpyArray =
      arrays.getOrElse(name, throw new IllegalArgumentException(s"$path: missing $name.npy — not a scipy sparse npz"))
    val format = arrays
      .get("format")
      .map(_.asString)
      .getOrElse(throw new IllegalArgumentException(s"$path: no 'format' member — not a scipy sparse npz"))
    val shape = arr("shape").asLongs
    format match {
      case "csr" | "csc" =>
        val data = arr("data").asDoubles
        val indices = arr("indices").asLongs
        val indptr = arr("indptr").asLongs
        val major = indptr.length - 1
        (0 until major).iterator.flatMap { m =>
          (indptr(m) until indptr(m + 1)).iterator.map { k =>
            val minor = indices(k.toInt)
            if (format == "csr") (fileId, m.toLong, minor, data(k.toInt))
            else (fileId, minor, m.toLong, data(k.toInt))
          }
        }
      case "coo" =>
        val data = arr("data").asDoubles
        val rows = arr("row").asLongs
        val cols = arr("col").asLongs
        data.indices.iterator.map(i => (fileId, rows(i), cols(i), data(i)))
      case other =>
        throw new NotImplementedError(s"sparse format '$other' (shape ${shape.mkString("x")}) not supported")
    }
  }

  // ---- NPY/NPZ parsing ----------------------------------------------------

  final case class NpyArray(descr: String, shape: Array[Long], bytes: Array[Byte]) {
    private def order(bb: ByteBuffer): ByteBuffer =
      bb.order(if (descr.startsWith(">")) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    private def kind: Char = descr.dropWhile(c => c == '<' || c == '>' || c == '|' || c == '=').head
    private def width: Int = NpzReader.byteWidth(descr)

    def asDoubles: Array[Double] = {
      val bb = order(ByteBuffer.wrap(bytes))
      val n = (bytes.length / width).toInt
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = (kind, width) match {
          case ('f', 4) => bb.getFloat(i * 4).toDouble
          case ('f', 8) => bb.getDouble(i * 8)
          case ('i', _) | ('u', _) => longAt(bb, i).toDouble
          case _ => throw new IllegalArgumentException(s"unsupported dtype $descr")
        }
        i += 1
      }
      out
    }

    def asLongs: Array[Long] = {
      val bb = order(ByteBuffer.wrap(bytes))
      val n = (bytes.length / width).toInt
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = longAt(bb, i); i += 1 }
      out
    }

    private def longAt(bb: ByteBuffer, i: Int): Long = (kind, width) match {
      case ('i', 1) => bb.get(i).toLong
      case ('i', 2) => bb.getShort(i * 2).toLong
      case ('i', 4) => bb.getInt(i * 4).toLong
      case ('i', 8) => bb.getLong(i * 8)
      case ('u', 1) => bb.get(i).toLong & 0xffL
      case ('u', 2) => bb.getShort(i * 2).toLong & 0xffffL
      case ('u', 4) => bb.getInt(i * 4).toLong & 0xffffffffL
      case ('u', 8) =>
        val v = bb.getLong(i * 8)
        if (v < 0) throw new IllegalArgumentException(s"uint64 value ${java.lang.Long.toUnsignedString(v)} exceeds Long.MaxValue")
        v
      case ('f', 4) => bb.getFloat(i * 4).toLong
      case ('f', 8) => bb.getDouble(i * 8).toLong
      case _        => throw new IllegalArgumentException(s"unsupported integer dtype $descr")
    }

    /** scipy stores `format` as a 0-d |S3 or <U3 scalar. */
    def asString: String =
      if (descr.contains("U")) {
        // UTF-32 little-endian code points
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val sb = new StringBuilder
        var i = 0
        while (i + 3 < bytes.length) {
          val cp = bb.getInt(i)
          if (cp != 0) sb.append(new String(Character.toChars(cp)))
          i += 4
        }
        sb.toString
      } else new String(bytes, "ASCII").takeWhile(_ != 0)
  }

  /** Parse members of an npz (zip of npy). Non-npy members skipped;
    * with `only`, members outside the set are not materialized.
    */
  private[sources] def readNpzArrays(path: String, only: Option[Set[String]] = None): Map[String, NpyArray] = {
    val zis = new ZipInputStream(new BufferedInputStream(new FileInputStream(path)))
    val out = Map.newBuilder[String, NpyArray]
    try {
      var entry = zis.getNextEntry
      while (entry != null) {
        if (entry.getName.endsWith(".npy")) {
          val name = entry.getName.stripSuffix(".npy")
          if (only.forall(_.contains(name))) out += name -> readNpy(zis)
        }
        entry = zis.getNextEntry
      }
    } finally zis.close()
    out.result()
  }

  final case class NpyHeader(descr: String, shape: Array[Long])

  /** Parse the NPY magic+header, leaving the stream at the payload. */
  private[sources] def readNpyHeader(in: InputStream): NpyHeader = {
    val din = new DataInputStream(in)
    val magic = new Array[Byte](6)
    din.readFully(magic)
    require(magic.sameElements(Array(0x93.toByte) ++ "NUMPY".getBytes("ASCII")), "bad NPY magic")
    val major = din.readByte()
    din.readByte() // minor
    val headerLen =
      if (major == 1) java.lang.Short.toUnsignedInt(java.lang.Short.reverseBytes(din.readShort()))
      else Integer.reverseBytes(din.readInt())
    val header = new Array[Byte](headerLen)
    din.readFully(header)
    val h = new String(header, "ASCII")
    val descr = extract(h, "'descr':").stripPrefix("'").takeWhile(_ != '\'')
    val shapeStr = h.substring(h.indexOf("'shape':") + 8).dropWhile(_ != '(').drop(1).takeWhile(_ != ')')
    val shape = shapeStr.split(',').map(_.trim).filter(_.nonEmpty).map(_.toLong)
    NpyHeader(descr, shape)
  }

  /** Bytes per element for an NPY descr. 'U' widths count
    * CHARACTERS at 4 bytes each (UTF-32).
    */
  private[sources] def byteWidth(descr: String): Int = {
    val w = descr.dropWhile(!_.isDigit).toInt
    val kind = descr.dropWhile(c => c == '<' || c == '>' || c == '|' || c == '=').head
    if (kind == 'U') w * 4 else w
  }

  private[sources] def readNpy(in: InputStream): NpyArray = {
    val hdr = readNpyHeader(in)
    val width = byteWidth(hdr.descr)
    val count = if (hdr.shape.isEmpty) 1L else hdr.shape.product
    val bytes = new Array[Byte]((count * width).toInt)
    new DataInputStream(in).readFully(bytes)
    NpyArray(hdr.descr, hdr.shape, bytes)
  }

  private def extract(header: String, key: String): String =
    header.substring(header.indexOf(key) + key.length).trim

  /** Throw-away EOF-safe skip helper kept for future row-range splits. */
  @throws[EOFException]
  private[sources] def skipFully(in: InputStream, n: Long): Unit = {
    var remaining = n
    while (remaining > 0) {
      val s = in.skip(remaining)
      if (s <= 0) {
        if (in.read() < 0) throw new EOFException()
        remaining -= 1
      } else remaining -= s
    }
  }
}
