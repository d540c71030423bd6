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
    private def width: Int = descr.dropWhile(!_.isDigit).toInt

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
      case ('u', 4) => bb.getInt(i * 4).toLong & 0xffffffffL
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

  /** Parse every member of an npz (zip of npy). Non-npy members skipped. */
  private[sources] def readNpzArrays(path: String): Map[String, NpyArray] = {
    val zis = new ZipInputStream(new BufferedInputStream(new FileInputStream(path)))
    val out = Map.newBuilder[String, NpyArray]
    try {
      var entry = zis.getNextEntry
      while (entry != null) {
        if (entry.getName.endsWith(".npy")) {
          val name = entry.getName.stripSuffix(".npy")
          out += name -> readNpy(zis)
        }
        entry = zis.getNextEntry
      }
    } finally zis.close()
    out.result()
  }

  private[sources] def readNpy(in: InputStream): NpyArray = {
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
    val width = descr.dropWhile(!_.isDigit).toInt
    val count = if (shape.isEmpty) 1L else shape.product
    val bytes = new Array[Byte]((count * width).toInt)
    din.readFully(bytes)
    NpyArray(descr, shape, bytes)
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
