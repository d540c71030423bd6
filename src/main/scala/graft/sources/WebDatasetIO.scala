package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WebDataset export/ingest — the OTHER training-loader handoff
  * next to [[TfRecordIO]]: POSIX ustar tar shards where each sample
  * is a group of files sharing a key prefix (`{key}.{field}`), the
  * layout WebDataset/img2dataset loaders stream sequentially. Ideal
  * for the multimodal rows this library carries (binary columns
  * write as raw member files — a jpg is a jpg in the shard).
  *
  * The ustar format is hand-rolled (public, byte-stable): 512-byte
  * headers with octal sizes + checksum, content padded to 512, two
  * zero blocks at end — `tar -tf` lists our shards (spec-pinned
  * against the system tar). One `mapPartitionsWithIndex` pass
  * writes `part-NNNNN.tar` per partition via the Hadoop FileSystem;
  * the reader parses members per shard and groups them by key.
  *
  * Field encoding: string → UTF-8 file; binary → raw bytes;
  * long/int/double → decimal string (re-parsed on read per the
  * caller's schema). Null fields omit their member file (the
  * WebDataset idiom), surfacing as null on read.
  */
object WebDatasetIO {

  private val Block = 512

  private def headerFor(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100, s"tar member name too long: $name")
    val h = new Array[Byte](Block)
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, h, off, math.min(b.length, len))
    }
    put(name, 0, 100)
    put("0000644\u0000", 100, 8)             // mode
    put("0000000\u0000", 108, 8)             // uid
    put("0000000\u0000", 116, 8)             // gid
    put(f"$size%011o\u0000", 124, 12)        // size, octal
    put("00000000000\u0000", 136, 12)        // mtime 0 (deterministic shards)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces for the sum
    h(156) = '0'                              // typeflag: regular file
    put("ustar\u0000", 257, 6)
    put("00", 263, 2)
    var sum = 0
    var i = 0
    while (i < Block) { sum += h(i) & 0xFF; i += 1 }
    put(f"$sum%06o\u0000 ", 148, 8)
    h
  }

  private def writeMember(out: java.io.OutputStream, name: String, data: Array[Byte]): Unit = {
    out.write(headerFor(name, data.length.toLong))
    out.write(data)
    val pad = (Block - (data.length % Block)) % Block
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  private def bytesOf(dt: DataType, v: Any): Array[Byte] = dt match {
    case StringType => v.asInstanceOf[String].getBytes("UTF-8")
    case BinaryType => v.asInstanceOf[Array[Byte]]
    case LongType => v.asInstanceOf[Long].toString.getBytes("UTF-8")
    case IntegerType => v.asInstanceOf[Int].toString.getBytes("UTF-8")
    case DoubleType => v.asInstanceOf[Double].toString.getBytes("UTF-8")
    case other => throw new IllegalArgumentException(s"unsupported WebDataset field type: $other")
  }

  private def valueOf(dt: DataType, b: Array[Byte]): Any = dt match {
    case StringType => new String(b, "UTF-8")
    case BinaryType => b
    case LongType => new String(b, "UTF-8").toLong
    case IntegerType => new String(b, "UTF-8").toInt
    case DoubleType => new String(b, "UTF-8").toDouble
    case other => throw new IllegalArgumentException(s"unsupported WebDataset field type: $other")
  }

  /** Write tar shards under `path`, one per partition; member names
    * are `{key}.{field}` with the key from `keyCol` (cast to
    * string, must be member-name-safe and unique per row).
    */
  def write(df: DataFrame, path: String, keyCol: String): Unit = {
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(path)
    val baseFs = base.getFileSystem(conf.value)
    baseFs.mkdirs(base)
    // Re-writing with fewer partitions must not leave stale shards
    // that read() would silently merge in: clear prior part-*.tar.
    baseFs.globStatus(new org.apache.hadoop.fs.Path(base, "part-*.tar"))
      .foreach(st => baseFs.delete(st.getPath, false))
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val p = new org.apache.hadoop.fs.Path(path, f"part-$idx%05d.tar")
      val fs = p.getFileSystem(conf.value)
      val out = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
      var n = 0L
      try {
        rows.foreach { r =>
          val key = String.valueOf(r.get(keyIdx))
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            if (i != keyIdx && !r.isNullAt(i))
              writeMember(out, s"$key.${f.name}", bytesOf(f.dataType, r.get(i)))
          }
          n += 1
        }
        out.write(new Array[Byte](2 * Block)) // end-of-archive
      } finally out.close()
      Iterator.single(n)
    }.count()
  }

  /** Parse a tar shard's bytes into (memberName, content).
    *
    * Only REGULAR-file members are emitted: externally-produced
    * shards (GNU/bsdtar) commonly carry PAX extended headers
    * (typeflag 'x'/'g') and directory members ('5'); those are
    * skipped - payload consumed and discarded - instead of failing,
    * so loader-written archives ingest cleanly.
    */
  def parseTar(bytes: Array[Byte]): Iterator[(String, Array[Byte])] = new Iterator[(String, Array[Byte])] {
    private var pos = 0
    // (name, size, isRegularFile)
    private def headerAt(p: Int): Option[(String, Int, Boolean)] = {
      if (p + Block > bytes.length) return None
      if (bytes(p) == 0) return None // end-of-archive zero block
      val nameEnd = {
        var e = p
        while (e < p + 100 && bytes(e) != 0) e += 1
        e
      }
      val name = new String(bytes, p, nameEnd - p, "UTF-8")
      val sizeStr = new String(bytes, p + 124, 12, "US-ASCII").trim.stripSuffix("\u0000").trim
      val size = java.lang.Long.parseLong(sizeStr.replace("\u0000", "").trim, 8).toInt
      val tf = bytes(p + 156)
      val regular = tf == '0'.toByte || tf == 0.toByte
      Some((name, size, regular))
    }
    private var nextHeader = headerAt(0)
    private def advancePast(size: Int): Unit = {
      pos = pos + Block + size + ((Block - (size % Block)) % Block)
      nextHeader = headerAt(pos)
    }
    private def skipNonRegular(): Unit =
      while (nextHeader.exists(!_._3)) advancePast(nextHeader.get._2)
    skipNonRegular()
    override def hasNext: Boolean = nextHeader.isDefined
    override def next(): (String, Array[Byte]) = {
      val (name, size, _) = nextHeader.get
      val dataOff = pos + Block
      val content = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + size)
      advancePast(size)
      skipNonRegular()
      (name, content)
    }
  }

  /** Stream a tar's REGULAR-file members off an input stream —
    * one member of peak memory instead of the whole shard (the old
    * binaryFile read held every shard byte AND re-materialized all
    * members, with a 2 GiB hard ceiling). PAX extended headers
    * ('x'/'g') and directories skip exactly as in [[parseTar]];
    * truncation mid-member throws. Closes `in` at end-of-archive.
    */
  def streamTarMembers(in: java.io.InputStream, shard: String): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var closed = false
      private var staged: (String, Array[Byte]) = _
      private def readFully(buf: Array[Byte], len: Int): Boolean = {
        var got = 0
        while (got < len) {
          val n = in.read(buf, got, len - got)
          if (n < 0) {
            require(got == 0, s"truncated tar member in $shard")
            return false
          }
          got += n
        }
        true
      }
      private def advance(): Unit = {
        staged = null
        val header = new Array[Byte](Block)
        while (staged == null && !closed) {
          if (!readFully(header, Block) || header(0) == 0) {
            closed = true; in.close(); return
          }
          var nameEnd = 0
          while (nameEnd < 100 && header(nameEnd) != 0) nameEnd += 1
          val name = new String(header, 0, nameEnd, "UTF-8")
          val sizeStr = new String(header, 124, 12, "US-ASCII")
            .replace("\u0000", "").replace(" ", "").trim
          val size = java.lang.Long.parseLong(sizeStr, 8).toInt
          val tf = header(156)
          val regular = tf == '0'.toByte || tf == 0.toByte
          val padded = size + ((Block - (size % Block)) % Block)
          if (regular) {
            val content = new Array[Byte](size)
            require(readFully(content, size), s"truncated tar member $name in $shard")
            val pad = new Array[Byte](padded - size)
            require(readFully(pad, pad.length), s"truncated tar padding after $name in $shard")
            staged = (name, content)
          } else {
            val skip = new Array[Byte](padded)
            require(readFully(skip, padded), s"truncated tar member $name in $shard")
          }
        }
      }
      advance()
      override def hasNext: Boolean = staged != null
      override def next(): (String, Array[Byte]) = {
        val r = staged; advance(); r
      }
    }

  /** Read shards back; `keyCol` must be in `schema` (string-typed
    * keys round-trip; numeric keys re-parse).
    *
    * Scale shape: shard paths are driver-side metadata; members
    * stream per shard via [[streamTarMembers]] and group into rows
    * by ADJACENCY — a sample's members are consecutive in the tar,
    * which is the WebDataset format's own contract (samples stream
    * sequentially through loaders) and what [[write]] emits — so
    * peak task memory is ONE SAMPLE, not one shard.
    */
  def read(spark: SparkSession, path: String, schema: StructType, keyCol: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(conf.value)
    val shards = Option(fs.globStatus(new org.apache.hadoop.fs.Path(base, "*.tar")))
      .getOrElse(throw new java.io.FileNotFoundException(s"WebDataset path does not exist: $path"))
      .map(_.getPath.toString).sorted.toSeq
    val fieldNames = schema.fields.map(_.name).filter(_ != keyCol).toSet
    val rows = spark.sparkContext
      .parallelize(shards, math.max(1, shards.length))
      .flatMap { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        val in = new java.io.BufferedInputStream(hp.getFileSystem(conf.value).open(hp), 1 << 16)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        val members = streamTarMembers(in, p).map { case (name, c) =>
          val cut = name.lastIndexOf('.')
          require(cut > 0 && fieldNames.contains(name.substring(cut + 1)),
            s"unexpected member $name")
          (name.substring(0, cut), name.substring(cut + 1), c)
        }.buffered
        new Iterator[Row] {
          override def hasNext: Boolean = members.hasNext
          override def next(): Row = {
            val key = members.head._1
            val byField = scala.collection.mutable.Map.empty[String, Array[Byte]]
            while (members.hasNext && members.head._1 == key) {
              val (_, f, c) = members.next()
              byField(f) = c
            }
            Row.fromSeq(schema.fields.map { f =>
              if (f.name == keyCol) valueOf(f.dataType, key.getBytes("UTF-8"))
              else byField.get(f.name).map(valueOf(f.dataType, _)).orNull
            }.toSeq)
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
