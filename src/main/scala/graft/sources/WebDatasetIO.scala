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
    // stage-and-swap (same contract as TfRecordIO.write): the prior
    // dataset is deleted only AFTER the write job succeeds, so a
    // failed job cannot destroy it; stale-shard clearing still holds
    val staging = new org.apache.hadoop.fs.Path(base,
      s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    baseFs.mkdirs(staging)
    val stagingStr = staging.toString
    try {
      df.rdd.mapPartitionsWithIndex { (idx, rows) =>
        val p = new org.apache.hadoop.fs.Path(stagingStr, f"part-$idx%05d.tar")
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
      baseFs.globStatus(new org.apache.hadoop.fs.Path(base, "part-*.tar"))
        .foreach(st => baseFs.delete(st.getPath, false))
      baseFs.globStatus(new org.apache.hadoop.fs.Path(staging, "part-*.tar"))
        .foreach { st =>
          val dest = new org.apache.hadoop.fs.Path(base, st.getPath.getName)
          require(baseFs.rename(st.getPath, dest), s"rename ${st.getPath} -> $dest failed")
        }
    } finally {
      baseFs.delete(staging, true)
      ()
    }
  }

  /** Parse a tar shard's bytes into (memberName, content) — the
    * in-memory twin of [[streamTarMembers]] (same PAX/longname/
    * prefix name resolution, same skip semantics).
    */
  def parseTar(bytes: Array[Byte]): Iterator[(String, Array[Byte])] =
    streamTarMembers(new java.io.ByteArrayInputStream(bytes), "<memory>")

  /** A PAX extended header payload is a sequence of
    * "len key=value\n" records; return the `path` override if the
    * payload carries one (the record that restores member names
    * past ustar's 100-char field).
    */
  private def paxPath(payload: Array[Byte]): Option[String] = {
    var p = 0
    while (p < payload.length) {
      var sp = p
      while (sp < payload.length && payload(sp) != ' '.toByte) sp += 1
      if (sp >= payload.length) return None
      val len =
        try new String(payload, p, sp - p, "US-ASCII").trim.toInt
        catch { case _: NumberFormatException => return None }
      if (len <= 0 || p + len > payload.length) return None
      val rec = new String(payload, sp + 1, p + len - sp - 2, "UTF-8") // drop trailing \n
      val eq = rec.indexOf('=')
      if (eq > 0 && rec.substring(0, eq) == "path") return Some(rec.substring(eq + 1))
      p += len
    }
    None
  }

  /** Stream a tar's REGULAR-file members off an input stream —
    * one member of peak memory instead of the whole shard (the old
    * binaryFile read held every shard byte AND re-materialized all
    * members, with a 2 GiB hard ceiling).
    *
    * Long member names resolve through all three mechanisms real
    * tars use: a PAX extended header's `path` record (typeflag 'x'),
    * a GNU longname member (typeflag 'L'), and the ustar `prefix`
    * field (offset 345) — externally-produced shards with >100-char
    * member names yield their FULL names instead of silently
    * truncated keys. PAX global headers ('g') and directories skip
    * (payload consumed and discarded); truncation mid-member throws.
    * Closes `in` at end-of-archive.
    */
  def streamTarMembers(in: java.io.InputStream, shard: String): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var closed = false
      private var staged: (String, Array[Byte]) = _
      // pending name override from a preceding 'x' PAX or 'L'
      // longname member — applies to the NEXT real member only
      private var nameOverride: Option[String] = None
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
      private def cString(h: Array[Byte], off: Int, max: Int): String = {
        var end = off
        while (end < off + max && h(end) != 0) end += 1
        new String(h, off, end - off, "UTF-8")
      }
      private def advance(): Unit = {
        staged = null
        val header = new Array[Byte](Block)
        while (staged == null && !closed) {
          if (!readFully(header, Block) || header(0) == 0) {
            closed = true; in.close(); return
          }
          val shortName = cString(header, 0, 100)
          val sizeStr = new String(header, 124, 12, "US-ASCII")
            .replace("\u0000", "").replace(" ", "").trim
          val size = java.lang.Long.parseLong(sizeStr, 8).toInt
          val tf = header(156)
          val regular = tf == '0'.toByte || tf == 0.toByte
          val padded = size + ((Block - (size % Block)) % Block)
          if (regular) {
            val content = new Array[Byte](size)
            require(readFully(content, size), s"truncated tar member $shortName in $shard")
            val pad = new Array[Byte](padded - size)
            require(readFully(pad, pad.length), s"truncated tar padding after $shortName in $shard")
            // name precedence per the specs: explicit override beats
            // ustar prefix+name beats the bare 100-char field. The
            // prefix field exists ONLY in POSIX ustar/PAX headers —
            // GNU (oldgnu) stores atime/ctime at offsets 345/357, so
            // honoring it unconditionally would prepend octal garbage
            // to every GNU-archive member name. Gate on the magic.
            val isUstar = header(257) == 'u'.toByte && header(258) == 's'.toByte &&
              header(259) == 't'.toByte && header(260) == 'a'.toByte &&
              header(261) == 'r'.toByte && header(262) == 0.toByte
            val prefix = if (isUstar) cString(header, 345, 155) else ""
            val ustarName = if (prefix.isEmpty) shortName else s"$prefix/$shortName"
            staged = (nameOverride.getOrElse(ustarName), content)
            nameOverride = None
          } else {
            val payload = new Array[Byte](padded)
            require(readFully(payload, padded), s"truncated tar member $shortName in $shard")
            if (tf == 'x'.toByte) {
              // per-member PAX header: a 'path' record overrides the
              // following member's name; other records are metadata
              paxPath(java.util.Arrays.copyOf(payload, size)).foreach(p => nameOverride = Some(p))
            } else if (tf == 'L'.toByte) {
              // GNU longname: payload IS the next member's full name
              var e = 0
              while (e < size && payload(e) != 0) e += 1
              nameOverride = Some(new String(payload, 0, e, "UTF-8"))
            } else {
              // 'g' global headers, directories, links: consumed, no
              // override — AND they consume any pending override (a
              // PAX/longname header names its IMMEDIATE successor; a
              // >100-char directory's override must not leak onto the
              // next regular file).
              nameOverride = None
            }
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
