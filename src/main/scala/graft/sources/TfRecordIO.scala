package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** TFRecord export/ingest — the training-loader handoff format
  * (TensorFlow `tf.data`, PyTorch via tfrecord readers, array_record
  * tooling): length-framed records with masked CRC32C checksums,
  * each record a `tf.train.Example` protobuf. Both formats are
  * public and byte-stable, and the writer hand-rolls them — the
  * record framing (TFRecord spec: u64-LE length, masked crc of the
  * length, payload, masked crc of the payload) and the Example
  * message (protobuf wire format: int64_list / float_list /
  * bytes_list features keyed by name) — so no TF/protobuf
  * dependency rides the cluster.
  *
  * Scale shape: the writer is one `mapPartitionsWithIndex` pass —
  * each partition streams its rows into `part-NNNNN.tfrecord` via
  * the Hadoop FileSystem (any scheme), no driver data, shard count
  * = partition count (repartition upstream to size shards). The
  * reader lists shard paths (driver metadata only) and STREAMS
  * records per shard off an FSDataInputStream — peak task memory is
  * one record, so shard size is unbounded (no binaryFile 2 GiB
  * ceiling) — verifying both CRCs (corrupt shards fail loudly,
  * never yield silent rows).
  *
  * Type mapping (round-trip exact unless noted): long/int ↔
  * int64_list; string ↔ bytes_list (UTF-8); binary ↔ bytes_list;
  * float ↔ float_list; double → float_list is LOSSY (float32 — the
  * format has no double list; keep exactness by exporting scaled
  * int64s or strings); arrays of these map to multi-element lists.
  */
object TfRecordIO {

  // ---- CRC32C (Castagnoli, reflected poly 0x82F63B78) -------------------

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0x82F63B78 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  def crc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    var c = 0xFFFFFFFF
    var i = off
    val end = off + len
    while (i < end) {
      c = CrcTable((c ^ bytes(i)) & 0xFF) ^ (c >>> 8)
      i += 1
    }
    c ^ 0xFFFFFFFF
  }

  /** TFRecord's masked crc: rot-right-15 then add the magic. */
  def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = crc32c(bytes, off, len)
    ((c >>> 15) | (c << 17)) + 0xa282ead8
  }

  // ---- protobuf wire helpers ---------------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def varintLen(v0: Long): Int = {
    var v = v0; var n = 1
    while ((v & ~0x7FL) != 0) { n += 1; v >>>= 7 }
    n
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field << 3) | wire).toLong)

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int, payload: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, payload.length.toLong)
    out.write(payload)
  }

  // Feature message: bytes_list=1, float_list=2, int64_list=3
  private def int64ListFeature(vals: Seq[Long]): Array[Byte] = {
    val packed = new ByteArrayOutputStream()
    vals.foreach(writeVarint(packed, _))
    val list = new ByteArrayOutputStream()
    writeLenDelim(list, 1, packed.toByteArray) // Int64List.value packed
    val feat = new ByteArrayOutputStream()
    writeLenDelim(feat, 3, list.toByteArray)
    feat.toByteArray
  }

  private def floatListFeature(vals: Seq[Float]): Array[Byte] = {
    val packed = new ByteArrayOutputStream()
    vals.foreach { f =>
      val bits = java.lang.Float.floatToIntBits(f)
      packed.write(bits & 0xFF); packed.write((bits >>> 8) & 0xFF)
      packed.write((bits >>> 16) & 0xFF); packed.write((bits >>> 24) & 0xFF)
    }
    val list = new ByteArrayOutputStream()
    writeLenDelim(list, 1, packed.toByteArray) // FloatList.value packed
    val feat = new ByteArrayOutputStream()
    writeLenDelim(feat, 2, list.toByteArray)
    feat.toByteArray
  }

  private def bytesListFeature(vals: Seq[Array[Byte]]): Array[Byte] = {
    val list = new ByteArrayOutputStream()
    vals.foreach(writeLenDelim(list, 1, _)) // BytesList.value repeated
    val feat = new ByteArrayOutputStream()
    writeLenDelim(feat, 1, list.toByteArray)
    feat.toByteArray
  }

  private def featureOf(dt: DataType, v: Any): Array[Byte] = dt match {
    case LongType => int64ListFeature(Seq(v.asInstanceOf[Long]))
    case IntegerType => int64ListFeature(Seq(v.asInstanceOf[Int].toLong))
    case FloatType => floatListFeature(Seq(v.asInstanceOf[Float]))
    case DoubleType => floatListFeature(Seq(v.asInstanceOf[Double].toFloat))
    case StringType => bytesListFeature(Seq(v.asInstanceOf[String].getBytes("UTF-8")))
    case BinaryType => bytesListFeature(Seq(v.asInstanceOf[Array[Byte]]))
    case ArrayType(LongType, _) => int64ListFeature(v.asInstanceOf[scala.collection.Seq[Long]].toSeq)
    case ArrayType(IntegerType, _) => int64ListFeature(v.asInstanceOf[scala.collection.Seq[Int]].toSeq.map(_.toLong))
    case ArrayType(FloatType, _) => floatListFeature(v.asInstanceOf[scala.collection.Seq[Float]].toSeq)
    case ArrayType(DoubleType, _) => floatListFeature(v.asInstanceOf[scala.collection.Seq[Double]].toSeq.map(_.toFloat))
    case ArrayType(StringType, _) => bytesListFeature(v.asInstanceOf[scala.collection.Seq[String]].toSeq.map(_.getBytes("UTF-8")))
    case other => throw new IllegalArgumentException(s"unsupported TFRecord feature type: $other")
  }

  /** One `tf.train.Example` from a row — features sorted by name so
    * the bytes are deterministic. Null fields are OMITTED (the
    * format's idiom for missing features).
    */
  def exampleBytes(row: Row, schema: StructType): Array[Byte] = {
    val features = new ByteArrayOutputStream()
    schema.fields.sortBy(_.name).foreach { f =>
      val i = schema.fieldIndex(f.name)
      if (!row.isNullAt(i)) {
        // map<string, Feature> entry: key=1 (string), value=2 (Feature)
        val entry = new ByteArrayOutputStream()
        writeLenDelim(entry, 1, f.name.getBytes("UTF-8"))
        writeLenDelim(entry, 2, featureOf(f.dataType, row.get(i)))
        writeLenDelim(features, 1, entry.toByteArray) // Features.feature
      }
    }
    val example = new ByteArrayOutputStream()
    writeLenDelim(example, 1, features.toByteArray) // Example.features
    example.toByteArray
  }

  private def frameRecord(out: java.io.OutputStream, data: Array[Byte]): Unit = {
    val lenBytes = new Array[Byte](8)
    var l = data.length.toLong
    var i = 0
    while (i < 8) { lenBytes(i) = (l & 0xFF).toByte; l >>>= 8; i += 1 }
    out.write(lenBytes)
    writeU32le(out, maskedCrc(lenBytes, 0, 8))
    out.write(data)
    writeU32le(out, maskedCrc(data, 0, data.length))
  }

  private def writeU32le(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  /** Write `df` as TFRecord shards `part-NNNNN.tfrecord` under
    * `path` — one shard per partition, one distributed pass.
    *
    * Stage-and-swap: shards land in a hidden staging dir first; the
    * prior dataset is only deleted AFTER the write job succeeds
    * (then staged shards rename in — metadata ops, not data
    * rewrites). A failed job therefore leaves the previous dataset
    * intact, and a re-write with fewer partitions still cannot
    * leave stale shards for read() to silently merge in.
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(path)
    val fs0 = base.getFileSystem(conf.value)
    fs0.mkdirs(base)
    val staging = new org.apache.hadoop.fs.Path(base,
      s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    fs0.mkdirs(staging)
    val stagingStr = staging.toString
    try {
      df.rdd.mapPartitionsWithIndex { (idx, rows) =>
        val p = new org.apache.hadoop.fs.Path(stagingStr, f"part-$idx%05d.tfrecord")
        val fs = p.getFileSystem(conf.value)
        val out = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
        var n = 0L
        try rows.foreach { r => frameRecord(out, exampleBytes(r, schema)); n += 1 }
        finally out.close()
        Iterator.single(n)
      }.count()
      // job succeeded — swap: clear prior shards, move staged ones in
      fs0.globStatus(new org.apache.hadoop.fs.Path(base, "part-*.tfrecord"))
        .foreach(st => fs0.delete(st.getPath, false))
      fs0.globStatus(new org.apache.hadoop.fs.Path(staging, "part-*.tfrecord"))
        .foreach { st =>
          val dest = new org.apache.hadoop.fs.Path(base, st.getPath.getName)
          require(fs0.rename(st.getPath, dest), s"rename ${st.getPath} -> $dest failed")
        }
    } finally {
      fs0.delete(staging, true)
      ()
    }
  }

  // ---- reader -------------------------------------------------------------

  private def readVarint(b: Array[Byte], pos: Array[Int]): Long = {
    var v = 0L; var shift = 0
    while (true) {
      val x = b(pos(0)); pos(0) += 1
      v |= (x & 0x7FL) << shift
      if ((x & 0x80) == 0) return v
      shift += 7
    }
    v
  }

  private def parseExample(data: Array[Byte], schema: StructType): Row = {
    // walk Example → Features → map entries; collect by name
    val vals = scala.collection.mutable.Map.empty[String, Any]
    def parseFeature(b: Array[Byte], from: Int, to: Int, dt: DataType): Any = {
      val pos = Array(from)
      var kind = -1
      var lo = 0; var hi = 0
      while (pos(0) < to) {
        val tag = readVarint(b, pos)
        val field = (tag >>> 3).toInt
        val len = readVarint(b, pos).toInt
        kind = field; lo = pos(0); hi = pos(0) + len
        pos(0) += len
      }
      // inner list message: field 1, packed or repeated
      val ip = Array(lo)
      kind match {
        case 3 => // Int64List
          val out = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (ip(0) < hi) {
            val t = readVarint(b, ip)
            val l = readVarint(b, ip).toInt
            val end = ip(0) + l
            require((t >>> 3).toInt == 1, "bad Int64List")
            while (ip(0) < end) out += readVarint(b, ip)
          }
          dt match {
            case LongType => out.headOption.orNull
            case IntegerType => out.headOption.map(_.toInt).orNull
            case ArrayType(LongType, _) => out.toSeq
            case ArrayType(IntegerType, _) => out.map(_.toInt).toSeq
            case other => throw new IllegalArgumentException(s"int64 feature vs $other")
          }
        case 2 => // FloatList
          val out = scala.collection.mutable.ArrayBuffer.empty[Float]
          while (ip(0) < hi) {
            val t = readVarint(b, ip)
            val l = readVarint(b, ip).toInt
            val end = ip(0) + l
            require((t >>> 3).toInt == 1, "bad FloatList")
            while (ip(0) < end) {
              val bits = (b(ip(0)) & 0xFF) | ((b(ip(0) + 1) & 0xFF) << 8) |
                ((b(ip(0) + 2) & 0xFF) << 16) | ((b(ip(0) + 3) & 0xFF) << 24)
              out += java.lang.Float.intBitsToFloat(bits)
              ip(0) += 4
            }
          }
          dt match {
            case FloatType => out.headOption.orNull
            case DoubleType => out.headOption.map(_.toDouble).orNull
            case ArrayType(FloatType, _) => out.toSeq
            case ArrayType(DoubleType, _) => out.map(_.toDouble).toSeq
            case other => throw new IllegalArgumentException(s"float feature vs $other")
          }
        case 1 => // BytesList
          val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          while (ip(0) < hi) {
            val t = readVarint(b, ip)
            val l = readVarint(b, ip).toInt
            require((t >>> 3).toInt == 1, "bad BytesList")
            out += java.util.Arrays.copyOfRange(b, ip(0), ip(0) + l)
            ip(0) += l
          }
          dt match {
            case StringType => out.headOption.map(new String(_, "UTF-8")).orNull
            case BinaryType => out.headOption.orNull
            case ArrayType(StringType, _) => out.map(new String(_, "UTF-8")).toSeq
            case other => throw new IllegalArgumentException(s"bytes feature vs $other")
          }
        case other => throw new IllegalArgumentException(s"unknown Feature kind $other")
      }
    }
    val p0 = Array(0)
    while (p0(0) < data.length) {
      val tag = readVarint(data, p0)
      val len = readVarint(data, p0).toInt
      val end = p0(0) + len
      if ((tag >>> 3).toInt == 1) {
        // Features message: repeated map entries
        while (p0(0) < end) {
          val t2 = readVarint(data, p0)
          val l2 = readVarint(data, p0).toInt
          val e2 = p0(0) + l2
          require((t2 >>> 3).toInt == 1, "bad Features")
          // map entry: key (1), value (2)
          var name: String = null
          var flo = -1; var fhi = -1
          while (p0(0) < e2) {
            val t3 = readVarint(data, p0)
            val l3 = readVarint(data, p0).toInt
            (t3 >>> 3).toInt match {
              case 1 => name = new String(data, p0(0), l3, "UTF-8")
              case 2 => flo = p0(0); fhi = p0(0) + l3
              case _ =>
            }
            p0(0) += l3
          }
          schema.fields.find(_.name == name).foreach { f =>
            vals(name) = parseFeature(data, flo, fhi, f.dataType)
          }
        }
      }
      p0(0) = end
    }
    Row.fromSeq(schema.fields.map(f => vals.getOrElse(f.name, null)).toSeq)
  }

  /** Parse a shard's bytes into records, CRC-verified. */
  def parseShard(bytes: Array[Byte]): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private var pos = 0
    override def hasNext: Boolean = pos < bytes.length
    override def next(): Array[Byte] = {
      var len = 0L
      var i = 0
      while (i < 8) { len |= (bytes(pos + i) & 0xFFL) << (8 * i); i += 1 }
      val lenCrc = u32le(bytes, pos + 8)
      require(lenCrc == maskedCrc(bytes, pos, 8), s"TFRecord length crc mismatch at offset $pos")
      val dataOff = pos + 12
      val data = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + len.toInt)
      val dataCrc = u32le(bytes, dataOff + len.toInt)
      require(dataCrc == maskedCrc(data, 0, data.length), s"TFRecord data crc mismatch at offset $pos")
      pos = dataOff + len.toInt + 4
      data
    }
  }

  private def u32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** Stream CRC-verified record payloads off an input stream without
    * materializing the shard — removes the 2 GiB `binaryFile`
    * ceiling and the shard-sized task memory spike; peak memory is
    * one record. Same corruption semantics as [[parseShard]]: both
    * CRCs checked (the length crc BEFORE the payload allocation, so
    * a corrupt length can never drive a giant alloc), mismatch or
    * truncation fails loudly, never silent rows. Closes `in` when
    * the last record is consumed.
    */
  def streamRecords(in: java.io.InputStream, totalLen: Long, name: String): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var pos = 0L
      private var closed = false
      private def readFully(buf: Array[Byte], len: Int): Unit = {
        var got = 0
        while (got < len) {
          val n = in.read(buf, got, len - got)
          require(n >= 0, s"truncated TFRecord shard $name at offset ${pos + got}")
          got += n
        }
      }
      override def hasNext: Boolean = {
        val more = pos < totalLen
        if (!more && !closed) { closed = true; in.close() }
        more
      }
      override def next(): Array[Byte] = {
        val header = new Array[Byte](12)
        readFully(header, 12)
        require(u32le(header, 8) == maskedCrc(header, 0, 8),
          s"TFRecord length crc mismatch at offset $pos in $name")
        var len = 0L; var i = 0
        while (i < 8) { len |= (header(i) & 0xFFL) << (8 * i); i += 1 }
        require(len <= Int.MaxValue - 8, s"TFRecord record length $len overflows at offset $pos in $name")
        val body = new Array[Byte](len.toInt + 4)
        readFully(body, len.toInt + 4)
        require(u32le(body, len.toInt) == maskedCrc(body, 0, len.toInt),
          s"TFRecord data crc mismatch at offset $pos in $name")
        pos += 12 + len + 4
        java.util.Arrays.copyOfRange(body, 0, len.toInt)
      }
    }

  /** Read TFRecord shards back into a DataFrame with the given
    * schema (features absent from a record come back null).
    *
    * Scale shape: shard paths are driver-side METADATA (a
    * `globStatus` listing); the bytes stream record-at-a-time per
    * task via [[streamRecords]] over an `FSDataInputStream`, one
    * Spark partition per shard — a 10 GiB shard costs one record of
    * task memory, where the old `binaryFile` read held the whole
    * shard (and hard-failed past 2 GiB).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(conf.value)
    // globStatus returns NULL (not empty) when the directory does
    // not exist — surface the path error, never an NPE
    val listed = Option(fs.globStatus(new org.apache.hadoop.fs.Path(base, "*.tfrecord")))
      .getOrElse(throw new java.io.FileNotFoundException(s"TFRecord path does not exist: $path"))
    val shards = listed.map(st => (st.getPath.toString, st.getLen)).sortBy(_._1).toSeq
    val rows = spark.sparkContext
      .parallelize(shards, math.max(1, shards.length))
      .flatMap { case (p, totalLen) =>
        val hp = new org.apache.hadoop.fs.Path(p)
        val in = new java.io.BufferedInputStream(hp.getFileSystem(conf.value).open(hp), 1 << 16)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        streamRecords(in, totalLen, p).map(parseExample(_, schema))
      }
    spark.createDataFrame(rows, schema)
  }
}
