package graft.sources

import graft.SparkSpec
import graft.operators.MetadataOps
import org.apache.spark.sql.functions._

import java.io.{ByteArrayOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{ZipEntry, ZipOutputStream}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  // ---- NPZ fixture construction (pure JVM, mirrors numpy save_npz) ----

  private def npyBytes(descr: String, shape: Seq[Long], payload: Array[Byte]): Array[Byte] = {
    val shapeStr = if (shape.isEmpty) "()" else if (shape.size == 1) s"(${shape.head},)" else shape.mkString("(", ", ", ")")
    var header = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
    val total = 10 + header.length
    val pad = (64 - (total + 1) % 64) % 64
    header = header + " " * pad + "\n"
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.write(0x93); d.writeBytes("NUMPY"); d.write(1); d.write(0)
    d.write(header.length & 0xff); d.write((header.length >> 8) & 0xff)
    d.writeBytes(header)
    d.write(payload)
    out.toByteArray
  }

  private def le[T](width: Int, xs: Seq[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(xs.size * width).order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach { x => width match { case 4 => bb.putInt(x.toInt); case 8 => bb.putLong(x) } }
    bb.array()
  }

  private def leDoubles(xs: Seq[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(xs.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(bb.putDouble)
    bb.array()
  }

  private def writeNpz(path: String, members: Map[String, Array[Byte]]): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(path))
    members.foreach { case (name, bytes) =>
      z.putNextEntry(new ZipEntry(s"$name.npy")); z.write(bytes); z.closeEntry()
    }
    z.close()
  }

  test("NpzReader parses a CSR matrix into COO triples") {
    // matrix [[1.0, 0, 2.0], [0, 0, 3.0]]
    val path = java.io.File.createTempFile("graft", ".npz").getAbsolutePath
    writeNpz(path, Map(
      "format" -> npyBytes("|S3", Nil, "csr".getBytes("ASCII")),
      "shape" -> npyBytes("<i8", Seq(2), le(8, Seq(2L, 3L))),
      "data" -> npyBytes("<f8", Seq(3), leDoubles(Seq(1.0, 2.0, 3.0))),
      "indices" -> npyBytes("<i4", Seq(3), le(4, Seq(0L, 2L, 2L))),
      "indptr" -> npyBytes("<i4", Seq(3), le(4, Seq(0L, 2L, 3L)))
    ))
    val df = NpzReader.read(spark, Seq(path))
    val triples = df.select("row", "col", "value").as[(Long, Long, Double)].collect().toSet
    assert(triples == Set((0L, 0L, 1.0), (0L, 2L, 2.0), (1L, 2L, 3.0)))
  }

  test("NpzReader.readSplit: row-range tasks reproduce the whole-file CSR read") {
    // 5-row CSR with varying row lengths
    val path = java.io.File.createTempFile("graft-split", ".npz").getAbsolutePath
    val data = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0)
    val indices = Seq(0L, 2L, 1L, 0L, 1L, 2L, 3L)
    val indptr = Seq(0L, 2L, 3L, 3L, 6L, 7L)
    writeNpz(path, Map(
      "format" -> npyBytes("|S3", Nil, "csr".getBytes("ASCII")),
      "shape" -> npyBytes("<i8", Seq(2), le(8, Seq(5L, 4L))),
      "data" -> npyBytes("<f8", Seq(7), leDoubles(data)),
      "indices" -> npyBytes("<i4", Seq(7), le(4, indices)),
      "indptr" -> npyBytes("<i4", Seq(6), le(4, indptr))
    ))
    val whole = NpzReader.read(spark, Seq(path))
      .select("row", "col", "value").as[(Long, Long, Double)].collect().toSet
    val split = NpzReader.readSplit(spark, path, rowsPerTask = 2)
      .select("row", "col", "value").as[(Long, Long, Double)].collect().toSet
    assert(split == whole)
    assert(split.size == 7)
  }

  test("NpzReader handles <U3 format members and uint16/uint64 index dtypes") {
    // scipy >=1.8 writes `format` as a '<U3' (UTF-32) scalar
    def utf32(s: String): Array[Byte] = {
      val bb = ByteBuffer.allocate(s.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      s.foreach(c => bb.putInt(c.toInt))
      bb.array()
    }
    def leU2(xs: Seq[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(xs.size * 2).order(ByteOrder.LITTLE_ENDIAN)
      xs.foreach(x => bb.putShort(x.toShort))
      bb.array()
    }
    val path = java.io.File.createTempFile("graft-u", ".npz").getAbsolutePath
    writeNpz(path, Map(
      "format" -> npyBytes("<U3", Nil, utf32("csr")),
      "shape" -> npyBytes("<u8", Seq(2), le(8, Seq(2L, 3L))),
      "data" -> npyBytes("<f8", Seq(3), leDoubles(Seq(1.0, 2.0, 3.0))),
      "indices" -> npyBytes("<u2", Seq(3), leU2(Seq(0L, 2L, 40000L))), // 40000 > Short.MaxValue
      "indptr" -> npyBytes("<u8", Seq(3), le(8, Seq(0L, 2L, 3L)))
    ))
    val df = NpzReader.read(spark, Seq(path))
    val triples = df.select("row", "col", "value").as[(Long, Long, Double)].collect().toSet
    assert(triples == Set((0L, 0L, 1.0), (0L, 2L, 2.0), (1L, 40000L, 3.0)))
  }

  test("NpzReader parses a COO matrix") {
    val path = java.io.File.createTempFile("graft", ".npz").getAbsolutePath
    writeNpz(path, Map(
      "format" -> npyBytes("|S3", Nil, "coo".getBytes("ASCII")),
      "shape" -> npyBytes("<i8", Seq(2), le(8, Seq(2L, 2L))),
      "data" -> npyBytes("<f4", Seq(2), {
        val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        bb.putFloat(5.0f); bb.putFloat(7.0f); bb.array()
      }),
      "row" -> npyBytes("<i8", Seq(2), le(8, Seq(0L, 1L))),
      "col" -> npyBytes("<i8", Seq(2), le(8, Seq(1L, 0L)))
    ))
    val df = NpzReader.read(spark, Seq(path))
    val triples = df.select("row", "col", "value").as[(Long, Long, Double)].collect().toSet
    assert(triples == Set((0L, 1L, 5.0), (1L, 0L, 7.0)))
  }

  test("ArrowIpcWriter.writeDir: distributed sharded export, one arrow file per partition, reader round-trip") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("name", concat(lit("n"), col("id")))
      .withColumn("v", when(col("id") % 97 === 0, lit(null).cast("double")).otherwise(col("id") * 0.5))
      .repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("graft-arrowdir").toString + "/out"
    ArrowIpcWriter.writeDir(df, dir, batchRows = 128)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrow")).map(_.getAbsolutePath).sorted
    assert(parts.length == 4, s"parts: ${parts.length}")
    assert(new java.io.File(dir, "_SUCCESS").exists())
    val back = ArrowIpcReader.read(spark, parts.toSeq)
    assert(back.count() == 1000)
    assert(back.filter(col("v").isNull).count() == 11) // ids 0,97,...,970
    assert(back.agg(sum("id")).collect()(0).getLong(0) == 499500L)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "v"))
  }

  test("Arrow IPC round-trips list<float> embedding columns (real embeddings table slice)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").filter(col("vec_id") < 50)
    val path = java.io.File.createTempFile("graft-emb", ".arrow").getAbsolutePath
    ArrowIpcWriter.write(emb, path, batchRows = 16)
    val back = ArrowIpcReader.read(spark, Seq(path))
    assert(back.schema("embedding").dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    val orig = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val got = back.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.keySet == orig.keySet && got.size == 50)
    orig.foreach { case (id, v) => assert(got(id) == v, s"vec $id differs") }
    // empty list and null list survive too
    val edge = Seq((1L, Seq(1.5f, -2.5f)), (2L, Seq.empty[Float]), (3L, null.asInstanceOf[Seq[Float]]))
      .toDF("id", "vec")
    val p2 = java.io.File.createTempFile("graft-edge", ".arrow").getAbsolutePath
    ArrowIpcWriter.write(edge, p2)
    val eb = ArrowIpcReader.read(spark, Seq(p2)).collect().map(r => r.getLong(0) -> Option(r.getSeq[Float](1))).toMap
    assert(eb(1L).contains(Seq(1.5f, -2.5f)) && eb(2L).contains(Seq.empty[Float]) && eb(3L).isEmpty, eb.toString)
  }

  test("ArrowIpcReader round-trips an IPC file written with Arrow Java") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    val path = java.io.File.createTempFile("graft", ".arrow").getAbsolutePath
    val allocator = new RootAllocator()
    val schema = new ASchema(java.util.List.of(
      new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("name", FieldType.nullable(ArrowType.Utf8.INSTANCE), null),
      new Field("score", FieldType.nullable(new ArrowType.FloatingPoint(
        org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)), null)
    ))
    val root = VectorSchemaRoot.create(schema, allocator)
    val ids = root.getVector("id").asInstanceOf[BigIntVector]
    val names = root.getVector("name").asInstanceOf[VarCharVector]
    val scores = root.getVector("score").asInstanceOf[Float8Vector]
    ids.allocateNew(3); names.allocateNew(); scores.allocateNew(3)
    Seq((0, 1L, "a", 0.5), (1, 2L, "b", 1.5), (2, 3L, "c", 2.5)).foreach { case (i, id, nm, sc) =>
      ids.set(i, id); names.setSafe(i, nm.getBytes("UTF-8")); scores.set(i, sc)
    }
    root.setRowCount(3)
    val ch = new java.io.FileOutputStream(path).getChannel
    val w = new ArrowFileWriter(root, null, ch)
    w.start(); w.writeBatch(); w.end(); w.close(); ch.close()
    root.close(); allocator.close()

    val df = BioLoader.load(spark, path)
    assert(df.columns.toSeq == Seq("id", "name", "score"))
    val rows = df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, "a", 0.5), (2L, "b", 1.5), (3L, "c", 2.5)))
  }

  test("BioLoader reads csv and tsv with headers") {
    val dir = java.nio.file.Files.createTempDirectory("graft").toFile.getAbsolutePath
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.csv"), "x,y\n1,foo\n2,bar\n")
    val df = BioLoader.load(spark, s"$dir/a.csv")
    assert(df.columns.toSeq == Seq("x", "y") && df.count() == 2)
  }

  test("CsvOptions parity: skip_rows, columns, new_columns, n_rows, null_values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csvopts").toFile
    val f = new java.io.File(dir, "d.csv")
    val w = new java.io.PrintWriter(f)
    w.println("# banner line one")
    w.println("# banner line two")
    w.println("a,b,c")
    w.println("1,x,NA")
    w.println("2,y,ok")
    w.println("3,z,miss")
    w.close()

    // skip_rows removes the banner before header parsing
    val df = BioLoader.load(spark, Seq(f.getAbsolutePath),
      BioLoader.CsvOptions(skipRows = 2, nullValues = Seq("NA", "miss")))
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 3)
    assert(df.filter(col("c").isNull).count() == 2) // NA + miss normalized

    // columns projection + new_columns rename + n_rows cap
    val proj = BioLoader.load(spark, Seq(f.getAbsolutePath),
      BioLoader.CsvOptions(skipRows = 2, newColumns = Seq("x1", "x2", "x3"),
        columns = Seq("x3", "x1"), nRows = Some(2)))
    assert(proj.columns.toSeq == Seq("x3", "x1"))
    assert(proj.count() == 2)
  }

  test("compressed csv dispatch: .csv.gz and .csv.bz2 load through the csv reader (test_load.py:961)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gz").toFile
    val body = "col_1,col_2,col_3\n0,0,0.0\n1,1,1.0\n2,2,2.0\n3,3,3.0\n"
    val gz = new java.io.File(dir, "d.csv.gz")
    val go = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(gz))
    go.write(body.getBytes("UTF-8")); go.close()
    val gdf = BioLoader.load(spark, gz.getAbsolutePath)
    assert(gdf.columns.toSeq == Seq("col_1", "col_2", "col_3") && gdf.count() == 4)

    val bz = new java.io.File(dir, "d.csv.bz2")
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(spark.sparkContext.hadoopConfiguration)
    val bo = codec.createOutputStream(new java.io.FileOutputStream(bz))
    bo.write(body.getBytes("UTF-8")); bo.close()
    val bdf = BioLoader.load(spark, bz.getAbsolutePath)
    assert(bdf.columns.toSeq == Seq("col_1", "col_2", "col_3") && bdf.count() == 4)
  }

  test("zip csv: flat and dir-nested entries unpack and union (test_load.py:983)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zip").toFile
    val z = new java.io.File(dir, "archive.zip")
    val zo = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(z))
    def put(name: String, rows: Range): Unit = {
      zo.putNextEntry(new java.util.zip.ZipEntry(name))
      zo.write(("col_1,col_2\n" + rows.map(i => s"$i,${i * 10}").mkString("\n") + "\n").getBytes("UTF-8"))
      zo.closeEntry()
    }
    put("a.csv", 0 until 4)
    put("nested/b.csv", 4 until 8) // dir-nested variant
    zo.putNextEntry(new java.util.zip.ZipEntry("__MACOSX/._a.csv")); zo.write("junk".getBytes); zo.closeEntry()
    zo.close()
    val df = BioLoader.load(spark, z.getAbsolutePath)
    assert(df.count() == 8)
    assert(df.columns.toSeq == Seq("col_1", "col_2"))
  }

  test("repeated loads of one zip reuse a single extraction; a rewritten zip re-extracts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zipcache").toFile
    val z = new java.io.File(dir, "cached.zip")
    def write(body: String): Unit = {
      val zo = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(z))
      zo.putNextEntry(new java.util.zip.ZipEntry("a.csv")); zo.write(body.getBytes("UTF-8")); zo.closeEntry()
      zo.close()
    }
    write("x\n1\n")
    val first = BioLoader.unzip(z.getAbsolutePath)
    val second = BioLoader.unzip(z.getAbsolutePath)
    assert(first == second, "same (path,size,mtime) must reuse the extraction dir, not leak a new one")
    write("x\n1\n2\n") // different size → new cache key
    z.setLastModified(z.lastModified() + 2000)
    val third = BioLoader.unzip(z.getAbsolutePath)
    assert(third != first, "a rewritten zip must re-extract")
    assert(BioLoader.load(spark, z.getAbsolutePath).count() == 2)
  }

  test("feather extension aliases to the Arrow IPC reader (data_files.py:29-38)") {
    // Feather v2 IS Arrow IPC: write an .arrow fixture, rename
    val dir = java.nio.file.Files.createTempDirectory("graft-feather").toFile
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    val path = new java.io.File(dir, "d.feather").getAbsolutePath
    val alloc = new RootAllocator()
    val schema = new ASchema(java.util.List.of(
      new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null)))
    val root = VectorSchemaRoot.create(schema, alloc)
    val ids = root.getVector("id").asInstanceOf[BigIntVector]
    ids.allocateNew(3); (0 until 3).foreach(i => ids.setSafe(i, i * 7L)); root.setRowCount(3)
    val ch = new java.io.FileOutputStream(path).getChannel
    val w = new ArrowFileWriter(root, null, ch)
    w.start(); w.writeBatch(); w.end(); w.close(); ch.close(); root.close(); alloc.close()
    val df = BioLoader.load(spark, path)
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 7L, 14L))
  }

  test("mismatched shards raise; addMissingColumns aligns with null fill (test_load.py:748-960)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toFile.getAbsolutePath
    Seq((1L, 2L)).toDF("header1", "header2").write.parquet(s"$dir/data_train_1.parquet")
    Seq((3L, 4L)).toDF("header3", "header4").write.parquet(s"$dir/data_train_2.parquet")
    val shard1 = s"$dir/data_train_1.parquet"
    val shard2 = s"$dir/data_train_2.parquet"
    val e = intercept[IllegalArgumentException](
      BioLoader.load(spark, Seq(shard1, shard2)).count())
    assert(e.getMessage.contains("disagree on columns"), e.getMessage)
    val aligned = BioLoader.load(spark, Seq(shard1, shard2), addMissingColumns = true)
    assert(aligned.columns.toSeq.sorted == Seq("header1", "header2", "header3", "header4"))
    assert(aligned.count() == 2)
    assert(aligned.filter(col("header1").isNull).count() == 1)
  }

  test("addMissingColumns sees every shard even past validateShardLimit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shardcap").toFile.getAbsolutePath
    Seq((1L, 2L)).toDF("a", "b").write.parquet(s"$dir/s1.parquet")
    Seq((3L, 4L)).toDF("a", "b").write.parquet(s"$dir/s2.parquet")
    Seq(Tuple1(9L)).toDF("c").write.parquet(s"$dir/s3.parquet") // mismatch BEYOND the cap
    val shards = Seq(s"$dir/s1.parquet", s"$dir/s2.parquet", s"$dir/s3.parquet")
    val aligned = BioLoader.load(spark, shards, addMissingColumns = true, validateShardLimit = 2)
    assert(aligned.columns.toSeq.sorted == Seq("a", "b", "c"))
    assert(aligned.count() == 3)
  }

  test("zip entries with colliding basenames across directories both load") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zipdirs").toFile
    val z = new java.io.File(dir, "nested.zip")
    val zo = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(z))
    def put(name: String, body: String): Unit = {
      zo.putNextEntry(new java.util.zip.ZipEntry(name)); zo.write(body.getBytes("UTF-8")); zo.closeEntry()
    }
    put("train/data.csv", "x\n1\n2\n")
    put("test/data.csv", "x\n3\n")
    zo.close()
    val df = BioLoader.load(spark, z.getAbsolutePath)
    assert(df.count() == 3)
  }

  test("skip_rows honors a non-UTF-8 encoding (explicit charset decode)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csvenc").toFile
    val f = new java.io.File(dir, "latin.csv")
    val body = "# bannière\nname,city\nrené,orléans\nzoë,münchen\n"
    java.nio.file.Files.write(f.toPath, body.getBytes("ISO-8859-1"))
    val df = BioLoader.load(spark, Seq(f.getAbsolutePath),
      BioLoader.CsvOptions(skipRows = 1, encoding = "ISO-8859-1"))
    assert(df.columns.toSeq == Seq("name", "city"))
    val names = df.select("name").collect().map(_.getString(0)).toSet
    assert(names == Set("rené", "zoë"), names.toString)
  }

  test("loadStream: csv directory as a streaming source with inferred schema (test_load.py:961 streaming shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "part0.csv").toPath,
      "col_1,col_2\na,1\nb,2\n")
    val stream = BioLoader.loadStream(spark, dir.getAbsolutePath, "csv")
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.toSeq == Seq("col_1", "col_2"))
    val q = stream.writeStream.format("memory").queryName("graft_stream_smoke").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("graft_stream_smoke").collect()
      assert(rows.length == 2)
    } finally q.stop()
  }

  test("ColumnInference resolves roles: explicit > default > pattern") {
    val df = Seq((1, "b1", "healthy", 0.5, 0.7)).toDF("sample_id", "batch", "diagnosis", "otu1", "otu2")
    val roles = ColumnInference.inferRoles(df, targetColumn = Some("diagnosis"))
    assert(roles.sampleColumn.contains("sample_id"))
    assert(roles.batchColumn.contains("batch"))
    assert(roles.targetColumn.contains("diagnosis"))
    assert(roles.dataColumns == Seq("otu1", "otu2"))
  }

  test("ColumnInference task typing: float → regression, string/int → classification") {
    val df = Seq((0.5, "x", 3)).toDF("f", "s", "i")
    assert(ColumnInference.inferTask(df, "f") == ColumnInference.Regression)
    assert(ColumnInference.inferTask(df, "s") == ColumnInference.Classification)
    assert(ColumnInference.inferTask(df, "i") == ColumnInference.Classification)
  }

  test("joinSampleMetadata: metadata wins collisions, metadata-first order") {
    val data = Seq((1, 10.0, "stale"), (2, 20.0, "stale")).toDF("samples", "v", "site")
    val meta = Seq((1, "fresh1", "b1"), (2, "fresh2", "b2")).toDF("samples", "site", "batch")
    val out = MetadataOps.joinSampleMetadata(data, meta, "samples")
    assert(out.columns.toSeq == Seq("samples", "site", "batch", "v"))
    assert(out.filter($"samples" === 1).select("site").as[String].head() == "fresh1")
  }

  test("reference parity: samples missing from metadata get null metadata columns (test_biodata.py:1783)") {
    val data = Seq(("sample1", 1), ("sample2", 20), ("sample4", 40)).toDF("sample", "header1")
    val meta = Seq(("sample1", "batch1", "a"), ("sample2", "batch2", "b"), ("sample3", "batch3", "c"))
      .toDF("sample", "batch", "metadata1")
    val out = MetadataOps.joinSampleMetadata(data, meta, "sample")
    // all data rows kept; sample4's metadata columns are null
    assert(out.count() == 3)
    val s4 = out.filter($"sample" === "sample4").head()
    assert(s4.isNullAt(out.columns.indexOf("batch")) && s4.isNullAt(out.columns.indexOf("metadata1")))
    assert(s4.getInt(out.columns.indexOf("header1")) == 40)
  }

  test("reference parity: metadata-only samples are ignored (test_biodata.py:1852)") {
    val data = Seq(("sample4", 40), ("sample5", 5)).toDF("sample", "header1")
    val meta = (1 to 7).map(i => (s"sample$i", s"m$i")).toDF("sample", "metadata1")
    val out = MetadataOps.joinSampleMetadata(data, meta, "sample")
    assert(out.count() == 2)
    assert(out.select("sample").as[String].collect().toSet == Set("sample4", "sample5"))
  }

  test("reference parity: multiclass labels — raw column preserved, encoded appended (test_biodata.py:1247)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mc").toFile
    val f = new java.io.File(dir, "file_multiclass.csv")
    val w = new java.io.PrintWriter(f)
    w.print("header1,header2,labels\n1,10,a\n20,2,b\n3,30,c\n40,4,d\n"); w.close()
    val ds = graft.api.LoadDataset.load(spark, graft.api.LoadDataset.Config(
      dataFiles = Seq(f.getAbsolutePath), targetColumn = Some("labels"), experimentType = "otu"))
    // reference asserts: 4 rows, raw labels column intact, encoded appended
    assert(ds.df.count() == 4)
    val rows = ds.df.orderBy("header1").collect()
    assert(rows.map(_.getAs[String]("labels")).toSeq == Seq("a", "c", "b", "d")) // by header1 order 1,3,20,40
    assert(ds.df.columns.contains(graft.operators.LabelOps.TargetColumn))
    assert(ds.labelNames == Seq("a", "b", "c", "d"))
    assert(ds.df.schema(graft.operators.LabelOps.TargetColumn)
      .metadata.getString("graft.featureType") == "ClassLabel")
  }

  test("reference parity: binarized pos/neg — codes and BinClassLabel metadata (test_biodata.py:1891)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin").toFile
    val f = new java.io.File(dir, "file_multiclass.csv")
    val w = new java.io.PrintWriter(f)
    w.print("header1,header2,labels\n1,10,a\n20,2,b\n3,30,c\n40,4,d\n"); w.close()
    val ds = graft.api.LoadDataset.load(spark, graft.api.LoadDataset.Config(
      dataFiles = Seq(f.getAbsolutePath), targetColumn = Some("labels"),
      positiveLabels = Seq("a", "b"), negativeLabels = Seq("c", "d"), experimentType = "otu"))
    val byH1 = ds.df.orderBy("header1").collect()
    // reference: header1 [1,20,3,40] → encoded [1,1,0,0]
    val enc = ds.df.orderBy("header2").collect() // 2,4,10,30 → rows b,d,a,c
    assert(enc.map(_.getAs[Int](graft.operators.LabelOps.TargetColumn)).toSeq == Seq(1, 0, 1, 0))
    assert(byH1.map(_.getAs[Int]("header1")).toSeq == Seq(1, 3, 20, 40))
    val m = ds.df.schema(graft.operators.LabelOps.TargetColumn).metadata
    assert(m.getString("graft.featureType") == "BinClassLabel")
    assert(m.getStringArray("graft.names").toSeq == Seq("negative", "positive"))
    assert(m.getStringArray("graft.positiveLabels").toSeq == Seq("a", "b"))
    assert(m.getStringArray("graft.negativeLabels").toSeq == Seq("c", "d"))
  }

  test("reference parity: binarized with missing labels → -1 (test_biodata.py:1940)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-binm").toFile
    val f = new java.io.File(dir, "file_multiclass.csv")
    val w = new java.io.PrintWriter(f)
    w.print("header1,header2,labels\n1,10,a\n20,2,b\n3,30,c\n40,4,d\n"); w.close()
    val ds = graft.api.LoadDataset.load(spark, graft.api.LoadDataset.Config(
      dataFiles = Seq(f.getAbsolutePath), targetColumn = Some("labels"),
      positiveLabels = Seq("a", "b"), negativeLabels = Seq("c"), experimentType = "otu"))
    // reference: rows a,b,c,d → [1, 1, 0, -1] ("d" in neither list, both lists given → -1)
    val enc = ds.df.orderBy("labels").collect()
      .map(_.getAs[Int](graft.operators.LabelOps.TargetColumn)).toSeq
    assert(enc == Seq(1, 1, 0, -1))
  }

  test("reference parity: explicit labels with unseen values → -1, codes follow the given dict (test_load.py:1090)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ml").toFile
    val f1 = new java.io.File(dir, "d1.csv"); val f2 = new java.io.File(dir, "d2.csv")
    for (f <- Seq(f1, f2)) {
      val w = new java.io.PrintWriter(f)
      w.print("sample,header1,target\nsample1,1,a\nsample2,2,b\nsample3,3,c\n"); w.close()
    }
    val ds = graft.api.LoadDataset.load(spark, graft.api.LoadDataset.Config(
      dataFiles = Seq(f1.getAbsolutePath, f2.getAbsolutePath),
      targetColumn = Some("target"), labels = Seq("a", "b")))
    // reference: 6 rows (two shards), targets a,b,c ×2, encoded {0,1,-1}
    assert(ds.df.count() == 6)
    val enc = ds.df.select("target", graft.operators.LabelOps.TargetColumn).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toSet
    assert(enc == Set("a" -> 0, "b" -> 1, "c" -> -1))
    assert(ds.labelNames == Seq("a", "b"))
  }

  test("attachFeatureMetadata lands in StructField metadata and survives projection") {
    val df = Seq((1.0, 2.0)).toDF("otu1", "otu2")
    val annotated = MetadataOps.attachFeatureMetadata(df, Map("otu1" -> Map("taxonomy" -> "g__Akkermansia")))
    val projected = annotated.select("otu1")
    assert(MetadataOps.featureMetadataOf(projected, "otu1").getString("taxonomy") == "g__Akkermansia")
  }

  test("HTTP ingestion: fetch-once cache, conditional-GET revalidation, refresh on change") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val notModified = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var body = "id,v\n1,10\n2,20\n"
    @volatile var etag = "\"v1\""
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.csv", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        hits.incrementAndGet()
        val inm = Option(x.getRequestHeaders.getFirst("If-None-Match"))
        if (inm.contains(etag)) {
          notModified.incrementAndGet()
          x.sendResponseHeaders(304, -1); x.close()
        } else {
          val bytes = body.getBytes("UTF-8")
          x.getResponseHeaders.add("ETag", etag)
          x.sendResponseHeaders(200, bytes.length)
          x.getResponseBody.write(bytes); x.close()
        }
      }
    })
    server.start()
    val cacheDir = java.nio.file.Files.createTempDirectory("graft-http").toString
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.csv"
      // first load: fetched + cached; extension dispatch still sees .csv
      val p1 = HttpFetch.cached(url, cacheDir)
      assert(p1.endsWith("data.csv"))
      val df1 = BioLoader.load(spark, Seq(p1))
      assert(df1.count() == 2 && df1.columns.toSeq == Seq("id", "v"))
      // second fetch revalidates: 304, bytes reused
      val p2 = HttpFetch.cached(url, cacheDir)
      assert(p2 == p1 && notModified.get() == 1)
      // content + etag change: refresh replaces the cached bytes
      body = "id,v\n1,10\n2,20\n3,30\n"; etag = "\"v2\""
      HttpFetch.cached(url, cacheDir)
      assert(spark.read.option("header", "true").csv(p1).count() == 3)
      assert(hits.get() == 3)
      // the BioLoader path accepts the URL directly (per-test cache dir
      // not injectable there; uses the default — still loopback-only)
      val viaLoader = BioLoader.load(spark, Seq(url))
      assert(viaLoader.count() == 3)
    } finally {
      server.stop(0)
    }
  }

  test("HTTP ingestion: fetchToDir fetches a URL list from executors across multiple tasks") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val name = x.getRequestURI.getPath.stripPrefix("/")
        val bytes = s"payload-of-$name".getBytes("UTF-8")
        x.sendResponseHeaders(200, bytes.length)
        x.getResponseBody.write(bytes); x.close()
      }
    })
    server.start()
    val destDir = java.nio.file.Files.createTempDirectory("graft-fetchdir").toString + "/media"
    try {
      val port = server.getAddress.getPort
      val urls = (0 until 20).map(i => s"http://127.0.0.1:$port/file$i.bin").toDF("url")
        .repartition(4)
      val report = HttpFetch.fetchToDir(urls, "url", destDir).collect()
      assert(report.length == 20)
      // really distributed: more than one task did the fetching
      assert(report.map(_.getInt(4)).distinct.length > 1)
      report.foreach { r =>
        assert(r.getInt(3) == 200)
        val name = r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1)
        val got = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(new java.net.URI(r.getString(1)).getPath match {
            case p if p.nonEmpty => p
            case _               => r.getString(1)
          })), "UTF-8")
        assert(got == s"payload-of-$name")
        assert(r.getLong(2) == got.length.toLong)
      }
      // no temp leftovers, and a re-run skips everything already landed
      // (hidden files are Hadoop local-FS .crc sidecars, not ours)
      val files = new java.io.File(destDir).listFiles.map(_.getName).filterNot(_.startsWith("."))
      assert(files.length == 20 && !files.exists(_.endsWith(".tmp")))
      val again = HttpFetch.fetchToDir(urls, "url", destDir).collect()
      assert(again.length == 20 && again.forall(_.getInt(3) == 200))
      // a dead host costs one report row, never the job: status -1,
      // path null, the good URL in the same batch still lands
      val mixed = Seq(
        s"http://127.0.0.1:$port/ok.bin",
        "http://127.0.0.1:1/unroutable.bin"
      ).toDF("url")
      val mixedRep = HttpFetch.fetchToDir(mixed, "url", destDir,
          requestTimeout = java.time.Duration.ofSeconds(10))
        .collect().map(r => r.getString(0) -> (r.getInt(3), Option(r.getString(1)))).toMap
      assert(mixedRep(s"http://127.0.0.1:$port/ok.bin")._1 == 200)
      assert(mixedRep("http://127.0.0.1:1/unroutable.bin") == ((-1, None)))
    } finally {
      server.stop(0)
    }
  }

  test("timestamp contract: NTZ columns normalize to TimestampType with identical micros (naive = UTC instant)") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    // a frame carrying a genuine TIMESTAMP_NTZ column (what Spark 4
    // infers from naive parquet timestamps when inference is on)
    val ntz = spark.sql(
      "SELECT id, timestampadd(SECOND, CAST(id AS INT), TIMESTAMP_NTZ '2020-03-01 12:00:00') AS ts FROM range(5)")
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val fixed = BioLoader.normalizeNtz(ntz)
    assert(fixed.schema("ts").dataType == TimestampType)
    // UTC session: the wall-clock reading is preserved exactly
    val micros = fixed.selectExpr("unix_micros(ts) AS m").orderBy("m")
      .collect().map(_.getLong(0))
    val base = 1583064000000000L // 2020-03-01T12:00:00Z in epoch micros
    assert(micros.toSeq == (0 until 5).map(i => base + i * 1000000L))
    // nanosToTimestamp handles the same flavor on a named column
    val viaNamed = BioLoader.nanosToTimestamp(ntz, "ts")
    assert(viaNamed.schema("ts").dataType == TimestampType)
    // event-time ops that require TIMESTAMP now resolve
    assert(fixed.withWatermark("ts", "1 minute").count() == 5)
  }
}
