package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset tar shards: round-trip (strings, binaries, numerics,
  * nulls, dotted keys), and INTEROP — the system tar must list our
  * members (the format contract, not just self-consistency).
  */
class WebDatasetIOSpec extends SparkSpec {
  import spark.implicits._

  test("round-trip: strings, binary, numerics, nulls, dotted keys") {
    val schema = StructType(Seq(
      StructField("key", StringType), StructField("txt", StringType),
      StructField("img", BinaryType), StructField("score", DoubleType)))
    val rows = Seq(
      org.apache.spark.sql.Row("s0.a", "hello webdataset", Array[Byte](1, 2, -3, 127), 0.75),
      org.apache.spark.sql.Row("s1", null, Array[Byte](9), 1.5),
      org.apache.spark.sql.Row("s2", "third", null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val tmp = java.nio.file.Files.createTempDirectory("wds").toString
    WebDatasetIO.write(df, s"file:$tmp/out", "key")
    val back = WebDatasetIO.read(spark, s"file:$tmp/out", schema, "key")
      .collect().map(r => (r.getString(0), r.get(1),
        Option(r.get(2)).map(_.asInstanceOf[Array[Byte]].toSeq).orNull, r.get(3))).toSet
    val want = rows.map(r => (r.getString(0), r.get(1),
      Option(r.get(2)).map(_.asInstanceOf[Array[Byte]].toSeq).orNull, r.get(3))).toSet
    assert(back == want, s"got $back")
  }

  test("system tar lists our shard members (format interop)") {
    val df = Seq(("k0", "alpha"), ("k1", "beta")).toDF("key", "txt")
    val tmp = java.nio.file.Files.createTempDirectory("wds2").toString
    WebDatasetIO.write(df.repartition(1), s"file:$tmp/t", "key")
    val shard = new java.io.File(s"$tmp/t").listFiles()
      .filter(_.getName.endsWith(".tar")).head
    val proc = new ProcessBuilder("tar", "-tf", shard.getAbsolutePath).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    assert(proc.waitFor() == 0, "tar -tf failed")
    val names = out.linesIterator.toSet
    assert(names == Set("k0.txt", "k1.txt"), s"tar listed $names")
  }

  test("re-write with fewer partitions leaves no stale shards behind") {
    val tmp = java.nio.file.Files.createTempDirectory("wds4").toString
    val big = Seq(("a", "1"), ("b", "2"), ("c", "3"), ("d", "4")).toDF("key", "txt")
    WebDatasetIO.write(big.repartition(4), s"file:$tmp/w", "key")
    assert(new java.io.File(s"$tmp/w").listFiles().count(_.getName.endsWith(".tar")) == 4)
    val small = Seq(("x", "9")).toDF("key", "txt")
    WebDatasetIO.write(small.repartition(1), s"file:$tmp/w", "key")
    assert(new java.io.File(s"$tmp/w").listFiles().count(_.getName.endsWith(".tar")) == 1)
    val schema = StructType(Seq(StructField("key", StringType), StructField("txt", StringType)))
    val back = WebDatasetIO.read(spark, s"file:$tmp/w", schema, "key").collect()
    assert(back.map(_.getString(0)).toSet == Set("x"), "stale shard rows leaked into read")
  }

  test("externally-produced shard with PAX/directory members ingests (typeflag skip)") {
    // GNU tar under a long-path/pax profile emits 'x' extended headers
    // and directory entries; the reader must skip them, not crash.
    val tmp = java.nio.file.Files.createTempDirectory("wds5").toFile
    val d = new java.io.File(tmp, "samples"); d.mkdirs()
    java.nio.file.Files.write(new java.io.File(d, "k0.txt").toPath, "alpha".getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(d, "k1.txt").toPath, "beta".getBytes("UTF-8"))
    val shardDir = new java.io.File(tmp, "shard"); shardDir.mkdirs()
    val shard = new java.io.File(shardDir, "part-00000.tar")
    // --format=pax forces extended 'x' headers per member; archiving the
    // DIRECTORY adds a type-'5' member; strip the dir prefix so member
    // basenames are {key}.{field}
    val proc = new ProcessBuilder(
      "tar", "--format=pax", "-cf", shard.getAbsolutePath,
      "-C", tmp.getAbsolutePath, "samples").start()
    assert(proc.waitFor() == 0, "system tar failed")
    val raw = java.nio.file.Files.readAllBytes(shard.toPath)
    val members = WebDatasetIO.parseTar(raw).map(_._1).toList
    assert(members.map(_.split('/').last).toSet == Set("k0.txt", "k1.txt"),
      s"parseTar surfaced $members")
  }

  test("streamTarMembers: stream == whole-shard parse, incl. PAX skip; truncation throws") {
    val tmp = java.nio.file.Files.createTempDirectory("wds6").toFile
    val d = new java.io.File(tmp, "samples"); d.mkdirs()
    java.nio.file.Files.write(new java.io.File(d, "k0.txt").toPath, "alpha".getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(d, "k1.txt").toPath, "beta".getBytes("UTF-8"))
    val shard = new java.io.File(tmp, "p.tar")
    val proc = new ProcessBuilder(
      "tar", "--format=pax", "-cf", shard.getAbsolutePath,
      "-C", tmp.getAbsolutePath, "samples").start()
    assert(proc.waitFor() == 0, "system tar failed")
    val raw = java.nio.file.Files.readAllBytes(shard.toPath)
    val streamed = WebDatasetIO.streamTarMembers(
      new java.io.ByteArrayInputStream(raw), "p").toList
    val parsed = WebDatasetIO.parseTar(raw).toList
    assert(streamed.map(_._1) == parsed.map(_._1) &&
      streamed.zip(parsed).forall { case (a, b) => java.util.Arrays.equals(a._2, b._2) })
    // cut mid-member: loud failure, not a silent partial sample
    val cut = java.util.Arrays.copyOfRange(raw, 0, 513)
    val ex = intercept[Exception] {
      WebDatasetIO.streamTarMembers(new java.io.ByteArrayInputStream(cut), "p").toList
    }
    assert(ex.getMessage.contains("truncated"), s"got: ${ex.getMessage}")
  }

  test(">100-char member names resolve through PAX path and GNU longname, not truncate") {
    // a member name past ustar's 100-char field: PAX tars carry it in
    // an 'x' header's path record, GNU tars in an 'L' longname member
    val tmp = java.nio.file.Files.createTempDirectory("wds7").toFile
    val deep = new java.io.File(tmp, ("d" * 40) + "/" + ("e" * 40) + "/" + ("f" * 40))
    deep.mkdirs()
    java.nio.file.Files.write(new java.io.File(deep, "k9.txt").toPath, "gamma".getBytes("UTF-8"))
    val rel = deep.getAbsolutePath.stripPrefix(tmp.getAbsolutePath + "/") + "/k9.txt"
    assert(rel.length > 100, s"fixture name must exceed the ustar field, got ${rel.length}")
    for (fmt <- Seq("pax", "gnu")) {
      val shard = new java.io.File(tmp, s"p-$fmt.tar")
      val proc = new ProcessBuilder(
        "tar", s"--format=$fmt", "-cf", shard.getAbsolutePath,
        "-C", tmp.getAbsolutePath, rel).start()
      assert(proc.waitFor() == 0, s"system tar --format=$fmt failed")
      val raw = java.nio.file.Files.readAllBytes(shard.toPath)
      val members = WebDatasetIO.parseTar(raw).toList
      assert(members.map(_._1) == List(rel), s"$fmt surfaced ${members.map(_._1)}")
      assert(new String(members.head._2, "UTF-8") == "gamma")
    }
    // plain ustar splits long names across prefix+name; system tar's
    // ustar profile exercises the prefix field (name <= 100 after split)
    val shard = new java.io.File(tmp, "p-ustar.tar")
    val proc = new ProcessBuilder(
      "tar", "--format=ustar", "-cf", shard.getAbsolutePath,
      "-C", tmp.getAbsolutePath, rel).start()
    assert(proc.waitFor() == 0, "system tar --format=ustar failed")
    val raw = java.nio.file.Files.readAllBytes(shard.toPath)
    val members = WebDatasetIO.parseTar(raw).toList
    assert(members.map(_._1) == List(rel), s"ustar prefix surfaced ${members.map(_._1)}")
  }

  // hand-craft a 512-byte tar header: the two regressions below need
  // byte-exact control over fields system tar won't emit on demand
  private def tarHeader(name: String, size: Int, typeflag: Byte,
                        magic: Array[Byte], prefixField: Array[Byte]): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("UTF-8"); System.arraycopy(nb, 0, h, 0, nb.length)
    def oct(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val p = ("0" * (len - 1 - s.length)) + s
      System.arraycopy(p.getBytes("US-ASCII"), 0, h, off, len - 1)
    }
    oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8) // mode/uid/gid
    oct(size.toLong, 124, 12); oct(0, 136, 12)       // size/mtime
    h(156) = typeflag
    System.arraycopy(magic, 0, h, 257, magic.length)
    System.arraycopy(prefixField, 0, h, 345, math.min(prefixField.length, 155))
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)   // chksum spaces
    var sum = 0L; var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    val csp = ("0" * (6 - cs.length)) + cs
    System.arraycopy(csp.getBytes("US-ASCII"), 0, h, 148, 6)
    h(154) = 0; h(155) = ' '.toByte
    h
  }
  private def padded(content: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOf(content, ((content.length + 511) / 512) * 512)
  private val posixMagic = Array[Byte]('u', 's', 't', 'a', 'r', 0)
  // oldgnu magic: "ustar  \0" — bytes 257..262 are NOT the POSIX magic
  private val gnuMagic = Array[Byte]('u', 's', 't', 'a', 'r', ' ', ' ', 0)

  test("GNU header's atime bytes at offset 345 are not misread as a ustar prefix") {
    // oldgnu stores atime/ctime at 345/357 where POSIX puts `prefix`;
    // the parser must gate the prefix read on the POSIX magic or
    // every GNU member gains a garbage 'prefix/'
    val content = "hello".getBytes("UTF-8")
    val atimeOctal = "00000001234 ".getBytes("US-ASCII")
    val tar = tarHeader("a.txt", content.length, '0'.toByte, gnuMagic, atimeOctal) ++
      padded(content) ++ new Array[Byte](1024)
    val members = WebDatasetIO.parseTar(tar).toList
    assert(members.map(_._1) == List("a.txt"), s"GNU atime leaked into name: ${members.map(_._1)}")
    assert(new String(members.head._2, "UTF-8") == "hello")
    // and a genuine POSIX prefix still resolves
    val pfx = "dir/sub".getBytes("UTF-8")
    val tar2 = tarHeader("b.txt", content.length, '0'.toByte, posixMagic, pfx) ++
      padded(content) ++ new Array[Byte](1024)
    assert(WebDatasetIO.parseTar(tar2).toList.map(_._1) == List("dir/sub/b.txt"))
  }

  test("a PAX path override for a non-regular member does not leak onto the next file") {
    // 'x' header naming a >100-char DIRECTORY, then the directory,
    // then a regular file: the override belongs to the directory and
    // must be consumed by it, not rename the file
    val longDir = ("d" * 120) + "/"
    val paxRec = {
      // "len path=value\n" with len covering the whole record
      def rec(l: Int) = s"$l path=$longDir\n"
      var l = rec(1).length; while (rec(l).length != l) l = rec(l).length
      rec(l).getBytes("UTF-8")
    }
    val content = "world".getBytes("UTF-8")
    val tar =
      tarHeader("PaxHeaders/dir", paxRec.length, 'x'.toByte, posixMagic, Array.emptyByteArray) ++
        padded(paxRec) ++
        tarHeader(longDir.take(100), 0, '5'.toByte, posixMagic, Array.emptyByteArray) ++
        tarHeader("c.txt", content.length, '0'.toByte, posixMagic, Array.emptyByteArray) ++
        padded(content) ++ new Array[Byte](1024)
    val members = WebDatasetIO.parseTar(tar).toList
    assert(members.map(_._1) == List("c.txt"),
      s"directory's PAX override leaked: ${members.map(_._1)}")
    assert(new String(members.head._2, "UTF-8") == "world")
  }

  test("write is stage-and-swap: a failing job leaves the previous dataset intact") {
    val tmp = java.nio.file.Files.createTempDirectory("wds8").toFile.getAbsolutePath
    val ok = Seq((0L, "alpha"), (1L, "beta")).toDF("k", "txt")
    WebDatasetIO.write(ok, tmp, "k")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("txt", org.apache.spark.sql.types.StringType)))
    // a poisoned write job (task-side exception) must not destroy it
    val bad = ok.select(col("k"), udf((s: String) =>
      if (s != null) throw new RuntimeException("boom") else s).apply(col("txt")).as("txt"))
    intercept[Exception] { WebDatasetIO.write(bad, tmp, "k") }
    val back = WebDatasetIO.read(spark, tmp, schema, "k")
      .as[(Long, String)].collect().sorted.toSeq
    assert(back == Seq((0L, "alpha"), (1L, "beta")), s"previous dataset lost: $back")
    // and no staging leftovers
    val leftovers = new java.io.File(tmp).listFiles().map(_.getName).filter(_.startsWith(".staging"))
    assert(leftovers.isEmpty, s"staging not cleaned: ${leftovers.toSeq}")
  }

  test("documents table round-trips at sf0.001") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string").as("key"), col("text"), col("lang"))
    val tmp = java.nio.file.Files.createTempDirectory("wds3").toString
    WebDatasetIO.write(docs.repartition(4), s"file:$tmp/d", "key")
    val back = WebDatasetIO.read(spark, s"file:$tmp/d", docs.schema, "key")
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
