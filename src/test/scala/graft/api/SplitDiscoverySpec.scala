package graft.api

import graft.SparkSpec
import graft.operators.LabelOps
import org.apache.spark.sql.functions._

/** Parity with the reference's filename-driven split discovery
  * (tests/test_load.py:715 `test_load_dataset_with_dir_and_split_names`,
  * data_files.py:141-185 split patterns).
  */
class SplitDiscoverySpec extends SparkSpec {
  import spark.implicits._

  private def writeCsv(path: java.io.File, body: String): Unit =
    java.nio.file.Files.writeString(path.toPath, body)

  test("discoverSplits: split keyword in filename; keyword-free data defaults to train") {
    val dir = java.nio.file.Files.createTempDirectory("graft-splits").toFile
    writeCsv(new java.io.File(dir, "train-samples_1.csv"), "sample,target\ns1,a\n")
    writeCsv(new java.io.File(dir, "test-samples_2.csv"), "sample,target\ns3,c\n")
    writeCsv(new java.io.File(dir, "extra_data.csv"), "sample,target\ns9,z\n")
    writeCsv(new java.io.File(dir, "sample_metadata.csv"), "sample,batch\ns1,b1\n")
    val splits = LoadDataset.discoverSplits(dir.getAbsolutePath)
    assert(splits.keySet == Set("train", "test"))
    assert(splits("test").map(new java.io.File(_).getName) == Seq("test-samples_2.csv"))
    // keyword-free file joins train; metadata sidecar excluded
    assert(splits("train").map(new java.io.File(_).getName).sorted ==
      Seq("extra_data.csv", "train-samples_1.csv"))
  }

  test("discoverSplits: split keyword in parent directory name; 'validation' never matches 'val' mid-word") {
    val dir = java.nio.file.Files.createTempDirectory("graft-splitdirs").toFile
    val trainDir = new java.io.File(dir, "train"); trainDir.mkdir()
    val devDir = new java.io.File(dir, "dev"); devDir.mkdir()
    writeCsv(new java.io.File(trainDir, "part0.csv"), "x\n1\n")
    writeCsv(new java.io.File(devDir, "part0.csv"), "x\n2\n")
    writeCsv(new java.io.File(dir, "evaluate.csv"), "x\n3\n") // "evaluate" is not a delimited keyword
    val splits = LoadDataset.discoverSplits(dir.getAbsolutePath)
    assert(splits.keySet == Set("train", "validation"))
    assert(splits("validation").head.contains("dev"))
    assert(splits("train").map(new java.io.File(_).getName).toSet == Set("part0.csv", "evaluate.csv"))
  }

  test("loadSplitsAuto mirrors test_load.py:715: per-split rows, one shared label dictionary") {
    val dir = java.nio.file.Files.createTempDirectory("graft-splitload").toFile
    writeCsv(new java.io.File(dir, "train-samples_1.csv"),
      "sample,batch,metadata1,target,header1\nsample1,batch1,a,a,1\nsample2,batch2,b,b,2\n")
    writeCsv(new java.io.File(dir, "test-samples_2.csv"),
      "sample,batch,metadata1,target,header1\nsample3,batch3,c,c,3\nsample4,batch4,d,d,4\n")
    val ds = LoadDataset.loadSplitsAuto(spark, dir.getAbsolutePath,
      LoadDataset.Config(Nil, targetColumn = Some("target"), labels = Seq("a", "b", "c", "d")))
    assert(ds.keySet == Set("train", "test"))
    val train = ds("train").df.orderBy("sample").collect()
    assert(train.map(_.getAs[String]("sample")).toSeq == Seq("sample1", "sample2"))
    // codes come from the shared explicit dictionary, not per-split ranks
    val trainCodes = ds("train").df.select("target", LabelOps.TargetColumn)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val testCodes = ds("test").df.select("target", LabelOps.TargetColumn)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(trainCodes == Map("a" -> 0, "b" -> 1))
    assert(testCodes == Map("c" -> 2, "d" -> 3))
    assert(ds("test").labelNames == Seq("a", "b", "c", "d"))
  }

  test("split-scoped sample metadata binds to its split only") {
    val dir = java.nio.file.Files.createTempDirectory("graft-splitmeta").toFile
    writeCsv(new java.io.File(dir, "train_data.csv"), "sample,v\ns1,1\ns2,2\n")
    writeCsv(new java.io.File(dir, "test_data.csv"), "sample,v\ns3,3\n")
    writeCsv(new java.io.File(dir, "train-metadata.csv"), "sample,batch\ns1,b1\ns2,b2\n")
    writeCsv(new java.io.File(dir, "test-metadata.csv"), "sample,batch\ns3,b9\n")
    val meta = LoadDataset.discoverSplitMetadata(dir.getAbsolutePath)
    assert(meta("train")._1.map(new java.io.File(_).getName) == Seq("train-metadata.csv"))
    assert(meta("test")._1.map(new java.io.File(_).getName) == Seq("test-metadata.csv"))
    val ds = LoadDataset.loadSplitsAuto(spark, dir.getAbsolutePath, LoadDataset.Config(Nil))
    val test = ds("test").df.collect()
    assert(test.length == 1 && test.head.getAs[String]("batch") == "b9")
    val train = ds("train").df.orderBy("sample").collect()
    assert(train.map(_.getAs[String]("batch")).toSeq == Seq("b1", "b2"))
  }

  test("compressed shards are visible to split discovery (train.csv.gz)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gzsplit").toFile
    def gz(f: java.io.File, body: String): Unit = {
      val o = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(f))
      o.write(body.getBytes("UTF-8")); o.close()
    }
    gz(new java.io.File(dir, "train.csv.gz"), "x\n1\n")
    gz(new java.io.File(dir, "test.csv.gz"), "x\n2\n")
    val splits = LoadDataset.discoverSplits(dir.getAbsolutePath)
    assert(splits.keySet == Set("train", "test"), splits.keySet.toString)
    val ds = LoadDataset.loadSplitsAuto(spark, dir.getAbsolutePath, LoadDataset.Config(Nil))
    assert(ds("train").df.count() == 1 && ds("test").df.count() == 1)
  }

  test("untagged fuzzy metadata (annotation_v2) is shared across splits, not silently dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzymeta").toFile
    writeCsv(new java.io.File(dir, "train_data.csv"), "sample,otu1\ns1,5\n")
    java.nio.file.Files.writeString(new java.io.File(dir, "annotation_v2.jsonl").toPath,
      "{\"feature\": \"otu1\", \"taxon\": \"bacteroides\"}\n")
    val ds = LoadDataset.loadSplitsAuto(spark, dir.getAbsolutePath, LoadDataset.Config(Nil))
    val fm = ds("train").getFeatureMetadata
    assert(fm.get("otu1").exists(_.get("taxon").contains("bacteroides")), fm.toString)
  }

  test("the data dir's OWN name never assigns a split: keyword-free files in a dir named 'eval' stay train") {
    val parent = java.nio.file.Files.createTempDirectory("graft-rootkw").toFile
    val dir = new java.io.File(parent, "eval"); dir.mkdir()
    writeCsv(new java.io.File(dir, "part0.csv"), "x\n1\n")
    writeCsv(new java.io.File(dir, "part1.csv"), "x\n2\n")
    // a SUBdirectory keyword still counts
    val testDir = new java.io.File(dir, "test"); testDir.mkdir()
    writeCsv(new java.io.File(testDir, "part0.csv"), "x\n3\n")
    val splits = LoadDataset.discoverSplits(dir.getAbsolutePath)
    assert(splits.keySet == Set("train", "test"), splits.keySet.toString)
    assert(splits("train").size == 2, splits("train").toString)
    assert(splits("test").size == 1)
  }

  test("discovery walks through the Hadoop FileSystem: a file:-scheme URI dir resolves splits and loads") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fsuri").toFile
    writeCsv(new java.io.File(dir, "train_data.csv"), "sample,v\ns1,1\n")
    writeCsv(new java.io.File(dir, "test_data.csv"), "sample,v\ns2,2\n")
    val uri = "file:" + dir.getAbsolutePath // java.io.File would treat this as a relative path and find nothing
    val splits = LoadDataset.discoverSplits(uri)
    assert(splits.keySet == Set("train", "test"), splits.keySet.toString)
    val ds = LoadDataset.loadSplitsAuto(spark, uri, LoadDataset.Config(Nil))
    assert(ds("train").df.count() == 1 && ds("test").df.count() == 1)
  }

  test("numbered metadata sidecars stay out of the data file set (features_1.jsonl shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nummeta").toFile
    writeCsv(new java.io.File(dir, "data_train_1.csv"), "sample,v\ns1,1\n")
    java.nio.file.Files.writeString(new java.io.File(dir, "features_1.jsonl").toPath,
      "{\"feature\": \"v\", \"unit\": \"count\"}\n")
    val splits = LoadDataset.discoverSplits(dir.getAbsolutePath)
    assert(splits("train").map(new java.io.File(_).getName) == Seq("data_train_1.csv"))
  }
}
