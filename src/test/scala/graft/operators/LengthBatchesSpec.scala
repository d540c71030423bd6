package graft.operators

import graft.SparkSpec

class LengthBatchesSpec extends SparkSpec {
  import spark.implicits._

  test("lengthBatches: batches cut on the (tokens desc, id) order with exact padding") {
    // one group, batchSize 2: sorted tokens 9,7,5,5,2 (ids break the 5-tie)
    val df = Seq((1L, 5L), (2L, 9L), (3L, 7L), (4L, 5L), (5L, 2L))
      .map { case (id, t) => ("g", id, t) }.toDF("src", "id", "toks")
    val out = MixOps.lengthBatches(df, Seq("src"), "id", "toks", 2)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // batch 0: 9,7 -> pad 2; batch 1: 5(id1),5(id4) -> pad 0; batch 2: 2 alone
    assert(out(0L) == ((2L, 9L, 16L, 2L)))
    assert(out(1L) == ((2L, 5L, 10L, 0L)))
    assert(out(2L) == ((1L, 2L, 2L, 0L)))
  }

  test("lengthBatches: batchSize 1 never pads; groups batch independently") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 3L), ("b", 3L, 8L))
      .toDF("src", "id", "toks")
    val out = MixOps.lengthBatches(df, Seq("src"), "id", "toks", 1).collect()
    assert(out.forall(_.getAs[Long]("padding") == 0L))
    assert(out.count(_.getString(0) == "a") == 2)
    assert(out.count(_.getString(0) == "b") == 1)
  }

  test("lengthBatches: pad_frac is the snapped padding share; zero-token batch is 0.0") {
    val df = Seq(("g", 1L, 0L), ("g", 2L, 0L)).toDF("src", "id", "toks")
    val out = MixOps.lengthBatches(df, Seq("src"), "id", "toks", 2).head()
    assert(out.getAs[Double]("pad_frac") == 0.0)
    val df2 = Seq(("g", 1L, 4L), ("g", 2L, 1L)).toDF("src", "id", "toks")
    val pf = MixOps.lengthBatches(df2, Seq("src"), "id", "toks", 2).head()
      .getAs[Double]("pad_frac")
    assert(pf == math.floor(3.0 / 8.0 * 1e9 + 0.5) / 1e9)
  }

  test("lengthBatches: sorted batching pads no more than the shuffled order") {
    val rnd = new scala.util.Random(17)
    val docs = (0 until 200).map(i => ("g", i.toLong, (rnd.nextInt(100) + 1).toLong))
    val sortedPad = MixOps.lengthBatches(docs.toDF("src", "id", "toks"),
      Seq("src"), "id", "toks", 8).collect().map(_.getAs[Long]("padding")).sum
    // shuffled order: batch on a hashed id instead of length
    val byHash = docs.sortBy(t => t._2 * 2654435761L % 1000)
      .grouped(8).map(b => b.map(_._3).max * b.size - b.map(_._3).sum).sum
    assert(sortedPad <= byHash, s"sorted $sortedPad vs shuffled $byHash")
  }

  test("lengthBatches: null token/id rows drop") {
    val df = Seq(("g", Some(1L), Some(5L)), ("g", None, Some(5L)), ("g", Some(2L), None))
      .toDF("src", "id", "toks")
    val out = MixOps.lengthBatches(df, Seq("src"), "id", "toks", 4).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_docs") == 1L)
  }
}
