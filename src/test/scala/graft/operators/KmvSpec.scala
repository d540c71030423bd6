package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def h52Ref(v: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.take(13), 16)
  }

  test("kmvSketch keeps exactly the k smallest distinct hashes, ascending") {
    val df = (1 to 500).map(i => ("g", i.toLong)).toDF("g", "v")
    val sk = SketchOps.kmvSketch(df, Seq("g"), "v", k = 32)
      .orderBy("rn").select("h", "rn").as[(Long, Int)].collect()
    val want = (1 to 500).map(i => h52Ref(i.toString)).distinct.sorted.take(32)
    assert(sk.map(_._1).toSeq == want)
    assert(sk.map(_._2).toSeq == (1 to 32))
    // duplicates never occupy extra slots
    val dup = ((1 to 40) ++ (1 to 40)).map(i => ("g", i.toLong)).toDF("g", "v")
    val skDup = SketchOps.kmvSketch(dup, Seq("g"), "v", k = 64)
    assert(skDup.count() == 40)
  }

  test("kmvEstimate: exact below k, within 20% of truth above k (n=2000, k=256)") {
    val small = (1 to 100).map(i => ("s", i.toLong)).toDF("g", "v")
    val eSmall = SketchOps.kmvEstimate(
      SketchOps.kmvSketch(small, Seq("g"), "v", k = 256), Seq("g"), k = 256).collect().head
    assert(eSmall.getAs[Double]("kmv_est") == 100.0 && eSmall.getAs[Long]("n_kept") == 100L)
    val big = (1 to 2000).map(i => ("b", i.toLong)).toDF("g", "v")
    val eBig = SketchOps.kmvEstimate(
      SketchOps.kmvSketch(big, Seq("g"), "v", k = 256), Seq("g"), k = 256).collect().head
    val est = eBig.getAs[Double]("kmv_est")
    assert(math.abs(est - 2000.0) / 2000.0 < 0.2, s"est=$est")
  }

  test("kmvJaccard: identical groups ~1, disjoint groups 0, half overlap in between") {
    val rows =
      (1 to 400).map(i => ("a", i.toLong)) ++
        (1 to 400).map(i => ("b", i.toLong)) ++        // b == a
        (1001 to 1400).map(i => ("c", i.toLong)) ++    // c disjoint from a
        (201 to 600).map(i => ("d", i.toLong))         // d half-overlaps a
    val sk = SketchOps.kmvSketch(rows.toDF("g", "v"), Seq("g"), "v", k = 64)
    val j = SketchOps.kmvJaccard(sk, "g", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("jaccard_est")).toMap
    assert(j(("a", "b")) == 1.0)
    assert(j(("a", "c")) == 0.0)
    val half = j(("a", "d"))  // true J = 200/600 = 0.333
    assert(half > 0.15 && half < 0.55, s"got $half")
    // union sketch stays a valid KMV sketch: bounded by k
    val uk = SketchOps.kmvJaccard(sk, "g", k = 64)
      .select("union_kept").as[Int].collect()
    assert(uk.forall(_ <= 64))
  }

  test("kmvSketch plan: bounded top-k aggregate, no global sort of the distinct frame") {
    val df = (1 to 1000).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "v")
    val plan = SketchOps.kmvSketch(df, Seq("g"), "v", k = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("top_k"), plan)
    assert(!plan.contains("Window"), plan) // no row_number windowing
  }
}
