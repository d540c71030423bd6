package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-10 operators: snapshot diff, data-quality checks,
  * golden-record survivorship.
  */
class Wave10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff: added/removed/changed with null-safe compare and changed-column list") {
    val o = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, null.asInstanceOf[String]),
      (4L, 40.0, "d")).toDF("k", "bal", "seg")
    val n = Seq((1L, 10.0, "a"),            // unchanged — drops
      (2L, 25.0, "B"),                      // both columns changed
      (3L, 30.0, null.asInstanceOf[String]),// null == null → unchanged
      (5L, 50.0, "e")                       // added; 4 removed
    ).toDF("k", "bal", "seg")
    val r = MergeOps.snapshotDiff(o, n, Seq("k"), Seq("bal", "seg"))
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getString(2))).toMap
    assert(r.keySet == Set(2L, 4L, 5L))
    assert(r(2L) == (("changed", "bal,seg")))
    assert(r(4L)._1 == "removed" && r(5L)._1 == "added")
    // null → value IS a change
    val n2 = Seq((3L, 30.0, "now-set")).toDF("k", "bal", "seg")
    val r2 = MergeOps.snapshotDiff(o.filter(col("k") === 3), n2, Seq("k"), Seq("bal", "seg"))
      .collect().head
    assert(r2.getString(1) == "changed" && r2.getString(2) == "seg")
  }

  test("snapshotDiff: includeUnchanged keeps the full frame") {
    val o = Seq((1L, 1.0)).toDF("k", "v")
    val all = MergeOps.snapshotDiff(o, o, Seq("k"), Seq("v"), includeUnchanged = true)
      .collect()
    assert(all.length == 1 && all.head.getString(1) == "unchanged" && all.head.isNullAt(2))
    assert(MergeOps.snapshotDiff(o, o, Seq("k"), Seq("v")).count() == 0)
  }

  test("qualityChecks: each check counts its own violations in one report") {
    val df = Seq(
      (1L, Some(5.0), "OK", "1-HIGH"),
      (2L, None, "OK", "9-BAD"),          // range: null doesn't violate; regex violates
      (3L, Some(-1.0), "??", "2-LOW"),    // range + set violations
      (3L, Some(2.0), "OK", "3-MID")      // duplicate key
    ).toDF("id", "v", "status", "prio")
    val r = QualityOps.check(df, Seq(
      QualityOps.NotNull("v"),
      QualityOps.InRange("v", 0.0, 10.0),
      QualityOps.InSet("status", Seq("OK")),
      QualityOps.Matches("prio", "[1-5]-[A-Z]+"),
      QualityOps.Unique(Seq("id"))))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getInt(4))).toMap
    assert(r("not_null(v)") == ((4L, 1L, 0)))
    assert(r("in_range(v,0.0,10.0)") == ((4L, 1L, 0)))
    assert(r("in_set(status)") == ((4L, 1L, 0)))
    assert(r("matches(prio)") == ((4L, 1L, 0)))
    assert(r("unique(id)") == ((4L, 1L, 0)))
    // tolerance: 25% violation rate passes at maxViolationRate=0.25
    val tol = QualityOps.check(df, Seq(QualityOps.NotNull("v")), maxViolationRate = 0.25)
      .collect().head
    assert(tol.getInt(4) == 1)
  }

  test("goldenRecord: most recent non-null survives per field") {
    val df = Seq(
      (1L, 1L, "old-name", Some(10.0), Some("seg-a")),
      (1L, 2L, "mid-name", None, Some("seg-b")),
      (1L, 3L, "new-name", Some(30.0), None),
      (2L, 9L, "solo", None, None)
    ).toDF("cluster", "ver", "name", "bal", "seg")
    val r = MergeOps.goldenRecord(df, "cluster", Seq("ver"), Seq("name", "bal", "seg"))
      .collect().map(x => x.getLong(0) -> x).toMap
    val c1 = r(1L)
    assert(c1.getLong(1) == 3 && c1.getString(2) == "new-name")
    assert(c1.getDouble(3) == 30.0)         // ver 3's bal
    assert(c1.getString(4) == "seg-b")      // ver 3's seg is null → ver 2 survives
    val c2 = r(2L)
    assert(c2.getString(2) == "solo" && c2.isNullAt(3) && c2.isNullAt(4))
  }
}
