package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReshapeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("melt produces one row per (id, value column)") {
    val df = Seq((1, 10.0, 5), (2, 20.0, 6)).toDF("id", "a", "b")
    val m = ReshapeOps.melt(df, Seq("id"), Seq("a", "b"))
    assert(m.count() == 4)
    val r = m.filter($"id" === 1 && $"variable" === "b").select("value").as[Double].head()
    assert(r == 5.0)
  }

  test("pivot inverts melt") {
    val df = Seq((1, 10.0, 5.0), (2, 20.0, 6.0)).toDF("id", "a", "b")
    val m = ReshapeOps.melt(df, Seq("id"), Seq("a", "b"))
    val p = ReshapeOps.pivot(m, "id", "variable", "value", Seq("a", "b"))
    val row = p.filter($"id" === 2).collect()(0)
    assert(row.getDouble(1) == 20.0 && row.getDouble(2) == 6.0)
  }

  test("transpose flips a feature-major table") {
    val df = Seq(("f1", 1, 10), ("f2", 2, 20)).toDF("feat", "s1", "s2")
    val t = ReshapeOps.transpose(df, "feat")
    val bySample = t.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(bySample("s1") == ((1.0, 2.0)))
    assert(bySample("s2") == ((10.0, 20.0)))
  }

  test("concatRows aligns by name and null-fills") {
    val a = Seq((1, "x")).toDF("id", "u")
    val b = Seq((2, 9.0)).toDF("id", "v")
    val u = ReshapeOps.concatRows(Seq(a, b))
    assert(u.columns.toSeq == Seq("id", "u", "v"))
    assert(u.count() == 2)
    assert(u.filter($"id" === 2).select("u").head().isNullAt(0))
  }

  test("concatColumns aligns positionally by given order, metadata first") {
    val data = Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "dval")
    val meta = Seq((30, "mc"), (10, "ma"), (20, "mb")).toDF("mk", "mval")
    val out = ReshapeOps.concatColumns(data, meta, Seq("k"), Seq("mk"))
    assert(out.columns.toSeq == Seq("mk", "mval", "k", "dval"))
    val rows = out.orderBy("k").collect().map(r => (r.getInt(0), r.getString(3)))
    assert(rows.toSeq == Seq((10, "a"), (20, "b"), (30, "c")))
  }

  test("withRowIndex is dense and order-stable") {
    val df = spark.range(100).toDF("x").orderBy(desc("x"))
    val idx = ReshapeOps.withRowIndex(df)
    val first = idx.filter($"__row_idx" === 0).select("x").as[Long].head()
    assert(first == 99L)
    assert(idx.select(max($"__row_idx")).as[Long].head() == 99L)
  }
}
