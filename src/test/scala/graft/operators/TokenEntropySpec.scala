package graft.operators

import graft.SparkSpec

class TokenEntropySpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  private def run(rows: Seq[(Long, String)]) =
    TextOps.tokenEntropy(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("tokenEntropy: uniform distribution hits log2(k) bits and norm 1") {
    val out = run(Seq((1L, "a b c d")))
    val r = out(1L)
    assert(r.getAs[Long]("n_tokens") == 4L && r.getAs[Long]("n_types") == 4L)
    // 4 equally likely tokens -> 2 bits, normalized 1.0
    assert(math.abs(r.getAs[Double]("entropy_bits") - 2.0) < 1e-8)
    assert(math.abs(r.getAs[Double]("norm_entropy") - 1.0) < 1e-8)
  }

  test("tokenEntropy: constant doc is 0 bits with null normalization") {
    val r = run(Seq((1L, "spam spam spam spam")))(1L)
    assert(r.getAs[Long]("n_types") == 1L)
    assert(r.getAs[Double]("entropy_bits") == 0.0)
    assert(r.isNullAt(r.fieldIndex("norm_entropy")))
  }

  test("tokenEntropy: skewed beats templated — hand-computed value") {
    // p = (3/4, 1/4): H = 0.75*log2(4/3) + 0.25*log2(4) bits via the
    // operator's snap points (nats per term, snapped, summed, /ln2)
    val r = run(Seq((1L, "x x x y")))(1L)
    val t1 = snap9(-(3.0 / 4.0) * math.log(3.0 / 4.0))
    val t2 = snap9(-(1.0 / 4.0) * math.log(1.0 / 4.0))
    val bits = snap9(snap9(t1 + t2) / math.log(2.0))
    assert(r.getAs[Double]("entropy_bits") == bits)
    val norm = snap9(bits / snap9(math.log(2.0) / math.log(2.0)))
    assert(r.getAs[Double]("norm_entropy") == norm)
  }

  test("tokenEntropy: tokenizer contract (lowercase, non-alnum splits) and empty docs drop") {
    val out = run(Seq((1L, "Foo, foo! BAR?"), (2L, "  .,;  "), (3L, "")))
    assert(out.keySet == Set(1L))
    val r = out(1L)
    assert(r.getAs[Long]("n_tokens") == 3L && r.getAs[Long]("n_types") == 2L)
  }

  test("tokenEntropy: boilerplate-heavy doc scores below an even one at equal length") {
    val even = (0 until 32).map(i => s"t$i").mkString(" ")
    val templated = (0 until 16).map(_ => "click here").mkString(" ")
    val out = run(Seq((1L, even), (2L, templated)))
    assert(out(1L).getAs[Double]("entropy_bits") > out(2L).getAs[Double]("entropy_bits"))
    assert(out(2L).getAs[Double]("norm_entropy") > 0.99) // 2 types, even usage
  }
}
