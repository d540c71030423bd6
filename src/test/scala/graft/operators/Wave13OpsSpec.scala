package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-13 operators: average precision, phonetic fuzzy
  * join.
  */
class Wave13OpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("averagePrecision: textbook value on a small ranking, perfect ranking scores 1") {
    // scores desc: (0.9,+), (0.8,-), (0.7,+), (0.6,-) → AP = (1/1·1 + 2/3·1)/2
    val df = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)).toDF("score", "lbl")
    val r = EvalOps.averagePrecision(df, "lbl", "score").collect().head
    val want = snap9(snap9(snap9(1.0 / 1) * 1 / 2) + snap9(snap9(2.0 / 3) * 1 / 2))
    assert(r.getLong(0) == 4 && r.getLong(1) == 2 && r.getDouble(2) == want, r.toString)
    // perfect separation → AP 1
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0)).toDF("score", "lbl")
    assert(EvalOps.averagePrecision(perfect, "lbl", "score").collect().head.getDouble(2) == 1.0)
    // no positives → NULL
    val none = Seq((0.9, 0), (0.8, 0)).toDF("score", "lbl")
    assert(EvalOps.averagePrecision(none, "lbl", "score").collect().head.isNullAt(2))
  }

  test("averagePrecision: tied scores form one block with after-block precision") {
    // all four rows tie at 0.5, 2 positive → one block: P = 2/4, ΔR = 1 → AP = 0.5
    val df = Seq((0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0)).toDF("score", "lbl")
    assert(EvalOps.averagePrecision(df, "lbl", "score").collect().head.getDouble(2) == 0.5)
  }

  test("fuzzyJoinPhonetic: vowel variants block together, consonant-skeleton changes do not") {
    val left = Seq((1L, "smith"), (2L, "brown"), (3L, "clark")).toDF("id_l", "nm_l")
    val right = Seq((10L, "smyth"), (20L, "brawn"), (30L, "clerk"), (40L, "smash"))
      .toDF("id_r", "nm_r")
    val pairs = FuzzyJoinOps.fuzzyJoinPhonetic(left, right, "nm_l", "nm_r", minSim = 0.8)
      .select("id_l", "id_r").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // smith~smyth (S530), brown~brawn (B650), clark~clerk (C462) all pass;
    // smash (S520) shares no code with smith (S530) — phonetic block excludes it
    assert(pairs == Set((1L, 10L), (2L, 20L), (3L, 30L)), pairs.toString)
  }

  test("fuzzyJoinPhonetic: the jaro gate still rejects phonetically-blocked weak pairs") {
    // same soundex (T600: "tray"/"tire"... use constructed pair): "robert"/"rupert"
    // share R163; jaro ~0.78 < 0.9 → blocked as candidates, gated out
    val left = Seq((1L, "robert")).toDF("id_l", "nm_l")
    val right = Seq((2L, "rupert")).toDF("id_r", "nm_r")
    val strict = FuzzyJoinOps.fuzzyJoinPhonetic(left, right, "nm_l", "nm_r", minSim = 0.9)
    assert(strict.count() == 0)
    val loose = FuzzyJoinOps.fuzzyJoinPhonetic(left, right, "nm_l", "nm_r", minSim = 0.7)
    assert(loose.count() == 1)
  }
}
