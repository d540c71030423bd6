package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 fuzz: randomized replays for average precision, the
  * phonetic fuzzy join's blocking semantics, and the calibration
  * curve. Fixed seeds, independent plain-Scala replays.
  */
class OracleFuzz8Spec extends SparkSpec {
  import spark.implicits._

  private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("fuzz: averagePrecision replays the tie-block AP at random score grids") {
    val rng = new scala.util.Random(811)
    for (trial <- 1 to 6) {
      // coarse score grid forces ties — the tie-block semantics are
      // the part a naive per-row replay gets wrong
      val grid = 2 + rng.nextInt(8)
      val rows = (1 to 100 + rng.nextInt(300)).map(_ =>
        (rng.nextInt(grid).toDouble / grid, rng.nextInt(2)))
      val r = EvalOps.averagePrecision(rows.toDF("score", "label"), "label", "score")
        .collect().head
      // replay: distinct-score blocks desc, precision at block END
      val blocks = rows.groupBy(_._1).toSeq.sortBy(-_._1)
        .map { case (s, xs) => (s, xs.size.toLong, xs.count(_._2 == 1).toLong) }
      val npos = blocks.map(_._3).sum
      var cumN = 0L; var cumP = 0L
      var ap = 0.0
      blocks.foreach { case (_, n, np) =>
        cumN += n; cumP += np
        if (npos > 0 && np > 0)
          ap += snap9(snap9(cumP.toDouble / cumN) * np.toDouble / npos)
      }
      assert(r.getAs[Long]("n") == rows.size.toLong && r.getAs[Long]("n_pos") == npos, s"trial $trial counts")
      if (npos > 0)
        assert(r.getAs[Double]("avg_precision") == snap9(ap), s"trial $trial ap")
      else assert(r.isNullAt(r.fieldIndex("avg_precision")), s"trial $trial null ap")
    }
  }

  /** Classic American Soundex (the algorithm Spark's `soundex`
    * implements), restricted here to inputs without h/w so the
    * between-letter collapse edge cases cannot diverge.
    */
  private def soundexRef(s: String): String = {
    def code(c: Char): Char = c match {
      case 'b' | 'f' | 'p' | 'v' => '1'
      case 'c' | 'g' | 'j' | 'k' | 'q' | 's' | 'x' | 'z' => '2'
      case 'd' | 't' => '3'
      case 'l' => '4'
      case 'm' | 'n' => '5'
      case 'r' => '6'
      case _ => '0'
    }
    val up = s.toUpperCase
    val sb = new StringBuilder
    sb += up.head
    var prev = code(s.head.toLower)
    up.tail.foreach { ch =>
      val c = code(ch.toLower)
      if (c != '0' && c != prev) sb += c
      prev = c
      if (sb.length == 4) return sb.toString
    }
    (sb.toString + "000").take(4)
  }

  test("fuzz: fuzzyJoinPhonetic equals the all-pairs soundex-block + JW-gate replay") {
    val rng = new scala.util.Random(812)
    val syll = Vector("ba", "ke", "li", "mo", "ru", "ta", "ze", "no", "pi", "su")
    for (trial <- 1 to 5) {
      def name() = (1 to 2 + rng.nextInt(3)).map(_ => syll(rng.nextInt(syll.size))).mkString
      val ls = (1 to 30 + rng.nextInt(40)).map(i => (i.toLong, name()))
      val rs = (1 to 30 + rng.nextInt(40)).map(i => (i.toLong, name()))
      val minSim = 0.82 + rng.nextInt(3) * 0.04
      val got = FuzzyJoinOps.fuzzyJoinPhonetic(
          ls.toDF("lid", "lname"), rs.toDF("rid", "rname"), "lname", "rname", minSim)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (li, ln) <- ls
        (ri, rn) <- rs
        if soundexRef(ln) == soundexRef(rn)
        jw = math.floor(graft.functions.StringSimilarity.jaroWinklerKernel(
          org.apache.spark.unsafe.types.UTF8String.fromString(ln),
          org.apache.spark.unsafe.types.UTF8String.fromString(rn)) * 1e6 + 0.5) / 1e6
        if jw >= minSim
      } yield (li, ri)).toSet
      assert(got == want, s"trial $trial: ${got.diff(want)} extra, ${want.diff(got)} missing")
    }
  }

  test("fuzz: calibrationCurve replays bins, rates and gaps at random bin counts") {
    val rng = new scala.util.Random(813)
    for (trial <- 1 to 5) {
      val bins = 2 + rng.nextInt(18)
      val rows = (1 to 200 + rng.nextInt(200)).map(_ => (rng.nextDouble(), rng.nextInt(2)))
      val got = EvalOps.calibrationCurve(rows.toDF("score", "label"), "label", "score", bins)
        .collect().map(r => r.getAs[Int]("bin") ->
          (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
            r.getAs[Double]("mean_score"), r.getAs[Double]("pos_rate"),
            r.getAs[Double]("gap"))).toMap
      rows.groupBy { case (s, _) =>
        math.min(math.max(math.floor(s * bins).toInt, 0), bins - 1)
      }.foreach { case (b, xs) =>
        val n = xs.size.toLong
        val np = xs.count(_._2 == 1).toLong
        val ms = snap9(xs.map(_._1).sum / n)
        val pr = snap9(np.toDouble / n)
        val want = (n, np, ms, pr, snap9(ms - pr))
        assert(got(b) == want, s"trial $trial bins=$bins bin $b: ${got(b)} vs $want")
      }
    }
  }
}
