package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a codegen'd Catalyst
  * expression — the record-linkage score that weighs agreeing
  * prefixes (Winkler 1990, on Jaro 1989; the public standard for
  * name matching). Complements `levenshtein`-based
  * [[graft.operators.FuzzyJoinOps.fuzzyJoin]]: edit distance counts
  * operations, Jaro-Winkler scores positional agreement — the usual
  * choice for person/company names where transposed or truncated
  * forms should rank high.
  *
  * Semantics pinned to the de-facto standard (and the DuckDB
  * `jaro_winkler_similarity` oracle): BYTE-level comparison (exact
  * parity for ASCII; multi-byte codepoints compare bytewise),
  * match window `max(len)/2 − 1`, transpositions = half the
  * mismatched match positions, boost only when jaro > 0.7, common
  * prefix capped at 4, prefix weight 0.1, both-empty and
  * either-empty → 0.
  */
object StringSimilarity {

  /** Static kernel — called from interpreted eval AND generated
    * code (the [[HashExpressions.simhashTextKernel]] pattern). */
  def jaroWinklerKernel(ua: UTF8String, ub: UTF8String): Double = {
    val s = ua.getBytes
    val t = ub.getBytes
    val m1 = s.length
    val m2 = t.length
    if (m1 == 0 || m2 == 0) return 0.0
    if (java.util.Arrays.equals(s, t)) return 1.0
    val range = math.max(math.max(m1, m2) / 2 - 1, 0)
    val sm = new Array[Boolean](m1)
    val tm = new Array[Boolean](m2)
    var m = 0
    var i = 0
    while (i < m1) {
      val hi = math.min(m2 - 1, i + range)
      var j = math.max(0, i - range)
      var found = false
      while (j <= hi && !found) {
        if (!tm(j) && s(i) == t(j)) { sm(i) = true; tm(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < m1) {
      if (sm(i)) {
        while (!tm(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val mt = trans / 2
    val md = m.toDouble
    val jaro = (md / m1 + md / m2 + (md - mt) / md) / 3.0
    if (jaro > 0.7) {
      val maxP = math.min(4, math.min(m1, m2))
      var p = 0
      while (p < maxP && s(p) == t(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  case class JaroWinklerSim(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler_sim"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSim =
      copy(left = l, right = r)

    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Double.valueOf(jaroWinklerKernel(
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String]))

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.StringSimilarity.jaroWinklerKernel($a, $b);")
  }

  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
