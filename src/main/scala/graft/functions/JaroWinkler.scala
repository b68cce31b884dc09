package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro–Winkler similarity (Winkler 1990)
  * of two string columns — the record-linkage scorer behind fuzzy entity
  * matching. Standard parameters: prefix scale 0.1 over at most 4
  * leading characters, applied only when the Jaro base exceeds 0.7.
  *
  * Convention pinned to the common C++/DuckDB implementations (so the
  * DuckDB oracle can score the same pairs): either side empty → 0.0,
  * including empty-vs-empty (the textbook would say 1.0 there); equal
  * non-empty strings reach 1.0 through the normal match loop. The
  * comparison is per UTF-16 code unit — for the ASCII identifiers this
  * engine matches on, identical to DuckDB's per-byte walk; mixed-plane
  * unicode names should be NFC-folded first ([[NfcNormalize]]).
  *
  * The match-window/transposition scan is an imperative two-array walk
  * with no relational decomposition, so it lives in a static helper
  * invoked from BOTH the interpreted path and the generated code — the
  * expression stays inside whole-stage codegen (one static call per
  * row, no interpreted Expression tree, no UDF serialization).
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires two strings, got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSimilarity.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerSimilarity.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinklerSimilarity {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point (Spark 4 classic Column↔Expression bridge). */
  def jaroWinklerNative(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Static scorer shared by interpreted eval and generated code. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.toString
    val s2 = ub.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    // clamp to 0: single-char pairs would otherwise get a −1 window and
    // never match ('a' vs 'a' must be 1.0, as DuckDB/rapidfuzz agree)
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, l2)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!f2(j) && s2.charAt(j) == s1.charAt(i)) {
          f1(i) = true; f2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var pl = 0
    val pMax = math.min(4, math.min(l1, l2))
    while (pl < pMax && s1.charAt(pl) == s2.charAt(pl)) pl += 1
    jaro + pl * 0.1 * (1.0 - jaro)
  }
}
