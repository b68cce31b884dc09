package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL Gopher repetition/boilerplate signals
  * (Rae et al. 2021 §A1.1) in ONE pass over the text — struct of
  * (tok, mwl, top2gram_frac, dup3gram_frac, dup_line_frac,
  * bullet_line_frac, ellipsis_line_frac, symbol_ratio, keep).
  *
  * Why (SURVEY §7.3 preference order (b)): the column-algebra forms in
  * [[graft.text.TextAnalysis]] are correct reference semantics, but
  * Catalyst does no CSE inside higher-order-function lambdas and
  * predicate pushdown re-inlines column aliases, so the n-gram ARRAY
  * CONSTRUCTION (transform + slice + concat_ws per element) re-runs
  * 2-3× per fraction per doc, interpreted — ~6 ms/doc, which made the
  * corpus-filter pass the single most expensive stage of the curation
  * pipeline (measured: the gopher WHERE clause alone cost 70 s at
  * sf0.1 vs 0.4 s for this expression). One text traversal in plain
  * JVM code with hash-map multiplicity counts is the right kernel, and
  * the generated code calls the static forwarder directly — the stage
  * stays in whole-stage codegen, no UDF plumbing.
  *
  * Bug-compatible with the column forms BY DESIGN, pinned by an
  * equivalence spec and the tx8 DuckDB oracle: 0x20-only trim (Spark
  * `trim`), split with limit -1 (Spark `split` keeps trailing empties),
  * the original-text emptiness guard of `wordNgrams`, non-overlapping
  * literal occurrence counts (the replace-length trick), and rounding
  * through the same BigDecimal HALF_UP path as Spark's `round`.
  * Null text → null (SQL convention; the column forms are only ever
  * applied to non-null corpus text).
  */
case class GopherSignals(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherSignals.schema

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"gopher_signals requires a string, got $t")
    }

  override def nullSafeEval(s: Any): Any =
    GopherSignals.compute(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // the Scala object's static forwarder is directly callable from
      // the generated Java
      s"${ev.value} = graft.functions.GopherSignals.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gopher_signals"
}

object GopherSignals {
  import org.apache.spark.sql.graftbridge.Bridge

  val schema: StructType = StructType(Seq(
    StructField("tok", LongType, nullable = false),
    StructField("mwl", DoubleType, nullable = false),
    StructField("top2gram_frac", DoubleType, nullable = false),
    StructField("dup3gram_frac", DoubleType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("bullet_line_frac", DoubleType, nullable = false),
    StructField("ellipsis_line_frac", DoubleType, nullable = false),
    StructField("symbol_ratio", DoubleType, nullable = false),
    StructField("keep", BooleanType, nullable = false)))

  /** Column-API entry point (Spark 4 classic Column↔Expression bridge). */
  def gopherSignalsNative(c: Column): Column =
    Bridge.column(GopherSignals(Bridge.expression(c)))

  private val wsPattern = java.util.regex.Pattern.compile("\\s+")
  private val nonAlnumPattern = java.util.regex.Pattern.compile("[^a-z0-9 ]")

  /** Spark `trim`: strips 0x20 spaces ONLY (not Java's <= 0x20). */
  private def trimSpaces(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  private def ltrimSpaces(s: String): String = {
    var b = 0
    while (b < s.length && s.charAt(b) == ' ') b += 1
    if (b == 0) s else s.substring(b)
  }

  private def rtrimSpaces(s: String): String = {
    var e = s.length
    while (e > 0 && s.charAt(e - 1) == ' ') e -= 1
    if (e == s.length) s else s.substring(0, e)
  }

  /** Non-overlapping left-to-right occurrence count — identical to the
    * replace-length trick of `TextAnalysis.countOccurrences`. */
  private def occurrences(s: String, lit: String): Long = {
    var n = 0L
    var i = s.indexOf(lit)
    while (i >= 0) { n += 1; i = s.indexOf(lit, i + lit.length) }
    n
  }

  /** Spark `round(col, 6)` on a double: BigDecimal HALF_UP, same API. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Java regex \s class, mirroring the `regexp_replace(…, "\\s+", "")`
    * length in meanWordLength (code points, like Spark `length`). */
  private def nonWsCodePoints(s: String): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (!ws) n += 1
      i += Character.charCount(cp)
    }
    n
  }

  def compute(text: String): InternalRow = {
    val trimmed = trimSpaces(text)
    val tok: Long =
      if (trimmed.isEmpty) 0L else wsPattern.split(trimmed, -1).length.toLong
    val mwl: Double = if (tok > 0) nonWsCodePoints(trimmed).toDouble / tok else 0.0

    val syms = occurrences(text, "#") + occurrences(text, "...") + occurrences(text, "…")
    val sym: Double = if (tok > 0) round6(syms.toDouble / tok) else 0.0

    // non-blank lines (blank = 0x20-trim empty, Spark trim semantics)
    val rawLines = text.split("\n", -1)
    var nLines = 0
    var nBullet = 0
    var nEllipsis = 0
    val distinctLines = new java.util.HashSet[String]()
    var li = 0
    while (li < rawLines.length) {
      val l = rawLines(li)
      if (trimSpaces(l).nonEmpty) {
        nLines += 1
        distinctLines.add(l)
        val lt = ltrimSpaces(l)
        if (lt.nonEmpty) {
          val cp = lt.codePointAt(0)
          if (cp == '-' || cp == '*' || cp == '•') nBullet += 1
        }
        val rt = rtrimSpaces(l)
        if (rt.endsWith("...") || rt.endsWith("…")) nEllipsis += 1
      }
      li += 1
    }
    val dupLine = if (nLines > 0)
      round6(1.0 - distinctLines.size.toDouble / nLines) else 0.0
    val bullet = if (nLines > 0) round6(nBullet.toDouble / nLines) else 0.0
    val ellipsis = if (nLines > 0) round6(nEllipsis.toDouble / nLines) else 0.0

    // normalized words (TextAnalysis.normWords); the empty-doc guard of
    // wordNgrams keys on the ORIGINAL text's trim, mirrored here.
    // Lowercase through Spark's own UTF8String path, NOT
    // String.toLowerCase(): on a tr-TR-locale JVM the latter maps ASCII
    // 'I' to dotless 'ı' while Spark's lower() lowercases pure-ASCII
    // strings byte-wise — UTF8String.toLowerCase IS the lower()
    // kernel, so parity holds on every locale by construction
    val lower = UTF8String.fromString(text).toLowerCase.toString
    val norm = trimSpaces(nonAlnumPattern.matcher(lower).replaceAll(" "))
    val words: Array[String] =
      if (trimmed.isEmpty) Array.empty else wsPattern.split(norm, -1)
    val nw = words.length

    var top2 = 0.0
    if (nw >= 2) {
      val counts = new java.util.HashMap[String, Int]()
      var best = 0
      var i = 0
      while (i < nw - 1) {
        val g = words(i) + " " + words(i + 1)
        val c = counts.merge(g, 1, Integer.sum)
        if (c > best) best = c
        i += 1
      }
      top2 = round6(best.toDouble / (nw - 1))
    }

    var dup3 = 0.0
    if (nw >= 3) {
      val distinct = new java.util.HashSet[String]()
      var i = 0
      while (i < nw - 2) {
        distinct.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
        i += 1
      }
      dup3 = round6(1.0 - distinct.size.toDouble / (nw - 2))
    }

    val keep = tok >= 20 && tok <= 100000 && mwl >= 3.0 && mwl <= 10.0 &&
      sym < 0.1 && dupLine < 0.30 && bullet < 0.90 && ellipsis < 0.30 &&
      top2 < 0.20 && dup3 < 0.60

    new GenericInternalRow(Array[Any](
      tok, mwl, top2, dup3, dupLine, bullet, ellipsis, sym, keep))
  }
}
