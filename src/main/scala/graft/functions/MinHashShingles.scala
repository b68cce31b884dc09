package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the word-shingle / MinHash-LSH hot
  * path — the [[SimHash]]/[[GopherSignals]] precedent applied to the
  * third (and last) interpreted-or-shuffled text kernel.
  *
  * Why (SURVEY §7.3 preference order (b)): the previous scale path built
  * shingles by posexplode + a per-doc `lead()` window (one sort of the
  * WORD stream per pipeline) and minhash signatures by a further 8-way
  * min aggregation — correct, but the per-doc work is embarrassingly
  * local: nothing about "split this text into n-grams and fold min-md5s
  * per salt" needs an exchange. These expressions compute the complete
  * result in one JVM pass per row inside whole-stage codegen, so:
  *
  *  - `shingle_array(text, n)` replaces the explode→window→lead chain —
  *    [[graft.dedup.Dedup.shingleRows]] becomes `explode(shingle_array)`
  *    and every consumer (dd3/4/7-12, dsir, tx7) sheds the window sort;
  *  - `minhash_bands(text, n, bands, r)` replaces the whole
  *    signature pipeline (shingle window + 8-min aggregation): band melts
  *    are now `posexplode(minhash_bands(text))` straight off the scan —
  *    the only remaining exchange in candidate generation is the ONE
  *    bucket shuffle that is genuinely distributed work.
  *
  * Hash semantics are IDENTICAL to the exploded forms (and therefore to
  * the DuckDB oracles): shingle = space-joined n-gram of the
  * lowercase/[^a-z0-9 ]-scrubbed/trimmed word stream; minhash_i =
  * lexicographic min over shingles of md5("i|" + shingle) hex; band key
  * b = md5 of the "|"-joined minhashes of that band. Equivalence is
  * spec-asserted against the reference HOF/window forms
  * (DedupSimSpec), and the dd3/dd4 oracle hashes pin it end-to-end.
  *
  * Null text → null (SQL convention). No shingles (fewer than n words):
  * `shingle_array` returns an EMPTY array (so `explode` drops the doc,
  * matching the old incomplete-tail filter) and `minhash_bands` returns
  * NULL (so `posexplode` drops the doc, matching the old aggregation
  * that never saw a row for it).
  */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"shingle_array requires a string, got $t")
    }

  override def nullSafeEval(s: Any): Any =
    MinHashShingles.shingleData(s.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashShingles.shingleData($c.toString(), $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_array"
}

case class MinHashBands(
    child: Expression,
    shingleSize: Int,
    bands: Int,
    rowsPerBand: Int) extends UnaryExpression {

  require(shingleSize >= 1, s"shingle size must be >= 1, got $shingleSize")
  require(bands >= 1 && rowsPerBand >= 1,
    s"bands/rowsPerBand must be >= 1, got $bands/$rowsPerBand")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // null on null input AND on shingle-less docs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"minhash_bands requires a string, got $t")
    }

  override def nullSafeEval(s: Any): Any =
    MinHashShingles.minhashBandsData(
      s.asInstanceOf[UTF8String].toString, shingleSize, bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.MinHashShingles.minhashBandsData(
         |  $c.toString(), $shingleSize, $bands, $rowsPerBand);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_bands"
}

object MinHashShingles {
  import org.apache.spark.sql.graftbridge.Bridge

  def shingleArrayNative(text: Column, n: Int = 3): Column =
    Bridge.column(ShingleArray(Bridge.expression(text), n))

  def minhashBandsNative(
      text: Column,
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 2): Column =
    Bridge.column(MinHashBands(Bridge.expression(text), shingleSize, bands, rowsPerBand))

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The word-shingle kernel — string-identical to the exploded
    * window form (lower → scrub [^a-z0-9 ] → trim → split \s+ → sliding
    * space-joined n-grams, incomplete tails dropped). After the scrub
    * only [a-z0-9 ] remain, so `trim` (0x20-only in Spark) and
    * `String.trim` agree, and split keeps no trailing empties. */
  // compiled once: String.replaceAll/split re-compile their regex per
  // call, which is per-DOC work on the hottest kernel in the catalog
  private val ScrubRe = java.util.regex.Pattern.compile("[^a-z0-9 ]")
  private val WsRe = java.util.regex.Pattern.compile("\\s+")

  def shingleStrings(text: String, n: Int): Array[String] = {
    val norm = ScrubRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
      .replaceAll(" ").trim
    val words = WsRe.split(norm)
    val count = words.length - (n - 1)
    if (count <= 0) return Array.empty
    val out = new Array[String](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** Static forwarder for codegen: shingles as Catalyst ArrayData. */
  def shingleData(text: String, n: Int): ArrayData = {
    val sh = shingleStrings(text, n)
    val out = new Array[Any](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = UTF8String.fromString(sh(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Static forwarder for codegen: the `bands` LSH band keys, or null
    * when the doc has no complete shingle. Duplicate shingles are folded
    * through a set first — the min over a multiset equals the min over
    * its support, so this only saves md5 work on repetitive text. */
  def minhashBandsData(
      text: String,
      shingleSize: Int,
      bands: Int,
      rowsPerBand: Int): ArrayData = {
    val sh = shingleStrings(text, shingleSize)
    if (sh.isEmpty) return null
    val distinct = new java.util.HashSet[String]()
    val numHashes = bands * rowsPerBand
    val salts = Array.tabulate(numHashes)(i => (i.toString + "|").getBytes("UTF-8"))
    // mins kept as RAW 16-byte digests: comparing digests as unsigned
    // bytes is order-identical to comparing their lowercase-hex strings
    // (each byte maps to two hex chars in value order), so the hex
    // conversion — one 32-char String per (shingle × salt) in the old
    // form, the dominant allocation of the whole dedup family — happens
    // only for the numHashes winners below. digest(buf) reuses one
    // scratch buffer; a copy is taken only when a new min is found.
    val mins = new Array[Array[Byte]](numHashes)
    val md = java.security.MessageDigest.getInstance("MD5")
    val tmp = new Array[Byte](16)
    var i = 0
    while (i < sh.length) {
      if (distinct.add(sh(i))) {
        val sb = sh(i).getBytes("UTF-8")
        var s = 0
        while (s < numHashes) {
          md.reset()
          md.update(salts(s))
          md.update(sb)
          md.digest(tmp, 0, 16)
          val cur = mins(s)
          if (cur == null || compareUnsigned(tmp, cur) < 0)
            mins(s) = java.util.Arrays.copyOf(tmp, 16)
          s += 1
        }
      }
      i += 1
    }
    val keys = new Array[Any](bands)
    val sb2 = new java.lang.StringBuilder
    var b = 0
    while (b < bands) {
      sb2.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb2.append('|')
        sb2.append(hex(mins(b * rowsPerBand + r)))
        r += 1
      }
      md.reset()
      keys(b) = UTF8String.fromString(hex(md.digest(sb2.toString.getBytes("UTF-8"))))
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Unsigned lexicographic byte-array compare — the digest order
    * behind every min-hash (≡ lowercase-hex string order). */
  private def compareUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }
}
