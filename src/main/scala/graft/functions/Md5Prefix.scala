package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 60 bits of md5(input) as a
  * non-negative long — the [[graft.sketch.Kmv]] unit hash, bit-identical
  * to the expression chain `conv(substring(md5(x), 1, 15), 16, 10)` and
  * to DuckDB's `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)` (15 hex
  * chars = the digest's first 7.5 bytes = big-endian first-8-bytes
  * >>> 4).
  *
  * Why (SURVEY §7.3 preference order (b)): the builtin chain hex-encodes
  * the 16-byte digest to a 32-char string, substrings it, then PARSES
  * 15 hex chars back to a long — two string allocations and a base-16
  * parse per row that exist only to round-trip through text. This
  * expression digests and shifts: at 100 TB the sketch hash is a
  * per-row hot path on every scan that feeds a distinct estimate.
  * Stays inside whole-stage codegen via the static kernel.
  *
  * Null semantics: null → null (SQL convention, same as the chain). */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"md5_prefix60 requires a string, got $t")
    }

  override def nullSafeEval(s: Any): Any =
    Md5Prefix60.kernel(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Prefix60.kernel($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix60"
}

object Md5Prefix60 {
  import org.apache.spark.sql.graftbridge.Bridge

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 over the UTF-8 bytes, as a long in [0, 2⁶⁰).
    * Static forwarder — directly callable from generated Java. */
  def kernel(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // big-endian first 8 bytes, top 60 bits
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** Column-API entry point (Spark 4 classic Column↔Expression bridge). */
  def md5Prefix60(c: Column): Column =
    Bridge.column(Md5Prefix60(Bridge.expression(c)))
}
