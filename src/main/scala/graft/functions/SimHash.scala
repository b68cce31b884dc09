package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: one-pass simhash fingerprint of a string
  * column — bit-identical to [[graft.dedup.Dedup.simhash]] (the
  * higher-order-function form) and [[graft.dedup.Dedup.simhashDf]] (the
  * exploded aggregation), delegating to the shared scalar kernel
  * [[graft.dedup.Dedup.simhashScalar]].
  *
  * Why (SURVEY §7.3 preference order (b)): the HOF form evaluates one
  * interpreted pass over the word array PER BIT (64 at the default
  * width); a UDF is one pass but adds the function-call boundary per
  * row. This expression stays inside whole-stage codegen — the
  * generated code calls the static kernel directly, with no UDF
  * plumbing — and is usable in streaming plans (per-row, no
  * aggregation), which is where [[graft.streaming.StreamingDedup]]
  * uses it.
  *
  * Null semantics: null text → null (SQL convention). The HOF form
  * instead coerces null to fingerprint 0 through its
  * `when().otherwise(0)` vote fold, and the exploded aggregation drops
  * the row entirely — neither is a meaningful fingerprint, so callers
  * should filter null text regardless of form.
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  // JVM shifts wrap at 64: out-of-range widths would alias vote
  // positions silently instead of failing
  require(bits >= 1 && bits <= 64, s"simhash bits must be in 1..64, got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"simhash requires a string, got $t")
    }

  override def nullSafeEval(s: Any): Any =
    graft.dedup.Dedup.simhashScalar(s.asInstanceOf[UTF8String].toString, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // the Scala object's static forwarder is directly callable from
      // the generated Java
      s"${ev.value} = graft.dedup.Dedup.simhashScalar($c.toString(), $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}

object SimHash {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point (Spark 4 classic Column↔Expression bridge). */
  def simhashNative(c: Column, bits: Int = 64): Column =
    Bridge.column(SimHash(Bridge.expression(c), bits))
}
