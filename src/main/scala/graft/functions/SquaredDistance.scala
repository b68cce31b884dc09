package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: squared euclidean distance of two numeric
  * array columns — Σ (aᵢ − bᵢ)², accumulated in double, summed
  * sequentially left-to-right (bit-identical to the HOF formulation
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0d, _+_)`, which the
  * DuckDB oracle mirrors).
  *
  * Same rationale as [[DotProduct]]: the IVF cell-assignment loop
  * evaluates a distance per (vector × centroid); higher-order functions
  * run that interpreted. This expression participates in whole-stage
  * codegen via a tight primitive loop, with a semantically identical
  * interpreted fallback. Null arrays → null; null ELEMENTS contribute 0.
  */
case class SquaredDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(_: NumericType, _), ArrayType(_: NumericType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"squared_distance requires two numeric arrays, got ${left.dataType} / ${right.dataType}")
    }
  }

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(a: Any, b: Any): Any = {
    val la = a.asInstanceOf[ArrayData]
    val rb = b.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n = math.min(la.numElements(), rb.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!la.isNullAt(i) && !rb.isNullAt(i)) {
        val x = lt match {
          case FloatType => la.getFloat(i).toDouble
          case DoubleType => la.getDouble(i)
          case IntegerType => la.getInt(i).toDouble
          case LongType => la.getLong(i).toDouble
          case _ => la.get(i, lt).asInstanceOf[Number].doubleValue()
        }
        val y = rt match {
          case FloatType => rb.getFloat(i).toDouble
          case DoubleType => rb.getDouble(i)
          case IntegerType => rb.getInt(i).toDouble
          case LongType => rb.getLong(i).toDouble
          case _ => rb.get(i, rt).asInstanceOf[Number].doubleValue()
        }
        val d = x - y
        acc += d * d
      }
      i += 1
    }
    acc
  }

  private def getter(t: NumericType, arr: String, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case _ => s"((Number) $arr.get($i, null)).doubleValue()"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lt = elemType(left)
    val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $d = (${getter(lt, a, i)}) - (${getter(rt, b, i)});
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "squared_distance"
}

object SquaredDistance {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point (Spark 4 classic Column↔Expression bridge). */
  def squaredDistanceNative(a: Column, b: Column): Column =
    Bridge.column(SquaredDistance(Bridge.expression(a), Bridge.expression(b)))
}
