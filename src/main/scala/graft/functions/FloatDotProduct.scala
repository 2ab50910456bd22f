package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd array dot product over float and/or double arrays
  * (in-order double accumulation — bit-identical to
  * `aggregate(zip_with(...))` with per-element double casts and to
  * DuckDB's `list_dot_product` on the same inputs: float→double
  * conversion is exact, so mixing input widths never changes the
  * result vs casting both sides up front).
  *
  * Why a native Expression: higher-order column functions evaluate
  * interpreted — per element they box, dispatch, and re-enter the
  * lambda evaluator. The pairwise similarity operators compute one dot
  * product per candidate pair (millions at corpus scale), and the
  * LSH/IVF index builds compute one per (row × plane/centroid), which
  * makes this the only hot loop in the engine that the built-in
  * surface can't express efficiently — exactly the "custom Expression
  * beats UDF beats everything" escape hatch. The generated code is a
  * primitive loop; eval() mirrors it for interpreted fallback.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (Seq(left, right).forall(elemType(_).isDefined))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fdot expects two array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  private def toDoubles(a: Any, e: Expression): Array[Double] =
    elemType(e).get match {
      case FloatType => a.asInstanceOf[ArrayData].toFloatArray().map(_.toDouble)
      case _ => a.asInstanceOf[ArrayData].toDoubleArray()
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = toDoubles(a, left)
    val ys = toDoubles(b, right)
    val n = math.min(xs.length, ys.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += xs(i) * ys(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def extract(src: String, e: Expression, name: String): (String, String) =
        elemType(e).get match {
          case FloatType => (s"float[] $name = $src.toFloatArray();", "float")
          case _ => (s"double[] $name = $src.toDoubleArray();", "double")
        }
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val (declX, _) = extract(a, left, xs)
      val (declY, _) = extract(b, right, ys)
      s"""
         |$declX
         |$declY
         |int $n = Math.min($xs.length, $ys.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $xs[$i] * (double) $ys[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

object FloatDotProduct {
  /** Column form: dot(x, y) over two array<float|double> columns. */
  def fdot(x: Column, y: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      FloatDotProduct(
        org.apache.spark.sql.GraftColumnBridge.expression(x),
        org.apache.spark.sql.GraftColumnBridge.expression(y)))
}
