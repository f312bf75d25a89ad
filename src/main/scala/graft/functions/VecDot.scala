package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over `array<float>` / `array<double>` embedding
  * columns: `vec_dot(a, b) = Σ aᵢ·bᵢ` accumulated left-to-right in
  * double precision.
  *
  * This replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` form in
  * the similarity operators (sim/Similarity.scala): higher-order
  * lambdas are *interpreted* per element with no common-subexpression
  * reuse, while this expression participates in whole-stage codegen —
  * the generated Java is a tight primitive loop over the two array
  * backings. On the cosine-family queries (brute-force top-k, blocked /
  * LSH near-dup, IVF search) the dot product runs once per candidate
  * *pair*, so it is the hottest scalar kernel in the engine.
  *
  * Semantics match the lambda form exactly (same IEEE operation
  * sequence, so r4-rounded oracle outputs are bit-identical):
  * each element is widened to double before multiply, products are
  * added in index order onto 0.0, a null element or a length mismatch
  * yields NULL (zip_with pads the shorter side with nulls, which
  * nullifies the interpreted sum the same way).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
      if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float|double>, array<float|double>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    val (lFloat, rFloat) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val x = if (lFloat) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (rFloat) bb.getFloat(i).toDouble else bb.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      def get(arr: String, e: Expression): String =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      // skip the per-element null branch when the schema promises none
      def nullCheck: String =
        if (left.dataType.asInstanceOf[ArrayType].containsNull ||
          right.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $sum += ${get(a, left)} * ${get(b, right)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

object VecDot {
  /** Column-API entry — no function-registry dependency. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** FunctionRegistry descriptor for SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "vec_dot(a, b) takes 2 arguments")
      VecDot(children(0), children(1))
    })
}
