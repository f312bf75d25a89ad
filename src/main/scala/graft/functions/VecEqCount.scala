package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native agreement count for two integral arrays: the number of
  * positions where both sides are non-null and equal, over the shorter
  * length. Codegen twin of the interpreted estimate fold
  * `aggregate(zip_with(a, b, (x,y) => when(x===y,1).otherwise(0)), 0, _+_)`
  * used to turn MinHash signatures into a Jaccard estimate — that form
  * runs one lambda dispatch per signature position per *candidate pair*.
  * SQL three-valued logic maps identically: a null on either side makes
  * `x === y` null, which the CASE sends to the 0 branch, exactly the
  * "both non-null and equal" rule here; zip_with's null padding of the
  * longer side likewise contributes 0, i.e. only the shorter length can
  * ever count. */
case class VecEqCount(left: Expression, right: Expression) extends BinaryExpression {

  private def elemIsLong(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _)) if lt == rt &&
      (lt == IntegerType || lt == LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_eq_count expects two arrays of the same int/bigint type, got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(aa.numElements(), bb.numElements())
    val isLong = elemIsLong(left)
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!aa.isNullAt(i) && !bb.isNullAt(i)) {
        val eq = if (isLong) aa.getLong(i) == bb.getLong(i)
                 else aa.getInt(i) == bb.getInt(i)
        if (eq) cnt += 1
      }
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val get = if (elemIsLong(left)) "getLong" else "getInt"
      val nullGuard =
        if (left.dataType.asInstanceOf[ArrayType].containsNull ||
          right.dataType.asInstanceOf[ArrayType].containsNull)
          s"!$a.isNullAt($i) && !$b.isNullAt($i) && "
        else ""
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($nullGuard$a.$get($i) == $b.$get($i)) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecEqCount =
    copy(left = l, right = r)
  override def prettyName: String = "vec_eq_count"
}

object VecEqCount {
  def eqCount(a: Column, b: Column): Column =
    ColumnBridge.column(VecEqCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** FunctionRegistry descriptor for SparkSessionExtensions.injectFunction. */
  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
    org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
    Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("vec_eq_count"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[VecEqCount].getName, "vec_eq_count"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "vec_eq_count(a, b) takes 2 arguments")
      VecEqCount(children(0), children(1))
    })
}
