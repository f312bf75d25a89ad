package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Morton (Z-order) key: interleave the low 32 bits of two
  * non-negative dimension values — bit i of `x` lands at output bit 2i,
  * bit i of `y` at 2i+1 — so sorting by the key clusters rows that are
  * close in BOTH dimensions into the same file/row group.
  *
  * This is the layout primitive behind multi-dimensional data skipping
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`): a linear sort on one column
  * gives perfect min/max pruning on that column and none on any other;
  * the z-curve trades a little per-dimension locality for bounded
  * min/max ranges on every interleaved dimension, so a 2-D box
  * predicate prunes row groups on BOTH bounds at 100 TB. Pure bit
  * twiddling (five spread steps per dimension), whole-stage codegen,
  * no state. Callers map each dimension into a bounded non-negative
  * integer domain first (e.g. `pmod(hash(col), 2^16)` or a rank). */
case class ZOrderKey(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_order_key expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val helper = ZOrderKey.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.interleave($a, $b);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrderKey =
    copy(left = l, right = r)
  override def prettyName: String = "z_order_key"
}

object ZOrderKey {

  /** Spread the low 32 bits of `v` to the even bit positions of a
    * 64-bit word (classic Morton dilation). */
  @inline def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton interleave: x's bits at even positions, y's at odd. Only
    * the low 32 bits of each input participate. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  def zkey(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrderKey(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** The equivalent per-bit SQL expression over `bits` low bits of each
    * dimension — the executable oracle form for engines without the
    * kernel (inputs must fit in `bits` bits for equality to hold). */
  def oracleSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
    org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
    Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("z_order_key"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[ZOrderKey].getName, "z_order_key"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "z_order_key(x, y) takes 2 arguments")
      ZOrderKey(children(0), children(1))
    })
}
