package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Order-preserving removal of a CONSTANT long blacklist from an
  * `array<bigint>` column: emits the input's elements, in order, that
  * are not in `blacklist` (null elements pass through — a long set
  * cannot contain them).
  *
  * Exists because `array_except(col, lit(blacklist))` rebuilds its
  * comparison hash set from the literal argument ON EVERY ROW —
  * O(rows × |blacklist|) set inserts, the exact per-row cliff the
  * hot-shingle cap was built to avoid, plus a plan literal whose
  * stringified form bloats every explain/task description. This kernel
  * sorts the blacklist ONCE per expression instance and probes by
  * binary search: O(len · log |blacklist|) per row, constant setup,
  * and the array rides the codegen references (not the plan string).
  *
  * Contract: duplicates in the input are preserved (callers here pass
  * distinct shingle arrays, for which this equals `array_except`
  * element-for-element — pinned in SigKernelsSpec); `array_except`'s
  * additional de-duplication is deliberately NOT replicated. */
case class LongSetRemove(child: Expression, blacklist: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"long_set_remove expects array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = child.dataType

  @transient private lazy val sorted: Array[Long] = {
    val s = blacklist.clone(); java.util.Arrays.sort(s); s
  }

  override def nullSafeEval(v: Any): Any =
    LongSetRemove.compute(v.asInstanceOf[ArrayData], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = LongSetRemove.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val ref = ctx.addReferenceObj("hotSorted", sorted, "long[]")
      s"${ev.value} = $helper.compute($a, $ref);"
    })

  override protected def withNewChildInternal(c: Expression): LongSetRemove =
    copy(child = c)
  override def prettyName: String = "long_set_remove"
}

object LongSetRemove {

  /** One pass: keep elements whose binary search misses. Called from
    * both interpreted eval and the generated code. */
  def compute(arr: ArrayData, sorted: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val keep = new Array[Boolean](n)
    var kept = 0
    var anyNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { keep(i) = true; kept += 1; anyNull = true }
      else if (java.util.Arrays.binarySearch(sorted, arr.getLong(i)) < 0) {
        keep(i) = true; kept += 1
      }
      i += 1
    }
    if (anyNull) {
      val out = new Array[Any](kept)
      var j = 0; i = 0
      while (i < n) {
        if (keep(i)) { out(j) = if (arr.isNullAt(i)) null else arr.getLong(i); j += 1 }
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](kept)
      var j = 0; i = 0
      while (i < n) {
        if (keep(i)) { out(j) = arr.getLong(i); j += 1 }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def remove(arr: Column, blacklist: Array[Long]): Column =
    ColumnBridge.column(LongSetRemove(ColumnBridge.expression(arr), blacklist))
}
