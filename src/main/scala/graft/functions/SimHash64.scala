package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native 64-bit SimHash of a token array — the projection-shaped twin
  * of the explode + groupBy formulation (`Dedup.simhashGrouped`): per
  * token, `h = xxhash64(token)` (XXH64 over the UTF8 bytes, Spark's
  * default seed 42 — bit-identical to the `xxhash64` SQL function);
  * per bit j, count +1 if bit j of h is set else −1; signature bit j is
  * 1 iff the count is positive.
  *
  * The grouped form explodes every token into a row and shuffles
  * (doc_id, token_hash) to a 64-sum hash aggregate — at 100 TB that is
  * a full shuffle of the tokenized corpus. This kernel computes the
  * signature inside the scan projection: ZERO shuffle, one fused loop
  * (tokens × 64 bit-tests) per document, inside whole-stage codegen.
  * Null tokens are SKIPPED — they contribute nothing, in BOTH forms
  * (the grouped spec filters them before aggregating). This is a
  * deliberate contract, not an accident of SQL nulls: Spark's
  * `xxhash64` does NOT return null for a null input — it skips the
  * argument and returns its seed (42) — so a null token left in the
  * grouped stream would silently hash as the constant 42 while any
  * "null contributes −1" kernel rule diverged from it; skip-on-both-
  * sides is the one semantics both formulations can share exactly.
  * An empty array yields signature 0 (the grouped form simply has no
  * row to aggregate; callers that need cardinality parity filter
  * empty docs first, as Dedup.simhash does).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null tokens contribute nothing (see scaladoc)
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < 64) {
          counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $a.numElements();
         |final int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) { // null tokens contribute nothing
         |    final long $h = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $j = 0; $j < 64; $j++) {
         |      $counts[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def simhash(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
    org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
    Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[SimHash64].getName, "simhash64"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "simhash64(tokens) takes 1 argument")
      SimHash64(children.head)
    })
}
