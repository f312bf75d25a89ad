package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native word-n-gram shingle fingerprints: for token array t, position
  * i yields the xxhash64 chain over (t(i), …, t(i+n−1)) with Spark's
  * default seed 42 — bit-identical to
  * `xxhash64(element_at(t,i+1), …, element_at(t,i+n))`, including the
  * null-token skip (a null child leaves the running hash unchanged,
  * exactly Spark's multi-argument hash semantics). Arrays shorter than
  * n yield an empty result; `distinct` dedups the fingerprints (SET
  * semantics like `array_distinct`; output order is ascending rather
  * than first-occurrence — every consumer is an aggregate or join, so
  * only the set matters).
  *
  * Why native, not `transform(sequence(...), i -> xxhash64(...))`: the
  * higher-order form is interpreted (≈3·grams lambda dispatches per
  * document), and — the sharper edge — when the token array lives in
  * the projection directly below, CollapseProject happily inlines the
  * `split()` that produced it into EVERY `element_at` reference,
  * re-tokenizing the document once per gram token (observed 6× blowup).
  * This kernel references the token array exactly once, so the collapse
  * is safe, and the whole gram loop runs fused inside codegen. */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression {

  require(n >= 1 && n <= 16, s"n must be in [1, 16], got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Shared by eval and the generated code (the loop is identical; the
    * value is the fingerprint array before/after dedup). */
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    new GenericArrayData(ShingleHashes.compute(arr, n, distinct))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = ShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($helper.compute($a, $n, $distinct));"
    })

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {

  /** The fingerprint loop — one tight pass, no per-gram allocation
    * (tokens are re-hashed per gram rather than cached per position:
    * n ≤ 3 in practice and XXH64 over short UTF8 slices is cheaper than
    * the indirection). Called from both interpreted eval and codegen. */
  def compute(arr: ArrayData, n: Int, distinct: Boolean): Array[Long] = {
    val num = arr.numElements()
    if (num < n) return Array.emptyLongArray
    val m = num - n + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 42L
      var o = 0
      while (o < n) {
        // null token: running hash unchanged (Spark multi-arg hash semantics)
        if (!arr.isNullAt(i + o)) h = XXH64.hashUTF8String(arr.getUTF8String(i + o), h)
        o += 1
      }
      hs(i) = h
      i += 1
    }
    if (!distinct) hs
    else {
      java.util.Arrays.sort(hs)
      var w = 0
      var r = 0
      while (r < m) {
        if (r == 0 || hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
        r += 1
      }
      java.util.Arrays.copyOf(hs, w)
    }
  }

  def shingles(tokens: Column, n: Int, distinct: Boolean): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), n, distinct))

  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
    org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
    Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_hashes"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[ShingleHashes].getName, "shingle_hashes"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "shingle_hashes(tokens, n, distinct) takes 3 arguments")
      val n = children(1) match {
        case e if e.foldable && e.dataType == IntegerType => e.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"shingle_hashes n must be an int literal, got $other")
      }
      val d = children(2) match {
        case e if e.foldable && e.dataType == BooleanType => e.eval().asInstanceOf[Boolean]
        case other => throw new IllegalArgumentException(
          s"shingle_hashes distinct must be a boolean literal, got $other")
      }
      ShingleHashes(children(0), n, d)
    })
}
