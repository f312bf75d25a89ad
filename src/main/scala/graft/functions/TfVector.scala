package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native hashing-trick term-frequency vector: token t increments
  * bucket `pmod(xxhash64(t), dim)` (xxhash64 seed 42 and pmod's
  * non-negative remainder — bit-identical to the
  * `explode → pmod(xxhash64(t), dim) → groupBy(dim sums)` formulation
  * this replaces, kept as `TextOps.tfVectorsGrouped`). Output is
  * `array<double>` of length `dim`, ready for the cosine/LSH/IVF
  * operators.
  *
  * The grouped form shuffles every (doc, token) row to a dim-column sum
  * aggregate — a full shuffle of the tokenized corpus. This kernel
  * fills the histogram in one fused loop inside the scan projection:
  * ZERO shuffle. Null tokens are skipped — the grouped spec FILTERS
  * them before aggregating (Spark's xxhash64 skips a null input and
  * returns its seed, so an unfiltered null would land in bucket
  * pmod(seed, dim), not in no bucket). */
case class TfVector(child: Expression, dim: Int) extends UnaryExpression {

  require(dim >= 1 && dim <= (1 << 20), s"dim must be in [1, 2^20], got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tf_vector expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TfVector.compute(v.asInstanceOf[ArrayData], dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = TfVector.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($helper.compute($a, $dim));"
    })

  override protected def withNewChildInternal(c: Expression): TfVector = copy(child = c)
  override def prettyName: String = "tf_vector"
}

object TfVector {

  /** One pass: hash token → non-negative bucket → increment. Called
    * from both interpreted eval and the generated code. */
  def compute(arr: ArrayData, dim: Int): Array[Double] = {
    val counts = new Array[Double](dim)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        // pmod semantics: ((h % dim) + dim) % dim
        val b = (((h % dim) + dim) % dim).toInt
        counts(b) += 1.0
      }
      i += 1
    }
    counts
  }

  def tf(tokens: Column, dim: Int): Column =
    ColumnBridge.column(TfVector(ColumnBridge.expression(tokens), dim))

  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
    org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
    Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("tf_vector"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[TfVector].getName, "tf_vector"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "tf_vector(tokens, dim) takes 2 arguments")
      val dim = children(1) match {
        case e if e.foldable && e.dataType == IntegerType => e.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"tf_vector dim must be an int literal, got $other")
      }
      TfVector(children(0), dim)
    })
}
