package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native sign-LSH bucket id (codegen twin of the lambda form that
  * Similarity.lshBucket originally built from zip_with/aggregate):
  * `planes` pseudo-random ±1 hyperplanes whose component for (plane p,
  * dim j) is `+1` iff `murmur3(j, murmur3(p, 42)) mod 2 == 0` — exactly
  * Spark's `hash(lit(p), j)` for int inputs, so bucket ids are
  * bit-identical to the interpreted version. Bit p of the result is set
  * iff the plane-p signed sum is strictly positive.
  *
  * The interpreted form costs planes × dim lambda dispatches per row;
  * this is one fused primitive loop (dim iterations × planes adds) with
  * the per-plane seed hashes precomputed once per expression instance.
  */
case class VecLshBucket(child: Expression, planes: Int) extends UnaryExpression {

  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_lsh_bucket expects array<float|double>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  // a null ELEMENT makes the result null (the VecDot convention —
  // hostile sweep r10 unified the two kernels' degenerate contract),
  // so the result can be null even over a non-nullable array column
  override def nullable: Boolean =
    child.nullable || child.dataType.asInstanceOf[ArrayType].containsNull

  // seed of plane p's per-dim hash chain: murmur3-int of p with Spark's
  // default hash() seed 42 — loop-invariant, computed once
  @transient private lazy val planeSeeds: Array[Int] =
    Array.tabulate(planes)(p => Murmur3_x86_32.hashInt(p, 42))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = elemIsFloat
    val dots = new Array[Double](planes)
    var j = 0
    while (j < n) {
      // null element -> NULL bucket (VecDot convention): a degenerate
      // vector gets NO bucket rather than silently landing in real
      // bucket 0 — the interpreted spec (lshBucketLambda) guards the
      // same way, and pairing never sees these rows (norm > 0 filter)
      if (arr.isNullAt(j)) return null
      val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      var p = 0
      while (p < planes) {
        val h = Murmur3_x86_32.hashInt(j, planeSeeds(p))
        dots(p) += (if (((h % 2) + 2) % 2 == 0) x else -x)
        p += 1
      }
      j += 1
    }
    var bucket = 0L
    var p = 0
    while (p < planes) {
      if (dots(p) > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seeds = ctx.addReferenceObj("planeSeeds", planeSeeds, "int[]")
      val mm = classOf[Murmur3_x86_32].getName
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val dots = ctx.freshName("dots")
      val bucket = ctx.freshName("bucket")
      val anyNull = ctx.freshName("anyNull")
      val getX =
        if (elemIsFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      val containsNull = child.dataType.asInstanceOf[ArrayType].containsNull
      val nullBreak =
        if (containsNull) s"if ($a.isNullAt($j)) { $anyNull = true; break; }"
        else ""
      // When containsNull is false, `anyNull` can never flip AND this
      // expression is non-nullable (see [[nullable]]) — in which case
      // nullSafeCodeGen's non-nullable branch makes `ev.isNull` the
      // LITERAL `false`, not a declared variable, so emitting an
      // assignment to it would be invalid Java (`false = true;`),
      // failing Janino and silently demoting the whole stage to
      // interpreted execution. Emit the null arm only when the type
      // admits null elements (then nullable=true and isNull is real).
      val bucketLoop =
        s"""for (int $p = 0; $p < $planes; $p++) {
           |  if ($dots[$p] > 0) $bucket |= (1L << $p);
           |}""".stripMargin
      val setNullOrBucket =
        if (containsNull)
          s"""if ($anyNull) {
             |  ${ev.isNull} = true; // null element -> NULL (VecDot convention)
             |} else {
             |  $bucketLoop
             |}""".stripMargin
        else bucketLoop
      s"""
         |final int $n = $a.numElements();
         |final double[] $dots = new double[$planes];
         |boolean $anyNull = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  $nullBreak
         |  final double $x = $getX;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    final int $h = $mm.hashInt($j, $seeds[$p]);
         |    $dots[$p] += ((($h % 2) + 2) % 2 == 0) ? $x : -$x;
         |  }
         |}
         |long $bucket = 0L;
         |$setNullOrBucket
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecLshBucket =
    copy(child = c)
  override def prettyName: String = "vec_lsh_bucket"
}

object VecLshBucket {
  def bucket(vec: Column, planes: Int): Column =
    ColumnBridge.column(VecLshBucket(ColumnBridge.expression(vec), planes))

  /** FunctionRegistry descriptor: `vec_lsh_bucket(vec, planes)` with a
    * foldable int-literal planes argument. */
  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
    org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
    Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("vec_lsh_bucket"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[VecLshBucket].getName, "vec_lsh_bucket"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "vec_lsh_bucket(vec, planes) takes 2 arguments")
      val planes = children(1) match {
        case e if e.foldable && e.dataType == IntegerType =>
          e.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"vec_lsh_bucket planes must be an int literal, got $other")
      }
      VecLshBucket(children(0), planes)
    })
}
