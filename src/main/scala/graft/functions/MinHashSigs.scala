package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native MinHash signature of a shingle-fingerprint array — the
  * projection-shaped twin of the explode + groupBy formulation
  * (`Dedup.minhashSignaturesGrouped`): signature position i is
  * `min over shingles of murmur3(i, shingle_h)`, where the per-position
  * hash chain is exactly Spark's `hash(lit(i), col)` for an (int, long)
  * input — `hashLong(shb, hashInt(i, 42))` — so signatures are
  * bit-identical to the grouped form's.
  *
  * The grouped form shuffles every (doc_id, shingle_h) row to a k-min
  * hash aggregate — a full shuffle of the shingled corpus. This kernel
  * computes all k minima in one fused loop (shingles × k murmur3
  * re-mixes) inside the scan projection: ZERO shuffle. Null shingle
  * hashes are skipped — the grouped spec FILTERS them before its
  * min aggregate (Spark's `hash` would otherwise fold a null argument
  * to its running seed, not to null, silently joining the min). An EMPTY array
  * yields null (the grouped form has no row to aggregate — callers
  * filter empty docs for cardinality parity, as Dedup does; emitting a
  * sentinel signature instead would make all short docs spurious
  * near-duplicates of each other in the band join).
  */
case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1 && k <= 1024, s"k must be in [1, 1024], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  // per-position seed: murmur3-int of the position with Spark's default
  // hash() seed 42 — loop-invariant, computed once per expression
  @transient private lazy val posSeeds: Array[Int] =
    Array.tabulate(k)(i => Murmur3_x86_32.hashInt(i, 42))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Int.MaxValue)
    var seen = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val shb = arr.getLong(j)
        var i = 0
        while (i < k) {
          val h = Murmur3_x86_32.hashLong(shb, posSeeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seeds = ctx.addReferenceObj("posSeeds", posSeeds, "int[]")
      val mm = classOf[Murmur3_x86_32].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val shb = ctx.freshName("shb")
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      s"""
         |final int $n = $a.numElements();
         |final int[] $mins = new int[$k];
         |java.util.Arrays.fill($mins, Integer.MAX_VALUE);
         |boolean $seen = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    $seen = true;
         |    final long $shb = $a.getLong($j);
         |    for (int $i = 0; $i < $k; $i++) {
         |      final int $h = $mm.hashLong($shb, $seeds[$i]);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |}
         |if (!$seen) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = null;
         |} else {
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSigs = copy(child = c)
  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  def sigs(shingleHashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSigs(ColumnBridge.expression(shingleHashes), k))

  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
    org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
    Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sigs"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[MinHashSigs].getName, "minhash_sigs"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "minhash_sigs(shingle_hashes, k) takes 2 arguments")
      val k = children(1) match {
        case e if e.foldable && e.dataType == IntegerType =>
          e.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"minhash_sigs k must be an int literal, got $other")
      }
      MinHashSigs(children(0), k)
    })
}
