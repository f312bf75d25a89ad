package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.sim.Similarity

/** Property tests for the native vector kernels: on arbitrary float
  * vectors (including NaN/Inf-free extremes, zero vectors, dimension 1)
  * the codegen'd expressions must equal their interpreted reference
  * formulations bit-for-bit. Fixed seeds in the fixed-vector specs can
  * miss sign-boundary cases; generated vectors sweep them. */
class VecKernelPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val finiteFloat: Gen[Float] =
    Gen.chooseNum(-1e6f, 1e6f)
  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(1, 48).flatMap(d => Gen.containerOfN[Array, Float](d, finiteFloat))

  test("vec_dot equals the lambda fold on generated vector batches") {
    val pairs = Gen.listOfN(200, for { a <- vecGen; b <- vecGen } yield (a, b))
      .sample.getOrElse(Nil)
    assert(pairs.nonEmpty)
    // equal-dim pairs compute; unequal-dim pairs must be NULL both ways
    val df = pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
    val lambda = aggregate(
      zip_with(transform(col("a"), _.cast("double")), transform(col("b"), _.cast("double")),
        (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val rows = df.select(col("id"), VecDot.dot(col("a"), col("b")).as("n"), lambda.as("r"))
      .collect()
    rows.foreach { r =>
      val (nNull, rNull) = (r.isNullAt(1), r.isNullAt(2))
      assert(nNull == rNull, s"null disagreement id=${r.getLong(0)}")
      if (!nNull)
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)), s"id=${r.getLong(0)}")
    }
  }

  test("vec_lsh_bucket equals the lambda formulation on generated vectors") {
    val vecs = Gen.listOfN(300, vecGen).sample.getOrElse(Nil)
    assert(vecs.nonEmpty)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val bad = df.select(
      VecLshBucket.bucket(col("v"), 12).as("native"),
      Similarity.lshBucketLambda(col("v"), 12).as("lambda"))
      .filter(col("native") =!= col("lambda")).count()
    assert(bad == 0)
  }
}
