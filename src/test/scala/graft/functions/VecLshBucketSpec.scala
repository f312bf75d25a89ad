package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.sim.Similarity

/** VecLshBucket must produce bucket ids bit-identical to the
  * higher-order-function formulation it replaces (same murmur3-derived
  * hyperplane signs, same strict-positivity rule). */
class VecLshBucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucket ids match the lambda formulation on random float vectors") {
    val df = (0 until 256).map { i =>
      (i.toLong, Array.tabulate(24)(j => (math.sin(i * 13 + j * 7) * 5).toFloat))
    }.toDF("id", "v")
    for (planes <- Seq(1, 8, 16)) {
      val mismatches = df.select(
        VecLshBucket.bucket(col("v"), planes).as("native"),
        Similarity.lshBucketLambda(col("v"), planes).as("lambda"))
        .filter(col("native") =!= col("lambda")).count()
      assert(mismatches == 0, s"planes=$planes")
    }
  }

  test("bucket ids match on real embeddings (sf0.001)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val mismatches = emb.select(
      VecLshBucket.bucket(col("embedding"), 8).as("native"),
      Similarity.lshBucketLambda(col("embedding"), 8).as("lambda"))
      .filter(col("native") =!= col("lambda")).count()
    assert(mismatches == 0)
  }

  test("null vector and null element yield NULL in BOTH forms (VecDot convention)") {
    // a degenerate vector gets NO bucket — mapping it to 0 would
    // silently collide it with real bucket-0 vectors (hostile sweep,
    // r10: the kernel-vs-spec agreement row caught the two forms
    // disagreeing here)
    val df = Seq(
      (1L, Array[java.lang.Float](1.0f, null, 2.0f)),
      (2L, null.asInstanceOf[Array[java.lang.Float]]),
      (3L, Array[java.lang.Float](1.0f, -1.0f, 2.0f))
    ).toDF("id", "v")
    val rows = df.select(col("id"),
      VecLshBucket.bucket(col("v"), 8).as("native"),
      Similarity.lshBucketLambda(col("v"), 8).as("lambda")).collect()
    rows.foreach { r =>
      val (n, l) = (r.isNullAt(1), r.isNullAt(2))
      if (r.getLong(0) == 3L) {
        assert(!n && !l && r.getLong(1) == r.getLong(2))
      } else assert(n && l, s"id ${r.getLong(0)}: native null=$n lambda null=$l")
    }
  }

  test("non-nullable array input compiles under codegen (no silent interpreted fallback)") {
    // With a NON-nullable array child (containsNull=false over
    // spark.range), the expression itself is non-nullable, so
    // nullSafeCodeGen makes ev.isNull the literal `false` — the
    // generated code must not assign to it (`false = true;` fails
    // Janino and silently demotes the stage to interpreted execution;
    // review sweep r10). fallback=false turns that demotion into a
    // loud error.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(64).select(col("id"),
        transform(sequence(lit(0), lit(15)),
          j => (j + col("id")).cast("double")).as("v"))
      assert(!df.schema("v").nullable &&
        !df.schema("v").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull,
        "fixture must be a non-nullable array to exercise the non-nullable codegen branch")
      val mismatches = df.select(
        VecLshBucket.bucket(col("v"), 8).as("native"),
        Similarity.lshBucketLambda(col("v"), 8).as("lambda"))
        .filter(col("native") =!= col("lambda")).count()
      assert(mismatches == 0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("empty and double-typed arrays agree with the lambda form") {
    val df = Seq(
      (1L, Array.empty[Double]),
      (2L, Array(0.5, -1.5, 2.5))
    ).toDF("id", "v")
    val rows = df.select(col("id"),
      VecLshBucket.bucket(col("v"), 8).as("native"),
      Similarity.lshBucketLambda(col("v"), 8).as("lambda")).collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id ${r.getLong(0)}"))
  }
}
