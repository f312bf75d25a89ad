package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** VecDot: codegen and interpreted paths agree with the higher-order
  * lambda fold it replaces, including null / length-mismatch edges. */
class VecDotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lambdaDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(transform(a, _.cast("double")), transform(b, _.cast("double")),
      (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("matches the interpreted lambda fold bit-for-bit on float arrays") {
    val df = (0 until 64).map { i =>
      (i.toLong,
        Array.tabulate(16)(j => (math.sin(i * 17 + j) * 10).toFloat),
        Array.tabulate(16)(j => (math.cos(i * 31 + j) * 10).toFloat))
    }.toDF("id", "a", "b")
    val got = df.select(col("id"), VecDot.dot(col("a"), col("b")).as("d"),
      lambdaDot(col("a"), col("b")).as("ref"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"row ${r.getLong(0)}")
    }
  }

  test("null array, null element, and length mismatch yield NULL") {
    val df = Seq(
      (1L, Array[java.lang.Float](1f, 2f), Array[java.lang.Float](3f, 4f)),
      (2L, Array[java.lang.Float](1f, null), Array[java.lang.Float](3f, 4f)),
      (3L, Array[java.lang.Float](1f, 2f, 3f), Array[java.lang.Float](3f, 4f)),
      (4L, null, Array[java.lang.Float](3f, 4f))
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"), VecDot.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L).contains(11.0))
    assert(rows(2L).isEmpty)
    assert(rows(3L).isEmpty)
    assert(rows(4L).isEmpty)
  }

  test("double arrays and mixed float/double are accepted") {
    val df = Seq((Array(1.5, 2.5), Array(2.0, 4.0))).toDF("a", "b")
      .withColumn("af", transform(col("a"), _.cast("float")))
    assert(df.select(VecDot.dot(col("a"), col("b"))).head.getDouble(0) == 13.0)
    assert(df.select(VecDot.dot(col("af"), col("b"))).head.getDouble(0) == 13.0)
  }

  test("registered as vec_dot via GraftExtensions for SQL callers") {
    val df = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT vec_dot(a, b) FROM vecs").head.getDouble(0) == 11.0)
  }

  test("rejects non-array inputs at analysis time") {
    val df = Seq((1, Array(1f))).toDF("x", "a")
    val e = intercept[Exception] { df.select(VecDot.dot(col("x"), col("a"))).head }
    assert(e.getMessage.toLowerCase.contains("vec_dot"))
  }
}
