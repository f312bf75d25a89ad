package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** VecEqCount must agree with the interpreted CASE-sum fold it replaces,
  * including null elements and mismatched lengths (zip_with padding). */
class VecEqCountSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lambdaForm(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)

  test("matches the lambda fold on random int signatures") {
    val df = (0 until 200).map { i =>
      (i.toLong,
        Array.tabulate(16)(j => (i * 31 + j * 7) % 5),
        Array.tabulate(16)(j => (i * 17 + j * 7) % 5))
    }.toDF("id", "a", "b")
    val bad = df.select(VecEqCount.eqCount(col("a"), col("b")).as("n"),
      lambdaForm(col("a"), col("b")).as("r"))
      .filter(col("n") =!= col("r")).count()
    assert(bad == 0)
  }

  test("null elements and length mismatch match zip_with padding semantics") {
    val df = Seq(
      (1L, Array[java.lang.Integer](1, 2, 3), Array[java.lang.Integer](1, 9, 3)),
      (2L, Array[java.lang.Integer](1, null, 3), Array[java.lang.Integer](1, null, 3)),
      (3L, Array[java.lang.Integer](1, 2), Array[java.lang.Integer](1, 2, 3, 4))
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"), VecEqCount.eqCount(col("a"), col("b")).as("n"),
      lambdaForm(col("a"), col("b")).as("r")).collect()
    rows.foreach(r => assert(r.getInt(1) == r.getInt(2), s"id=${r.getLong(0)}"))
    assert(rows.map(r => r.getLong(0) -> r.getInt(1)).toMap == Map(1L -> 2, 2L -> 2, 3L -> 2))
  }

  test("registered for SQL via GraftExtensions, as are the other kernels") {
    Seq((Array(1, 2, 3), Array(1, 9, 3), Array(1.0f, -2.0f)))
      .toDF("a", "b", "v").createOrReplaceTempView("sigs")
    assert(spark.sql("SELECT vec_eq_count(a, b) FROM sigs").head.getInt(0) == 2)
    // vec_lsh_bucket: SQL call must agree with the Column API
    val (sqlB, colB) = (
      spark.sql("SELECT vec_lsh_bucket(v, 8) FROM sigs").head.getLong(0),
      spark.table("sigs").select(VecLshBucket.bucket(col("v"), 8)).head.getLong(0))
    assert(sqlB == colB)
  }

  test("bigint arrays supported; mixed types rejected at analysis") {
    val df = Seq((Array(1L, 2L), Array(1L, 3L))).toDF("a", "b")
    assert(df.select(VecEqCount.eqCount(col("a"), col("b"))).head.getInt(0) == 1)
    val mixed = df.withColumn("c", transform(col("a"), _.cast("int")))
    val e = intercept[Exception] {
      mixed.select(VecEqCount.eqCount(col("a"), col("c"))).head
    }
    assert(e.getMessage.toLowerCase.contains("vec_eq_count"))
  }
}
