package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The optimizer rule must rewrite the HOF dot-product idiom (Column
  * and SQL forms, with or without the widening transform) to vec_dot,
  * leave non-idiom folds untouched, and preserve results bit-for-bit. */
class VecDotRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // file-backed (a local Seq collapses to LocalTableScan at optimization,
  // hiding the projection from plan assertions)
  private lazy val df = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rw").toString + "/vecs"
    (0 until 32).map { i =>
      (i.toLong,
        Array.tabulate(8)(j => (math.sin(i * 3 + j) * 4).toFloat),
        Array.tabulate(8)(j => (math.cos(i * 5 + j) * 4).toFloat))
    }.toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def planOf(c: org.apache.spark.sql.Column): String = {
    val q = df.select(c.as("r"))
    q.collect()
    q.queryExecution.executedPlan.toString
  }

  test("Column-form idiom with widening transforms rewrites to vec_dot") {
    val idiom = aggregate(
      zip_with(transform(col("a"), _.cast("double")), transform(col("b"), _.cast("double")),
        (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val p = planOf(idiom)
    assert(p.contains("vec_dot"), s"rewrite did not fire:\n$p")
    // and the rewritten result is bit-identical to the explicit kernel
    val rows = df.select(idiom.as("hof"), VecDot.dot(col("a"), col("b")).as("native")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("SQL-form idiom rewrites to vec_dot") {
    df.createOrReplaceTempView("vecs_rw")
    val q = spark.sql(
      """SELECT aggregate(zip_with(CAST(a AS array<double>), CAST(b AS array<double>),
        |  (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS r FROM vecs_rw""".stripMargin)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("vec_dot"), s"SQL rewrite did not fire:\n$p")
  }

  test("non-idiom folds are left alone") {
    // different zero → not a dot product
    val notDot1 = aggregate(
      zip_with(transform(col("a"), _.cast("double")), transform(col("b"), _.cast("double")),
        (x, y) => x * y), lit(1.0), (acc, v) => acc + v)
    assert(!planOf(notDot1).contains("vec_dot"))
    // sum of maxima, not products
    val notDot2 = aggregate(
      zip_with(transform(col("a"), _.cast("double")), transform(col("b"), _.cast("double")),
        (x, y) => greatest(x, y)), lit(0.0), (acc, v) => acc + v)
    assert(!planOf(notDot2).contains("vec_dot"))
  }
}
