package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native DotProductExpr must agree exactly with the HOF formulation
  * (same element-order accumulation) on both interpreted and codegen
  * paths, handle float/double mixes, and propagate nulls. */
class VectorExpressionsSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("matches HOF fold bit-exactly on real embeddings (codegen path)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val both = emb.select(
      VectorExpressions.dotProduct(col("embedding"), col("embedding")).as("native"),
      hofDot(col("embedding"), col("embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("two dot products in one codegen function compile (fresh locals)") {
    // Regression: fixed `i`/`n`/`acc` locals collided when a cosine-style
    // projection placed two DotProductExprs in one whole-stage-codegen
    // function — janino failed and the stage silently ran interpreted.
    // codegen.fallback=false turns that silent fallback into a test failure.
    import SparkSpec.spark.implicits._
    val df = Seq((1L, Array(1f, 2f), Array(3f, 4f))).toDF("id", "a", "b")
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      val row = df.select(
        VectorExpressions.dotProduct(col("a"), col("b")).as("ab"),
        VectorExpressions.dotProduct(col("a"), col("a")).as("aa"),
        VectorExpressions.dotProduct(col("b"), col("b")).as("bb")).head
      assert(row.getDouble(0) == 11.0 && row.getDouble(1) == 5.0
        && row.getDouble(2) == 25.0)
    }
  }

  test("float x double literal mix") {
    import SparkSpec.spark.implicits._
    val df = Seq((1L, Array(1f, 2f, 3f))).toDF("id", "v")
    val planes = typedLit(Seq(0.5, 0.5, 0.5))
    val out = df.select(
      VectorExpressions.dotProduct(col("v"), planes).as("d")).head.getDouble(0)
    assert(out == 3.0)
  }

  test("null array propagates null") {
    import SparkSpec.spark.implicits._
    val df = Seq((1L, null: Array[Float]), (2L, Array(1f, 1f)))
      .toDF("id", "v")
    val out = df.select(col("id"),
      VectorExpressions.dotProduct(col("v"), col("v")).as("d"))
      .orderBy(col("id")).collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getDouble(1) == 2.0)
  }

  test("type check rejects non-numeric arrays") {
    import SparkSpec.spark.implicits._
    val df = Seq((1L, Array("a", "b"))).toDF("id", "v")
    intercept[Exception] {
      df.select(VectorExpressions.dotProduct(col("v"), col("v"))).collect()
    }
  }
}
