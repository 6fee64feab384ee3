package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSessionExtensions

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("codegen expression equals the HOF formulation exactly") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    import graft.functions.VectorFunctions._
    val (fast, ref) = df.select(
      dot(toDouble($"a"), toDouble($"b")),
      dotHof(toDouble($"a"), toDouble($"b"))).as[(Double, Double)].head()
    assert(fast === ref && fast === 32.0)
  }

  test("registered for SQL via the extensions' injection shape") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => org.apache.spark.sql.graftexpr.DotProductExpr(exprs(0), exprs(1)), "built-in")
    val v = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(v === 11.0)
  }

  test("extensions entry point applies cleanly") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("SQL call on array<float> gets implicit elementwise cast, not a garbage read") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => org.apache.spark.sql.graftexpr.DotProductExpr(exprs(0), exprs(1)), "built-in")
    val v = spark.sql(
      "SELECT dot_product(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d")
      .as[Double].head()
    assert(v === 9.0)
  }
}
