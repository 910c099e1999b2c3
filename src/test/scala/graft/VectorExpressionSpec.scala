package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expressions.{GraftExtensions, VectorFunctions}

class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("floatDot matches the built-in HOF fold bit-for-bit") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.0f), Array(0.5f, 4.0f, -1.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f))).toDF("a", "b")
    val out = df.select(
      VectorFunctions.floatDot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("floatDot propagates null inputs") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val out = df.select(VectorFunctions.floatDot(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("float_dot is SQL-callable via GraftExtensions") {
    val base = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // fresh session (same JVM SparkContext) so extensions apply
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s.implicits._
      Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
        .createOrReplaceTempView("v")
      val r = s.sql("SELECT float_dot(a, b) AS d FROM v").head()
      assert(r.getDouble(0) == 11.0)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
