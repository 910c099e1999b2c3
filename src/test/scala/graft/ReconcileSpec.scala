package graft

import org.apache.spark.sql.functions._
import graft.operators.Reconcile

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def diffMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap

  test("tableDiff names added/removed/changed keys with exact changed column sets; unchanged keys absent") {
    val left = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 20L), (3L, Some("c"), 30L),
      (4L, None: Option[String], 40L), (5L, Some("e"), 50L)
    ).toDF("id", "s", "v")
    val right = Seq(
      (1L, Some("a"), 10L),                      // unchanged
      (3L, Some("C"), 31L),                      // both columns changed
      (4L, None: Option[String], 40L),           // unchanged (NULL <=> NULL)
      (5L, None: Option[String], 50L),           // value -> NULL is a change
      (6L, Some("f"), 60L)                       // added
    ).toDF("id", "s", "v")
    val got = diffMap(Reconcile.tableDiff(left, right, Seq("id")))
    assert(got == Map(
      2L -> ("removed", ""),
      3L -> ("changed", "s,v"),
      5L -> ("changed", "s"),
      6L -> ("added", "")))
  }

  test("tableDiff hashCols compares by digest — same verdicts, wide column never joined by value") {
    val left = Seq((1L, "same text", 1L), (2L, "old body", 2L)).toDF("id", "t", "v")
    val right = Seq((1L, "same text", 1L), (2L, "new body", 2L)).toDF("id", "t", "v")
    val got = diffMap(Reconcile.tableDiff(left, right, Seq("id"), hashCols = Seq("t")))
    assert(got == Map(2L -> ("changed", "t")))
    // the join's projected side carries the 32-hex digest, not the
    // text (analyzed plan — the optimizer constant-folds md5 over a
    // literal fixture, which only proves the digest is map-side)
    val plan = Reconcile.tableDiff(left, right, Seq("id"), hashCols = Seq("t"))
      .queryExecution.analyzed.toString
    assert(plan.contains("md5"), s"expected md5 projection below the join:\n$plan")
  }

  test("tableDiff identical tables diff empty; schema drift and bad keys fail loudly") {
    val t = Seq((1L, "a")).toDF("id", "s")
    assert(Reconcile.tableDiff(t, t, Seq("id")).isEmpty)
    intercept[IllegalArgumentException] {
      Reconcile.tableDiff(t, t.withColumnRenamed("s", "z"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Reconcile.tableDiff(t, t, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Reconcile.tableDiff(t, t, Seq("id"), hashCols = Seq("id")) // key as hashCol
    }
  }
}
