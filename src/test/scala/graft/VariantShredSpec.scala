package graft

import org.apache.spark.sql.functions._

import graft.sources.VariantShred

/** The variant shredding write path: schema parsing, typed-column
  * materialization, residual fallback for conflicting types, pruned
  * read-back. */
class VariantShredSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("t").toString

  test("objectFields parses nested and parameterized types at top level only") {
    val fs = VariantShred.objectFields(
      "OBJECT<arr: ARRAY<DECIMAL(2,1)>, k: BIGINT, mix: VARIANT, o: OBJECT<a: BIGINT, b: STRING>, s: STRING>")
    assert(fs == Seq(
      "arr" -> "ARRAY<DECIMAL(2,1)>", "k" -> "BIGINT", "mix" -> "VARIANT",
      "o" -> "OBJECT<a: BIGINT, b: STRING>", "s" -> "STRING"))
    assert(VariantShred.objectFields("BIGINT").isEmpty)
    assert(VariantShred.objectFields("VARIANT").isEmpty)
    assert(VariantShred.objectFields("OBJECT<>").isEmpty)
    assert(VariantShred.typable("ARRAY<DOUBLE>"))
    assert(!VariantShred.typable("OBJECT<a: VARIANT>"))
    assert(VariantShred.toSparkDdl("OBJECT<a: OBJECT<b: BIGINT>>")
      == "STRUCT<a: STRUCT<b: BIGINT>>")
  }

  test("parsePath handles fields and 0-based array indices") {
    assert(VariantShred.parsePath("$.a") == Seq(Left("a")))
    assert(VariantShred.parsePath("$.a[3].b") ==
      Seq(Left("a"), Right(3), Left("b")))
    intercept[IllegalArgumentException](VariantShred.parsePath("a.b"))
    intercept[IllegalArgumentException](VariantShred.parsePath("$.a[1"))
  }

  test("stable fields shred to typed columns; no residual without conflicts") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 10, "s": "x"}"""),
      (2L, """{"k": 20}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("v"))
    val out = tmp("shred_clean")
    val schemas = VariantShred.writeShredded(df, out)
    assert(schemas("v") == "OBJECT<k: BIGINT, s: STRING>")
    val back = spark.read.parquet(out)
    assert(back.columns.toSet == Set("id", "v$k", "v$s"),
      back.columns.mkString(","))
    val rows = back.select(col("id"),
        VariantShred.extract(back, "v", "$.k", "bigint").as("k"),
        VariantShred.extract(back, "v", "$.s", "string").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .toSet
    assert(rows == Set((1L, 10L, Some("x")), (2L, 20L, None)))
    // a field that never occurred extracts as NULL, not an error
    val none = back.select(
      VariantShred.extract(back, "v", "$.absent", "int").as("a")).collect()
    assert(none.forall(_.isNullAt(0)))
  }

  test("conflicting field types fall back to a residual variant") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 1, "mix": 3}"""),
      (2L, """{"k": 2, "mix": "str"}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("v"))
    val out = tmp("shred_mix")
    val schemas = VariantShred.writeShredded(df, out)
    assert(schemas("v") == "OBJECT<k: BIGINT, mix: VARIANT>")
    val back = spark.read.parquet(out)
    assert(back.columns.toSet == Set("id", "v$k", "v$residual"))
    // the stable field reads its typed column; the conflicted one
    // decodes from the residual, per-row typed as requested
    val rows = back.select(col("id"),
        VariantShred.extract(back, "v", "$.k", "bigint").as("k"),
        VariantShred.extract(back, "v", "$.mix", "string").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set((1L, 1L, "3"), (2L, 2L, "str")))
  }

  test("nested access on shredded struct/array columns stays typed") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"o": {"a": 5, "b": "p"}, "arr": [1.5, 2.5]}"""),
      (2L, """{"o": {"a": 6}, "arr": [9.0]}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("v"))
    val out = tmp("shred_nested")
    VariantShred.writeShredded(df, out)
    val back = spark.read.parquet(out)
    assert(back.columns.toSet == Set("id", "v$arr", "v$o"))
    val rows = back.select(col("id"),
        VariantShred.extract(back, "v", "$.o.a", "bigint").as("a"),
        VariantShred.extract(back, "v", "$.arr[0]", "double").as("e0"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, 5L, 1.5), (2L, 6L, 9.0)))
  }

  test("extraction of a shredded field reads ONLY that parquet column") {
    import spark.implicits._
    val df = Seq((1L, """{"k": 10, "s": "wide payload text"}"""))
      .toDF("id", "j").select(col("id"), parse_json(col("j")).as("v"))
    val out = tmp("shred_prune")
    VariantShred.writeShredded(df, out)
    val back = spark.read.parquet(out)
    val q = back.select(col("id"),
      VariantShred.extract(back, "v", "$.k", "bigint").as("k"))
    val p = q.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(readSchema.contains("v$k"), p)
    assert(!readSchema.contains("v$s"), s"unpruned sibling column: $readSchema")
    assert(!p.contains("Exchange"), p)
  }

  test("a pinned schema skips inference and controls the shred set") {
    import spark.implicits._
    val df = Seq((1L, """{"k": 1, "extra": 2}"""))
      .toDF("id", "j").select(col("id"), parse_json(col("j")).as("v"))
    val out = tmp("shred_pinned")
    // pin a schema narrower than the data: only k is shredded, and the
    // absence of a residual means extra is simply not extractable —
    // the deliberate snapshot-evolution contract
    VariantShred.writeShredded(df, out, Some(Map("v" -> "OBJECT<k: BIGINT>")))
    val back = spark.read.parquet(out)
    assert(back.columns.toSet == Set("id", "v$k"))
  }
}
