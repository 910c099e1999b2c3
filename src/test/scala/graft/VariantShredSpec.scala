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

  test("objectFields is backtick-aware: quoted names may contain ':' ',' '<'") {
    // schema_of_variant_agg emits names needing quoting as `...` with
    // embedded backticks doubled — the splitter must treat the quoted
    // run as opaque name characters, not structure
    val fs = VariantShred.objectFields(
      "OBJECT<`a,b`: BIGINT, `ns:key`: STRING, `x<y`: DOUBLE, plain: BIGINT, `tick``ed`: STRING>")
    assert(fs == Seq(
      "a,b" -> "BIGINT", "ns:key" -> "STRING", "x<y" -> "DOUBLE",
      "plain" -> "BIGINT", "tick`ed" -> "STRING"), fs)
    // a quoted name inside a NESTED object must not split the parent
    val nested = VariantShred.objectFields(
      "OBJECT<o: OBJECT<`c:d`: BIGINT>, z: STRING>")
    assert(nested == Seq("o" -> "OBJECT<`c:d`: BIGINT>", "z" -> "STRING"), nested)
  }

  test("pathFor picks dot or quoted-bracket form by name shape") {
    assert(VariantShred.pathFor("plain") == Some("$.plain"))
    assert(VariantShred.pathFor("ns:key") == Some("$.ns:key"))
    assert(VariantShred.pathFor("a,b") == Some("$.a,b"))
    assert(VariantShred.pathFor("do.t") == Some("$['do.t']"))
    assert(VariantShred.pathFor("br[0") == Some("$['br[0']"))
    assert(VariantShred.pathFor("q'.uote").isEmpty) // inexpressible
    assert(VariantShred.pathFor("").isEmpty)
  }

  test("keys with ':' ',' '<' shred end-to-end and extract correctly") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"ns:key": 10, "a,b": "x", "x<y": 1.5, "do.t": 7}"""),
      (2L, """{"ns:key": 20, "a,b": "y", "x<y": 2.5, "do.t": 8}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("v"))
    val out = tmp("shred_oddkeys")
    val schemas = VariantShred.writeShredded(df, out)
    assert(schemas("v").startsWith("OBJECT<"), schemas("v"))
    val back = spark.read.parquet(out)
    assert(back.columns.toSet ==
      Set("id", "v$ns:key", "v$a,b", "v$x<y", "v$do.t"), back.columns.mkString(","))
    val rows = back.select(col("id"),
        col("`v$ns:key`").as("k"), col("`v$a,b`").as("ab"),
        col("`v$x<y`").cast("double").as("xy"), col("`v$do.t`").as("dt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
      .toSet
    assert(rows == Set((1L, 10L, "x", 1.5, 7L), (2L, 20L, "y", 2.5, 8L)))
  }

  test("an inexpressible key name stays reachable through the residual") {
    import spark.implicits._
    // contains both a dot and a single quote: no variant path can name
    // it, so it must NOT shred — and the residual must carry it
    val df = Seq((1L, """{"w.o'e": 5, "k": 1}"""))
      .toDF("id", "j").select(col("id"), parse_json(col("j")).as("v"))
    val out = tmp("shred_inexpressible")
    VariantShred.writeShredded(df, out)
    val back = spark.read.parquet(out)
    assert(back.columns.toSet == Set("id", "v$k", "v$residual"),
      back.columns.mkString(","))
    val got = back.select(
      variant_get(col("v$residual"), "$", "string").as("all")).head.getString(0)
    assert(got.contains("w.o'e"), got)
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
