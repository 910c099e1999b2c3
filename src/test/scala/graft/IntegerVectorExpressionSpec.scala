package graft

import org.apache.spark.sql.functions._

import graft.expressions.IntegerVectorFunctions

/** Parity pins for the round-16 native integer kernels: each one must
  * match the declarative built-in composition it replaces BIT-FOR-BIT
  * (well-formed, ragged, null-element, empty), because the optimizer
  * rewrite ([[graft.plans.NativeLongFoldRewrite]]) fires on arbitrary
  * plans and the ilog2 chain feeds oracle-checked fixed-point queries. */
class IntegerVectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def hofSqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  test("longSqDist / longDot match the built-in HOF folds, including null semantics") {
    val rows: Seq[(Array[java.lang.Long], Array[java.lang.Long])] = Seq(
      (Array[java.lang.Long](1L, -2L, 3L), Array[java.lang.Long](4L, 5L, -6L)),
      (Array[java.lang.Long](1000000L, -2500000L), Array[java.lang.Long](-1000000L, 2500000L)),
      (Array[java.lang.Long](1L, 2L), Array[java.lang.Long](3L)),             // ragged
      (Array[java.lang.Long](1L), Array[java.lang.Long](1L, 2L, 3L)),         // ragged other way
      (Array[java.lang.Long](1L, null, 3L), Array[java.lang.Long](1L, 2L, 3L)), // null element
      (Array[java.lang.Long](), Array[java.lang.Long]()))                     // both empty → 0
    val df = rows.toDF("a", "b")
    val out = df.select(
      IntegerVectorFunctions.longSqDist(col("a"), col("b")).as("nsq"),
      hofSqDist(col("a"), col("b")).as("hsq"),
      IntegerVectorFunctions.longDot(col("a"), col("b")).as("ndot"),
      hofDot(col("a"), col("b")).as("hdot")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"sqdist null parity: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), s"sqdist value: $r")
      assert(r.isNullAt(2) == r.isNullAt(3), s"dot null parity: $r")
      if (!r.isNullAt(2)) assert(r.getLong(2) == r.getLong(3), s"dot value: $r")
    }
  }

  test("NativeLongFoldRewrite rewrites the declarative folds into the native kernels") {
    // non-foldable source (a literal frame constant-folds to a
    // LocalRelation before the plan can be inspected)
    val df = spark.range(1, 2).select(
      array(col("id"), lit(2L), lit(3L)).as("a"),
      array(lit(4L), lit(5L), lit(6L)).as("b"))
    val q = df.select(hofSqDist(col("a"), col("b")).as("sq"),
      hofDot(col("a"), col("b")).as("dt"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("long_sqdist"), s"sqdist not rewritten:\n$optimized")
    assert(optimized.contains("long_dot"), s"dot not rewritten:\n$optimized")
    val row = q.head()
    assert(row.getLong(0) == (9L + 9L + 9L))
    assert(row.getLong(1) == (4L + 10L + 18L))
  }

  test("BloomContamHits matches the declarative filter/forall/bloomPositions screen") {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.graftinterop.ColumnInterop
    val mBits = 1 << 10
    val k = 3
    // bitset from a few planted shingles via the production fold
    val planted = Seq("alpha beta gamma", "beta gamma delta", "zz yy xx")
    val words = new Array[Long](mBits / 64)
    val pos = planted.toDF("sh")
      .select(explode(TextFunctions.bloomPositions(col("sh"), mBits, k)).as("p"))
      .collect().map(_.getLong(0))
    pos.foreach(p => words((p >>> 6).toInt) |= 1L << (p & 63))
    // probe arrays incl. planted members, misses, empties
    val df = Seq(
      Array("alpha beta gamma", "no such shingle here"),
      Array("beta gamma delta", "zz yy xx", "another miss entirely"),
      Array[String](),
      Array("miss one", "miss two")).toDF("sh")
    def shiftR(v: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      ColumnInterop.column(org.apache.spark.sql.catalyst.expressions.ShiftRight(
        ColumnInterop.expression(v), ColumnInterop.expression(n)))
    val wlit = typedlit(words.toSeq)
    val declarative = size(filter(col("sh"), s =>
      forall(TextFunctions.bloomPositions(s, mBits, k), p =>
        shiftR(element_at(wlit, (p / 64).cast("int") + 1), (p % 64).cast("int"))
          .bitwiseAND(1) === 1))).cast("bigint")
    val out = df.select(
      graft.expressions.BloomFunctions
        .bloomContamHits(col("sh"), words, mBits, k).as("native"),
      declarative.as("decl")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1), s"mismatch: $r"))
    // the planted rows really do hit (the test isn't vacuous)
    assert(out(0).getLong(0) == 1L && out(1).getLong(0) == 2L)
  }

  test("ilog2Fp16 native expression matches the declarative 16-step chain") {
    // the exact chain ilog2Fp16 replaced (struct fold over sequence)
    def oldChain(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val msb = (length(bin(p)) - 1).cast("long")
      val init = struct(
        call_function("shiftright", shiftleft(p, 20), msb).as("x"),
        lit(0L).as("acc"))
      val folded = aggregate(sequence(lit(1), lit(16)), init, (s, _) => {
        val xsq = shiftright(s.getField("x") * s.getField("x"), 20)
        when(xsq >= lit(2L * (1L << 20)),
          struct(shiftright(xsq, 1).as("x"),
            (s.getField("acc") * 2 + 1).as("acc")))
          .otherwise(struct(xsq.as("x"), (s.getField("acc") * 2).as("acc")))
      })
      msb * lit(65536L) + folded.getField("acc")
    }
    // contract domain [1, 2^20) plus boundary probes
    val probes = (Seq(1L, 2L, 3L, 5L, 7L, 64L, 1000L, 65535L, 65536L,
      999999L, 1000000L, (1L << 20) - 1) ++
      (1 to 200).map(i => (i * 5237L) % ((1L << 20) - 1) + 1)).distinct
    val df = probes.toDF("p")
    val out = df.select(col("p"),
      graft.functions.TextFunctions.ilog2Fp16(col("p")).as("native"),
      oldChain(col("p")).as("chain")).collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"ilog2 mismatch at p=${r.getLong(0)}: native=${r.getLong(1)} chain=${r.getLong(2)}")
    }
  }
}
