package graft

import java.sql.Timestamp

import graft.operators.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at-or-before each left ts") {
    val left = Seq(
      (1L, 10L, t("2024-01-01 09:00:00")), // before any right row -> null
      (2L, 10L, t("2024-01-01 10:00:00")), // equal ts -> matches r@10:00
      (3L, 10L, t("2024-01-01 11:30:00")), // between -> r@11:00
      (4L, 20L, t("2024-01-01 12:00:00"))  // other key -> r2@09:00
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, t("2024-01-01 10:00:00"), 100.0),
      (10L, t("2024-01-01 11:00:00"), 200.0),
      (20L, t("2024-01-01 09:00:00"), 999.0)
    ).toDF("user_id", "ts", "purchase_value")
    val out = Joins.asOfJoin(left, right, Seq("user_id"), "ts", Seq("purchase_value"))
      .orderBy("event_id").collect()
    assert(out.map(r => if (r.isNullAt(3)) null else r.getDouble(3)).toSeq ==
      Seq(null, 100.0, 200.0, 999.0))
    // left columns pass through untouched
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("asOfJoin propagates a genuinely-null payload from the latest right row") {
    val left = Seq((1L, 10L, t("2024-01-01 11:30:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, t("2024-01-01 10:00:00"), Some(5.0)),
      (10L, t("2024-01-01 11:00:00"), None) // latest row carries NULL
    ).toDF("user_id", "ts", "purchase_value")
    val out = Joins.asOfJoin(left, right, Seq("user_id"), "ts", Seq("purchase_value"))
    assert(out.head().isNullAt(3)) // NOT the stale 5.0
  }

  test("asOfJoin maxStaleness: matches older than the tolerance answer NULL; boundary is inclusive") {
    import org.apache.spark.sql.functions.expr
    val left = Seq(
      (1L, 10L, t("2024-01-01 10:30:00")), // 30 min stale -> fresh
      (2L, 10L, t("2024-01-01 11:00:00")), // exactly 1 h -> inclusive, fresh
      (3L, 10L, t("2024-01-01 12:30:00"))  // 2.5 h stale -> NULL
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, t("2024-01-01 10:00:00"), 100.0))
      .toDF("user_id", "ts", "purchase_value")
    val out = Joins.asOfJoin(left, right, Seq("user_id"), "ts",
        Seq("purchase_value"), maxStaleness = Some(expr("INTERVAL 1 HOUR")))
      .orderBy("event_id").collect()
    assert(out.map(r => if (r.isNullAt(3)) null else r.getDouble(3)).toSeq ==
      Seq(100.0, 100.0, null))
    // no tolerance -> the 2.5 h-old match still serves (regression)
    val loose = Joins.asOfJoin(left, right, Seq("user_id"), "ts",
      Seq("purchase_value"))
    assert(loose.filter($"event_id" === 3L).head().getDouble(3) == 100.0)
  }

  test("asOfJoin keeps every left row (left-join semantics)") {
    val left = Seq((1L, 1L, t("2024-01-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq.empty[(Long, Timestamp, Double)].toDF("user_id", "ts", "purchase_value")
    val out = Joins.asOfJoin(left, right, Seq("user_id"), "ts", Seq("purchase_value"))
    assert(out.count() == 1 && out.head().isNullAt(3))
  }

  test("saltedJoin is result-identical to the plain join on a skewed key") {
    import org.apache.spark.sql.functions._
    // one hot key (0) with 500 rows, a cold tail, and an unmatched key
    val left = ((1 to 500).map(i => (i.toLong, 0L)) ++
      (501 to 520).map(i => (i.toLong, (i % 5 + 1).toLong)) :+
      (999L, 77L)).toDF("row_id", "k") // 77 has no right row
    val right = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"),
      (4L, "d"), (5L, "e")).toDF("k", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("row_id", "k", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getString(2))).sortBy(t => (t._1, t._2))
    for (jt <- Seq("inner", "left")) {
      val salted = canon(Joins.saltedJoin(left, right, "k", "row_id", 8, jt))
      val plain = canon(left.join(right, Seq("k"), jt))
      assert(salted.toSeq == plain.toSeq, s"$jt: salted != plain")
    }
    // the hot key really is spread: its rows land in >1 salt bucket
    val spread = left.filter(col("k") === 0L)
      .select(pmod(hash(col("row_id")), lit(8)).as("s"))
      .distinct().count()
    assert(spread > 1, s"salt spread only $spread buckets")
  }

  test("rangeJoin matches the naive BETWEEN join exactly, as an equi-join plan") {
    import org.apache.spark.sql.functions._
    val pts = Seq((1L, 0.0), (2L, 3.9), (3L, 4.0), (4L, 17.5), (5L, 99.0), (6L, -2.0))
      .toDF("pid", "v")
    val iv = Seq((10L, 0.0, 4.0), (11L, 3.5, 20.0), (12L, 98.0, 98.5), (13L, 5.0, 1.0))
      .toDF("iid", "lo", "hi") // 13 is inverted -> contributes nothing
    val got = Joins.rangeJoin(pts, iv, "v", "lo", "hi", bucketWidth = 2.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pts.crossJoin(iv)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
    // the point of the rewrite: no nested-loop / cartesian in the plan
    val plan = Joins.rangeJoin(pts, iv, "v", "lo", "hi", bucketWidth = 2.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("intervalJoin matches the inequality-pair semantics exactly once per pair") {
    import spark.implicits._
    val a = Seq((1L, 0L, 10L), (2L, 20L, 25L), (3L, 30L, 30L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq(
      (10L, 10L, 12L), // touches a1's right edge → overlap (closed)
      (11L, 5L, 40L),  // spans many buckets, overlaps all three As
      (12L, 26L, 29L), // gap between a2 and a3 → no match
      (13L, 0L, 2L)    // overlaps a1 only
    ).toDF("b_id", "b_lo", "b_hi")
    // tiny bucket (width 3) forces multi-bucket pairs: exactly-once law
    val got = Joins.intervalJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 3.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    val want = for {
      (ai, alo, ahi) <- Seq((1L, 0L, 10L), (2L, 20L, 25L), (3L, 30L, 30L))
      (bi, blo, bhi) <- Seq((10L, 10L, 12L), (11L, 5L, 40L), (12L, 26L, 29L), (13L, 0L, 2L))
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)
    assert(got.sorted == want.sorted, s"got ${got.sorted} want ${want.sorted}")
    assert(got.size == got.toSet.size, "pair emitted more than once")
    // wider buckets give the same answer
    val wide = Joins.intervalJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 100.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(wide.sorted == want.sorted)
    // no nested loop in the plan
    val plan = Joins.intervalJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 3.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)

    // the auto-width variant (sketch-chosen median length) agrees
    val auto = Joins.intervalJoinAuto(a, b, "a_lo", "a_hi", "b_lo", "b_hi")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(auto.sorted == want.sorted, s"auto got ${auto.sorted}")
  }
}
