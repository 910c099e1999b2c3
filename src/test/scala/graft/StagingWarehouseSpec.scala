package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.staging.Staging
import graft.warehouse.Warehouse
import graft.validate.Expectations

class StagingWarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("deriveTimeColumns yields string year + full English month/dow names") {
    val df = Seq(Tuple1(ts("2024-01-06 10:00:00"))).toDF("pickup_datetime")
    val out = Staging.deriveTimeColumns(df).select("year", "month", "dow").collect()(0)
    assert(out.getString(0) == "2024")
    assert(out.getString(1) == "January")
    assert(out.getString(2) == "Saturday")
  }

  test("staging_agg_bucketed is value-identical to staging_agg") {
    val dir = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("staging_agg")(spark, dir)
    val bucketed = SparkEntry.queries("staging_agg_bucketed")(spark, dir)
    assert(exact.exceptAll(bucketed).isEmpty, "rows in exact but not bucketed")
    assert(bucketed.exceptAll(exact).isEmpty, "rows in bucketed but not exact")
  }

  test("stagingAggregate sums present measures and zeros absent ones") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 4.0)).toDF("k", "passenger_count")
    val out = Staging.stagingAggregate(df, keys = Seq("k"),
      sums = Seq("passenger_count", "trip_distance"))
    val rows = out.orderBy("k").collect()
    assert(rows(0).getDouble(1) == 3.0) // a: 1+2
    assert(rows(0).getDouble(2) == 0.0) // absent measure -> 0
    assert(rows(1).getDouble(1) == 4.0)
  }

  test("surrogateKey: null coalesces to empty string (dbt_utils 0.8.0)") {
    val df = Seq((Some(1), "x"), (None, "x")).toDF("a", "b")
    val keys = df.select(Warehouse.surrogateKey(col("a"), col("b")).as("k"))
      .as[String].collect()
    // md5("1-x") and md5("-x")
    assert(keys(0) == org.apache.commons.codec.digest.DigestUtils.md5Hex("1-x"))
    assert(keys(1) == org.apache.commons.codec.digest.DigestUtils.md5Hex("-x"))
  }

  test("dimVendor filters ids >= 3 and maps TLC names") {
    val staging = Seq(1, 2, 3, 2, 1).toDF("vendor_id")
    val out = Warehouse.dimVendor(staging).collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2))
    assert(out.map(_.getString(2)).toSeq ==
      Seq("Creative Mobile Technologies", "VeriFone Inc"))
  }

  test("expectation suite counts violations in one pass") {
    val df = Seq(
      (Some(1), 5.0), (None, 50.0), (Some(2), 200.0), (None, -1.0)
    ).toDF("vendor_id", "trip_distance")
    val suite = Seq(Expectations.NotNull("vendor_id"),
      Expectations.Between("trip_distance", 0, 100))
    val r = Expectations.report(df, suite).collect()(0)
    assert(r.getLong(0) == 2) // two null vendor ids
    assert(r.getLong(1) == 2) // 200 and -1 out of range
  }

  test("observed metrics ride the main action and match the two-pass report") {
    val df = Seq(
      (Some(1), 5.0), (None, 50.0), (Some(2), 200.0), (None, -1.0)
    ).toDF("vendor_id", "trip_distance")
    val suite = Seq(Expectations.NotNull("vendor_id"),
      Expectations.Between("trip_distance", 0, 100))
    val (observedDf, obs) = Expectations.observed(df, suite)
    // the caller's own action — no second validation scan runs
    assert(observedDf.filter(col("trip_distance") > 0).count() == 3)
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("not_null_vendor_id") == 2L)
    assert(m("between_trip_distance") == 2L)
  }

  test("outliers flags exactly the rows beyond z sigma, per group") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // group a: 20 values at 10.0 plus one at 1000.0 — the spike is the
    // only point beyond 3 sigma; group b: constant, sigma 0, no outliers
    val a = (1 to 20).map(i => (i.toLong, "a", 10.0)) :+ (99L, "a", 1000.0)
    val b = (1 to 10).map(i => (100L + i, "b", 7.0))
    val df = (a ++ b).toDF("id", "grp", "v")
    val out = Expectations.outliers(df, "v", Seq("grp"), z = 3)
      .select("id").as[Long].collect().toSet
    assert(out == Set(99L), s"got $out")
    // z large enough → nothing flagged
    assert(Expectations.outliers(df, "v", Seq("grp"), z = 5).isEmpty)
    // original columns pass through untouched
    val cols = Expectations.outliers(df, "v", Seq("grp")).columns.toSeq
    assert(cols.sorted == Seq("grp", "id", "v"))
  }

  test("Drift.compare flags null-rate, distinct, row-count, and schema drift") {
    import graft.operators.Profiler
    import graft.validate.Drift
    val before = Profiler.profile(
      (1L to 100L).map(i => (i, Some(i % 50), s"u$i")).toDF("id", "k", "u"),
      Seq("id", "k", "u"))
    // after: k went 40% null AND constant; u dropped (schema drift)
    val after = Profiler.profile(
      (1L to 100L).map(i => (i, if (i <= 40) None else Some(7L))).toDF("id", "k"),
      Seq("id", "k"))
    val v = Drift.compare(before, after)
      .collect().map(r => r.getString(0) -> r.getString(r.fieldIndex("verdict"))).toMap
    assert(v("id") == "ok")
    assert(v("k") == "null_rate_drift")   // 0% -> 40% nulls fires first
    assert(v("u") == "schema_drift")      // present only in `before`
    // same snapshot twice: everything ok
    val same = Drift.compare(before, before)
      .collect().map(_.getString(5)).toSet
    assert(same == Set("ok"))
  }

  test("mergeAggregates: merge of partials equals the one-shot aggregate") {
    import graft.operators.Incremental
    val stored = Seq(("a", 3L, 100L, 5L), ("b", 1L, 40L, 9L))
      .toDF("k", "n", "cents", "mx")
    val delta = Seq(("a", 2L, 50L, 7L), ("c", 4L, 10L, 1L))
      .toDF("k", "n", "cents", "mx")
    val got = Incremental.mergeAggregates(stored, delta, Seq("k"),
        Map("n" -> "sum", "cents" -> "sum", "mx" -> "max"))
      .collect().map(r => r.getString(r.fieldIndex("k")) ->
        (r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("cents")),
          r.getLong(r.fieldIndex("mx")))).toMap
    assert(got == Map("a" -> ((5L, 150L, 7L)),   // merged
      "b" -> ((1L, 40L, 9L)),                    // history-only survives
      "c" -> ((4L, 10L, 1L))))                   // new-in-batch appears
    // unmergeable functions are rejected, not silently mis-merged
    intercept[IllegalArgumentException] {
      Incremental.mergeAggregates(stored, delta, Seq("k"), Map("n" -> "avg"))
    }
  }

  test("applyChangeFeed: signed feed deltas maintain counts and sums through deletes and updates; zero-count groups vanish") {
    import graft.operators.Incremental
    import org.apache.spark.sql.functions.col
    val base = Seq(("a", 2L, 30L), ("b", 1L, 5L)).toDF("k", "n", "s")
    val feed = Seq(
      ("insert", "a", 7L),            // a grows
      ("delete", "b", 5L),            // b's only row erased
      ("update_preimage", "a", 10L),  // one a-row 10 -> 11
      ("update_postimage", "a", 11L),
      ("insert", "c", 2L)             // new group
    ).toDF("_change_type", "k", "v")
    val got = Incremental.applyChangeFeed(base, feed, Seq("k"), "n",
        Map("s" -> "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("s")))).toMap
    assert(got == Map(
      "a" -> ((3L, 38L)),  // +insert(7), update 10->11
      "c" -> ((1L, 2L))))  // b reached count 0 and vanished
    // replaying the maintained view against a recompute of the
    // implied final table gives the same rows
    val finalRows = Seq(("a", 20L), ("a", 11L), ("a", 7L), ("c", 2L))
      .toDF("k", "v")
    val recompute = finalRows.groupBy("k")
      .agg(org.apache.spark.sql.functions.count(col("v")).as("n"),
        org.apache.spark.sql.functions.sum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(recompute == got)
    // a change type the algebra doesn't know fails loudly, never
    // silently skews the view
    val alien = Seq(("truncate", "a", 1L)).toDF("_change_type", "k", "v")
    intercept[Exception] {
      Incremental.applyChangeFeed(base, alien, Seq("k"), "n",
        Map("s" -> "v")).collect()
    }
  }

  test("suggestChecks closes the quality loop: profiled suggestions register as CHECKs and gate the next commit") {
    import graft.validate.Expectations
    import graft.sources.TxnLog
    val clean = Seq((1L, "en", 10L), (2L, "fr", 20L), (3L, "en", 30L))
      .toDF("id", "lang", "v")
    val withNulls = clean.unionByName(
      Seq((4L, null.asInstanceOf[String], 40L)).toDF("id", "lang", "v"))
    val sugg = Expectations.suggestChecks(withNulls, domainMax = 5)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    // a nullable column gets NO not-null suggestion; its domain skips nulls
    assert(!sugg.contains("lang_not_null"))
    assert(sugg("lang_domain") == "lang IN ('en', 'fr')")
    assert(sugg("id_not_null") == "id IS NOT NULL")
    assert(sugg("id_range") == "id BETWEEN 0 AND 5") // pad = max(1, 3*10/100)
    assert(sugg("v_range") == "v BETWEEN 7 AND 43")  // pad = 30*10/100 = 3
    // the closure: register every suggestion on a txn-log table —
    // a conforming append passes, a violating one is refused
    val root = java.nio.file.Files.createTempDirectory("graft_sugg").toString + "/t"
    TxnLog.overwrite(clean, root)
    Expectations.suggestChecks(clean, domainMax = 5).collect().foreach { r =>
      TxnLog.addCheck(spark, root, r.getString(1), r.getString(2))
    }
    TxnLog.append(Seq((2L, "fr", 25L)).toDF("id", "lang", "v"), root)
    assert(TxnLog.read(spark, root).count() == 4)
    intercept[IllegalArgumentException] {
      TxnLog.append(Seq((6L, "zz", 25L)).toDF("id", "lang", "v"), root)
    }
    intercept[IllegalArgumentException] {
      TxnLog.append(Seq((7L, "en", 999L)).toDF("id", "lang", "v"), root)
    }
    assert(TxnLog.read(spark, root).count() == 4, "violators never landed")
  }

  test("period_over_period: lag/delta/basis points in exact cents, sign-safe") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("period_over_period")(spark, dir)
      .orderBy("month").collect()
    assert(out.length > 2)
    // first month has no predecessor: null prev/delta/pct
    assert(out.head.isNullAt(2) && out.head.isNullAt(3) && out.head.isNullAt(4))
    // every later row: delta = rev - prev; pct_bp = sign * (1e4*|delta|) div prev
    for (r <- out.tail) {
      val (rev, prev, delta, pct) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(delta == rev - prev)
      val expect = (if (delta < 0) -1L else 1L) * ((10000L * math.abs(delta)) / prev)
      assert(pct == expect, s"month ${r.getString(0)}")
    }
    // totals conserved: sum of monthly cents = cents of the table total
    val totalCents = out.map(_.getLong(1)).sum
    val direct = graft.core.Tables.orders(spark, dir)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).collect()(0).getLong(0)
    assert(totalCents == direct)
  }

  test("dim_date spine is contiguous, key-consistent, and weekend-correct") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("dim_date")(spark, dir)
      .orderBy("date_key").collect()
    assert(rows.length > 300)
    // contiguous daily spine: row count equals the inclusive day span
    val first = java.time.LocalDate.parse(rows.head.getString(1))
    val last = java.time.LocalDate.parse(rows.last.getString(1))
    assert(java.time.temporal.ChronoUnit.DAYS.between(first, last) + 1 == rows.length)
    rows.foreach { r =>
      val d = java.time.LocalDate.parse(r.getString(1))
      assert(r.getLong(0) == d.format(
        java.time.format.DateTimeFormatter.BASIC_ISO_DATE).toLong)
      // java DOW: Mon=1..Sun=7; engine DOW: Sun=1..Sat=7
      val expectDow = (d.getDayOfWeek.getValue % 7) + 1
      assert(r.getLong(6) == expectDow, s"$d")
      assert(r.getBoolean(7) == (expectDow == 1 || expectDow == 7))
    }
  }

  test("transition_matrix row-normalizes exactly and ties to its own totals") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("transition_matrix")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val totals = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    rows.foreach { case (from, _, n, pFp) =>
      assert(pFp == 1000000L * n / totals(from))
    }
    // a row's probabilities sum to ~1 (floor division loses < |row| ulps)
    totals.keys.foreach { from =>
      val s = rows.filter(_._1 == from).map(_._4).sum
      val k = rows.count(_._1 == from)
      assert(s <= 1000000L && s > 1000000L - k, s"$from sums to $s")
    }
  }

  test("funnel_steps depth counts are monotone nonincreasing and tie to the 2-step funnel") {
    val dir = "/root/testdata/sf0.001"
    val steps = SparkEntry.queries("funnel_steps")(spark, dir)
      .orderBy("depth").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(steps.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // a later step can never have more users than an earlier one
    assert(steps(0)._2 >= steps(1)._2 && steps(1)._2 >= steps(2)._2)
    // depth-1 ties to the 2-step funnel's view-user universe
    val funnelUsers = SparkEntry.queries("funnel")(spark, dir).count()
    assert(steps(0)._2 == funnelUsers)
  }

  test("unpivot_measures melts 4 measures per lineitem row, value-faithful") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.core.Tables.lineitem(spark, dir)
    val out = SparkEntry.queries("unpivot_measures")(spark, dir)
    assert(out.count() == li.count() * 4)
    // spot-faithfulness: re-pivoting quantity recovers the original column
    val qty = out.filter(col("measure") === "l_quantity")
      .select(col("l_orderkey"), col("l_linenumber"), col("value"))
    val orig = li.select(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").as("value"))
    assert(qty.exceptAll(orig).isEmpty && orig.exceptAll(qty).isEmpty)
  }

  test("covarianceReport: perfect correlation saturates the Cauchy-Schwarz bound, anti-correlation is negative, nulls drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, 2L, -1L, 5L), (2L, 4L, -2L, 5L), (3L, 6L, -3L, 5L),
      (4L, 8L, -4L, 5L), (5L, 10L, -5L, 5L))
      .toDF("x", "y2x", "neg", "konst")
    val rep = graft.operators.Profiler.covarianceReport(df, Seq(
      "x" -> col("x"), "y2x" -> col("y2x"), "neg" -> col("neg"),
      "konst" -> col("konst")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // y = 2x exactly: cov_n^2 == var_nx * var_ny (Cauchy-Schwarz tight)
    val (n, cxy, vx, vy) = rep(("x", "y2x"))
    assert(n == 5L && cxy > 0)
    assert(cxy * cxy == vx * vy, s"got cov=$cxy varx=$vx vary=$vy")
    assert(vy == 4 * vx) // var(2x) = 4 var(x), exactly in integer moments
    // neg = -x: perfectly anti-correlated
    val (_, cneg, _, _) = rep(("x", "neg"))
    assert(cneg == -vx, s"got $cneg vs -$vx")
    // a constant column has zero variance and zero covariance
    val (_, ck, _, vk) = rep(("x", "konst"))
    assert(ck == 0L && vk == 0L)
    // complete-case: a NULL row drops everywhere (n shrinks)
    val withNull = df.unionByName(
      Seq((9L, Option.empty[Long], 9L, 9L)).toDF("x", "y2x", "neg", "konst"))
    val n2 = graft.operators.Profiler.covarianceReport(withNull, Seq(
      "x" -> col("x"), "y2x" -> col("y2x")))
      .head.getLong(2)
    assert(n2 == 5L)
  }

  test("covarianceReport: decimal overflow and Long-range excess fail with the rescale message, never NPE or truncate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Σx² for two rows of ~9.2e18 is ~1.7e38 > decimal(38,0): under
    // ANSI eval Spark itself fails the aggregate loudly; under
    // non-ANSI the sum returns SQL NULL and the engine's dec() guard
    // must turn it into the actionable rescale error — either way,
    // NEVER a bare NullPointerException
    val overflow = Seq((Long.MaxValue, 1L), (Long.MaxValue, 2L)).toDF("x", "y")
    val e1 = intercept[Exception] {
      graft.operators.Profiler.covarianceReport(overflow,
        Seq("x" -> col("x"), "y" -> col("y"))).collect()
    }
    assert(!e1.isInstanceOf[NullPointerException], e1.toString)
    val m1 = Option(e1.getMessage).getOrElse("").toLowerCase
    assert(m1.contains("rescale") || m1.contains("overflow") ||
      m1.contains("out_of_range") || m1.contains("cannot be represented"), e1.toString)
    // moments fit decimal(38,0) but var_n = 1.8e37 exceeds Long —
    // must fail loudly, not wrap/truncate via .toLong
    val big = 3000000000000000000L // 3e18; n·Σx² = 3.6e37 fits decimal
    val wide = Seq((big, 1L), (-big, 2L)).toDF("x", "y")
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Profiler.covarianceReport(wide,
        Seq("x" -> col("x"), "y" -> col("y"))).collect()
    }
    assert(e2.getMessage.contains("exceeds Long range"), e2.getMessage)
  }
}
