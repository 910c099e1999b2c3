package graft

import graft.validate.Privacy

/** k-anonymity / l-diversity release-gate semantics on a fixture with
  * known equivalence classes. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // classes: (a,1)×3, (a,2)×1, (b,1)×2 — with k=3 the last two violate
  private def df = Seq(
    ("a", 1, "x"), ("a", 1, "x"), ("a", 1, "y"),
    ("a", 2, "x"),
    ("b", 1, "x"), ("b", 1, "x")).toDF("qi1", "qi2", "sensitive")

  test("kAnonymityGroups returns exactly the undersized classes") {
    val got = Privacy.kAnonymityGroups(df, Seq("qi1", "qi2"), k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(("a", 2, 1L), ("b", 1, 2L)))
  }

  test("kAnonymityReport gate fields are exact") {
    val r = Privacy.kAnonymityReport(df, Seq("qi1", "qi2"), k = 3).head()
    assert(r.getLong(0) == 6)        // n_rows
    assert(r.getLong(1) == 3)        // n_classes
    assert(r.getLong(2) == 2)        // violating_classes
    assert(r.getLong(3) == 3)        // exposed_rows
    assert(r.getLong(4) == 5000)     // exposed_bps = 3*10000 div 6
    assert(r.getLong(5) == 1)        // min_class_size
    assert(!r.getBoolean(6))         // k_anonymous
    val clean = Privacy.kAnonymityReport(df, Seq("qi1", "qi2"), k = 2).head()
    // k=2: only (a,2) violates
    assert(clean.getLong(2) == 1 && !clean.getBoolean(6))
  }

  test("tCloseness computes the hand-traced integer EMD per class") {
    // two bins {0,1}; class A counts (3,3), class B counts (0,4)
    // global = (3,7), N = 10, m = 2
    // A: |3·10 − 3·6| = 12 → emd = 12e6/(1·6·10) = 200000 (true 0.2)
    // B: |0·10 − 3·4| = 12 → emd = 12e6/(1·4·10) = 300000 (true 0.3)
    val rows = Seq.fill(3)(("A", 0L)) ++ Seq.fill(3)(("A", 1L)) ++
      Seq.fill(4)(("B", 1L))
    val d = rows.toDF("cls", "bin")
    val got = Privacy.tCloseness(d, Seq("cls"), "bin", tMillionths = 250000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == Set(("A", 6L, 200000L, true), ("B", 4L, 300000L, false)))
    // a class identical to the population has distance zero
    val uniform = (Seq.fill(2)(("U", 0L)) ++ Seq.fill(2)(("U", 1L)) ++
      Seq.fill(2)(("V", 0L)) ++ Seq.fill(2)(("V", 1L))).toDF("cls", "bin")
    val z = Privacy.tCloseness(uniform, Seq("cls"), "bin", 100000L)
      .collect().map(r => r.getLong(2)).toSet
    assert(z == Set(0L))
    // single-bin degenerate: divisor guard, distance zero
    val one = Seq(("W", 5L), ("X", 5L)).toDF("cls", "bin")
    val o = Privacy.tCloseness(one, Seq("cls"), "bin", 100000L)
      .collect().map(r => r.getLong(2)).toSet
    assert(o == Set(0L))
  }

  test("dpCounts: seeded Laplace noise is deterministic, group-dependent, and scales with 1/epsilon") {
    // LUT laws: exactly symmetric (sums to zero), monotone
    // nondecreasing, right length
    val lut = Privacy.laplaceLutMicro(500000L, 512)
    assert(lut.length == 512 && lut.sum == 0L)
    assert(lut.zip(lut.tail).forall { case (a, b) => a <= b })
    // accuracy/ε law: doubling ε halves every quantile (b = 1/ε), up
    // to the 1-micro rounding of each entry
    val tight = Privacy.laplaceLutMicro(1000000L, 512)
    lut.zip(tight).foreach { case (loose, t) =>
      assert(math.abs(loose - 2 * t) <= 2L, s"$loose !~ 2*$t") }
    // mechanism: noise = LUT at the md5 bucket of (group, seed) —
    // replicated driver-side; counts never released bare
    val df = (Seq.fill(7)("en") ++ Seq.fill(3)("fr") ++ Seq.fill(5)("de"))
      .toDF("lang")
    def bucketOf(g: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((g + "dp").getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % 512).toInt
    }
    val got = Privacy.dpCounts(df, "lang", epsMicro = 500000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = Map("en" -> 7L, "fr" -> 3L, "de" -> 5L).map { case (g, n) =>
      g -> ((n * 1000000L + lut(bucketOf(g)), 500000L))
    }
    assert(got == want)
    // deterministic under repartitioning (a release must be replayable)
    val again = Privacy.dpCounts(df.repartition(7), "lang", 500000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got.map { case (g, (v, _)) => g -> v })
    // the noise is group-dependent (not one constant shift)
    val noises = got.map { case (g, (v, _)) =>
      v - Map("en" -> 7L, "fr" -> 3L, "de" -> 5L)(g) * 1000000L }.toSet
    assert(noises.size > 1, s"all groups drew the same noise: $noises")
  }

  test("dpSum: clamping bounds sensitivity at the cap; noise scales with cap and replays driver-side") {
    val df = Seq(("a", 5.0), ("a", 100.0), ("a", -3.0), ("b", 2.5))
      .toDF("grp", "v")
    def bucketOf(g: String, seed: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((g + seed).getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % 512).toInt
    }
    val lut = Privacy.laplaceLutMicro(500000L, 512, sensMicro = 10000000L)
    // cap-scaling law: the cap-10 table is exactly the sensitivity-1
    // table scaled by 10 (up to per-entry micro rounding)
    Privacy.laplaceLutMicro(500000L, 512).zip(lut).foreach { case (one, ten) =>
      assert(math.abs(ten - 10 * one) <= 10L, s"$ten !~ 10*$one") }
    val got = Privacy.dpSum(df, "grp", "v", capMicro = 10000000L,
        epsMicro = 500000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // group a: 5.0 kept, 100.0 clamped to 10, -3.0 clamped to 0 →
    // clamped sum 15e6; group b: 2.5e6 — plus each group's seeded draw
    assert(got("a") == ((15000000L + lut(bucketOf("a", "dp-sum")), 500000L, 10000000L)))
    assert(got("b") == ((2500000L + lut(bucketOf("b", "dp-sum")), 500000L, 10000000L)))
  }

  test("lDiversityGroups flags classes with a constant sensitive value") {
    val got = Privacy.lDiversityGroups(df, Seq("qi1", "qi2"), "sensitive", l = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    // (a,1) has {x,y} → passes; (a,2) and (b,1) are constant-x
    assert(got == Set(("a", 2, 1L, 1L), ("b", 1, 2L, 1L)))
  }
}
