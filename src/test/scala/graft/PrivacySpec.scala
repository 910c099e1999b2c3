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

  test("lDiversityGroups flags classes with a constant sensitive value") {
    val got = Privacy.lDiversityGroups(df, Seq("qi1", "qi2"), "sensitive", l = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    // (a,1) has {x,y} → passes; (a,2) and (b,1) are constant-x
    assert(got == Set(("a", 2, 1L, 1L), ("b", 1, 2L, 1L)))
  }
}
