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

  test("lDiversityGroups flags classes with a constant sensitive value") {
    val got = Privacy.lDiversityGroups(df, Seq("qi1", "qi2"), "sensitive", l = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    // (a,1) has {x,y} → passes; (a,2) and (b,1) are constant-x
    assert(got == Set(("a", 2, 1L, 1L), ("b", 1, 2L, 1L)))
  }
}
