package graft

/** The bench's self-adjudication machinery (round-16 verdict #4):
  * requietMeasure must actually spawn a working fresh child JVM and
  * come back with a plausible timing — a silently-broken child (bad
  * classpath, missing add-opens, regex drift against the compact
  * line) would let every SUSPECT flag go unadjudicated while the
  * bench still reports success. One real end-to-end spawn (~60 s)
  * keeps that honest. */
class BenchSpec extends SparkSpec {

  test("requietMeasure spawns a fresh child JVM and parses its compact total") {
    val v = Bench.requietMeasure("q1_agg", "/root/testdata/sf0.001")
    assert(v.isDefined, "child JVM re-measure returned nothing")
    assert(v.get > 0.0 && v.get < 120.0, s"implausible requiet seconds: $v")
  }
}
