package graft

import org.apache.spark.sql.functions._

/** Deterministic N× expansion: row counts multiply, keys shift per
  * copy without collisions, referential integrity holds within a
  * copy, fixed dims stay fixed. */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  test("expand multiplies rows and offsets keys collision-free") {
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val out = ScaleUp.expand(src, Seq("k"), factor = 4)
    assert(out.count() == 12)
    val keys = out.select("k").as[Long].collect().toSeq
    assert(keys.distinct.size == 12, "offset copies must never collide")
    // copy c carries key k + c*Offset with the SAME payload
    val byCopy = out.collect().map(r => (r.getLong(0), r.getString(1)))
    (0 until 4).foreach { c =>
      assert(byCopy.count { case (k, _) =>
        k >= c * ScaleUp.Offset && k < c * ScaleUp.Offset + 100 } == 3)
    }
    assert(byCopy.toSet.contains((2L + 3 * ScaleUp.Offset, "b")))
  }

  test("joins survive expansion: fact↔dim rows match within each copy") {
    val cust = Seq((1L, "acme"), (2L, "bolt")).toDF("c_custkey", "name")
    val ord = Seq((10L, 1L, 5.0), (11L, 2L, 7.0), (12L, 1L, 9.0))
      .toDF("o_orderkey", "o_custkey", "price")
    val cx = ScaleUp.expand(cust, Seq("c_custkey"), 3)
    val ox = ScaleUp.expand(ord, Seq("o_orderkey", "o_custkey"), 3)
    // every expanded order finds exactly its copy's customer
    val joined = ox.join(cx, ox("o_custkey") === cx("c_custkey"))
    assert(joined.count() == 9, "3 orders x 3 copies, each matching one customer")
    // and the join fans out exactly as the original did, per copy
    val perName = joined.groupBy(col("name")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perName == Map("acme" -> 6, "bolt" -> 3))
  }

  test("fixed dims pass through unchanged") {
    val dim = Seq((0, "europe"), (1, "asia")).toDF("r_regionkey", "r_name")
    val out = ScaleUp.expand(dim, Seq.empty, 10)
    assert(out.collect().toSeq == dim.collect().toSeq)
  }
}
