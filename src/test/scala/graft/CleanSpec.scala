package graft

import org.apache.spark.sql.functions._
import graft.clean.Clean

class CleanSpec extends SparkSpec {
  import spark.implicits._

  test("lowercaseColumns lowers every name and is idempotent") {
    val df = Seq((1, "x")).toDF("Foo", "BAR_Baz")
    val once = Clean.lowercaseColumns(df)
    assert(once.columns.toSeq == Seq("foo", "bar_baz"))
    assert(Clean.lowercaseColumns(once).columns.toSeq == Seq("foo", "bar_baz"))
  }

  test("sortColumns orders alphabetically") {
    val df = Seq((1, 2, 3)).toDF("c", "a", "b")
    assert(Clean.sortColumns(df).columns.toSeq == Seq("a", "b", "c"))
  }

  test("canonicalizeDatetimeColumns handles tpep/lpep/plain variants") {
    val yellow = Seq(("2024-01-01", "2024-01-02")).toDF("tpep_pickup_datetime", "tpep_dropoff_datetime")
    assert(Clean.canonicalizeDatetimeColumns(yellow).columns.toSet ==
      Set("pickup_datetime", "dropoff_datetime"))
    val green = Seq(("a", "b")).toDF("lpep_pickup_datetime", "lpep_dropoff_datetime")
    assert(Clean.canonicalizeDatetimeColumns(green).columns.toSet ==
      Set("pickup_datetime", "dropoff_datetime"))
    val plain = Seq(("a", "b")).toDF("pickup_datetime", "dropoff_datetime")
    assert(Clean.canonicalizeDatetimeColumns(plain).columns.toSet ==
      Set("pickup_datetime", "dropoff_datetime"))
    val bad = Seq((1, 2)).toDF("x", "y")
    intercept[IllegalArgumentException](Clean.canonicalizeDatetimeColumns(bad))
  }

  test("dropColumns tolerates absent names; castIntOrZero defaults bad casts") {
    val df = Seq(("1", "oops")).toDF("a", "b")
    assert(Clean.dropColumns(df, "zzz", "b").columns.toSeq == Seq("a"))
    val cast = Clean.castIntOrZero(df, "a", "b")
    val row = cast.collect()(0)
    assert(row.getInt(0) == 1 && row.getInt(1) == 0)
  }

  test("pseudonymize: deterministic tokens, NULLs stay NULL, joins survive") {
    val a = Seq((1L, "alice"), (2L, "bob"), (3L, null)).toDF("id", "name")
    val b = Seq(("alice", 10L), ("carol", 20L)).toDF("name", "score")
    val ma = Clean.pseudonymize(a, Seq("name"), "s1")
    val mb = Clean.pseudonymize(b, Seq("name"), "s1")
    val rows = ma.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows(1L) != "alice" && rows(1L).length == 64) // sha2-256 hex
    assert(rows(3L) == null)                             // NULL is not a token
    // referential integrity: the masked join matches the clear join
    assert(ma.join(mb, "name").count() == 1)
    // salt rotation rotates every token
    val rot = Clean.pseudonymize(a, Seq("name"), "s2")
      .collect().map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(!rot.contains(rows(1L)))
    // missing column is rejected loudly
    intercept[IllegalArgumentException] {
      Clean.pseudonymize(a, Seq("nope"), "s1")
    }
  }

  test("zoneEnrich drops unmatched ids (inner-join pandas-merge parity)") {
    val trips = Seq((1, 10), (2, 99)).toDF("trip_id", "pulocationid")
    val lookup = Seq((10, 40.7, -74.0)).toDF("LocationID", "latitude", "longitude")
    val out = Clean.zoneEnrich(trips, lookup, "pulocationid", "pickup")
    assert(out.count() == 1)
    assert(out.columns.contains("pickup_latitude"))
    assert(out.select("trip_id").as[Int].collect().toSeq == Seq(1))
  }
}
