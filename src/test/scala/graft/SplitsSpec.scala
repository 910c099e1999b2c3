package graft

import org.apache.spark.sql.functions._

import graft.operators.Splits

/** Deterministic splitting + the eval→train leakage audit. */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is deterministic, stable under growth, and roughly proportioned") {
    val docs = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"))
    val s1 = Splits.hashSplit(docs, valPct = 10, testPct = 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // rerun = identical assignment
    val s2 = Splits.hashSplit(docs, valPct = 10, testPct = 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1 == s2)
    // a GROWN corpus keeps every previous member in its split
    val grown = spark.range(4000).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"))
    val s3 = Splits.hashSplit(grown, valPct = 10, testPct = 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1.forall { case (id, sp) => s3(id) == sp },
      "growth must never reassign an existing document")
    // proportions near 10/10/80 (salted md5 ~ uniform)
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("val") - 200) < 80, counts.toString)
    assert(math.abs(counts("test") - 200) < 80, counts.toString)
    // a different salt reshuffles
    val salted = Splits.hashSplit(docs, salt = "other", valPct = 10, testPct = 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(salted != s1)
  }

  test("splitLeakage flags an eval doc whose near-dup sits in train, with the partner") {
    // engineer ids on both sides of the boundary: find one train id and
    // one eval id under the same salt the operator uses, give them
    // near-identical long texts; an unrelated control doc stays clean
    val docs = spark.range(400).select(col("id").as("doc_id"),
      concat(lit("probe "), col("id")).as("text"))
    val assigned = Splits.hashSplit(docs).select("doc_id", "split")
      .as[(Long, String)].collect()
    val trainId = assigned.collectFirst { case (id, "train") => id }.get
    val evalId = assigned.collectFirst { case (id, s) if s != "train" => id }.get
    val evalSplit = assigned.find(_._1 == evalId).get._2
    val controlId = assigned.collectFirst {
      case (id, s) if s != "train" && id != evalId => id }.get
    val base = (0 until 40).map(i => s"token$i word$i").mkString(" ")
    val corpus = Seq(
      (trainId, base),
      (evalId, base + " tonight"), // near-dup of the train doc
      (controlId, (0 until 40).map(i => s"other$i vocab$i").mkString(" "))
    ).toDF("doc_id", "text")
    val leaks = Splits.splitLeakage(corpus)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(leaks.map(_._1) == Seq(evalId), s"expected only $evalId flagged: $leaks")
    assert(leaks.head._2 == evalSplit)
    assert(leaks.head._3 == trainId, "the leaking train partner must be named")
  }
}
