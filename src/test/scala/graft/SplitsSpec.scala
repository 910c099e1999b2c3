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

  test("the cluster-unit safe split audits CLEAN; a doc-level split leaks") {
    // a corpus dense with near-dup pairs: 20 groups of 3 near-identical
    // docs each — under a naive per-doc split some group straddles the
    // boundary; the cluster-unit splitter keeps whole groups together,
    // so the SAME audit must find nothing
    val docs = (0 until 20).flatMap { g =>
      val base = (0 until 40).map(i => s"grp${g}tok$i word$i").mkString(" ")
      Seq((g * 10L, base), (g * 10L + 1, base + " alpha"), (g * 10L + 2, base + " beta"))
    }.toDF("doc_id", "text")
    val pairs = graft.dedup.Dedup.minhashNearDups(docs).select("doc_a", "doc_b")
    val safe = graft.dedup.Dedup.leakageSafeSplit(docs, pairs, trainPct = 80)
      .select(col("doc_id"),
        when(col("split") === "train", "train").otherwise("val").as("split"))
    assert(Splits.auditSplit(docs, safe).count() == 0,
      "cluster-unit split must have zero near-dup leakage by construction")
    // sanity: the safe split actually held out SOMETHING
    assert(safe.filter(col("split") =!= "train").count() > 0)
    // and the naive doc-level split on the same corpus DOES leak
    assert(Splits.splitLeakage(docs).count() > 0,
      "fixture must contain boundary-straddling near-dups for the contrast")
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
