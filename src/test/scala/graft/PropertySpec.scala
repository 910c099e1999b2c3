package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.clean.Clean
import graft.functions.TextFunctions
import graft.warehouse.Warehouse

/** Property tests for the invariants SURVEY.md §5 names: surrogate-key
  * determinism, lowercase idempotence, epoch round-trips, tokenizer
  * bounds. ScalaCheck generators sampled directly (the scalatest
  * bridge artifact is not in the offline cache); each property runs
  * over a fixed-seed batch of generated cases evaluated in ONE Spark
  * job to keep the suite fast.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int = 40): Seq[A] =
    LazyList.from(0)
      .map(i => gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L + i)))
      .collect { case Some(v) => v }.take(n).toList

  test("surrogateKey is deterministic; null == empty string (dbt_utils 0.8.0)") {
    val pairGen = for {
      a <- Gen.listOf(Gen.alphaNumChar).map(_.mkString)
      b <- Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    } yield (a, b)
    val ps = cases(pairGen)
    val keys = (ps ++ ps).toDF("x", "y")
      .select(Warehouse.surrogateKey(col("x"), col("y")).as("k"))
      .as[String].collect()
    val (first, second) = keys.splitAt(ps.size)
    assert(first.toSeq == second.toSeq) // deterministic
    assert(keys.forall(_.matches("[0-9a-f]{32}")))
    val nulls = Seq((Option.empty[String], "z"), (Some(""), "z")).toDF("x", "y")
      .select(Warehouse.surrogateKey(col("x"), col("y")).as("k"))
      .as[String].collect()
    assert(nulls(0) == nulls(1))
  }

  test("lowercaseColumns is idempotent for any column names") {
    val nameGen = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(12))
    cases(nameGen, 20).zipWithIndex.foreach { case (n1, i) =>
      val n2 = s"${n1}_$i"
      val df = Seq((1, 2)).toDF(n1, n2)
      val once = Clean.lowercaseColumns(df)
      val twice = Clean.lowercaseColumns(once)
      assert(once.columns.toSeq == twice.columns.toSeq)
      assert(once.columns.forall(c => c == c.toLowerCase))
    }
  }

  test("epoch micros -> timestamp -> micros round-trips") {
    val usGen = Gen.choose(0L, 4102444800000000L) // <= year 2100
    val us = cases(usGen)
    val back = us.toDF("us")
      .select(unix_micros(timestamp_micros(col("us"))).as("back"))
      .as[Long].collect()
    assert(back.toSeq == us)
  }

  test("token counts: 0 <= stopwords <= tokens; fingerprint whitespace-invariant") {
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.oneOf(TextFunctions.stopwords),
      Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(10))))
    val texts = cases(wordGen).map(_.take(30))
    val rows = texts.map(ws => (ws.mkString(" "), "  " + ws.mkString("  ") + " "))
      .toDF("a", "b").select(
        TextFunctions.wsTokenCount(col("a")).as("n"),
        TextFunctions.stopwordCount(col("a")).as("s"),
        TextFunctions.fingerprint(col("a")).as("fa"),
        TextFunctions.fingerprint(col("b")).as("fb")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(0))
      assert(r.getString(2) == r.getString(3))
    }
  }
}
