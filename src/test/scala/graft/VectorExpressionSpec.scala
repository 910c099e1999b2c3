package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expressions.{GraftExtensions, VectorFunctions}

class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("nfcNormalize composes decomposed forms, is idempotent, keeps non-BMP text") {
    import graft.expressions.NfcNormalize.nfcNormalize
    val decomposed = "cafe\u0301 A\u030Angstro\u0308m" // e+acute, A+ring, o+diaeresis
    val composed = "caf\u00e9 \u00c5ngstr\u00f6m"
    val df = Seq(
      (1L, decomposed),
      (2L, composed),            // already NFC: fast path, unchanged
      (3L, "plain ascii"),
      (4L, "emoji 😀 stays"), // non-BMP surrogate pair untouched
      (5L, null.asInstanceOf[String])
    ).toDF("id", "s")
    val out = df.select(col("id"), nfcNormalize(col("s")).as("n"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains(composed))
    assert(out(2L).contains(composed))
    assert(out(3L).contains("plain ascii"))
    assert(out(4L).contains("emoji 😀 stays"))
    assert(out(5L).isEmpty) // null in, null out
    // idempotent: normalize twice == once
    val twice = df.filter(col("s").isNotNull)
      .select(nfcNormalize(nfcNormalize(col("s"))).as("a"), nfcNormalize(col("s")).as("b"))
      .collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1)))
    // registered as a SQL function by GraftExtensions
    df.filter(col("s").isNotNull).createOrReplaceTempView("nfc_in")
    val viaSql = spark.sql("SELECT id, nfc_normalize(s) AS n FROM nfc_in")
      .as[(Long, String)].collect().toMap
    assert(viaSql(1L) == composed)
    // dedup motivation: fingerprints unify only after normalization
    assert(decomposed != composed)
    assert(out(1L) == out(2L))
  }

  test("floatDot matches the built-in HOF fold bit-for-bit") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.0f), Array(0.5f, 4.0f, -1.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f))).toDF("a", "b")
    val out = df.select(
      VectorFunctions.floatDot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("floatDot propagates null inputs") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val out = df.select(VectorFunctions.floatDot(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("floatDot matches the fold's NULL semantics on ragged and null-element arrays") {
    // the fold nulls out on length mismatch (zip_with pads with nulls)
    // and on any null element; the kernel must agree EXACTLY, or the
    // optimizer rewrite would silently change user results
    val rows: Seq[(Array[java.lang.Float], Array[java.lang.Float])] = Seq(
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f)),           // ragged
      (Array[java.lang.Float](1.0f), Array[java.lang.Float](1.0f, 2.0f, 3.0f)),     // ragged other way
      (Array[java.lang.Float](1.0f, null, 3.0f), Array[java.lang.Float](1.0f, 2.0f, 3.0f)), // null element
      (Array[java.lang.Float](), Array[java.lang.Float]()),                          // both empty → 0.0
      (Array[java.lang.Float](2.0f, 4.0f), Array[java.lang.Float](0.5f, 0.25f)))     // well-formed
    val df = rows.toDF("a", "b")
    val out = df.select(
      VectorFunctions.floatDot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null parity broken: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)), s"value parity broken: $r")
    }
  }

  test("GraftExtensions: SQL functions + NativeDotRewrite optimizer rule") {
    val base = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // fresh session (same JVM SparkContext) so extensions apply
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s.implicits._
      Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
        .createOrReplaceTempView("v")
      val r = s.sql("SELECT float_dot(a, b) AS d FROM v").head()
      assert(r.getDouble(0) == 11.0)

      // minhash_signature SQL surface matches the Column API kernel
      Seq(Tuple1(Seq("a b c", "b c d", "c d e"))).toDF("sh")
        .createOrReplaceTempView("vs")
      val sqlSig = s.sql("SELECT minhash_signature(sh, 4) AS sig FROM vs")
        .head().getSeq[Long](0)
      val apiSig = Seq(Tuple1(Seq("a b c", "b c d", "c d e"))).toDF("sh")
        .select(graft.expressions.MinHashFunctions.minhashSignature(col("sh"), 4))
        .head().getSeq[Long](0)
      assert(sqlSig == apiSig)

      // kmv_distinct is SQL-callable as an aggregate
      s.range(0, 500).selectExpr("id % 37 AS v").createOrReplaceTempView("vk")
      val est = s.sql(
        """SELECT kmv_distinct(
          |  CAST(conv(substring(md5(CAST(v AS STRING)), 1, 15), 16, 10) AS BIGINT),
          |  64).estimate AS e FROM vk""".stripMargin).head().getLong(0)
      assert(est == 37)

      // hll_distinct is SQL-callable; linear-counting correction over
      // the SQL-built sketch tracks the exact count closely
      val hllEst = s.sql(
        """SELECT hll_distinct(
          |  CAST(conv(substring(md5(CAST(v AS STRING)), 1, 15), 16, 10) AS BIGINT),
          |  12) AS hll FROM vk""".stripMargin)
        .select(graft.expressions.SketchAggregates
          .hllCorrectedEstimate(col("hll"), 12)).head().getLong(0)
      assert(math.abs(hllEst - 37L) <= 2, s"hll estimate $hllEst far from 37")

      // misra_gries is SQL-callable as an aggregate (exact regime)
      s.range(0, 100).selectExpr("CAST(id % 5 AS STRING) AS x")
        .createOrReplaceTempView("vm")
      val hh = s.sql("SELECT misra_gries(x, 8) AS hh FROM vm")
        .select(explode(col("hh"))).select("col.item", "col.cnt")
        .as[(String, Long)].collect().toMap
      assert(hh == (0 until 5).map(i => i.toString -> 20L).toMap)

      // quantile_sketch is SQL-callable (exact regime: median of 1..99)
      s.range(1, 100).selectExpr("CAST(id AS DOUBLE) AS x")
        .createOrReplaceTempView("vq")
      val med = s.sql("SELECT quantile_sketch(x, 256) AS sk FROM vq")
        .select(graft.expressions.SketchAggregates
          .sketchQuantileDisc(col("sk"), 50)).head().getDouble(0)
      assert(med == 50.0, s"median $med")

      // shingle_rows generator is SQL-callable, incl. LATERAL VIEW
      Seq((1L, "The quick Brown fox jumps")).toDF("id", "txt")
        .createOrReplaceTempView("vg")
      val lat = s.sql(
        """SELECT id, pos, shingle FROM vg
          |LATERAL VIEW shingle_rows(txt, 3) AS pos, shingle""".stripMargin)
        .as[(Long, Int, String)].collect().toSeq
      assert(lat == Seq((1L, 0, "the quick brown"), (1L, 1, "quick brown fox"),
        (1L, 2, "brown fox jumps")))

      // the optimizer rule rewrites the HOF fold into FloatDotProduct
      // (non-foldable input — literal views constant-fold to a
      // LocalRelation before the plan can be inspected)
      s.range(1, 3).selectExpr(
        "array(CAST(id AS FLOAT), CAST(2.0 AS FLOAT)) AS a",
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS b")
        .createOrReplaceTempView("vr")
      val hof = s.sql(
        """SELECT aggregate(zip_with(a, b,
          |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d FROM vr ORDER BY d""".stripMargin)
      val optimized = hof.queryExecution.optimizedPlan
      def hasNativeDot(pl: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
        pl.exists(_.expressions.exists(_.exists(
          _.isInstanceOf[graft.expressions.FloatDotProduct])))
      assert(hasNativeDot(optimized), s"NativeDotRewrite did not fire:\n$optimized")
      assert(hof.collect().map(_.getDouble(0)).toSeq == Seq(11.0, 14.0))

      // a structurally different fold (zero = 1.0) is left alone
      val other = s.sql(
        """SELECT aggregate(zip_with(a, b,
          |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |  CAST(1.0 AS DOUBLE), (acc, v) -> acc + v) AS d FROM vr ORDER BY d""".stripMargin)
      assert(!hasNativeDot(other.queryExecution.optimizedPlan))
      assert(other.collect().map(_.getDouble(0)).toSeq == Seq(12.0, 15.0))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("ShingleRows generator matches posexplode(shingles(text, n)) row-for-row") {
    import graft.functions.TextFunctions
    import graft.expressions.TextGenerators
    val docs = Seq(
      (1L, "  The quick   brown FOX jumps over the lazy dog  "), // mixed case/space
      (2L, "one two"),   // shorter than n → no rows
      (3L, null: String) // null text → no rows
    ).toDF("doc_id", "text")
    val gen = docs.select(col("doc_id"), TextGenerators.shingleRows(col("text"), 3))
    val hof = docs.select(col("doc_id"),
        posexplode(TextFunctions.shingles(col("text"), 3)))
      .withColumn("pos", col("pos").cast("int"))
      .withColumnRenamed("col", "shingle")
    assert(gen.exceptAll(hof).isEmpty && hof.exceptAll(gen).isEmpty,
      s"gen=${gen.collect().toSeq} hof=${hof.collect().toSeq}")
    assert(gen.filter(col("doc_id") >= 2).isEmpty)
  }

  test("SQL names for the curation tier match the Column API byte-for-byte") {
    import graft.functions.{TextFunctions, UrlFunctions}
    val rows = Seq(
      (1L, "HTTPS://WWW.News.Example.COM:443/A/b/?utm_source=x&b=2&a=1#frag",
        "The quick brown fox jumps over the lazy dog and keeps running"),
      (2L, "http://sub.site.co.uk/path", "le chat noir et le chien blanc sont ici"))
      .toDF("id", "url", "text")
    rows.createOrReplaceTempView("curation_rows")
    val viaSql = spark.sql(
      """SELECT id, url_normalize(url) AS un, url_host(url) AS h,
        |  registered_domain(url_host(url)) AS dom, lang_id(text) AS lang,
        |  ws_token_count(text) AS n_tok, rolling_hash(text) AS rh,
        |  doc_fingerprint(text) AS fp, shingle_hash(text) AS sh
        |FROM curation_rows""".stripMargin)
    val viaApi = rows.select(col("id"),
      UrlFunctions.urlNormalize(col("url")).as("un"),
      UrlFunctions.urlHost(col("url")).as("h"),
      UrlFunctions.registeredDomain(UrlFunctions.urlHost(col("url"))).as("dom"),
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.wsTokenCount(col("text")).as("n_tok"),
      TextFunctions.rollingHash(col("text")).as("rh"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.shingleHash(col("text")).as("sh"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty,
      s"sql=${viaSql.collect().toSeq}\napi=${viaApi.collect().toSeq}")
    // the 60-bit shingle_hash composes with the sketch UDAFs in SQL
    val est = spark.sql(
      "SELECT hll_distinct(shingle_hash(text), 12).est_hll FROM curation_rows")
      .head().getLong(0)
    assert(est >= 1, s"composed sketch estimate $est")
  }
}
