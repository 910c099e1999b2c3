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

  test("mmrRerank equals an independent greedy reference on random instances") {
    import graft.similarity.Similarity
    val rnd = new scala.util.Random(4242)
    // the engine's exact double pipeline: sequential-fold dot, cosine
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    for (trial <- 1 to 3) {
      val cands = for (q <- 0 until 4; c <- 0 until 10) yield
        (q.toLong, (100 * trial + c).toLong, rnd.nextDouble(),
          Array.fill(6)((rnd.nextInt(9) + 1).toFloat))
      val k = 4
      // reference: per query, greedy argmax of rel − maxsim, ties to min id
      val expected = cands.groupBy(_._1).flatMap { case (q, cs) =>
        var sel = Vector.empty[(Long, Array[Float], Long)] // (id, emb, pick)
        var rem = cs.map(t => (t._2, t._3, t._4)).toVector
        for (pick <- 1 to k) {
          val best = rem.minBy { case (id, rel, emb) =>
            val maxsim = if (sel.isEmpty) 0.0
                         else sel.map(s => cos(emb, s._2)).max
            val key = if (sel.isEmpty) rel else rel - maxsim
            (-key, id)
          }
          sel :+= ((best._1, best._3, pick.toLong))
          rem = rem.filterNot(_._1 == best._1)
        }
        sel.map(s => (q, s._1, s._3))
      }.toSet
      val df = cands.toDF("q_id", "vec_id", "rel", "embedding")
      val got = Similarity.mmrRerank(df, k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"trial $trial diverged from reference greedy")
    }
  }

  test("rrfFuse equals the brute reciprocal-rank computation on random lists") {
    import graft.operators.Fusion
    val rnd = new scala.util.Random(777)
    val lists = (1 to 3).map { _ =>
      val ids = rnd.shuffle((1L to 30L).toVector).take(12)
      ids.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
    }
    val expected = lists.flatten
      .groupBy(_._1).map { case (id, rows) =>
        (id, rows.size.toLong, rows.map(r => 1000000L / (60L + r._2)).sum)
      }.toSeq
      .sortBy(t => (-t._3, t._1)).take(8)
      .zipWithIndex.map { case ((id, n, fp), i) => (id, n, fp, i + 1L) }
      .toSet
    val got = Fusion.rrfFuse(lists.map(_.toDF("doc_id", "rank")), topK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  test("packAttentionSpans tiles every window exactly, conserves doc tokens") {
    import graft.functions.TextFunctions
    // shard 0 stream (nShards=1): doc lengths 3, 7, 6, 1 over W=4
    val docs = Seq(
      (0L, "a b c"), (1L, "d e f g h i j"), (2L, "k l m n o p"), (3L, "q")
    ).toDF("doc_id", "text")
    val spans = TextFunctions.packAttentionSpans(docs, windowTokens = 4, nShards = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per-doc seg_len sums = token counts
    val perDoc = spans.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(perDoc == Map(0L -> 3L, 1L -> 7L, 2L -> 6L, 3L -> 1L))
    // every window except the last is tiled [0, W) without gaps/overlap
    val perBin = spans.groupBy(_._1)
    val lastBin = perBin.keys.max
    perBin.foreach { case (bin, segs) =>
      val sorted = segs.sortBy(_._3)
      // contiguous: each segment starts where the previous ended
      sorted.foldLeft(0L) { case (expect, (_, _, st, len)) =>
        assert(st == expect, s"bin $bin: gap/overlap at $st (expected $expect)")
        st + len
      }
      if (bin != lastBin)
        assert(sorted.map(_._4).sum == 4L, s"bin $bin not fully tiled")
    }
    // doc 1 (tokens 3..9) crosses windows 0,1,2 → three segments
    assert(spans.count(_._2 == 1L) == 3)
  }

  test("packDocuments invariants: offsets in-window, totals conserved, bins monotone") {
    val docGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(8))).map(_.take(40).mkString(" "))
    val docs = cases(docGen, 30).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val window = 16
    val packed = TextFunctions.packDocuments(docs, window, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    packed.foreach { case (_, _, nTok, start, bin, off) =>
      assert(off >= 0 && off < window)
      assert(bin == start / window)
      assert(nTok >= 1)
    }
    // per shard: running totals are consistent (start = sum of earlier docs)
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (_, _, nTok, start, _, _) =>
        assert(start == cum); cum += nTok
      }
    }
  }

  test("contamination fraction is always in [0,1] and n_matched <= n_shingles") {
    val docGen = Gen.nonEmptyListOf(
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
      .map(_.take(20).mkString(" "))
    val all = cases(docGen, 30).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val train = all.filter(_._1 % 2 == 0).toDF("doc_id", "text")
    val test_ = all.filter(_._1 % 2 == 1).toDF("doc_id", "text")
    val out = TextFunctions.contamination(train, test_).collect()
    assert(out.length == all.count(_._1 % 2 == 1))
    out.foreach { r =>
      val (n, m, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(m >= 0 && m <= n)
      assert(f >= 0.0 && f <= 1.0)
      if (n > 0) assert(math.abs(f - m.toDouble / n) < 1e-15) else assert(f == 0.0)
    }
  }

  test("quantizeInt8 roundtrip error bounded by scale/2 for random vectors") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-100.0f, 100.0f))
    val vecs = cases(vecGen, 30).zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      .toDF("vec_id", "embedding")
    val out = graft.similarity.Similarity.quantizeInt8(vecs).collect()
    out.foreach { r =>
      val (scale, q, err) = (r.getDouble(1), r.getSeq[Int](2), r.getDouble(3))
      assert(q.forall(x => x >= -127 && x <= 127))
      assert(err <= scale / 2 + 1e-9)
    }
  }

  test("nearDupClusters equals union-find ground truth on random graphs") {
    val edgeGen = Gen.listOfN(35, for {
      a <- Gen.choose(0L, 24L); b <- Gen.choose(0L, 24L)
    } yield (a, b))
    cases(edgeGen, 6).foreach { edges =>
      val pairs = edges.filter(e => e._1 != e._2)
      if (pairs.nonEmpty) {
        // driver-side union-find reference
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = pairs.flatMap(e => Seq(e._1, e._2)).distinct
        // min id per component
        val want = nodes.map { n =>
          val root = find(n)
          n -> nodes.filter(m => find(m) == root).min
        }.toMap
        // BOTH execution paths must equal the ground truth: the
        // driver union-find fast path (default cap) and the
        // distributed star-contraction (forced via cap 0)
        val got = graft.dedup.Dedup.nearDupClusters(pairs.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"fast path: edges=$pairs")
        val gotDist = graft.dedup.Dedup
          .nearDupClusters(pairs.toDF("doc_a", "doc_b"), driverEdgeCap = 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotDist == want, s"distributed path: edges=$pairs")
      }
    }
  }

  test("substrDedup equals a reference coverage computation on random corpora") {
    // reference: hash windows per doc, flag occurrences that are not
    // the global (doc, pos)-minimum of their window text, remove every
    // token covered by a flagged window — computed with plain Scala
    // collections over the same tokenization
    val w = 4
    val docGen = Gen.listOfN(14, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(6, docGen)
    cases(corpusGen, 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val want = {
        val occ = docs.flatMap { case (id, t) =>
          val ts = t.trim.toLowerCase.split("\\s+").toSeq
          (0 to ts.length - w).map(p => (ts.slice(p, p + w).mkString(" "), id, p))
        }
        val owner = occ.groupBy(_._1).map { case (win, os) =>
          win -> os.map(o => (o._2, o._3)).min
        }
        val flagged = occ.filter { case (win, id, p) =>
          occ.count(_._1 == win) >= 2 && owner(win) != ((id, p))
        }.map(o => (o._2, o._3)).toSet
        docs.map { case (id, t) =>
          val ts = t.trim.toLowerCase.split("\\s+").toSeq
          val kept = ts.indices.filterNot(i =>
            flagged.exists { case (fid, s) => fid == id && i >= s && i < s + w })
          id -> kept.map(ts).mkString(" ")
        }.toMap
      }
      val got = graft.dedup.Dedup.substrDedup(docs.toDF("doc_id", "text"), w = w)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"corpus=$texts")
    }
  }

  test("variant shredding extract equals variant_get on random flat payloads") {
    val rowGen = for {
      k <- Gen.chooseNum(-1000000L, 1000000L)
      s <- Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString)
      hasS <- Gen.oneOf(true, false)
    } yield if (hasS) s"""{"k": $k, "s": "$s"}""" else s"""{"k": $k}"""
    val rows = cases(rowGen, 30).zipWithIndex.map { case (j, i) => (i.toLong, j) }
    val df = rows.toDF("id", "j").select(col("id"), parse_json(col("j")).as("v"))
    val out = java.nio.file.Files.createTempDirectory("prop_shred").resolve("t").toString
    graft.sources.VariantShred.writeShredded(df, out)
    val back = spark.read.parquet(out)
    val got = back.select(col("id"),
        graft.sources.VariantShred.extract(back, "v", "$.k", "bigint").as("k"),
        graft.sources.VariantShred.extract(back, "v", "$.s", "string").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    val want = df.select(col("id"),
        variant_get(col("v"), "$.k", "bigint").as("k"),
        variant_get(col("v"), "$.s", "string").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == want)
  }

  test("zValue round-trips through xOf/yOf for arbitrary 16-bit coordinates") {
    import graft.sources.ZOrder
    val coordGen = for {
      x <- Gen.chooseNum(0L, 65535L); y <- Gen.chooseNum(0L, 65535L)
    } yield (x, y)
    val rows = cases(coordGen, 60).toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
      .select(col("x"), col("y"),
        ZOrder.xOf(col("z")).as("xr"), ZOrder.yOf(col("z")).as("yr")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(2) && r.getLong(1) == r.getLong(3),
        s"roundtrip broke at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("spanDedup output is a chunk-subset; unique corpora pass through unchanged") {
    val docGen = Gen.nonEmptyListOf(
      Gen.chooseNum(0, 30).map(i => s"w$i")).map(_.take(50).mkString(" "))
    val texts = cases(docGen, 15).distinct
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = graft.dedup.Dedup.spanDedup(docs, window = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byId = texts.zipWithIndex.map { case (t, i) => i.toLong -> t }.toMap
    out.foreach { case (id, dedup) =>
      // the rebuilt text only ever shrinks, and every original chunk
      // either survives verbatim or is gone (subset property)
      val orig = byId(id).split(" ").grouped(5).map(_.mkString(" ")).toSet
      val keptChunks =
        if (dedup.isEmpty) Set.empty[String] else orig.filter(dedup.contains)
      assert(keptChunks.forall(orig.contains))
      assert(dedup.length <= byId(id).length)
    }
    // a corpus with no repeated chunks must come back identical
    val uniqueDocs = Seq((1L, (1 to 12).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 12).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    val u = graft.dedup.Dedup.spanDedup(uniqueDocs, window = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(u(1L) == (1 to 12).map(i => s"a$i").mkString(" "))
    assert(u(2L) == (1 to 12).map(i => s"b$i").mkString(" "))
  }

  test("bloomJoin equals the plain join for arbitrary key sets") {
    val setGen = Gen.listOf(Gen.chooseNum(0L, 500L)).map(_.distinct.take(60))
    cases(setGen, 6).filter(_.nonEmpty).foreach { keys =>
      val probe = spark.range(0, 500).toDF("k")
      val build = keys.toDF("bk")
      val plain = probe.join(build, col("k") === col("bk")).count()
      val bloomed = graft.operators.BloomJoin
        .join(probe, build, "k", "bk", expectedItems = 64).count()
      assert(bloomed == plain, s"keys=$keys")
    }
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

  test("intervalJoin equals the brute-force inequality join on random interval sets") {
    import graft.operators.Joins
    val ivGen = for {
      lo <- Gen.choose(0L, 500L)
      len <- Gen.choose(0L, 60L)
    } yield (lo, lo + len)
    val as = cases(ivGen, 60).zipWithIndex.map { case ((l, h), i) => (i.toLong, l, h) }
    val bs = cases(ivGen.map(p => (p._1 + 13, p._2 + 13)), 60).zipWithIndex
      .map { case ((l, h), i) => (i.toLong, l, h) }
    val want = (for {
      (ai, alo, ahi) <- as; (bi, blo, bhi) <- bs
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)).sorted
    for (width <- Seq(1.0, 7.0, 64.0, 1000.0)) {
      val got = Joins.intervalJoin(
        as.toDF("a_id", "a_lo", "a_hi"), bs.toDF("b_id", "b_lo", "b_hi"),
        "a_lo", "a_hi", "b_lo", "b_hi", width)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
      assert(got == want, s"width=$width: ${got.size} vs ${want.size} pairs")
    }
  }

  test("quantileSketch rank error stays bounded for random data and small k") {
    import graft.expressions.SketchAggregates
    val n = 5000
    val vs = cases(Gen.choose(0, 1000000), n).map(_.toDouble)
    val sorted = vs.sorted
    val sk = vs.toDF("v").repartition(6)
      .agg(SketchAggregates.quantileSketch(col("v"), 128).as("sk"))
    for (p <- Seq(10, 50, 95)) {
      val est = sk.select(SketchAggregates.sketchQuantileDisc(col("sk"), p))
        .head().getDouble(0)
      // true rank of the estimate vs the target rank
      val rank = sorted.count(_ <= est)
      val target = math.ceil(n * p / 100.0)
      assert(math.abs(rank - target) <= 0.1 * n,
        s"p$p: est=$est rank=$rank target=$target")
    }
  }

  test("pageRank conserves mass within floor leak on random graphs") {
    import graft.operators.Graph
    val edgeGen = for {
      a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L) if a != b
    } yield (a, b)
    val pairs = cases(edgeGen, 80).distinct
    val edges = Graph.symmetrize(pairs.toDF("a", "b"), "a", "b")
    val ranks = Graph.pageRank(edges, iterations = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = ranks.length
    assert(ranks.forall(_._2 >= 0))
    val total = ranks.map(_._2).sum
    // each node leaks <= ~1 micro-unit per floor division per round
    assert(total <= 1000000L && total >= 1000000L - nodes.toLong * 5 * 4,
      s"mass $total over $nodes nodes")
  }

  test("TxnLog matches an in-memory model over random op sequences") {
    import graft.sources.TxnLog
    // ops: 0 = overwrite, 1 = append, 2 = idempotent-append replay
    val opsGen = Gen.listOfN(8, Gen.choose(0, 2))
    for ((ops, caseIdx) <- cases(opsGen, 4).zipWithIndex) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_prop_txn$caseIdx").toString + "/t"
      var model = Vector.empty[Seq[Long]] // expected contents per version
      var nextRow = 0L
      var lastTxn = Option.empty[String]
      ops.foreach { op =>
        val rows = Seq(nextRow, nextRow + 1)
        val df = rows.toDF("id")
        op match {
          case 0 =>
            TxnLog.overwrite(df, root)
            model :+= rows
            nextRow += 2
          case 1 =>
            val txn = s"t$nextRow"
            TxnLog.append(df, root, Some(txn))
            model :+= (model.lastOption.getOrElse(Seq.empty) ++ rows)
            lastTxn = Some(txn)
            nextRow += 2
          case 2 => lastTxn match {
            case Some(txn) => // replay: NO new version, contents unchanged
              TxnLog.append(df, root, Some(txn))
            case None => // nothing to replay yet: treat as overwrite
              TxnLog.overwrite(df, root)
              model :+= rows
              nextRow += 2
          }
        }
        // every historical version must still read back exactly
        model.zipWithIndex.foreach { case (want, v) =>
          val got = TxnLog.read(spark, root, asOf = Some(v.toLong))
            .as[Long].collect().sorted.toSeq
          assert(got == want.sorted, s"case $caseIdx v$v: $got != $want (ops $ops)")
        }
        assert(TxnLog.latestVersion(spark, root) == model.size - 1)
      }
    }
  }

  test("rollingAgg equals the brute-force trailing-window definition on random series") {
    val evGen = Gen.listOfN(30, for {
      key <- Gen.choose(1L, 3L)
      us <- Gen.choose(0L, 600L * 1000000L)
      cents <- Gen.choose(-10000L, 10000L)
    } yield (key, us, cents / 100.0))
    val events = cases(evGen, 8).zipWithIndex.flatMap { case (evs, i) =>
      evs.map { case (k, us, v) => (k + i * 10L, us, v) } // isolate batches by key
    }
    val win = 120L * 1000000L
    val df = events.toDF("user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .drop("us")
    val got = graft.operators.TimeSeries.rollingAgg(df, "user_id", "ts", "value", win)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("value"), col("rolling_sum"), col("rolling_n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)) ->
        ((r.getDouble(3), r.getLong(4)))).toMap
    // brute force: per row, sum cents of same-key rows in [us-win, us]
    events.foreach { case (k, us, v) =>
      val inWin = events.filter { case (k2, us2, _) => k2 == k && us2 >= us - win && us2 <= us }
      val expSum = inWin.map { case (_, _, v2) => math.round(v2 * 100) }.sum / 100.0
      val (gotSum, gotN) = got((k, us, v))
      assert(gotN == inWin.size && gotSum == expSum,
        s"key=$k us=$us: got ($gotSum, $gotN), want ($expSum, ${inWin.size})")
    }
  }

  test("BPE fold-merge equals the reference scan-merge on random symbol runs") {
    // reference: scan left-to-right, fuse non-overlapping (a,b) pairs
    def scanMerge(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    val wordGen = Gen.listOfN(12, Gen.oneOf("a", "b")).map(_.mkString)
    val words = cases(wordGen, 30).distinct
    for ((a, b) <- Seq(("a", "a"), ("a", "b"), ("b", "a"))) {
      val df = words.toDF("word")
        .select(col("word"), lit(1L).as("freq"),
          transform(sequence(lit(1), length(col("word"))), i =>
            col("word").substr(i, lit(1))).as("syms"))
      val winner = Seq((a, b)).toDF("sym_left", "sym_right")
      // private fold exercised through the public API: one training
      // round on a corpus whose top pair is forced to (a, b) is not
      // constructible generically, so apply via the vocab path instead
      val applied = graft.functions.TextFunctions.bpeApplyMergeForTest(df, winner)
        .select(col("word"), col("syms")).as[(String, Seq[String])]
        .collect().toMap
      words.foreach { w =>
        val want = scanMerge(w.map(_.toString).toList, a, b)
        assert(applied(w).toList == want,
          s"word=$w merge=($a,$b): got ${applied(w)}, want $want")
      }
    }
  }

  test("blocklistFilter invariants: multiplicity >= distinct; verdict is the threshold") {
    val textGen = Gen.listOfN(12,
      Gen.oneOf("slow", "dup", "fast", "join", "merge", "agg")).map(_.mkString(" "))
    val docs = cases(textGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = TextFunctions.blocklistFilter(docs, Seq("slow", "dup"), maxHits = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    rows.foreach { case (n, d, keep) =>
      assert(n >= d, s"multiplicity $n < distinct $d")
      assert(d <= 2, s"distinct $d exceeds blocklist size")
      assert(keep == (n <= 2))
    }
  }

  test("qualityLinear score decomposes linearly from its own reported features") {
    val textGen = Gen.listOfN(10,
      Gen.oneOf("the", "cat", "on", "and", "verylongtokenword", "x.", "!!")).map(_.mkString(" "))
    val docs = cases(textGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    TextFunctions.qualityLinear(docs).collect().foreach { r =>
      val (stop, punct, dev, score) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(score == 400000L + 3 * stop - 10 * punct - dev / 5)
      assert(r.getBoolean(5) == (score > 0))
      assert(stop >= 0 && stop <= 1000000 && punct >= 0 && punct <= 1000000)
    }
  }

  test("calibratedTopPctSketch vs the rank path on random grouped scores") {
    import graft.operators.Robust
    // random group sizes 1..60 with HEAVY ties (scores drawn from a
    // small range), several keep percentages — the sketch path must
    // keep the rank path's rows as a subset, differ ONLY by rows tying
    // the cutoff score, and match EXACTLY when a group's scores are
    // distinct
    val corpusGen = for {
      nGroups <- Gen.choose(2, 6)
      rows <- Gen.sequence[Seq[(Int, Long)], (Int, Long)](
        (0 until nGroups).map { g =>
          for { sz <- Gen.choose(1, 60); s <- Gen.choose(0L, 12L) } yield (g, s)
        })
      extra <- Gen.listOfN(120, for {
        g <- Gen.choose(0, nGroups - 1); s <- Gen.choose(0L, 12L)
      } yield (g, s))
    } yield rows ++ extra
    cases(corpusGen, n = 6).zipWithIndex.foreach { case (rows, ci) =>
      Seq(1, 30, 85).foreach { pct =>
        val df = rows.zipWithIndex
          .map { case ((g, s), i) => (i.toLong, s"g$g", s) }
          .toDF("doc_id", "source", "score_fp")
        val rank = Robust.calibratedTopPct(df, "score_fp", "source", pct, "doc_id")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        val sketch = Robust.calibratedTopPctSketch(df, "score_fp", "source", pct)
          .collect().map(r =>
            (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("score_fp")))
        val rankIds = rank.map(_._1).toSet
        val sketchIds = sketch.map(_._1).toSet
        assert(rankIds.subsetOf(sketchIds),
          s"case $ci pct $pct: sketch lost rank-path rows ${rankIds -- sketchIds}")
        // the surplus is exactly the cutoff ties: every extra row's
        // score equals its group's smallest rank-path-kept score
        val cutoffByGroup = rank.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
        (sketch.filterNot(r => rankIds(r._1))).foreach { case (id, g, s) =>
          assert(cutoffByGroup.get(g).contains(s),
            s"case $ci pct $pct: extra row $id in $g at score $s != cutoff ${cutoffByGroup.get(g)}")
        }
        // groups whose scores are all distinct agree EXACTLY
        val distinctGroups = rows.groupBy(_._1).collect {
          case (g, rs) if rs.map(_._2).distinct.size == rs.size => s"g$g"
        }.toSet
        distinctGroups.foreach { g =>
          assert(rank.filter(_._2 == g).map(_._1).toSet ==
            sketch.filter(_._2 == g).map(_._1).toSet,
            s"case $ci pct $pct: distinct-score group $g diverged")
        }
      }
    }
  }

  test("hardNegatives is exactly the banded slice of the brute-force ranking") {
    val vecGen = Gen.listOfN(4, Gen.choose(-1f, 1f)).map(_.toArray)
    val vecs = cases(vecGen, 30).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .filter(_._2.exists(_ != 0f)).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val banded = graft.similarity.Similarity
      .hardNegatives(vecs, q, k = 1000, loCos = -0.5, hiCos = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the operator bands on RAW cosine but only the 9-decimal-rounded
    // value is observable here, so sandwich: everything strictly
    // inside the band (by rounded value, 1e-9 margin) must be present,
    // and nothing clearly outside it may be
    val full = graft.similarity.Similarity.bruteForceTopK(vecs, q, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val mustHave = full.filter { case (_, _, c) => c >= -0.5 + 1e-9 && c < 0.5 - 1e-9 }
      .map(t => (t._1, t._2)).toSet
    val mayHave = full.filter { case (_, _, c) => c >= -0.5 - 1e-9 && c < 0.5 + 1e-9 }
      .map(t => (t._1, t._2)).toSet
    assert(mustHave.subsetOf(banded), s"missing: ${mustHave -- banded}")
    assert(banded.subsetOf(mayHave), s"out of band: ${banded -- mayHave}")
  }

  test("unimaxBudgets == sequential water-filling over random instances") {
    import graft.operators.Sampling
    // random source sets: 1-9 sources, weights 0-10000, budgets and
    // caps spanning the all-capped / none-capped / mixed regimes
    val instGen = for {
      n <- Gen.choose(1, 9)
      ws <- Gen.listOfN(n, Gen.choose(0L, 10000L))
      b <- Gen.choose(1L, 30000L)
      capM <- Gen.oneOf(100000L, 250000L, 500000L, 1000000L, 3000000L)
    } yield (ws.zipWithIndex.map { case (w, i) => (s"s$i", w) }, b, capM)
    def ref(weights: Seq[(String, Long)], b: Long, capM: Long): Map[String, Long] = {
      var list = weights.map { case (s, w) => (s, w * capM / 1000000L) }
        .sortBy { case (s, c) => (c, s) }
      val res = scala.collection.mutable.Map[String, Long]()
      var rem = b
      while (list.nonEmpty) {
        val (s, c) = list.head
        if (c * list.size <= rem) { res(s) = c; rem -= c; list = list.tail }
        else {
          val share = rem / list.size; val r = (rem % list.size).toInt
          list.zipWithIndex.foreach { case ((s2, c2), i) =>
            res(s2) = math.min(c2, share + (if (i < r) 1 else 0)) }
          list = Nil
        }
      }
      res.toMap
    }
    cases(instGen, n = 25).foreach { case (weights, b, capM) =>
      val df = weights.map { case (s, w) => (s, w) }.toDF("stratum", "w")
      val got = Sampling.unimaxBudgets(df, "w", "stratum", b, capM)
        .select("stratum", "budget").as[(String, Long)].collect().toMap
      val want = ref(weights, b, capM)
      assert(got == want, s"weights=$weights b=$b capM=$capM")
      val caps = weights.map { case (s, w) => s -> w * capM / 1000000L }.toMap
      assert(got.values.sum == math.min(b, caps.values.sum),
        s"conservation broken: weights=$weights b=$b capM=$capM")
    }
  }
}
