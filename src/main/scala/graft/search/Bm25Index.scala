package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.{TxnCatalog, TxnLog}

/** PERSISTED BM25 postings index — the text-search twin of
  * [[graft.similarity.IvfIndex]]: tokenize and count the corpus ONCE,
  * store the postings bucket-partitioned, and serve every query
  * afterwards from scans of ONLY the query terms' buckets.
  * [[TextFunctions.bm25Search]] re-tokenizes the corpus per call —
  * right for ad-hoc search, wasteful for a query service.
  *
  * Index layout (every member a TxnLog table — atomic commits,
  * incremental appends, time travel for free):
  *  - `<path>/postings`: (term, doc_id, tf, dl, positions) partitioned
  *    by `bucket = pmod(hash(term), nBuckets)`. A query for t terms
  *    scans ≤ t of nBuckets partitions (directory-level pruning via
  *    the same literal-IN filter as the IVF cell probe). `positions`
  *    (the term's sorted 1-based token positions) upgrades the index
  *    to phrase queries ([[phraseCounts]]) at the standard positional-
  *    postings storage premium.
  *  - `<path>/stats`: append-only DELTA rows (n_docs, total_dl);
  *    the corpus totals are their sum. Append-only is what makes
  *    incremental maintenance exact: no read-modify-write, no merge.
  *  - `<path>/meta`: one row (n_buckets) — the layout constant,
  *    versioned with everything else.
  *  - `<path>/_catalog`: a [[TxnCatalog]] whose releases pin one
  *    consistent (postings, stats, meta) version TRIPLE per
  *    build/append. The catalog release is the index's ONLY commit
  *    point: [[topK]] resolves all members from one release, so a
  *    reader can never see new postings scored against stale
  *    N/total_dl no matter where a concurrent maintenance run is
  *    between its member commits (the torn-read window a
  *    latest-of-each read would have).
  *
  * The design removes the df table entirely: document frequency of a
  * term is the LENGTH OF ITS OWN POSTING LIST ((term, doc) rows are
  *  unique), so df comes free with the pruned scan — one less
  * artifact to keep consistent.
  *
  * Exactness: [[append]]ing a batch appends its postings and its
  * stats delta; tf/df/dl/N/total-dl are all additive, so an index
  * built incrementally is IDENTICAL to one built in one shot, and
  * both serve results bit-identical to the ad-hoc
  * [[TextFunctions.bm25Search]] over the same corpus — the scoring
  * tail is literally shared code ([[TextFunctions.rankBm25]]). No
  * drift, no rebuild debt — the contrast with IVF's approximate
  * append is the point.
  *
  * Crash safety: pass a `txnId` and every member commit AND the
  * release publish become idempotent — a crash between member
  * commits leaves the last release serving the old consistent
  * triple, and the retried maintenance run no-ops the members that
  * landed, commits the rest, and publishes the pin (no double-
  * counted tf/df, the exactly-once contract
  * [[TxnLog.foreachBatchAppend]] set). [[foreachBatchUpdate]] is the
  * streaming sink wrapping exactly that.
  *
  * Contract: one maintenance writer at a time (publish pins each
  * member's latest version — racing writers could interleave);
  * a document is indexed at most once (re-appending a doc
  * double-counts it — same contract as IvfIndex.append); new-corpus
  * rebuilds go through [[build]] on a fresh path.
  *
  * Scale shape: build is one tokenize+groupBy (narrow (doc, term, tf)
  * rows shuffle, text never does); a query resolves the release pins
  * (3 catalog rows + a 1-row meta read), scans t/nBuckets of the
  * postings, pivots the ≤ |matching docs| rows, broadcasts two
  * single-row stats frames, and ranks — corpus size enters only
  * through the pruned posting lists. */
object Bm25Index {

  /** Build the index from scratch (overwrites `path`). `txnId` makes
    * a retried build idempotent per member and per release. */
  def build(docs: DataFrame, path: String, nBuckets: Int = 16,
            textCol: String = "text", idCol: String = "doc_id",
            txnId: Option[String] = None): Unit = {
    require(nBuckets >= 1, s"need nBuckets >= 1, got $nBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    TxnLog.overwrite(postingsOf(docs, nBuckets, textCol, idCol),
      s"$path/postings", txnId.map(_ + "-postings"), partitionBy = Seq("bucket"))
    TxnLog.overwrite(statsDeltaOf(docs, textCol, idCol),
      s"$path/stats", txnId.map(_ + "-stats"))
    TxnLog.overwrite(Seq(nBuckets).toDF("n_buckets"),
      s"$path/meta", txnId.map(_ + "-meta"))
    publish(spark, path, txnId)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_SUCCESS"), "")
    ()
  }

  /** Incremental maintenance: append a batch of NEW documents. Both
    * member appends are additive, so the index stays exactly equal
    * to a one-shot build over the union corpus; the release publish
    * at the end is what makes the append ATOMIC for readers. */
  def append(spark: SparkSession, path: String, docs: DataFrame,
             textCol: String = "text", idCol: String = "doc_id",
             txnId: Option[String] = None): Unit = {
    val nBuckets = pinnedMeta(spark, path)
    TxnLog.append(postingsOf(docs, nBuckets, textCol, idCol),
      s"$path/postings", txnId.map(_ + "-postings"), partitionBy = Seq("bucket"))
    TxnLog.append(statsDeltaOf(docs, textCol, idCol),
      s"$path/stats", txnId.map(_ + "-stats"))
    publish(spark, path, txnId)
    ()
  }

  /** Right-to-be-forgotten for the SEARCH index — the erasure surface
    * [[graft.operators.Forget]] closes for tables, closed here for
    * the derived postings: remove `docIds`' posting rows (copy-on-
    * write delete on the postings member, partition layout preserved)
    * and append a NEGATIVE stats delta re-derived from the removed
    * postings themselves, then publish the release. Every statistic
    * stays exactly consistent by construction: df is each term's own
    * posting-list length (shrinks with the delete), N/total_dl are
    * additive deltas (the negative row), so the index serves results
    * BIT-IDENTICAL to a one-shot build over the surviving corpus —
    * the same exactness law as [[append]], in reverse.
    *
    * Crash-safe under a txnId: the victims' (count, total dl) are
    * derived from the CURRENT RELEASE's pinned postings (unmoved
    * until the final publish), so a retry recomputes identical
    * deltas, no-ops the member commits that landed, and publishes.
    * `docIds` is an in-filter — sized for erasure requests (≤ a few
    * thousand ids), not bulk re-curation (rebuild for that). As with
    * [[TxnLog.delete]], old versions still serve the rows until
    * `vacuum` on the members. */
  def delete(spark: SparkSession, path: String, docIds: Seq[Long],
             txnId: Option[String] = None): Unit = {
    require(docIds.nonEmpty, "Bm25Index.delete: no doc ids")
    import spark.implicits._
    val pin = pins(spark, path)
    val victims = TxnLog.read(spark, s"$path/postings", Some(pin("postings")))
      .filter(col("doc_id").isin(docIds: _*))
      .select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("__n"), coalesce(sum("dl"), lit(0L)).as("__t"))
      .head // bounded: one row
    val (n, t) = (victims.getLong(0), victims.getLong(1))
    // no victims → no-op (the release pin derives victims from the
    // PRE-delete postings version, so a crashed run's retry still
    // sees n > 0 and completes its publish)
    if (n == 0) return
    TxnLog.delete(spark, s"$path/postings",
      col("doc_id").isin(docIds: _*), txnId.map(_ + "-postings"))
    TxnLog.append(Seq((-n, -t)).toDF("n_docs", "total_dl"),
      s"$path/stats", txnId.map(_ + "-stats"))
    publish(spark, path, txnId)
    ()
  }

  /** Exactly-once streaming index maintenance — the ingest→searchable
    * freshness loop, closed the way [[TxnLog.foreachBatchUpsert]]
    * closed CDC-apply: each micro-batch of new documents is appended
    * under a batchId-derived txnId, so a checkpoint-recovery replay
    * no-ops every member commit and the release publish, and the
    * index stays bit-identical to a one-shot build over everything
    * ingested. Use from `writeStream.foreachBatch`. */
  def foreachBatchUpdate(path: String, textCol: String = "text",
                         idCol: String = "doc_id"): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      append(batch.sparkSession, path, batch, textCol, idCol,
        txnId = Some(s"batch-$batchId"))

  /** Serve a query from the index: resolve ONE catalog release, scan
    * only the query terms' buckets at the pinned postings version,
    * score with the shared BM25 tail against the pinned stats, rank
    * top-k — output convention identical to
    * [[TextFunctions.bm25Search]]. */
  def topK(spark: SparkSession, path: String, terms: Seq[String],
           k: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, s"1..8 literal terms, got ${terms.size}")
    val pin = pins(spark, path)
    val nBuckets = metaAt(spark, path, pin("meta"))
    // the build's OWN hash expression evaluated on the literal terms —
    // bounded (≤ 8 rows) and immune to any driver-side reimplementation
    // drifting from Spark's Murmur3
    val buckets = spark.range(1)
      .select(terms.map(t => pmod(hash(lit(t)), lit(nBuckets))): _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Int]).distinct.sorted
    val post = TxnLog.read(spark, s"$path/postings", Some(pin("postings")))
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
    // df per term = its posting-list length; dl rides with the posting
    val docTfDl = post.groupBy("doc_id", "dl")
      .pivot("term", terms).agg(first("tf"))
      .select(col("doc_id") +: col("dl") +:
        terms.map(t => coalesce(col(s"`$t`"), lit(0L)).as(s"__tf_$t")): _*)
    val statsRow = TxnLog.read(spark, s"$path/stats", Some(pin("stats")))
      .agg(sum(col("n_docs")).as("__n"), sum(col("total_dl")).as("__t"))
    TextFunctions.rankBm25(docTfDl, statsRow, terms, k)
  }

  /** Exact overlapping-phrase counts served FROM THE INDEX — the
    * positional-postings consumer.
    * [[TextFunctions.phraseSearch]] is the map-side corpus scan
    * (right for one-off analysis); a SERVED phrase query must not
    * re-tokenize 100 TB of text, so this resolves ONE catalog release,
    * scans only the phrase terms' buckets at the pinned version, and
    * adjacency-joins the positions: an occurrence at base position p
    * needs term_i at p + i for every i, so each term's positions
    * shift left by its offset and the legs inner-join on
    * (doc_id, base). Repeated terms are just repeated legs — correct
    * for "the the"-style phrases. Output convention identical to
    * [[TextFunctions.phraseSearch]]: (doc_id, n_matches), only docs
    * with a match, overlaps counted.
    *
    * Scale shape: ≤ |distinct terms| of nBuckets postings partitions
    * read; positions explode map-side; the joins carry narrow
    * (doc_id, base) pairs pre-shrunk to the phrase's terms. */
  def phraseCounts(spark: SparkSession, path: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2 && phrase.size <= 8,
      s"2..8 literal phrase terms, got ${phrase.size}")
    require(phrase.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"phrase terms must be non-empty single tokens, got $phrase")
    val pin = pins(spark, path)
    val nBuckets = metaAt(spark, path, pin("meta"))
    val terms = phrase.distinct
    val buckets = spark.range(1)
      .select(terms.map(t => pmod(hash(lit(t)), lit(nBuckets))): _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Int]).distinct.sorted
    val occ = TxnLog.read(spark, s"$path/postings", Some(pin("postings")))
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), explode(col("positions")).as("pos"))
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      occ.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - i).as("base"))
    }
    legs.reduce(_.join(_, Seq("doc_id", "base")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
  }

  /** Pin one consistent (postings, stats, meta) triple as a new
    * catalog release — the index's commit point. */
  private def publish(spark: SparkSession, path: String,
                      txnId: Option[String]): Long =
    TxnCatalog.publish(spark, s"$path/_catalog", Map(
      "postings" -> s"$path/postings",
      "stats" -> s"$path/stats",
      "meta" -> s"$path/meta"), txnId.map(_ + "-release"))

  /** The postings table as the CURRENT RELEASE serves it — the audit
    * surface an erasure check re-scans ([[graft.operators.Forget]]):
    * reading through the release pin proves what [[topK]] can see,
    * not what bytes happen to be on disk. */
  def servedPostings(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    TxnLog.read(spark, s"$path/postings", Some(pins(spark, path)("postings")))

  /** member name → pinned version of the latest release. Bounded:
    * three catalog rows. */
  private def pins(spark: SparkSession, path: String): Map[String, Long] =
    TxnCatalog.pins(spark, s"$path/_catalog")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  private def metaAt(spark: SparkSession, path: String, v: Long): Int =
    TxnLog.read(spark, s"$path/meta", Some(v))
      .head.getInt(0) // bounded: the meta table is one row

  /** The layout constant at the latest release — what [[append]]
    * must bucket new postings by. */
  private def pinnedMeta(spark: SparkSession, path: String): Int =
    metaAt(spark, path, pins(spark, path)("meta"))

  /** (term, doc_id, tf, dl, bucket) — one row per distinct doc-term.
    * `explode_outer`, not `explode`: a doc whose tokenization is NULL
    * (null text) still emits ONE null-term row, so EVERY indexed doc
    * has a doc-level surface in postings. Query paths never see it
    * (term IN (...) on literal non-null terms), df is untouched (df =
    * a real term's own posting-list length), but [[delete]]'s victim
    * census counts it — without it, deleting a token-less doc left
    * n_docs overstated, breaking the one-shot-build identity.
    * `private[graft]` so the torn-maintenance spec can commit one
    * member without the release. */
  private[graft] def postingsOf(docs: DataFrame, nBuckets: Int,
                         textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.wsTokenCount(col(textCol)).as("dl"),
        posexplode_outer(TextFunctions.tokens(col(textCol)))
          .as(Seq("pos", "term")))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"),
        // POSITIONAL postings: the term's sorted 1-based token
        // positions ride each posting row, so an index-served phrase
        // query ([[phraseCounts]]) adjacency-joins inside the probed
        // buckets instead of re-scanning text. Purely additive —
        // append/delete laws carry because positions are per-(doc,
        // term) facts, exactly like tf.
        sort_array(collect_list(col("pos") + 1)).as("positions"))
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))

  /** One additive stats row for a batch. */
  private def statsDeltaOf(docs: DataFrame, textCol: String,
                           idCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      sum(TextFunctions.wsTokenCount(col(textCol))).as("total_dl"))
}
