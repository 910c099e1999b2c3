package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.TxnLog

/** PERSISTED BM25 postings index — the text-search twin of
  * [[graft.similarity.IvfIndex]]: tokenize and count the corpus ONCE,
  * store the postings bucket-partitioned, and serve every query
  * afterwards from scans of ONLY the query terms' buckets.
  * [[TextFunctions.bm25Search]] re-tokenizes the corpus per call —
  * right for ad-hoc search, wasteful for a query service.
  *
  * Index layout (everything a TxnLog table — atomic commits,
  * incremental appends, time travel for free):
  *  - `<path>/postings`: (term, doc_id, tf, dl) partitioned by
  *    `bucket = pmod(hash(term), nBuckets)`. A query for t terms
  *    scans ≤ t of nBuckets partitions (directory-level pruning via
  *    the same literal-IN filter as the IVF cell probe).
  *  - `<path>/stats`: append-only DELTA rows (n_docs, total_dl);
  *    the corpus totals are their sum. Append-only is what makes
  *    incremental maintenance exact: no read-modify-write, no merge.
  *
  * The design removes the df table entirely: document frequency of a
  * term is the LENGTH OF ITS OWN POSTING LIST ((term, doc) rows are
  * unique), so df comes free with the pruned scan — one less
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
  * Contract: a document is indexed at most once (re-appending a doc
  * double-counts it — same contract as IvfIndex.append); new-corpus
  * rebuilds go through [[build]] on a fresh path.
  *
  * Scale shape: build is one tokenize+groupBy (narrow (doc, term, tf)
  * rows shuffle, text never does); a query scans t/nBuckets of the
  * postings, pivots the ≤ |matching docs| rows, broadcasts two
  * single-row stats frames, and ranks — corpus size enters only
  * through the pruned posting lists. */
object Bm25Index {

  /** Build the index from scratch (overwrites `path`). */
  def build(docs: DataFrame, path: String, nBuckets: Int = 16,
            textCol: String = "text", idCol: String = "doc_id"): Unit = {
    require(nBuckets >= 1, s"need nBuckets >= 1, got $nBuckets")
    TxnLog.overwrite(postingsOf(docs, nBuckets, textCol, idCol),
      s"$path/postings", partitionBy = Seq("bucket"))
    TxnLog.overwrite(statsDeltaOf(docs, textCol, idCol), s"$path/stats")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_meta_nbuckets"),
      nBuckets.toString.getBytes("UTF-8"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_SUCCESS"), "")
    ()
  }

  /** Incremental maintenance: append a batch of NEW documents. Both
    * appends are additive, so the index stays exactly equal to a
    * one-shot build over the union corpus. */
  def append(spark: SparkSession, path: String, docs: DataFrame,
             textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val nBuckets = readNBuckets(path)
    TxnLog.append(postingsOf(docs, nBuckets, textCol, idCol),
      s"$path/postings", partitionBy = Seq("bucket"))
    TxnLog.append(statsDeltaOf(docs, textCol, idCol), s"$path/stats")
    ()
  }

  /** Serve a query from the index: scan only the query terms'
    * buckets, score with the shared BM25 tail, rank top-k — output
    * convention identical to [[TextFunctions.bm25Search]]. */
  def topK(spark: SparkSession, path: String, terms: Seq[String],
           k: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, s"1..8 literal terms, got ${terms.size}")
    val nBuckets = readNBuckets(path)
    // the build's OWN hash expression evaluated on the literal terms —
    // bounded (≤ 8 rows) and immune to any driver-side reimplementation
    // drifting from Spark's Murmur3
    val buckets = spark.range(1)
      .select(terms.map(t => pmod(hash(lit(t)), lit(nBuckets))): _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Int]).distinct.sorted
    val post = TxnLog.read(spark, s"$path/postings")
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
    // df per term = its posting-list length; dl rides with the posting
    val docTfDl = post.groupBy("doc_id", "dl")
      .pivot("term", terms).agg(first("tf"))
      .select(col("doc_id") +: col("dl") +:
        terms.map(t => coalesce(col(s"`$t`"), lit(0L)).as(s"__tf_$t")): _*)
    val statsRow = TxnLog.read(spark, s"$path/stats")
      .agg(sum(col("n_docs")).as("__n"), sum(col("total_dl")).as("__t"))
    TextFunctions.rankBm25(docTfDl, statsRow, terms, k)
  }

  /** (term, doc_id, tf, dl, bucket) — one row per distinct doc-term. */
  private def postingsOf(docs: DataFrame, nBuckets: Int,
                         textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.wsTokenCount(col(textCol)).as("dl"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))

  /** One additive stats row for a batch. */
  private def statsDeltaOf(docs: DataFrame, textCol: String,
                           idCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      sum(TextFunctions.wsTokenCount(col(textCol))).as("total_dl"))

  private def readNBuckets(path: String): Int =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_meta_nbuckets")), "UTF-8").trim.toInt
}
