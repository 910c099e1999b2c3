package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Near-duplicate screening ON INGEST — the streaming twin of
  * [[graft.dedup.Dedup.incrementalNearDup]]: every arriving document
  * is MinHash-signed, LSH-banded, and compared against a per-bucket
  * catalog of previously admitted signatures held in stream state.
  * This is the "dedup before it ever lands" stage of a training-data
  * pipeline: the batch variants dedup yesterday's lake, this screens
  * the firehose.
  *
  * Shape: signature + banding are the SAME column expressions the
  * batch path uses ([[graft.dedup.Dedup.minhashSignatures]] /
  * [[graft.dedup.Dedup.bandKeys]] — pure projections, so they run
  * unchanged on a streaming frame), then one `flatMapGroupsWithState`
  * keyed by (band_idx, band_hash). State per bucket is a signature
  * catalog capped at `bucketCap` entries — the same degenerate-bucket
  * guard as the batch `lshCandidates` cap, which also bounds state
  * size: ≤ bands · buckets · cap · k longs, independent of stream
  * length. Matching estimates Jaccard as the fraction of agreeing
  * signature positions (the standard MinHash estimator) — no shingle
  * sets cross the wire, only (doc_id, signature).
  *
  * Emission: one [[StreamingNearDup.BandVerdict]] per (document, band)
  * whose bucket catalog contains a match at or above `threshold` —
  * novel documents emit nothing and are ADMITTED to the catalog
  * (duplicates are not). A document colliding in several bands emits
  * up to `bands` verdicts; sinks wanting one verdict per doc
  * deduplicate on doc_id downstream (`.dropDuplicates("doc_id")`, or
  * distinct in the batch that consumes the screen). Determinism: docs
  * are processed in doc_id order within each micro-batch, and the
  * match is the (max estimate, min doc_id) catalog entry.
  */
object StreamingNearDup {

  case class BandRow(band_idx: Int, band_hash: String, doc_id: Long, sig: Seq[Long])

  case class DocSig(doc_id: Long, sig: Seq[Long])

  case class BucketInitRow(band_idx: Int, band_hash: String, entries: Seq[DocSig])

  case class BucketCatalog(docs: List[(Long, Seq[Long])])

  case class BandVerdict(doc_id: Long, band_idx: Int, dup_of: Long,
                         est_jaccard: Double)

  /** The batch-side catalog of an ACCEPTED corpus, in the shape
    * [[nearDupStream]] bootstraps from: one (doc_id, band_idx,
    * band_hash, sig) row per (accepted doc, band). This is what makes
    * the screen RESTARTABLE: the stream emits only rejections, so the
    * accepted set lives in the lake — snapshot it with this one-pass
    * batch derivation (the same signature/band expressions the stream
    * itself uses) and hand it to the next incarnation of the query as
    * `initialCatalog`. Narrow: ~`bands` rows of (ids + k longs) per
    * doc, no text. */
  def catalogFrom(accepted: DataFrame, k: Int = 12, bands: Int = 4,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sigs = graft.dedup.Dedup.minhashSignatures(accepted, k, textCol, idCol)
    graft.dedup.Dedup.lshBands(sigs, k, bands)
      .join(sigs.select(col("doc_id"), col("sig")), "doc_id")
      .select(col("doc_id"), col("band_idx"), col("band_hash"), col("sig"))
  }

  /** Screen a streaming frame with (idCol: long, textCol: string).
    * Append-mode output; state never expires (a catalog, not a
    * window) — long-running deployments snapshot the accepted corpus
    * to a table ([[catalogFrom]]) and restart the query against it
    * via `initialCatalog`, whose rows seed each bucket's state before
    * the first micro-batch (`flatMapGroupsWithState` initial state).
    * Buckets over `bucketCap` initial entries keep the lowest-id
    * `bucketCap` — the same admission preference a live run would
    * have produced in doc_id order. */
  def nearDupStream(docs: DataFrame, k: Int = 12, bands: Int = 4,
                    threshold: Double = 0.7, bucketCap: Int = 64,
                    textCol: String = "text", idCol: String = "doc_id",
                    initialCatalog: Option[DataFrame] = None)
      : Dataset[BandVerdict] = {
    import docs.sparkSession.implicits._
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    require(bucketCap > 0, s"bucketCap must be positive, got $bucketCap")
    val sigs = graft.dedup.Dedup.minhashSignatures(docs, k, textCol, idCol)
    val banded = sigs
      .select(col("doc_id"), col("sig"),
        posexplode(graft.dedup.Dedup.bandKeys(col("sig"), k, bands)))
      .select(col("pos").cast("int").as("band_idx"), col("col").as("band_hash"),
        col("doc_id"), col("sig"))
      .as[BandRow]

    def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length

    val screen = (_: (Int, String), it: Iterator[BandRow],
                  state: GroupState[BucketCatalog]) => {
      var catalog = state.getOption.getOrElse(BucketCatalog(Nil)).docs
      val out = Seq.newBuilder[BandVerdict]
      it.toSeq.sortBy(_.doc_id).foreach { r =>
        val matches = catalog.iterator
          .map { case (id, s) => (id, estJaccard(r.sig, s)) }
          .filter(_._2 >= threshold)
          .toSeq
        if (matches.nonEmpty) {
          val (bestId, bestEst) =
            matches.minBy { case (id, est) => (-est, id) }
          out += BandVerdict(r.doc_id, r.band_idx, bestId, bestEst)
        } else if (catalog.size < bucketCap) {
          catalog = (r.doc_id, r.sig) :: catalog
        }
      }
      state.update(BucketCatalog(catalog))
      out.result().iterator
    }

    val grouped = banded.groupByKey(r => (r.band_idx, r.band_hash))
    initialCatalog match {
      case None =>
        grouped.flatMapGroupsWithState[BucketCatalog, BandVerdict](
          OutputMode.Append, GroupStateTimeout.NoTimeout)(screen)
      case Some(cat) =>
        // one state row per bucket (initial state must be key-unique);
        // entries held newest-id-first to mirror live admission order
        val init = cat
          .groupBy(col("band_idx").cast("int").as("band_idx"), col("band_hash"))
          .agg(collect_list(struct(col("doc_id").cast("long").as("doc_id"),
            col("sig"))).as("entries"))
          .as[BucketInitRow]
          .groupByKey(r => (r.band_idx, r.band_hash))
          .mapValues { r =>
            val kept = r.entries.sortBy(_.doc_id).take(bucketCap)
            BucketCatalog(kept.sortBy(-_.doc_id)
              .map(e => (e.doc_id, e.sig)).toList)
          }
        grouped.flatMapGroupsWithState[BucketCatalog, BandVerdict](
          OutputMode.Append, GroupStateTimeout.NoTimeout, init)(screen)
    }
  }
}
