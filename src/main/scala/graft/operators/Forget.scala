package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TxnLog

/** Right-to-be-forgotten propagation — the compliance primitive a
  * 100 TB training-data lake actually needs. A GDPR/CCPA erasure
  * request names document ids; those rows live not only in the corpus
  * table but in every DERIVED artifact keyed by the same id (signature
  * catalogs, feature tables, embedding stores, quality scores), and a
  * deletion that misses one derived table is a compliance failure that
  * no single-table DELETE can see. This operator runs the copy-on-write
  * [[TxnLog.delete]] across the corpus root and every registered
  * derived root, then RE-SCANS each table for the ids and reports the
  * result — the audit row is the proof, not the intent.
  *
  * Semantics per table:
  *  - matched_before: rows carrying a requested id in the pre-delete
  *    snapshot (0 means the artifact never held the subject's data —
  *    also worth proving).
  *  - delete via `idCol IN (ids)` — copy-on-write, so only commit
  *    directories containing a requested id are rewritten; everything
  *    else carries by reference ([[TxnLog.delete]]'s contract).
  *  - remaining_after: rows STILL carrying a requested id, measured by
  *    a fresh scan of the post-delete snapshot. Always 0 on success;
  *    reported rather than assumed.
  *  - `vacuumAfter = true` drops time travel to the single post-delete
  *    version per table and deletes the expired data directories —
  *    without it the old bytes remain readable at earlier versions
  *    (the lakehouse trade: point-in-time reproducibility vs actual
  *    destruction; erasure compliance requires the vacuum).
  *
  * The id list is driver-side BY DESIGN: erasure requests are
  * small-cardinality (a subject's documents, not a corpus slice) and
  * must be auditable as literals. The `isin` predicate broadcasts with
  * the plan and pushes into every parquet scan. For bulk deletions
  * (a banned domain, a contaminated source) use [[TxnLog.delete]]
  * directly with a column predicate instead.
  *
  * Scale shape: per table, one pushed-down detection scan + a rewrite
  * of only the affected commit dirs + two id-count scans for the
  * audit; nothing shuffles wider than the audit's single-row
  * aggregate. Returns one audit row per table:
  * (artifact, matched_before, remaining_after, version_before,
  * version_after, vacuumed).
  */
object Forget {

  def forget(spark: SparkSession, ids: Seq[Long], roots: Map[String, String],
             idCol: String = "doc_id", vacuumAfter: Boolean = false,
             bm25Indexes: Map[String, String] = Map.empty,
             ivfIndexes: Map[String, String] = Map.empty): DataFrame = {
    require(ids.nonEmpty, "Forget.forget: empty erasure request")
    require(roots.nonEmpty || bm25Indexes.nonEmpty || ivfIndexes.nonEmpty,
      "Forget.forget: nothing registered to erase from")
    require(ids.size <= 100000,
      s"Forget.forget: ${ids.size} ids — erasure requests are small by nature; " +
        "for bulk deletion use TxnLog.delete with a column predicate")
    val fp = requestFingerprint(ids)
    val pred = col(idCol).isin(ids: _*)
    val rows = roots.toSeq.sortBy(_._1).map { case (name, root) =>
      val vBefore = TxnLog.latestVersion(spark, root)
      require(vBefore >= 0L, s"Forget.forget: no table at $root ($name)")
      val matched = TxnLog.read(spark, root).filter(pred).count()
      val vAfter = TxnLog.delete(spark, root, pred, Some(s"forget-$fp-$name"))
      val remaining = TxnLog.read(spark, root).filter(pred).count()
      // vacuum only where a delete actually landed — a table that never
      // held the subject's data keeps its unrelated time travel
      val vacuumed = vacuumAfter && vAfter != vBefore
      if (vacuumed) TxnLog.vacuum(spark, root, retainVersions = 1)
      (name, matched, remaining, vBefore, vAfter, if (vacuumed) 1 else 0)
    } ++
    // derived SEARCH artifacts: a deleted document that still surfaces
    // from an index is a compliance failure the table audit cannot
    // see. Each index's own delete keeps its statistics exactly
    // consistent (Bm25Index: negative stats delta; IvfIndex: cell rows
    // under the manifest commit point), and the audit re-scans the
    // index's own serving tables for the ids — the proof, not the
    // intent. Index deletes are idempotent under the same request
    // fingerprint; vacuum stays the caller's per-member decision
    // (indexes pin versions through their catalogs).
    bm25Indexes.toSeq.sortBy(_._1).map { case (name, path) =>
      val vBefore = TxnLog.latestVersion(spark, s"$path/_catalog")
      val matched = graft.search.Bm25Index.servedPostings(spark, path)
        .filter(col("doc_id").isin(ids: _*)).count()
      if (matched > 0)
        graft.search.Bm25Index.delete(spark, path, ids, Some(s"forget-$fp-$name"))
      val remaining = graft.search.Bm25Index.servedPostings(spark, path)
        .filter(col("doc_id").isin(ids: _*)).count()
      (s"bm25:$name", matched, remaining, vBefore,
        TxnLog.latestVersion(spark, s"$path/_catalog"), 0)
    } ++
    ivfIndexes.toSeq.sortBy(_._1).map { case (name, path) =>
      val vBefore = TxnLog.latestVersion(spark, s"$path/cells")
      val cells = TxnLog.read(spark, s"$path/cells")
      val matched = cells.filter(col("vec_id").isin(ids: _*)).count()
      if (matched > 0)
        graft.similarity.IvfIndex.delete(spark, path, ids, Some(s"forget-$fp-$name"))
      val remaining = TxnLog.read(spark, s"$path/cells")
        .filter(col("vec_id").isin(ids: _*)).count()
      (s"ivf:$name", matched, remaining, vBefore,
        TxnLog.latestVersion(spark, s"$path/cells"), 0)
    }
    import spark.implicits._
    rows.toDF("artifact", "matched_before", "remaining_after",
      "version_before", "version_after", "vacuumed")
  }

  /** Deterministic fingerprint of the sorted id list — makes the
    * per-table delete txnId stable across retries of the SAME request
    * (idempotent re-run) while distinct requests never collide. */
  private def requestFingerprint(ids: Seq[Long]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    ids.sorted.foreach { id =>
      md.update(id.toString.getBytes("UTF-8")); md.update('|'.toByte)
    }
    md.digest().take(8).map("%02x".format(_)).mkString
  }
}
