package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-table consistent snapshots — DATASET RELEASES. A training
  * run never consumes one table: documents + embeddings + quality
  * scores + split assignments must all be read at versions that
  * belong together, and "latest of each" silently drifts the moment
  * any ingest appends. A release pins the cut explicitly.
  *
  * The catalog is itself a [[TxnLog]] table whose rows are
  * `(table_name, root, version)` — one row per member table, one
  * catalog version per release. That buys the whole TxnLog contract
  * for free: publishing a release is one atomic manifest commit
  * (create-exclusive — two racing publishers cannot both claim a
  * release number), releases are time travel (`asOfRelease`), and a
  * replayed publish with the same txnId is a no-op.
  *
  * What a release DOES claim: every reader of release R resolves
  * member table T to exactly the version pinned at publish — forever,
  * regardless of later appends/deletes to T. What it does NOT claim:
  * atomicity of the SOURCE writes across tables — `publish` pins each
  * table's latest version at its own read, so a writer racing the
  * publish can slip one table a version ahead of another. The
  * coordination contract is the producer's: publish AFTER the
  * multi-table load completes (the natural pipeline shape), or
  * quiesce writers around the publish.
  *
  * Vacuum interaction: [[TxnLog.vacuum]] on a member table can expire
  * a pinned version — the pinned read then fails LOUDLY (TxnLog's
  * contract), never serves partial data. [[verifyRelease]] is the
  * metadata-only audit that catches this before a training run does:
  * retention policy on member tables must cover live releases.
  *
  * Scale shape: a catalog row is ~3 fields; publish cost is one
  * `latestVersion` log listing per member plus one manifest write —
  * independent of data size. Reads plan directly on the pinned
  * snapshot's directory list (all of TxnLog's pruning applies). */
object TxnCatalog {

  /** Pin every member table's current latest version as a new release.
    * Returns the release number. `txnId` makes retried publishes
    * no-ops (a release pipeline re-run must not mint a second
    * identical release). */
  def publish(spark: SparkSession, catalogRoot: String,
              tables: Map[String, String],
              txnId: Option[String] = None): Long = {
    require(tables.nonEmpty, "TxnCatalog.publish: no member tables")
    val pins = tables.toSeq.sortBy(_._1).map { case (name, root) =>
      val v = TxnLog.latestVersion(spark, root)
      require(v >= 0L,
        s"TxnCatalog.publish: member table '$name' at $root has no commits")
      (name, root, v)
    }
    import spark.implicits._
    TxnLog.overwrite(pins.toDF("table_name", "root", "version"),
      catalogRoot, txnId)
  }

  /** The pin rows of a release (latest release by default). */
  def pins(spark: SparkSession, catalogRoot: String,
           asOfRelease: Option[Long] = None): DataFrame =
    TxnLog.read(spark, catalogRoot, asOfRelease)
      .select("table_name", "root", "version")

  /** Read member table `tableName` at the version release
    * `asOfRelease` pinned (latest release by default) — the
    * reproducible-training read path. */
  def readTable(spark: SparkSession, catalogRoot: String, tableName: String,
                asOfRelease: Option[Long] = None): DataFrame = {
    val pin = pins(spark, catalogRoot, asOfRelease)
      .filter(col("table_name") === tableName)
      .collect() // bounded: one row per member table
    require(pin.length == 1,
      s"TxnCatalog: table '$tableName' not in release ${asOfRelease.getOrElse("latest")} " +
        s"at $catalogRoot (${pin.length} matches)")
    TxnLog.read(spark, pin(0).getString(1), Some(pin(0).getLong(2)))
  }

  /** Metadata-only audit: is every pin of the release still readable
    * (not expired by a member-table vacuum)? One row per member:
    * (table_name, version, readable 0/1). Run it before a training
    * job trusts an old release. */
  def verifyRelease(spark: SparkSession, catalogRoot: String,
                    asOfRelease: Option[Long] = None): DataFrame = {
    val rows = pins(spark, catalogRoot, asOfRelease)
      .collect() // bounded: one row per member table
      .map { r =>
        // planning the pinned read is the probe: an expired version
        // fails the version require; a swept data dir fails schema
        // resolution — both mean "this pin is gone"
        val ok =
          try { TxnLog.read(spark, r.getString(1), Some(r.getLong(2))); true }
          catch { case scala.util.control.NonFatal(_) => false }
        (r.getString(0), r.getLong(2), if (ok) 1 else 0)
      }.toSeq
    import spark.implicits._
    rows.toDF("table_name", "version", "readable")
  }
}
