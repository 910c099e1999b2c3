package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The LAST MILE of a curation pipeline: export a packed corpus as
  * deterministic training shards with a verifiable manifest.
  *
  * Trainers consume shards, not tables — what they need from the
  * engine is (a) one file per shard, (b) a DETERMINISTIC row order
  * inside each shard so epoch N of a re-export is byte-identical
  * training input, and (c) a manifest that lets the training job
  * verify what it read without trusting the filesystem listing.
  *
  *  - Each shard is written by exactly one task
  *    (`repartition(shardCol)` by exact shard id →
  *    `sortWithinPartitions(orderCols)`), so file count == shard
  *    count and in-file order is the declared order, not task
  *    scheduling.
  *  - The manifest records per shard: row count, payload token count,
  *    and a CONTENT fingerprint — an order-independent aggregate
  *    (sum + xor of per-row 64-bit hashes over ALL exported columns)
  *    that any engine can recompute from the rows themselves;
  *    parquet bytes are not comparable across writer versions, rows
  *    are.
  *  - The manifest is committed ATOMICALLY after the data
  *    (create-exclusive write, [[TxnLog]]'s commit-point discipline):
  *    readers that require the manifest can never observe
  *    data-without-manifest as complete, and a crashed export leaves
  *    no manifest — re-export overwrites cleanly.
  *
  * [[verify]] recomputes the fingerprints from the written files and
  * compares — the post-copy/post-transfer integrity check. */
object TrainingExport {

  final case class ShardStat(shard: Int, rows: Long, tokens: Long,
                             hashSum: Long, hashXor: Long)

  /** Per-shard row/token/fingerprint stats of `df` — the same
    * aggregate exporters write and verifiers recompute, so the two
    * can never drift. Hash input is every column in NAME-SORTED order
    * (`partitionBy` moves the shard column to the end of the
    * read-back schema, so positional order would differ between
    * writer and verifier). Two folds: a sum of 31-bit hash residues
    * (catches multiplicity changes xor misses; overflow-free for up
    * to 2^32 rows/shard) and a bit_xor of the full 64-bit hashes
    * (catches pair swaps a sum misses). */
  private def shardStats(df: DataFrame, shardCol: String,
                         tokenCol: String): DataFrame = {
    // An EMPTY export (a filter pipeline can legitimately pass nothing
    // on a given day) writes no partition directories, so the
    // read-back frame has no shard column at all — restore it as a
    // typed null so the stats aggregate yields the empty frame the
    // manifest/verify contract expects, instead of failing resolution.
    val withShard =
      if (df.columns.contains(shardCol)) df
      else df.withColumn(shardCol, lit(null).cast("int"))
    val canonical = withShard.columns.sorted.map(c => s"`$c`").mkString(", ")
    withShard.groupBy(col(shardCol).cast("int").as("shard"))
      .agg(count(lit(1)).as("rows"),
        sum(col(tokenCol)).cast("long").as("tokens"),
        sum(expr(s"pmod(xxhash64($canonical), 2147483648)")).cast("long")
          .as("hashSum"),
        expr(s"bit_xor(xxhash64($canonical))").as("hashXor"))
  }

  /** Export `df` as one parquet data file per `shardCol` value
    * (Hive layout `shard=N/`), rows ordered by `orderCols` within
    * each shard, then atomically commit `_manifest.json`. All rows of
    * a shard hash to one task and `partitionBy` gives each shard its
    * own file within that task, so file count == shard count and
    * in-file order is the declared sort — not task scheduling.
    * Returns the per-shard stats written. */
  def export(df: DataFrame, path: String, shardCol: String,
             tokenCol: String, orderCols: Seq[String]): Seq[ShardStat] =
    exportAs(df, path, shardCol, tokenCol, orderCols, "parquet")

  /** JSONL twin of [[export]]: one `.json` (JSON Lines) text file per
    * shard — the format trainers most commonly stream — under the same
    * discipline: deterministic in-shard order, manifest recomputed
    * from the WRITTEN files, create-exclusive commit point. JSON
    * round-trips integral/boolean/string columns exactly (the training
    * payload case: ids, token counts, text); floating-point columns
    * round-trip at JSON text precision, so fingerprints over them are
    * only stable for values that print exactly. Spark's JSON writer
    * omits null fields; the explicit read-back schema restores them as
    * nulls, so the fingerprint is unaffected. */
  def exportJsonl(df: DataFrame, path: String, shardCol: String,
                  tokenCol: String, orderCols: Seq[String]): Seq[ShardStat] =
    exportAs(df, path, shardCol, tokenCol, orderCols, "json")

  private def exportAs(df: DataFrame, path: String, shardCol: String,
                       tokenCol: String, orderCols: Seq[String],
                       format: String): Seq[ShardStat] = {
    require(orderCols.nonEmpty, "need a deterministic in-shard order")
    val spark = df.sparkSession
    val nShards = df.select(shardCol).distinct().count().toInt
    df.repartition(math.max(nShards, 1), col(shardCol))
      .sortWithinPartitions((shardCol +: orderCols).map(col): _*)
      .write.mode("overwrite").partitionBy(shardCol).format(format).save(path)
    // the manifest certifies what is ON DISK, so its stats are
    // recomputed from the written files — a separate pre-write
    // evaluation of a non-deterministic `df` (or one whose source
    // mutated between the two jobs) would fingerprint rows that were
    // never written, and verify() would report phantom tampering
    val stats = collectStats(
      shardStats(readBack(spark, path, df, shardCol, format), shardCol, tokenCol))
    writeManifest(spark, path, stats)
    stats
  }

  /** Written files, read with the WRITER's data schema pinned: JSON
    * inference would widen/narrow types and break fingerprint parity,
    * and an EMPTY export (legitimate: a filter pipeline passed
    * nothing) leaves parquet nothing to infer a schema from — pinning
    * makes both formats read the empty snapshot as an empty frame. */
  private def readBack(spark: SparkSession, path: String, like: DataFrame,
                       shardCol: String, format: String): DataFrame = {
    val dataSchema = org.apache.spark.sql.types.StructType(
      like.schema.fields.filterNot(_.name == shardCol))
    spark.read.schema(dataSchema).format(format).load(path)
  }

  private def writeManifest(spark: SparkSession, path: String,
                            stats: Seq[ShardStat]): Unit = {
    val manifest = stats.sortBy(_.shard).map { s =>
      s"""{"shard":${s.shard},"rows":${s.rows},"tokens":${s.tokens},"hash_sum":${s.hashSum},"hash_xor":${s.hashXor}}"""
    }.mkString("[\n", ",\n", "\n]")
    // create-exclusive AFTER the data: the manifest IS the commit point
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mPath = new org.apache.hadoop.fs.Path(path, "_manifest.json")
    fs.delete(mPath, false)
    val out = fs.create(mPath, false)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  /** Recompute the per-shard fingerprints from the written files and
    * diff against the manifest. Returns mismatching shards (empty =
    * intact). The verifier reads ONLY data columns — it never trusts
    * file names or sizes. */
  def verify(spark: SparkSession, path: String, shardCol: String,
             tokenCol: String): Seq[String] =
    (try Some(spark.read.parquet(path))
     catch {
       // an EMPTY export has no parquet footers to infer from; its
       // recomputed stats are vacuously empty and the manifest must
       // agree (UNABLE_TO_INFER_SCHEMA, not a missing directory —
       // readManifest still requires the commit point)
       case _: org.apache.spark.sql.AnalysisException => None
     }) match {
      case Some(written) =>
        verifyAgainst(written, spark, path, shardCol, tokenCol)
      case None =>
        readManifest(spark, path).keySet.toSeq.sorted
          .map(s => s"shard $s: in manifest but no rows on disk")
    }

  /** JSONL twin of [[verify]]: the caller supplies the data schema the
    * export declared (a verifier pins types; it never lets the on-disk
    * text infer its own). */
  def verifyJsonl(spark: SparkSession, path: String,
                  dataSchema: org.apache.spark.sql.types.StructType,
                  shardCol: String, tokenCol: String): Seq[String] =
    verifyAgainst(spark.read.schema(dataSchema).json(path),
      spark, path, shardCol, tokenCol)

  private def verifyAgainst(written: DataFrame, spark: SparkSession,
                            path: String, shardCol: String,
                            tokenCol: String): Seq[String] = {
    val got = collectStats(shardStats(written, shardCol, tokenCol))
      .map(s => s.shard -> s).toMap
    val manifest = readManifest(spark, path)
    val missing = manifest.keySet.diff(got.keySet).toSeq.sorted
      .map(s => s"shard $s: in manifest but no rows on disk")
    val extra = got.keySet.diff(manifest.keySet).toSeq.sorted
      .map(s => s"shard $s: on disk but not in manifest")
    val diff = manifest.toSeq.sortBy(_._1).flatMap { case (id, want) =>
      got.get(id).toSeq.flatMap { g =>
        if (g == want) Seq.empty
        else Seq(s"shard $id: manifest $want != recomputed $g")
      }
    }
    missing ++ extra ++ diff
  }

  private def collectStats(statsDf: DataFrame): Seq[ShardStat] =
    statsDf.collect().toIndexedSeq.map { r =>
      ShardStat(r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }

  private def readManifest(spark: SparkSession, path: String): Map[Int, ShardStat] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mPath = new org.apache.hadoop.fs.Path(path, "_manifest.json")
    require(fs.exists(mPath), s"no _manifest.json under $path — export incomplete")
    val in = fs.open(mPath)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    // flat, engine-written JSON: parse with Spark's bundled Jackson
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(text)
    import scala.jdk.CollectionConverters._
    root.elements().asScala.map { n =>
      val s = ShardStat(n.get("shard").asInt(), n.get("rows").asLong(),
        n.get("tokens").asLong(), n.get("hash_sum").asLong(), n.get("hash_xor").asLong())
      s.shard -> s
    }.toMap
  }
}
