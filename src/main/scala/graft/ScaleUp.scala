package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× expansion of a testdata scale-factor directory —
  * the derived scaling decade the local benchmark needs above the
  * largest driver-generated SF (sf0.1). Each fact/doc table is the
  * union of `factor` id-offset copies (every key column shifted by
  * `copy · OFFSET`, so referential integrity holds within a copy and
  * copies never collide); the fixed dims (region, nation) are copied
  * unchanged, matching how real data grows — facts multiply, the
  * nation list does not. Non-key content (text, prices, dates,
  * embeddings) repeats verbatim: group COUNTS stay put while rows per
  * group grow ~N×, which is the load shape a 10× bigger corpus puts
  * on aggregates and joins.
  *
  * Built ONCE per source snapshot through [[graft.sources.LayoutCache]]
  * (content-fingerprinted, atomically published, cross-JVM), so the
  * expansion cost is a metered layout build, not a per-run tax.
  *
  * Representativeness: right for aggregates, joins, windows, scans —
  * the watchlist the sf1 decade times. NOT right for near-dup/minhash
  * measurements: expanded documents are exact copies, so LSH candidate
  * pairs grow quadratically within each copy group, which real 10×
  * growth (new text) would not do — keep text-dedup operators off the
  * expanded decade. */
object ScaleUp {

  /** Key shift per copy — far above any real id in the expanded range
    * (sf1 keys top out in the low millions), far below long overflow
    * at factor ≤ 10^6. */
  val Offset: Long = 1000000000L

  /** Key columns shifted per copy; empty = fixed dim (copied once). */
  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq.empty,
    "nation" -> Seq.empty,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Ensure the expanded directory exists and return its path; tables
    * land as `<table>.parquet` directories, so every `Tables.*` reader
    * works against it unchanged. */
  def ensure(spark: SparkSession, srcDir: String, factor: Int = 10): String =
    ensureImpl(spark, srcDir, factor, perturbText = false)

  /** [[ensure]] with PERTURBED document text — the expansion the
    * text-dedup watch queries need: copy k > 0 tags every token of
    * `documents.text` with `~k`, so the token-window hashes that
    * substring/minhash dedup operate on are distinct ACROSS copies
    * while each copy's INTERNAL duplicate structure repeats verbatim.
    * Total duplicate mass then grows ~N× — the shape of real corpus
    * growth (new text, same boilerplate rate) — instead of the
    * quadratic cross-copy collision blow-up exact copies produce
    * (the representativeness caveat in this object's Scaladoc).
    * Token counts and document lengths are preserved; token strings
    * grow by two characters. All other tables expand exactly as
    * [[ensure]] does. */
  def ensureText(spark: SparkSession, srcDir: String, factor: Int = 10): String =
    ensureImpl(spark, srcDir, factor, perturbText = true)

  private def ensureImpl(spark: SparkSession, srcDir: String, factor: Int,
                         perturbText: Boolean): String = {
    require(factor >= 2, s"need factor >= 2, got $factor")
    val tables = keyCols.keys.toSeq.sorted
    val files = tables.map(t => new java.io.File(srcDir, s"$t.parquet"))
    require(files.forall(_.exists()), s"missing source tables under $srcDir")
    val fp = graft.sources.LayoutCache.contentFingerprint(files)
    // v1: bump when the expansion semantics (offsets, key columns) change
    val scope = if (perturbText) s"graft_scaleup_text_v1_x$factor"
                else s"graft_scaleup_v1_x$factor"
    graft.sources.LayoutCache.ensure(scope,
      new java.io.File(srcDir).getName, fp) { tmp =>
      tables.foreach { t =>
        val src = spark.read.parquet(s"$srcDir/$t.parquet")
        val out =
          if (perturbText && t == "documents")
            expandPerturbText(src, keyCols(t), factor)
          else expand(src, keyCols(t), factor)
        out.write.parquet(s"$tmp/$t.parquet")
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(tmp, "_SUCCESS"), "")
      ()
    }
  }

  private[graft] def expand(src: DataFrame, keys: Seq[String],
                            factor: Int): DataFrame =
    if (keys.isEmpty) src
    else (0 until factor).map { k =>
      keys.foldLeft(src)((df, c) => df.withColumn(c, col(c) + k * Offset))
    }.reduce(_ unionAll _)

  /** [[expand]] for the documents table with per-copy token tagging
    * (copy 0 stays verbatim, so the expansion contains the original
    * corpus unchanged). */
  private[graft] def expandPerturbText(src: DataFrame, keys: Seq[String],
                                       factor: Int): DataFrame =
    (0 until factor).map { k =>
      val shifted =
        keys.foldLeft(src)((df, c) => df.withColumn(c, col(c) + k * Offset))
      if (k == 0) shifted
      else shifted.withColumn("text",
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"~$k"))), " "))
    }.reduce(_ unionAll _)
}
