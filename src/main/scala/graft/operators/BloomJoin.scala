package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-filtered join — the explicit form of Spark's
  * runtime row-level filtering (`InjectRuntimeFilter`), for joins the
  * optimizer can't infer one for (build side behind a non-trivial
  * subplan, probe side behind a union, disabled AQE, etc.).
  *
  * At 100 TB the win is shuffle volume: a selective build side means
  * most probe rows are dropped at the scan/map side — BEFORE the
  * exchange — instead of travelling through the shuffle only to miss
  * in the join. The bloom is a few MB of bits for millions of keys
  * (~9.6 bits/key at 1% fpp), the same order as a broadcast-join hash
  * relation for a *small* table, but it works when the build side is
  * too big to broadcast as rows yet small enough to summarize as bits.
  *
  * The filter is false-positive-only, so the exact join afterwards
  * returns byte-identical results to the unfiltered join — which is
  * exactly what the DuckDB oracle checks.
  *
  * Uses Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions (codegen'd, xxhash64-keyed) rather than a reimplemented
  * sketch; the aggregate's partial buffers OR-merge across partitions,
  * so the build is one pass, no extra shuffle beyond a 1-row final
  * merge.
  */
object BloomJoin {

  /** Max bits we'll ever allocate (16 MiB of filter). Past this the
    * fpp degrades gracefully rather than the driver OOMing. The
    * effective cap is the min of this and the session's runtime-bloom
    * limits, so the aggregate never exceeds what Spark's own runtime
    * filtering would allocate. */
  val MaxBits: Long = 128L << 20

  private def confLong(df: DataFrame, key: String, default: Long): Long =
    try df.sparkSession.conf.get(key).toLong
    catch { case scala.util.control.NonFatal(_) => default }

  private def optimalBits(expectedItems: Long, fpp: Double, cap: Long): Long = {
    val m = math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    math.min(math.max(m, 64L), cap)
  }

  /** One-pass build: aggregate the build side's join key into a bloom
    * filter, returned as its serialized bytes (a few MB — the same
    * payload Spark's runtime filter ships in a scalar subquery).
    * `expectedItems`/bits are clamped to the session's
    * `runtime.bloomFilter.maxNumItems`/`maxNumBits`, so an oversized
    * estimate degrades the fpp instead of over-allocating. */
  def buildFilter(build: DataFrame, key: Column,
                  expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bitsCap = math.min(MaxBits,
      confLong(build, "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L))
    val itemsCap =
      confLong(build, "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L)
    val items = math.min(math.max(expectedItems, 1L), itemsCap)
    val hashed = ColumnInterop.expression(xxhash64(key))
    val agg = new BloomFilterAggregate(hashed,
      Literal(items), Literal(optimalBits(items, fpp, bitsCap)))
    val row = build.agg(ColumnInterop.column(agg.toAggregateExpression())).head()
    if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
  }

  /** Probe-side pre-filter: `might_contain(bloom, xxhash64(key))`.
    * Codegen'd predicate, evaluated at the scan — upstream of any
    * exchange the subsequent join plans. */
  def prefilter(probe: DataFrame, key: Column, bloomBytes: Array[Byte]): DataFrame = {
    if (bloomBytes.isEmpty) return probe.filter(lit(false))
    val pred = BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      ColumnInterop.expression(xxhash64(key)))
    probe.filter(ColumnInterop.column(pred))
  }

  /** Join types for which dropping non-matching PROBE (left) rows
    * before the join is result-preserving: probe rows only surface
    * through a match. Left/full outer preserve unmatched probe rows
    * and left_anti preserves exactly the non-matching ones, so for
    * those the prefilter would silently delete output rows. */
  private val prefilterSafe = Set(
    "inner", "cross", "leftsemi", "left_semi", "semi",
    "right", "rightouter", "right_outer")

  /** Bloom-pre-filtered equi-join: build a bloom over `build`'s key,
    * drop probe rows that cannot match map-side, then run the exact
    * join. Result is identical to `probe.join(build, ...)` for EVERY
    * join type: the prefilter only runs where it is result-preserving
    * (inner / cross / left_semi / right_outer — see [[prefilterSafe]]);
    * probe-preserving types (left/full outer, left_anti) fall through
    * to the plain join rather than silently dropping their preserved
    * rows. */
  def join(probe: DataFrame, build: DataFrame,
           probeKey: String, buildKey: String,
           expectedItems: Long, fpp: Double = 0.01,
           joinType: String = "inner"): DataFrame = {
    val normalized = joinType.toLowerCase(java.util.Locale.ROOT).replace(" ", "")
    val left =
      if (prefilterSafe(normalized))
        prefilter(probe, col(probeKey), buildFilter(build, col(buildKey), expectedItems, fpp))
      else probe
    left.join(build, col(probeKey) === col(buildKey), joinType)
  }
}
