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
    * fpp degrades gracefully rather than the driver OOMing. */
  val MaxBits: Long = 128L << 20

  private def optimalBits(expectedItems: Long, fpp: Double): Long = {
    val m = math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    math.min(math.max(m, 64L), MaxBits)
  }

  /** One-pass build: aggregate the build side's join key into a bloom
    * filter, returned as its serialized bytes (a few MB — the same
    * payload Spark's runtime filter ships in a scalar subquery). */
  def buildFilter(build: DataFrame, key: Column,
                  expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val hashed = ColumnInterop.expression(xxhash64(key))
    val agg = new BloomFilterAggregate(hashed,
      Literal(expectedItems), Literal(optimalBits(expectedItems, fpp)))
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

  /** Bloom-pre-filtered equi-join: build a bloom over `build`'s key,
    * drop probe rows that cannot match map-side, then run the exact
    * join. Result is identical to `probe.join(build, ...)`; the bloom
    * only changes *where* non-matching rows die. */
  def join(probe: DataFrame, build: DataFrame,
           probeKey: String, buildKey: String,
           expectedItems: Long, fpp: Double = 0.01,
           joinType: String = "inner"): DataFrame = {
    val bloom = buildFilter(build, col(buildKey), expectedItems, fpp)
    prefilter(probe, col(probeKey), bloom)
      .join(build, col(probeKey) === col(buildKey), joinType)
  }
}
