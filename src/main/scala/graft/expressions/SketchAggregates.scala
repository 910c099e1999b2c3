package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types._

/** KMV (K-Minimum-Values) distinct-count sketch as a native
  * `TypedImperativeAggregate` — the engine's UDAF surface.
  *
  * The buffer is the set of the k smallest *distinct* hash values seen;
  * buffers merge by set-union-then-truncate, so partial aggregation
  * (map-side combine) works exactly like any built-in agg: each
  * partition ships at most k longs to the final merge, independent of
  * partition size. That mergeability is the whole point at 100 TB —
  * `COUNT(DISTINCT x)` shuffles every distinct value; the sketch
  * shuffles k of them per group for a (k-1)/h_k estimate with
  * ~1/sqrt(k) relative error (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002).
  *
  * The input must already be a uniform hash in [0, 2^60): callers feed
  * `conv(substring(md5(x), 1, 15), 16, 10)::long` (15 hex digits =
  * 60 bits) so the estimate — and the k minima themselves — are
  * reproducible in any engine with md5, which is what the DuckDB
  * oracle does. Output is a struct of the estimate and the sorted
  * minima (the sketch itself, so downstream unions can re-merge).
  */
case class KmvDistinctAgg(child: Expression, k: Int,
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  private val HashSpace = 1L << 60

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if k > 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct expects a long hash column (k > 1), got ($t, k=$k)")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("estimate", LongType, nullable = false),
    StructField("kmin", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // Insert-then-truncate keeps the k smallest distinct values; once
    // the buffer is full, values >= the current k-th minimum are
    // rejected without mutating (the common case on big groups).
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val mins = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { mins(i) = it.next(); i += 1 }
    val estimate =
      if (mins.length < k) mins.length.toLong // saw fewer than k distinct: exact
      else math.floor((k - 1).toDouble * HashSpace.toDouble / mins(k - 1).toDouble).toLong
    new GenericInternalRow(Array[Any](estimate, new GenericArrayData(mins)))
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinctAgg =
    copy(child = newChild)
}

/** Misra-Gries heavy-hitters sketch as a native
  * `TypedImperativeAggregate` — bounded-memory frequent-items over an
  * unbounded key domain (Misra & Gries 1982; mergeable form from
  * Agarwal et al., "Mergeable summaries", PODS 2012).
  *
  * The buffer holds at most `k` (item → counter) pairs. Update: bump an
  * existing counter, insert if there is room, else decrement ALL
  * counters (dropping zeros) — the classic frequent algorithm. Merge:
  * pointwise-sum two buffers, then subtract the (k+1)-th largest
  * counter from every entry and drop non-positives, which restores the
  * size bound while preserving the error guarantee. Each partition
  * therefore ships at most k pairs to the final merge regardless of
  * partition size — the exact `GROUP BY item ORDER BY count` it
  * replaces shuffles every distinct item.
  *
  * Guarantees (n = group row count): every item with true frequency
  * > n/(k+1) survives, and every reported counter c satisfies
  * true − n/(k+1) ≤ c ≤ true. With k ≥ the number of distinct items no
  * decrement ever fires, counters are EXACT, and the output is
  * deterministic — the regime the SQL oracle checks; the lossy regime
  * is spec-checked against the bounds.
  *
  * Output: array of struct(item, cnt), ordered (cnt desc, item asc).
  */
case class MisraGriesAgg(child: Expression, k: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a string column (k > 0), got ($t, k=$k)")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      val cur = buf.get(item)
      if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + 1L)
      else if (buf.size() < k) buf.put(item, 1L)
      else {
        // decrement-all: the one O(k) step, amortized over k inserts
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (buf.size() > k) {
      // subtract the (k+1)-th largest counter, drop non-positives
      val counts = new Array[Long](buf.size())
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - 1 - k) // (k+1)-th largest
      val es = buf.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= d) es.remove() else e.setValue(e.getValue - d)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size())
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(item), c))
    })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      bytes += 4 + it0.next().getKey.getBytes("UTF-8").length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes("UTF-8")
      bb.putInt(kb.length); bb.put(kb); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.put(new String(kb, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

/** Mutable MRL/KLL-style quantile sketch buffer: `levels(i)` holds
  * values of weight 2^i; a level reaching `k` items is compacted —
  * sorted, every other element promoted to level i+1 (weight doubles),
  * the rest dropped. The promotion offset alternates per level so
  * successive compactions cancel rank bias (deterministic, no RNG).
  * Below k items nothing compacts and the sketch is EXACT. */
final class QuantileBuffer(val k: Int) {
  import scala.collection.mutable.ArrayBuffer
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer[Double]())
  val parity: ArrayBuffer[Int] = ArrayBuffer(0)

  private def level(i: Int): ArrayBuffer[Double] = {
    while (levels.size <= i) { levels += ArrayBuffer[Double](); parity += 0 }
    levels(i)
  }

  def insert(v: Double): Unit = { level(0) += v; compactFrom(0) }

  def compactFrom(start: Int): Unit = {
    var i = start
    while (i < levels.size && levels(i).size >= k) {
      val buf = levels(i)
      val sorted = buf.toArray
      java.util.Arrays.sort(sorted)
      val o = parity(i)
      parity(i) = 1 - o
      val up = level(i + 1) // materialize BEFORE clearing (may grow `levels`)
      var j = o
      while (j < sorted.length) { up += sorted(j); j += 2 }
      buf.clear()
      i += 1
    }
  }

  def mergeIn(other: QuantileBuffer): Unit = {
    var i = 0
    while (i < other.levels.size) {
      if (other.levels(i).nonEmpty) { level(i) ++= other.levels(i); compactFrom(i) }
      i += 1
    }
  }

  /** (value, weight) pairs sorted by value. */
  def weightedSample: Array[(Double, Long)] = {
    val out = ArrayBuffer[(Double, Long)]()
    var i = 0
    while (i < levels.size) {
      val w = 1L << i
      levels(i).foreach(v => out += ((v, w)))
      i += 1
    }
    out.sortBy(_._1).toArray
  }
}

/** Mergeable quantile sketch as a native `TypedImperativeAggregate` —
  * the scale path for percentiles: Spark's exact `percentile` buffers
  * and sorts EVERY group value; this sketch caps state at
  * O(k·log(n/k)) per group and merges map-side like any built-in agg
  * (Manku-Rajagopalan-Lindsay SIGMOD'98 / Karnin-Lang-Liberty
  * FOCS'16 — public papers; deterministic alternating-offset variant,
  * no RNG, so results are reproducible run-over-run).
  *
  * Below `k` values per group nothing compacts and the sketch is the
  * full sorted sample — quantiles are EXACT (the regime the SQL
  * oracle checks); above it, rank error grows with the compaction
  * depth (spec-checked against a 10% rank bound at 150x overflow).
  *
  * Output: array<struct<v double, w bigint>> — the weighted sorted
  * sample, queryable with [[SketchAggregates.sketchQuantileDisc]].
  */
case class QuantileSketchAgg(child: Expression, k: Int,
                             override val mutableAggBufferOffset: Int = 0,
                             override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileBuffer]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType if k >= 4 && k % 2 == 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch expects (double, even k >= 4), got ($t, k=$k)")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("w", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch"

  override def createAggregationBuffer(): QuantileBuffer = new QuantileBuffer(k)

  override def update(buf: QuantileBuffer, input: InternalRow): QuantileBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QuantileBuffer, other: QuantileBuffer): QuantileBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: QuantileBuffer): Any =
    new GenericArrayData(buf.weightedSample.map { case (v, w) =>
      new GenericInternalRow(Array[Any](v, w))
    })

  override def serialize(buf: QuantileBuffer): Array[Byte] = {
    val n = buf.levels.map(_.size).sum
    val bb = ByteBuffer.allocate(4 + buf.levels.size * 8 + n * 8)
    bb.putInt(buf.levels.size)
    buf.levels.indices.foreach { i =>
      bb.putInt(buf.levels(i).size)
      bb.putInt(buf.parity(i))
      buf.levels(i).foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantileBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val nLevels = bb.getInt
    val buf = new QuantileBuffer(k)
    var i = 0
    while (i < nLevels) {
      val sz = bb.getInt
      val par = bb.getInt
      var j = 0
      val lvl = scala.collection.mutable.ArrayBuffer[Double]()
      while (j < sz) { lvl += bb.getDouble; j += 1 }
      while (buf.levels.size <= i) {
        buf.levels += scala.collection.mutable.ArrayBuffer[Double]()
        buf.parity += 0
      }
      buf.levels(i) = lvl
      buf.parity(i) = par
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

/** Count-Min frequency sketch as a native `TypedImperativeAggregate`
  * (Cormode & Muthukrishnan, "An improved data stream summary: the
  * count-min sketch and its applications", J. Algorithms 2005).
  *
  * The buffer is a fixed `depth × width` counter matrix: each input
  * increments one counter per row, at column `(h1 + j·h2) mod 2^31
  * mod width` — the Kirsch-Mitzenmacher two-hash family over the
  * item's md5 this engine already uses for MinHash, so every bucket
  * index (and therefore every counter and every point estimate) is
  * reproducible in any engine with md5. Merge is POINTWISE ADDITION —
  * the sketch is a linear projection of the frequency vector, which is
  * why per-partition partials, per-day shards, and streaming state all
  * compose exactly; each partition ships depth·width longs regardless
  * of row count where the exact `GROUP BY item` ships every distinct
  * item.
  *
  * Point estimate (see [[SketchAggregates.cmEstimate]]): min over the
  * depth rows of the item's counter — always ≥ the true count, and
  * ≤ true + 2n/width with probability 1 − 2^−depth. Deterministic
  * given the data (the hashes are fixed), so the estimates themselves
  * are oracle-checkable, not just their bounds.
  *
  * Output: the flattened row-major counter matrix (array<long> of
  * depth·width), queryable in place by [[SketchAggregates.cmEstimate]]
  * and composable by [[SketchAggregates.cmUnion]].
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  private val M = 1L << 31

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if depth >= 1 && width >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_min expects a string column (depth, width >= 1), got ($t, depth=$depth, width=$width)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** 15 hex nibbles of the digest starting at nibble `from`, as a
    * long — the same derivation as the MinHash kernel and the
    * `conv(substring(md5(x), 1|16, 15), 16, 10)` SQL form. */
  private def hex15(digest: Array[Byte], from: Int): Long = {
    var v = 0L
    var i = from
    while (i < from + 15) {
      val b = digest(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >> 4 else b & 0xf)
      i += 1
    }
    v
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val digestFn = md.get()
      digestFn.reset()
      val digest = digestFn.digest(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      val h1 = hex15(digest, 0) % M
      val h2 = hex15(digest, 15) % M
      var j = 0
      while (j < depth) {
        buf(j * width + (((h1 + j * h2) % M) % width).toInt) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(v => v: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** Dense-register HyperLogLog distinct-count sketch as a native
  * `TypedImperativeAggregate` (Flajolet et al., "HyperLogLog: the
  * analysis of a near-optimal cardinality estimation algorithm",
  * AofA 2007).
  *
  * The buffer is a fixed array of `m = 2^p` byte registers. Each
  * 60-bit md5-derived input hash splits into a p-bit bucket index
  * (top bits) and a `W = 60 − p`-bit tail; the register keeps the
  * maximum over inputs of `rho = W − floor(log2(tail))` (tail = 0 →
  * `W + 1`), i.e. 1 + the tail's leading-zero count. Merge is
  * POINTWISE MAX — per-partition partials, per-shard sketches, and
  * streaming state all compose exactly, shipping `m` bytes per group
  * regardless of row count where `COUNT(DISTINCT)` ships every value.
  *
  * The raw estimate is kept fully INTEGER so any engine reproduces it
  * bit-for-bit: with `alpha_m = 0.7213 / (1 + 1.079/m) = 7213·m /
  * (10000·m + 10790)` (the constant's own published rational form),
  * and `S = Σ_j 2^(Rmax − reg_j)` (`Rmax = W + 1`, so S is an exact
  * long ≤ m·2^Rmax),
  * `est = floor(7213 · m³ · 2^Rmax / ((10000·m + 10790) · S))`
  * — computed in BigInt here and HUGEINT in the SQL oracle, no
  * floating point anywhere. The small-range (linear-counting) branch
  * of the published estimator needs `ln`, so it lives in
  * [[SketchAggregates.hllCorrectedEstimate]] for callers that want
  * accuracy over cross-engine exactness; `n_zero` ships in the output
  * so that correction is computable from the sketch alone.
  *
  * Output: struct(est_hll, n_zero, pow_sum, regs) — the raw integer
  * estimate, the zero-register count, S, and the dense register array
  * (the sketch itself, so downstream unions can pointwise-max it).
  */
case class HllDistinctAgg(child: Expression, p: Int,
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  private val m = 1 << p
  private val W = 60 - p

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if p >= 4 && p <= 16 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_distinct expects a long hash column (4 <= p <= 16), got ($t, p=$p)")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("est_hll", LongType, nullable = false),
    StructField("n_zero", LongType, nullable = false),
    StructField("pow_sum", LongType, nullable = false),
    StructField("regs", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // 60-bit domain contract, checked per row (cheap single compare):
      // a full-64-bit hash (e.g. xxhash64) would index registers out of
      // range — fail with the contract named instead of an
      // ArrayIndexOutOfBounds deep inside an executor task
      if (h < 0L || h >= (1L << 60))
        throw new IllegalArgumentException(
          s"hll_distinct: input hash $h outside the 60-bit domain [0, 2^60) — " +
            "hash with conv(substring(md5(x),1,15),16,10) (TextFunctions.shingleHash), " +
            "not a full-64-bit hash like xxhash64")
      val j = (h >>> W).toInt // top p bits of the 60-bit hash
      val tail = h & ((1L << W) - 1)
      // rho = W - floor(log2(tail)) = leading zeros within W bits + 1
      val rho = if (tail == 0L) W + 1 else W - (63 - java.lang.Long.numberOfLeadingZeros(tail))
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val rMax = W + 1
    var nZero = 0L
    var powSum = 0L
    var i = 0
    while (i < m) {
      if (buf(i) == 0) nZero += 1
      powSum += 1L << (rMax - buf(i))
      i += 1
    }
    val est = (BigInt(7213) * m * m * m * (BigInt(1) << rMax) /
      (BigInt(10000L * m + 10790) * powSum)).toLong
    new GenericInternalRow(Array[Any](est, nZero, powSum,
      new GenericArrayData(buf.map(b => b.toInt: Any))))
  }

  // The buffer IS its wire form; clone on write because the caller may
  // keep mutating the live buffer after serialize returns.
  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinctAgg =
    copy(child = newChild)
}

object SketchAggregates {
  import org.apache.spark.sql.functions._

  /** The 60-bit md5-derived hash both engines can compute (same
    * derivation as `Sampling.hashBucket`, full 15-hex-digit value). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** KMV distinct sketch over a raw value column: hashes then
    * aggregates; returns struct(estimate, kmin). */
  def kmvDistinct(c: Column, k: Int): Column =
    ColumnInterop.column(
      KmvDistinctAgg(ColumnInterop.expression(hash60(c)), k).toAggregateExpression())

  /** Mergeable quantile sketch over a numeric column: returns the
    * weighted sorted sample array<struct(v, w)>. Exact below k values
    * per group. */
  def quantileSketch(c: Column, k: Int): Column =
    ColumnInterop.column(
      QuantileSketchAgg(ColumnInterop.expression(c.cast("double")), k)
        .toAggregateExpression())

  /** Let-binding (same trick as `TextFunctions.bound`): evaluate `e`
    * once and expose it to `f` as a lambda variable — otherwise
    * CollapseProject re-inlines the sub-expression at every use site,
    * and an aggregate-over-the-array used inside another fold's lambda
    * turns O(n) into O(n²) per row (measured: 338 s for the
    * quantile_sketch query at sf0.1 without this; 0.2 s with it). */
  private def bound(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  /** Lower discrete quantile from a stored sketch: the smallest value
    * whose cumulative weight reaches ceil(pPct% of total weight) —
    * pure array built-ins, so it runs on persisted sketch columns.
    * Matches the ceil(p·n)-th order statistic when the sketch is
    * exact. */
  def sketchQuantileDisc(sk: Column, pPct: Int): Column = {
    require(pPct >= 1 && pPct <= 100, s"pPct in [1,100], got $pPct")
    bound(sk) { s =>
      val total = aggregate(s, lit(0L), (acc, e) => acc + e.getField("w"))
      bound(floor((total * pPct + 99).cast("double") / 100).cast("long")) { target =>
        aggregate(s,
          struct(lit(0L).as("cum"), lit(null).cast("double").as("res")),
          (acc, e) => {
            val cum2 = acc.getField("cum") + e.getField("w")
            struct(cum2.as("cum"),
              coalesce(acc.getField("res"),
                when(cum2 >= target, e.getField("v"))).as("res"))
          }).getField("res")
      }
    }
  }

  /** Cutoff score for a keep-top-`keepPct`-percent policy from a
    * stored sketch: the value at ascending rank
    * `total − ceil(total·keepPct/100) + 1` — i.e. the SMALLEST score
    * the rank-based top-pct cut would keep, so `score >= cutoff`
    * reproduces [[graft.operators.Robust.calibratedTopPct]]'s keep
    * set exactly when scores are distinct (ties at the cutoff all
    * survive — a score threshold cannot split equal values). Same
    * weighted-sample fold as [[sketchQuantileDisc]], different target
    * rank. */
  def sketchTopPctCutoff(sk: Column, keepPct: Int): Column = {
    require(keepPct >= 1 && keepPct <= 100, s"keepPct in [1,100], got $keepPct")
    bound(sk) { s =>
      val total = aggregate(s, lit(0L), (acc, e) => acc + e.getField("w"))
      val keepN = floor((total * keepPct + 99).cast("double") / 100).cast("long")
      bound(total - keepN + 1) { target =>
        aggregate(s,
          struct(lit(0L).as("cum"), lit(null).cast("double").as("res")),
          (acc, e) => {
            val cum2 = acc.getField("cum") + e.getField("w")
            struct(cum2.as("cum"),
              coalesce(acc.getField("res"),
                when(cum2 >= target, e.getField("v"))).as("res"))
          }).getField("res")
      }
    }
  }

  /** Misra-Gries heavy-hitters sketch over a string column: returns
    * array<struct(item, cnt)> ordered (cnt desc, item asc). Exact when
    * k >= #distinct; otherwise counters are within n/(k+1) below true
    * frequency and no item above that threshold is missed. */
  def misraGries(c: Column, k: Int): Column =
    ColumnInterop.column(
      MisraGriesAgg(ColumnInterop.expression(c), k).toAggregateExpression())

  /** Sketch algebra — union of two STORED Misra-Gries arrays: counters
    * sum pointwise; if more than k items survive, the (k+1)-th largest
    * counter is subtracted from all and non-positives drop — the same
    * reduction [[MisraGriesAgg.merge]] applies, so stored per-shard /
    * per-day sketches compose without touching raw data, with the same
    * n/(k+1) undercount guarantee. Pure array built-ins (arrays are
    * ≤ 2k entries, so the quadratic item-matching is O(k²) on tiny k). */
  def mgUnion(a: Column, b: Column, k: Int): Column = {
    require(k > 0, s"k must be positive, got $k")
    val combined = concat(a, b)
    val items = array_distinct(transform(combined, e => e.getField("item")))
    val summed = transform(items, i => struct(
      i.as("item"),
      aggregate(filter(combined, e => e.getField("item") === i),
        lit(0L), (acc, e) => acc + e.getField("cnt")).as("cnt")))
    val sorted = array_sort(summed, (l, r) =>
      when(l.getField("cnt") > r.getField("cnt"), -1)
        .when(l.getField("cnt") < r.getField("cnt"), 1)
        .when(l.getField("item") < r.getField("item"), -1)
        .when(l.getField("item") > r.getField("item"), 1)
        .otherwise(0))
    when(size(sorted) <= k, sorted).otherwise {
      val d = element_at(sorted, k + 1).getField("cnt")
      slice(filter(transform(sorted, e => struct(
        e.getField("item").as("item"),
        (e.getField("cnt") - d).as("cnt"))),
        e => e.getField("cnt") > 0), 1, k)
    }
  }

  private val HashSpaceD = (1L << 60).toDouble

  private def estimateOf(kmin: Column, k: Int): Column =
    when(size(kmin) < k, size(kmin).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * HashSpaceD) /
        element_at(kmin, k).cast("double")).cast("long"))

  /** Sketch algebra — union: the k smallest distinct hashes of the
    * combined minima ARE the KMV sketch of A ∪ B, so two sketches
    * built independently (different tables, different days) combine
    * without touching the raw data. Pure array built-ins: usable on
    * stored sketch columns. */
  def kmvUnion(a: Column, b: Column, k: Int): Column = {
    val m = slice(array_sort(array_distinct(
      concat(a.getField("kmin"), b.getField("kmin")))), 1, k)
    struct(estimateOf(m, k).as("estimate"), m.as("kmin"))
  }

  /** Sketch algebra — overlap (Beyer et al., SIGMOD 2007): among the
    * union sketch's values, the fraction present in BOTH input
    * sketches estimates Jaccard(A, B); scaled by the union estimate it
    * gives |A ∩ B|. The audience-overlap primitive: intersecting
    * billion-row ID sets at the cost of 2k longs. Returns
    * struct(jaccard, intersection_est, union_est). */
  def kmvOverlap(a: Column, b: Column, k: Int): Column = {
    val u = kmvUnion(a, b, k)
    val uk = u.getField("kmin")
    val inBoth = size(filter(uk, v =>
      array_contains(a.getField("kmin"), v) && array_contains(b.getField("kmin"), v)))
    val j = when(size(uk) === 0, lit(0.0))
      .otherwise(inBoth.cast("double") / size(uk).cast("double"))
    val uEst = u.getField("estimate")
    struct(j.as("jaccard"),
      floor(j * uEst.cast("double")).cast("long").as("intersection_est"),
      uEst.as("union_est"))
  }

  /** Count-Min frequency sketch over a string column: returns the
    * flattened row-major depth×width counter matrix. */
  def countMin(c: Column, depth: Int, width: Int): Column =
    ColumnInterop.column(
      CountMinAgg(ColumnInterop.expression(c.cast("string")), depth, width)
        .toAggregateExpression())

  /** The (h1, h2) md5 halves the CMS buckets derive from — the same
    * 31-bit Kirsch-Mitzenmacher family as MinHash, SQL-expressible. */
  private def cmHash(item: Column, fromHex: Int): Column =
    conv(substring(md5(item.cast("string")), fromHex, 15), 16, 10)
      .cast("long") % (1L << 31)

  /** Point estimate from a STORED Count-Min sketch: min over the depth
    * rows of the item's counter. Always ≥ the item's true count;
    * within 2n/width of it w.p. 1 − 2^−depth. Pure array built-ins, so
    * it runs against persisted sketch columns, and — because the
    * hashes are fixed md5 derivations — the estimate is deterministic
    * and reproducible in any engine. */
  def cmEstimate(sketch: Column, item: Column, depth: Int, width: Int): Column =
    bound(cmHash(item, 1)) { h1 =>
      bound(cmHash(item, 16)) { h2 =>
        array_min(transform(sequence(lit(0), lit(depth - 1)), j =>
          element_at(sketch,
            (j * width + ((h1 + j * h2) % (1L << 31)) % width + 1).cast("int"))))
      }
    }

  /** Sketch algebra — union: the CMS is a linear projection of the
    * frequency vector, so pointwise addition of two stored sketches IS
    * the sketch of the combined data — exactly, not approximately. */
  def cmUnion(a: Column, b: Column): Column = zip_with(a, b, _ + _)

  /** Sketch algebra — equi-join SIZE estimate from two stored CMS
    * sketches over the join keys (Cormode & Muthukrishnan, "An
    * improved data stream summary: the count-min sketch and its
    * applications", J. Algorithms 2005, §4.2): the true join size is
    * the inner product of the two frequency vectors, and each CMS row
    * overestimates it by hash collisions only — so `min` over the
    * depth rows of `Σ_b a[j][b]·b[j][b]` is an upper bound within
    * εN₁N₂ w.p. 1 − 2^−depth. The planner question this answers at
    * 100 TB: how many rows will this join emit — broadcast, shuffle,
    * or rethink? — for the price of two single-row aggregates, never
    * running the join. Same-column sketches give the self-join size
    * (the F₂ moment), i.e. the skew-blowup forecast for a
    * shuffle-heavy self-join. Deterministic (fixed md5 derivations),
    * so the estimate replays exactly cross-engine. */
  def cmJoinSize(a: Column, b: Column, depth: Int, width: Int): Column = {
    val prod = zip_with(a, b, _ * _)
    array_min(array((0 until depth).map(j =>
      aggregate(slice(prod, j * width + 1, width), lit(0L), _ + _)): _*))
  }

  /** HyperLogLog distinct sketch over a raw value column: hashes to
    * the shared 60-bit md5 space, then aggregates into `2^p` dense
    * registers; returns struct(est_hll, n_zero, pow_sum, regs). */
  def hllDistinct(c: Column, p: Int): Column =
    ColumnInterop.column(
      HllDistinctAgg(ColumnInterop.expression(hash60(c)), p).toAggregateExpression())

  /** Sketch algebra — union of two STORED HLL register arrays:
    * pointwise max IS the sketch of the combined data, exactly —
    * registers only ever record the max rho seen, so order and
    * grouping of merges cannot matter. Pure array built-ins; returns
    * the same struct shape as [[hllDistinct]] minus the raw estimate
    * (recompute it from `regs`/`pow_sum` where needed — the integer
    * division needs 128-bit arithmetic, which Spark expressions lack).
    */
  def hllUnion(a: Column, b: Column, p: Int): Column = {
    val rMax = 60 - p + 1
    bound(zip_with(a, b, (x, y) => greatest(x, y))) { regs =>
      struct(
        size(filter(regs, _ === 0)).cast("long").as("n_zero"),
        aggregate(regs, lit(0L),
          // 2^(rMax − reg) via double pow: exponent ≤ 57, a pure power
          // of two — exactly representable, exact in any IEEE engine
          (acc, r) => acc + pow(lit(2.0), lit(rMax) - r).cast("long")).as("pow_sum"),
        regs.as("regs"))
    }
  }

  /** The published two-branch HLL estimator, small-range correction
    * included: linear counting `m·ln(m/V)` when the raw estimate is
    * ≤ 5m/2 and zero registers remain, else the raw bias-corrected
    * estimate. Needs `ln`, so this is the ACCURACY surface (spec-
    * checked); the oracle-exact integer surface is the aggregate's own
    * `est_hll`. */
  def hllCorrectedEstimate(sketch: Column, p: Int): Column = {
    val m = 1 << p
    val raw = sketch.getField("est_hll")
    val v = sketch.getField("n_zero")
    when(raw <= lit(5L * m / 2) && v > 0,
      floor(lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double"))).cast("long"))
      .otherwise(raw)
  }
}
