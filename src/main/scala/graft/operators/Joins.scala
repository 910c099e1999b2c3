package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-in set. */
object Joins {

  /** Skew-salted equi-join: spreads each hot left-side key across
    * `saltFactor` partitions by deriving a deterministic per-row salt
    * from `tieCol` (a unique row id — NOT the join key, whose salt
    * would be constant per key and spread nothing), and replicating
    * every right row once per salt value. Joining on (key, salt) then
    * lands each left row in exactly one of the `saltFactor` buckets of
    * its key, so one degenerate key (the null-island zone, the empty
    * document hash, the bot user) costs 1/saltFactor of a partition
    * instead of one straggler task holding the whole stage hostage.
    *
    * Result-identical to `left.join(right, key, joinType)`: each left
    * row carries exactly one salt, each (key, salt) finds the one
    * replicated right row — inner and left joins both preserve their
    * semantics (an unmatched left row fails in its one bucket → one
    * null row, as unsalted).
    *
    * Cost: the right side shuffles saltFactor× its size — use when the
    * right side is too big to broadcast (else `broadcast()` wins) and
    * |R|·saltFactor ≪ the hot key's row count. AQE's skew-join split
    * handles moderate skew for free; this is for the extreme single-key
    * case AQE can't split (one key > one partition AFTER splitting, or
    * disabled AQE). `joinType` ∈ inner | left. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 tieCol: String, saltFactor: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, s"need saltFactor >= 1, got $saltFactor")
    require(Seq("inner", "left").contains(joinType),
      s"saltedJoin supports inner|left, got $joinType")
    val l = left.withColumn("__salt", pmod(hash(col(tieCol)), lit(saltFactor)))
    val r = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit(_)): _*)))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** As-of (point-in-time) LEFT join: for each left row, attach the
    * latest right-side payload with `right.ts <= left.ts` on the same
    * key; null when no earlier right row exists.
    *
    * `maxStaleness` bounds how far back the match may reach — the
    * pandas `merge_asof(tolerance = …)` contract a feature-serving
    * join needs (a quote from last quarter must not price today's
    * trade): a carried payload older than `left.ts − maxStaleness`
    * answers NULL instead. Pass an interval expression for timestamp
    * keys (`expr("INTERVAL 48 HOURS")`) or a numeric literal for
    * numeric ones; the bound is inclusive.
    *
    * Implementation is the scalable union + ordered window carry — NOT
    * a range join: tag right rows to sort before left rows at equal
    * timestamps, union the two sides, and carry
    * `last(payload, ignoreNulls)` forward within each key ordered by
    * (ts, tag). One shuffle by key + one partition-local sort; no
    * per-row range probe, no candidate-pair blowup, and skew follows
    * ordinary key salting rules (staleness is a post-carry filter —
    * zero extra movement). Right side should be unique per
    * (key, ts) — pre-aggregate if not — so the "latest" row is
    * well-defined.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, payloadCols: Seq[String],
               maxStaleness: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    require(payloadCols.forall(right.columns.contains), "payload missing from right")

    // Align schemas: left rows carry null payload slots, right rows
    // carry null left-only slots. The payload travels as ONE struct
    // that is non-null for every right row (even when its fields are
    // null), so the ignoreNulls carry always picks the LATEST right
    // row atomically — a genuinely-null payload value propagates, and
    // multiple payload columns can never stitch across rows. The
    // right row's own ts rides inside the struct so the staleness
    // test reads the MATCHED row's age, not a reconstruction.
    val leftOnly = leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
    val payloadStruct = struct(
      (payloadCols.map(col) :+ col(tsCol).as("__ts")): _*)
    val rightTagged = right.select(
      (keyCols.map(col) :+ col(tsCol)) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payloadStruct.as("__p") :+ lit(0).as("__side"): _*)
    val payloadType = rightTagged.schema("__p").dataType
    val leftTagged = left.select(
      (keyCols.map(col) :+ col(tsCol)) ++
        leftOnly.map(col) :+
        lit(null).cast(payloadType).as("__p") :+
        lit(1).as("__side"): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightTagged.unionByName(leftTagged)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    val fresh = maxStaleness match {
      case None => col("__p")
      case Some(tol) =>
        when(col("__p.__ts") >= col(tsCol) - tol, col("__p"))
    }
    carried.filter(col("__side") === 1)
      .withColumn("__p", fresh)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__p.$c").as(c)): _*)
  }

  /** Bucketized range join: pairs every point row with every interval
    * row whose `[lo, hi]` contains its `value`. Spark's native plan
    * for a BETWEEN join predicate is a broadcast-nested-loop (or
    * cartesian) — every point probes every interval. This rewrites it
    * as an EQUI-join on a bucket id: points land in the single
    * `floor(value / bucketWidth)` bucket; intervals replicate into
    * each bucket they span. A matching pair meets in exactly the one
    * bucket holding the point, so no post-join dedup is needed; the
    * residual `BETWEEN` filter discards same-bucket non-matches.
    *
    * Scale: shuffle is hash-partitioned by bucket (narrow rows), and
    * interval replication factor is span/bucketWidth — pick
    * `bucketWidth` near the typical interval width so replication
    * stays O(1). Degenerate wide intervals replicate proportionally
    * (cap them upstream or pre-split). */
  /** Interval-overlap join without a nested loop: two interval tables
    * are joined on [lo, hi] OVERLAP (half-closed inequality pair
    * `a.lo <= b.hi AND b.lo <= a.hi`) by exploding each interval onto
    * fixed-width buckets and equi-joining on the bucket id — a
    * shuffle-hash/broadcast join Catalyst can plan, instead of the
    * BroadcastNestedLoopJoin a raw inequality join degenerates to.
    *
    * A pair overlapping several buckets would match once per shared
    * bucket; rather than a `distinct()` (extra wide shuffle), each pair
    * is emitted ONLY in the bucket containing `greatest(a.lo, b.lo)` —
    * the overlap's left edge, which both sides share — so output is
    * exactly-once by construction.
    *
    * `bucketWidth` tunes the explode factor vs bucket selectivity:
    * ~the median interval length is a good default. */
  def intervalJoin(a: DataFrame, b: DataFrame,
                   aLo: String, aHi: String, bLo: String, bHi: String,
                   bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketed(df: DataFrame, lo: String, hi: String) = df
      .filter(col(lo) <= col(hi))
      .withColumn("__b", explode(sequence(
        floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    bucketed(a, aLo, aHi).join(bucketed(b, bLo, bHi), Seq("__b"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__b") ===
        floor(greatest(col(aLo), col(bLo)) / bucketWidth).cast("long"))
      .drop("__b")
  }

  /** [[intervalJoin]] with the bucket width chosen FROM THE DATA: the
    * median interval length of both sides, estimated by the mergeable
    * quantile sketch and folded in as a one-row broadcast — width
    * tuning without a driver-side action or a magic constant. The
    * width rides the plan as a Column, so `floor(lo / width)` works
    * exactly as with a literal. */
  def intervalJoinAuto(a: DataFrame, b: DataFrame,
                       aLo: String, aHi: String,
                       bLo: String, bHi: String): DataFrame = {
    import graft.expressions.SketchAggregates
    val lens = a.select((col(aHi) - col(aLo)).cast("double").as("__len"))
      .union(b.select((col(bHi) - col(bLo)).cast("double").as("__len")))
    val w = lens
      .agg(SketchAggregates.quantileSketch(col("__len"), 4096).as("__sk"))
      .select(greatest(SketchAggregates.sketchQuantileDisc(col("__sk"), 50),
        lit(1.0)).as("__w"))
    def bucketed(df: DataFrame, lo: String, hi: String) = df
      .crossJoin(broadcast(w))
      .filter(col(lo) <= col(hi))
      .withColumn("__b", explode(sequence(
        floor(col(lo) / col("__w")).cast("long"),
        floor(col(hi) / col("__w")).cast("long"))))
    bucketed(a, aLo, aHi).join(bucketed(b, bLo, bHi).drop("__w"), Seq("__b"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__b") ===
        floor(greatest(col(aLo), col(bLo)) / col("__w")).cast("long"))
      .drop("__b", "__w")
  }

  def rangeJoin(points: DataFrame, intervals: DataFrame,
                valueCol: String, loCol: String, hiCol: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__b",
      floor(col(valueCol) / bucketWidth).cast("long"))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__b", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, Seq("__b"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__b")
  }
}
