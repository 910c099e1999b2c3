package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Exact

/** Regular-grid time-series operators: gap-filling resample with
  * forward fill, and SCD Type 2 interval construction — the two
  * "shape time into rows" primitives warehouse and feature pipelines
  * need beyond as-of/range joins and sessionization.
  *
  * Scale shape, both operators: everything is keyed by the series /
  * dimension key, so there is exactly ONE shuffle (hash by key) and
  * all windows run inside it with narrow columns; the dense grid is
  * generated per key with `sequence` (span/step rows per key,
  * distributed — never a driver-side calendar table).
  */
object TimeSeries {

  /** Resample events onto a regular `unit` grid (one row per key per
    * bucket from the key's first to last bucket), with exact bucket
    * sums, event counts, a gap flag for empty buckets, and the
    * last-observation-carried-forward sum.
    *
    * `unit` is a calendar unit accepted by `date_trunc` / `interval`
    * ("minute", "hour", "day"). The value aggregate goes through
    * [[Exact.dsum]] (integer-cents) so the doubles are bit-identical
    * in any engine.
    */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, unit: String = "hour"): DataFrame = {
    val base = df
      .groupBy(col(keyCol),
        date_trunc(unit, col(tsCol)).cast("timestamp_ntz").as("bucket"))
      .agg(Exact.dsum(col(valueCol)).as("bucket_sum"),
        count(lit(1)).as("n_events"))
    val grid = base.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"),
          expr(s"interval 1 $unit"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(base, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("bucket_sum").isNull.as("gap"),
        last(col("bucket_sum"), ignoreNulls = true).over(w).as("filled_sum"))
  }

  /** Rolling trailing-window aggregate: for every event, the exact sum
    * and count of the key's events in `(ts − window, ts]`-style closed
    * trailing range `[ts − windowMicros, ts]`.
    *
    * The frame is a RANGE frame over integer epoch **micros** — not a
    * ROWS frame (which would be order-dependent among equal
    * timestamps) and not a `cast(ts as long)` frame (which truncates
    * sub-second parts and silently widens the window). Equal-micros
    * rows are frame peers in every engine, so the result is
    * deterministic without a tiebreaker. The rolling sum goes through
    * integer cents ([[Exact]] discipline) so the double is
    * bit-identical cross-engine.
    *
    * Scale shape: one hash shuffle by key, then a partition-local sort
    * + a sliding two-pointer frame per key — no self-join, no
    * per-row range probe, memory O(active window) per key. */
  def rollingAgg(df: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, windowMicros: Long): DataFrame = {
    require(windowMicros >= 0, s"need windowMicros >= 0, got $windowMicros")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ts_us"))
      .rangeBetween(-windowMicros, Window.currentRow)
    df.withColumn("__ts_us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("rolling_sum",
        sum(round(col(valueCol) * 100).cast("long")).over(w) / 100.0)
      .withColumn("rolling_n", count(lit(1)).over(w))
      .drop("__ts_us")
  }

  /** Gap detection: one row per consecutive same-key event pair whose
    * spacing exceeds `minGapMicros` — the monitoring primitive for
    * "did the feed stop?" (sensor dropout, ingestion stalls, silent
    * upstream failures).
    *
    * Ordering is (epoch micros, tieCol) so equal-timestamp rows have a
    * deterministic predecessor. Emits (key, prev_tie, tie, gap_us).
    * One shuffle by key; narrow columns only. */
  def gaps(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           minGapMicros: Long): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts_us"), col(tieCol))
    df.withColumn("__ts_us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__prev_us", lag(col("__ts_us"), 1).over(wOrd))
      .withColumn("__prev_tie", lag(col(tieCol), 1).over(wOrd))
      .filter(col("__ts_us") - col("__prev_us") > minGapMicros)
      .select(col(keyCol), col("__prev_tie").as("prev_" + tieCol),
        col(tieCol), (col("__ts_us") - col("__prev_us")).as("gap_us"))
  }

  /** One-sided CUSUM change-point detection (Page 1954) per key — the
    * classic drift alarm for a metric stream: the statistic
    * S_i = max(0, S_{i−1} + (x_i − ref)) accumulates excess over the
    * reference level and resets on deficit; an alarm fires where
    * S_i ≥ threshold. Everything is integer (the caller passes a
    * scaled-integer value column, e.g. cents), so alarms are
    * bit-identical across engines.
    *
    * The recurrence looks inherently sequential, but it has a closed
    * prefix form: with P_i the running sum of (x_i − ref) and P_0 = 0,
    * S_i = P_i − min(0, min_{j≤i} P_j). Two cumulative windows over
    * the SAME (key, ts, tie) ordering — one shuffle by key, no
    * iteration, no driver state — replace the loop; this is what makes
    * CUSUM runnable over 100 TB of events as a plain window query.
    * Equal timestamps are ordered by `tieCol` for a deterministic
    * prefix. Returns the alarm rows only:
    * (key, tie, cusum), cusum ≥ threshold. */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
            valueCents: Column, refCents: Long,
            thresholdCents: Long): DataFrame = {
    require(thresholdCents > 0, s"need thresholdCents > 0, got $thresholdCents")
    val wCum = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol), col(tsCol), col(tieCol),
        (valueCents - refCents).as("__d"))
      .withColumn("__p", sum(col("__d")).over(wCum))
      .withColumn("__cusum",
        col("__p") - least(lit(0L), min(col("__p")).over(wCum)))
      .filter(col("__cusum") >= thresholdCents)
      .select(col(keyCol), col(tieCol), col("__cusum").as("cusum"))
  }

  /** Per-key rate limiting / quota admission — the ingestion-shaping
    * primitive (API quotas, per-user crawl budgets, abuse throttles)
    * as a deterministic batch operator: within each (key, tumbling
    * event-time window) the first `maxPerWindow` events in (ts, tie)
    * order are admitted, the rest dropped. Returns every input row
    * tagged with `window_start` and `admitted` 0/1 — the caller
    * filters or audits (a quota decision you can't audit is a quota
    * dispute you can't settle).
    *
    * Scale shape: ONE shuffle by key, a per-(key, window) rank window
    * inside it — never an unpartitioned window; the tie column makes
    * equal timestamps deterministic. `truncUnit` is a `date_trunc`
    * unit so the window boundary is replayable in any engine. The
    * streaming twin is
    * [[graft.streaming.StatefulRateLimit.rateLimitStream]] — same
    * admission law, two-long state per key. */
  def rateLimit(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                maxPerWindow: Int, truncUnit: String = "day"): DataFrame = {
    require(maxPerWindow >= 1, s"need maxPerWindow >= 1, got $maxPerWindow")
    val win = date_trunc(truncUnit, col(tsCol)).cast("timestamp_ntz")
    val w = Window.partitionBy(col(keyCol), col("window_start"))
      .orderBy(col(tsCol), col(tieCol))
    df.withColumn("window_start", win)
      .withColumn("admitted",
        when(row_number().over(w) <= maxPerWindow, lit(1)).otherwise(lit(0)))
  }

  /** Backfill planner — which date ranges are MISSING from a table:
    * the partition-audit every scheduled pipeline needs before a
    * backfill run ("days 3/10/17 never landed; re-run exactly those").
    * Present days collapse to islands via the date-minus-rank
    * gaps-and-islands trick; each gap between consecutive islands is
    * one output row (gap_start, gap_end, n_days_missing). Days before
    * the first or after the last observation are not reported — the
    * table cannot know its own intended range; pass bounds by unioning
    * sentinel dates if the schedule knows them.
    *
    * Scale shape: the data-sized work is one map-side-combinable
    * DISTINCT over the date column; the windows after it run over one
    * row per distinct DAY, then one row per island (the
    * watermark-audit discipline: unpartitioned windows only over
    * metadata-scale frames). */
  def missingRanges(df: DataFrame, dateCol: String): DataFrame = {
    val w = Window.orderBy(col("__day"))
    val islands = df.select(col(dateCol).cast("date").as("__day"))
      .filter(col("__day").isNotNull).distinct()
      .withColumn("__rn", row_number().over(w))
      .withColumn("__grp", expr("date_sub(__day, __rn)"))
      .groupBy(col("__grp"))
      .agg(min(col("__day")).as("island_start"), max(col("__day")).as("island_end"))
    val w2 = Window.orderBy(col("island_start"))
    islands
      .withColumn("__next_start", lead(col("island_start"), 1).over(w2))
      .filter(col("__next_start").isNotNull)
      .select(expr("date_add(island_end, 1)").as("gap_start"),
        expr("date_sub(__next_start, 1)").as("gap_end"),
        (datediff(col("__next_start"), col("island_end")) - 1)
          .cast("long").as("n_days_missing"))
  }

  /** Longest streak per key — gaps-and-islands: the maximal run of
    * CONSECUTIVE events (in (ts, tie) order) satisfying `cond`, the
    * "how long did the anomaly persist" complement of [[cusum]]'s
    * "when did it start". Islands form from the row-number difference
    * (rank among all events − rank among matching events is constant
    * exactly within a consecutive matching run); per-island length and
    * endpoints aggregate in one pass, and the per-key winner is a
    * struct-max argmax ordered (length, earliest start) — longer wins,
    * ties go to the earliest streak, fully deterministic.
    *
    * Scale shape: two windows over the SAME (key, ts, tie) ordering —
    * one shuffle by key — then two narrow hash-aggs; no iteration, no
    * rank window over anything wider than (key, island). Returns
    * (key, streak_len, start_<tie>, end_<tie>) for keys with ≥1
    * matching event. */
  def streaks(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
              cond: Column): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts_us"), col(tieCol))
    val hits = df
      .withColumn("__ts_us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__rn", row_number().over(wOrd))
      .filter(cond)
      .withColumn("__rh", row_number().over(wOrd))
      .withColumn("__grp", col("__rn") - col("__rh"))
    val islands = hits.groupBy(col(keyCol), col("__grp")).agg(
      count(lit(1)).as("__len"),
      min(struct(col("__ts_us"), col(tieCol))).as("__s"),
      max(struct(col("__ts_us"), col(tieCol))).as("__e"))
    // argmax by (len, earliest start): starts are distinct within a
    // key, so the first three struct fields order totally; the end tie
    // rides along for extraction
    islands.groupBy(col(keyCol)).agg(
        max(struct(col("__len"),
          (-col("__s.__ts_us")).as("__nts"),
          (-col(s"__s.$tieCol")).as("__ntie"),
          col(s"__e.$tieCol").as("__etie"))).as("__m"))
      .select(col(keyCol), col("__m.__len").as("streak_len"),
        (-col("__m.__ntie")).as(s"start_$tieCol"),
        col("__m.__etie").as(s"end_$tieCol"))
  }

  /** SCD Type 2 from a change log: collapse consecutive identical
    * states per key, then emit one validity interval per state run —
    * (key, state, valid_from, valid_to, is_current), half-open
    * [valid_from, valid_to), NULL valid_to on the current row.
    *
    * `tieCol` breaks equal-timestamp ordering deterministically.
    * Two windows over the same (key) partitioning = one shuffle. */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           stateCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changes = df
      .select(col(keyCol), col(tsCol), col(tieCol), col(stateCol))
      .withColumn("__prev", lag(col(stateCol), 1).over(wOrd))
      .withColumn("__rn", row_number().over(wOrd))
      // state runs: keep the first row of each run. The partition
      // start is detected by row number, NOT by `__prev IS NULL` —
      // a NULL *state* also makes lag() null, and must still collapse
      // into runs (null-safe <=> comparison)
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(stateCol)))
      .drop("__rn")
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(wOrd))
      .select(col(keyCol), col(stateCol),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Sentinel for "no earlier event": far below any real epoch-micros
    * value yet far enough from Long.MinValue that `sentinel − delay`
    * cannot underflow under ANSI arithmetic (vectorized eval computes
    * both AND arms — a guard alone does not prevent the overflow). */
  private val NoPriorTs = -4000000000000000000L

  /** Watermark-lateness audit — the event-time tuning report for a
    * streaming deployment: replay the log in arrival order
    * (`arrivalCol` ascending — the ingest sequence) and compute, for
    * each event, the idealized watermark in force ON ARRIVAL (max
    * event time seen strictly earlier, minus `delayMicros`); report
    * per event-time hour how many events that watermark would drop as
    * late, in exact counts and bps. Spark's production watermark
    * advances per micro-batch, so the per-event advance here is the
    * CONSERVATIVE bound: an event late under it can be late under some
    * batching of the same stream — the right side to tune
    * `withWatermark` delay from.
    *
    * Scale shape: a single global running max would serialize a
    * 100 TB sort into one task, so the prefix max is TWO-PHASE:
    * arrival ids shard by range (`shardWidth`), the within-shard
    * exclusive running max is a window PARTITIONED by shard, and each
    * shard's carry-in comes from a cumulative max over the per-shard
    * maxima — the only unpartitioned window runs over that frame,
    * bounded by rows/shardWidth (one narrow row per shard), never by
    * rows; AQE broadcasts it back. */
  def watermarkAudit(df: DataFrame, delayMicros: Long,
                     tsCol: String = "ts", arrivalCol: String = "event_id",
                     shardWidth: Long = 1L << 20): DataFrame = {
    require(delayMicros >= 0 && shardWidth > 0,
      s"need delayMicros >= 0 and shardWidth > 0, got $delayMicros, $shardWidth")
    val base = df.select(col(arrivalCol).cast("long").as("__a"),
        unix_micros(col(tsCol).cast("timestamp")).as("__t"))
      .filter(col("__a").isNotNull && col("__t").isNotNull)
      .withColumn("__s", expr(s"__a div $shardWidth"))
    val inShard = Window.partitionBy(col("__s")).orderBy(col("__a"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("__pm_in", max(col("__t")).over(inShard))
    val carryW = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val shardCarry = base.groupBy(col("__s")).agg(max(col("__t")).as("__sm"))
      .withColumn("__pm_carry", max(col("__sm")).over(carryW))
      .select(col("__s"), col("__pm_carry"))
    local.join(shardCarry, Seq("__s"))
      .withColumn("__pm", greatest(
        coalesce(col("__pm_in"), lit(NoPriorTs)),
        coalesce(col("__pm_carry"), lit(NoPriorTs))))
      .withColumn("__late", ((col("__pm") > NoPriorTs) &&
        (col("__t") < col("__pm") - delayMicros)).cast("long"))
      .groupBy(expr("__t div 3600000000").as("__h"))
      .agg(count(lit(1)).as("n_events"), sum(col("__late")).as("n_late"))
      .select((col("__h") * 3600000000L).as("window_start_us"),
        col("n_events"), col("n_late"),
        expr("(n_late * 10000) div greatest(n_events, 1)").as("late_bps"))
  }
}
