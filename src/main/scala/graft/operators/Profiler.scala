package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column stats in ONE aggregate pass, emitted
  * long-format (column, n_rows, n_nulls, n_distinct, min_value,
  * max_value — values stringified so heterogeneous column types share
  * a schema). The wide→long pivot happens on the single aggregate
  * output row, so profiling cost is one scan regardless of column
  * count.
  */
object Profiler {

  /** EXACT pairwise covariance/variance profiling in ONE pass — the
    * relationship half of [[profile]]: which measures move together
    * (feature redundancy before training, drift in joint structure,
    * the do-these-columns-encode-the-same-thing check). Metrics are
    * caller-scaled integer expressions (document the units!); every
    * moment (Σx, Σx², Σxy) accumulates in decimal — order-free,
    * engine-portable — and the report rows derive on the driver from
    * the ONE collected aggregate row in exact BigInt arithmetic:
    * `cov_n = (n·Σxy − Σx·Σy) div n` (n × covariance — stays in a
    * long wherever n·max|x|·max|y| does; the caller's unit scaling is
    * what keeps that true at 100 TB), `var_n*` the same per column.
    * The sign of `cov_n` is the correlation's direction; consumers
    * wanting Pearson r divide by the root of the variance product in
    * whatever precision they like — the EXACT integers are the
    * portable part.
    *
    * Scale shape: one scan, one aggregate row (k + k + k(k−1)/2
    * decimal sums for k metrics), one one-row collect. NULLs in any
    * metric drop the row (complete-case, stated in the row count). */
  def covarianceReport(df: DataFrame,
                       metrics: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(metrics.size >= 2, s"covarianceReport: need >= 2 metrics, got ${metrics.size}")
    require(metrics.map(_._1).distinct.size == metrics.size,
      "covarianceReport: metric names must be unique")
    val spark = df.sparkSession
    import spark.implicits._
    val names = metrics.map(_._1)
    val proj = df.select(metrics.map { case (n, c) =>
        c.cast("long").as(s"__m_$n") }: _*)
      .na.drop() // complete-case: a NULL anywhere drops the row
    val pairs = for {
      i <- names.indices; j <- (i + 1) until names.size
    } yield (names(i), names(j))
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val aggs = Seq(count(lit(1)).as("__n")) ++
      names.map(n => sum(d(col(s"__m_$n"))).as(s"__s_$n")) ++
      names.map(n => sum(d(col(s"__m_$n")) * d(col(s"__m_$n"))).as(s"__q_$n")) ++
      pairs.map { case (a, b) =>
        sum(d(col(s"__m_$a")) * d(col(s"__m_$b"))).as(s"__p_${a}_$b") }
    val row = proj.agg(aggs.head, aggs.tail: _*).head // ONE row
    val n = BigInt(row.getAs[Long]("__n"))
    require(n > 0, "covarianceReport: no complete rows")
    // a decimal(38,0) sum that overflows returns SQL NULL under
    // non-ANSI modes — surface that as the actionable message it is,
    // never a bare NPE from the driver-side BigInt conversion
    def dec(f: String) = {
      val v = row.getAs[java.math.BigDecimal](f)
      require(v != null,
        s"covarianceReport: moment $f overflowed decimal(38,0) — " +
          "metric units too large; rescale the metric expressions")
      BigInt(v.toBigInteger)
    }
    def fdiv(s: BigInt, m: BigInt) = (s - (((s % m) + m) % m)) / m
    // the report columns are Longs by contract — an exact value that
    // no longer fits must FAIL, not silently truncate
    def longExact(v: BigInt, what: String): Long = {
      require(v.isValidLong,
        s"covarianceReport: $what = $v exceeds Long range — " +
          "metric units too large; rescale the metric expressions")
      v.toLong
    }
    def varN(c: String) = fdiv(n * dec(s"__q_$c") - dec(s"__s_$c") * dec(s"__s_$c"), n)
    pairs.map { case (a, b) =>
      (a, b, n.toLong,
        longExact(fdiv(n * dec(s"__p_${a}_$b") - dec(s"__s_$a") * dec(s"__s_$b"), n),
          s"cov_n($a,$b)"),
        longExact(varN(a), s"var_n($a)"), longExact(varN(b), s"var_n($b)"))
    }.toDF("col_x", "col_y", "n", "cov_n", "var_nx", "var_ny")
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      one.select(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    stacked.reduce(_ unionAll _)
  }

  /** Corpus snapshot drift: per-source document/token mass of two
    * corpus versions side by side, with each version's token SHARE in
    * integer millionths and the absolute share delta — the per-source
    * terms of the total-variation distance (TV = Σ|share_a−share_b|/2,
    * left to the reader so every emitted value stays an exact
    * integer). The ops signal for "did this crawl/filter change shift
    * the source mix" before a new snapshot ships to training.
    * Sources present in only one snapshot report zeros on the other —
    * appearing/disappearing domains are exactly what drift review is
    * for.
    *
    * Scale shape: one hash aggregate per snapshot on (source) —
    * partial-aggregated, text reduced to a token count inside the
    * scan projection, never shuffled; a source-width full-outer join;
    * totals ride a one-row broadcast. Cost is O(distinct sources)
    * past the scans. */
  def corpusDrift(a: DataFrame, b: DataFrame, sourceCol: String = "source",
                  textCol: String = "text"): DataFrame = {
    def stats(df: DataFrame, s: String) =
      df.groupBy(col(sourceCol).as("source"))
        .agg(count(lit(1)).as(s"docs_$s"),
          sum(graft.functions.TextFunctions.wsTokenCount(col(textCol)))
            .as(s"tokens_$s"))
    val j = stats(a, "a").join(stats(b, "b"), Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("docs_a"), lit(0L)).as("docs_a"),
        coalesce(col("docs_b"), lit(0L)).as("docs_b"),
        coalesce(col("tokens_a"), lit(0L)).as("tokens_a"),
        coalesce(col("tokens_b"), lit(0L)).as("tokens_b"))
    val tot = j.agg(sum(col("tokens_a")).as("__ta"), sum(col("tokens_b")).as("__tb"))
    j.crossJoin(broadcast(tot))
      .withColumn("share_a_fp",
        when(col("__ta") > 0, expr("(1000000 * tokens_a) div __ta")).otherwise(0L))
      .withColumn("share_b_fp",
        when(col("__tb") > 0, expr("(1000000 * tokens_b) div __tb")).otherwise(0L))
      .withColumn("share_delta_fp", abs(col("share_a_fp") - col("share_b_fp")))
      .drop("__ta", "__tb")
  }

  /** Skew advisor — the monitoring→ACTION half of the skew report,
    * mirroring `TxnLog.compactAdvice` / `IvfIndex.rebuildAdvice`: for
    * each candidate shuffle key, decide whether a join/agg keyed on it
    * needs salting at `partitions`-way parallelism, and recommend the
    * salt factor. A key is skewed when its heaviest value alone
    * overfills a partition by more than `slack`× the ideal rows per
    * partition (`ceil(n_rows / partitions)`); the recommended salt is
    * `ceil(top_n / ideal)` — the sub-split count that brings the hot
    * key back to ideal-sized units. All integer ceil/floor arithmetic
    * (ceil(a/b) = (a + b − 1) div b), so the advice replays exactly.
    *
    * Scale shape: per audited column, one map-side-combinable count
    * agg and a one-row top-key reduce — the same cost as reading the
    * skew report; nothing driver-side beyond the advice row. Returns
    * one row per key column: (key_col, n_rows, n_keys, top_n,
    * ideal_rows, skewed, salt_factor, reason). */
  def skewAdvice(df: DataFrame, keyCols: Seq[String], partitions: Int,
                 slack: Long = 2L): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(partitions > 0 && slack >= 1,
      s"need partitions > 0 and slack >= 1, got $partitions, $slack")
    keyCols.map { kc =>
      df.groupBy(col(kc)).agg(count(lit(1)).as("__n"))
        // coalesce: an EMPTY input must advise "balanced, salt 1" with
        // zero counts, not a row of NULL aggregates
        .agg(coalesce(sum(col("__n")).cast("long"), lit(0L)).as("n_rows"),
          count(lit(1)).as("n_keys"),
          coalesce(max(col("__n")), lit(0L)).as("top_n"))
        .select(lit(kc).as("key_col"), col("n_rows"), col("n_keys"), col("top_n"),
          expr(s"(n_rows + $partitions - 1) div $partitions").as("ideal_rows"))
        .withColumn("skewed", col("top_n") > lit(slack) * col("ideal_rows"))
        .withColumn("salt_factor",
          when(col("skewed"),
            expr("(top_n + ideal_rows - 1) div ideal_rows")).otherwise(1L))
        .withColumn("reason",
          when(col("skewed"),
            concat(lit("top "), col("top_n"), lit(s" > $slack x ideal "),
              col("ideal_rows")))
            .otherwise(lit("balanced")))
    }.reduce(_.unionByName(_))
  }
}
