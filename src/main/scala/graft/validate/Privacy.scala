package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy audits over quasi-identifiers — the release-gate checks a
  * dataset must pass before leaving the curation pipeline (the
  * population side of what [[graft.clean.Clean]]/mask_pii's
  * pseudonymization does per value):
  *
  *  - **k-anonymity**: every combination of quasi-identifier values
  *    must be shared by ≥ k rows, or the combination re-identifies
  *    its members. [[kAnonymityGroups]] returns each violating
  *    equivalence class with its size; [[kAnonymityReport]] is the
  *    one-row release gate (violating classes, exposed rows, exposed
  *    fraction in exact basis points, worst class size).
  *  - **l-diversity** of a sensitive column within each class: a
  *    class where every member shares the sensitive value leaks it
  *    even at k members. Reported as classes with < l distinct
  *    sensitive values.
  *
  * Scale shape: one hash-aggregate keyed by the QI tuple — the same
  * shuffle any GROUP BY pays; the report is a second aggregate over
  * class sizes only (narrow). No row data leaves the executors; the
  * report row is O(1). */
object Privacy {

  /** Equivalence classes (QI-value combinations) with fewer than
    * `k` members: (qi columns..., class_size). */
  def kAnonymityGroups(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** One-row release gate: total rows, classes, violating classes,
    * exposed rows (members of violating classes), exposed share in
    * exact basis points (integer floor — engine-portable), and the
    * smallest class size observed. */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .agg(
        // coalesce: an EMPTY dataset must gate as vacuously anonymous
        // (0 rows, 0 violations), not as a row of NULL aggregates
        coalesce(sum(col("class_size")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("class_size") < k, 1L).otherwise(0L)), lit(0L))
          .as("violating_classes"),
        coalesce(sum(when(col("class_size") < k, col("class_size")).otherwise(0L)),
          lit(0L)).as("exposed_rows"),
        coalesce(min(col("class_size")), lit(0L)).as("min_class_size"))
      .select(col("n_rows"), col("n_classes"), col("violating_classes"),
        col("exposed_rows"),
        // integral division of non-negative longs: floor == trunc on
        // every engine, so the gate value replays exactly; greatest
        // guards the empty-input denominator only
        expr("(exposed_rows * 10000) div greatest(n_rows, 1)").as("exposed_bps"),
        col("min_class_size"),
        (col("violating_classes") === 0).as("k_anonymous"))
  }

  /** t-closeness audit (Li, Li, Venkatasubramanian 2007) — the
    * distribution-level leak k-anonymity and l-diversity both miss: a
    * class can be large AND diverse yet still reveal that its members'
    * sensitive values skew far from the population. For an ORDERED
    * sensitive attribute pre-binned into `binCol`, the distance is the
    * Earth Mover's Distance with adjacent-bin ground distance, which
    * collapses to mean absolute prefix-sum difference — and that is
    * exactly computable in integers: per (class, bin),
    * prefix(c_j·N − g_j·n_c) accumulates the scaled CDF gap, so
    * emd_millionths = Σ|prefix| · 10^6 div ((m−1)·n_c·N) replays
    * bit-for-bit in any engine. Every class is reported with its
    * distance and a pass flag (a release gate wants the census, not
    * just violators — and the worst classes rank by the distance).
    *
    * Scale shape: two hash-aggs (class×bin, global bins) — the same
    * shuffles any GROUP BY pays; the global bin list broadcasts; the
    * prefix window is per class over ≤ m bin rows, never over data
    * rows. Count products stay under 2^63 for n_c·N ≤ 9·10^18 — at
    * larger populations move the prefix arithmetic to DECIMAL. */
  def tCloseness(df: DataFrame, qiCols: Seq[String], binCol: String,
                 tMillionths: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tMillionths > 0, s"need tMillionths > 0, got $tMillionths")
    val qi = qiCols.map(col)
    val cb = df.groupBy((qiCols :+ binCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val g = df.groupBy(col(binCol)).agg(count(lit(1)).as("__g"))
    val tot = df.agg(count(lit(1)).as("__nt"),
      countDistinct(col(binCol)).as("__m"))
    val cls = cb.groupBy(qi: _*).agg(sum(col("__c")).as("__nc"))
    // dense class×bin grid: absent bins must still contribute their
    // zero count to every later prefix position
    val dense = cls.crossJoin(broadcast(g))
      .join(cb, qiCols :+ binCol, "left")
      .na.fill(0L, Seq("__c"))
      .crossJoin(broadcast(tot))
    val w = Window.partitionBy(qi: _*).orderBy(col(binCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense
      .withColumn("__pre",
        sum(col("__c") * col("__nt") - col("__g") * col("__nc")).over(w))
      .groupBy(qi: _*)
      .agg(max(col("__nc")).as("class_size"),
        sum(abs(col("__pre"))).as("__sabs"),
        max(col("__m")).as("__mm"), max(col("__nt")).as("__ntt"))
      .select(qi :+ col("class_size") :+
        expr("(__sabs * 1000000L) div (greatest(__mm - 1, 1) * class_size * __ntt)")
          .as("emd_millionths"): _*)
      .withColumn("t_close", col("emd_millionths") < tMillionths)
  }

  /** Classes (of ≥1 rows) whose sensitive column takes fewer than `l`
    * distinct values: (qi columns..., class_size, sensitive_distinct).
    * A class passing k-anonymity can still leak the sensitive value
    * when every member shares it. */
  /** Seeded ε-differentially-private count release (Laplace
    * mechanism, sensitivity 1 — Dwork et al., "Calibrating Noise to
    * Sensitivity in Private Data Analysis", TCC 2006): per-group
    * counts released with additive Laplace(1/ε) noise, the step past
    * this tier's k-anonymity / l-diversity / t-closeness gates that
    * syntactic privacy cannot reach. Deterministic the house way so
    * the release is REPRODUCIBLE and oracle-exact: the noise is a
    * pure function of (seed, group) — an md5-derived uniform bucket
    * maps through a literal inverse-CDF table of the Laplace
    * distribution in integer micro-units (the JL-plane literal
    * discipline; `nBuckets` quantiles at bucket midpoints, mirrored
    * so the table is exactly symmetric and unbiased). One caveat is
    * inherent to seeding: re-releasing the SAME group under the SAME
    * seed spends no fresh ε (identical noise), while a new seed is a
    * new ε-budget draw — the composition accounting is the caller's.
    *
    * Output: (group, noisy_count_micro, epsilon_micro) — the true
    * count never leaves. Scale shape: one count shuffle on the group
    * key, then a map-side literal-array lookup; no window, no second
    * exchange, group cardinality never collected. */
  def dpCounts(df: DataFrame, groupCol: String, epsMicro: Long,
               seed: String = "dp", nBuckets: Int = 512): DataFrame = {
    require(epsMicro > 0, s"need epsilon > 0 micro-units, got $epsMicro")
    require(nBuckets >= 2 && nBuckets % 2 == 0,
      s"need an even bucket count >= 2, got $nBuckets")
    val lut = laplaceLutMicro(epsMicro, nBuckets)
    val bucket = (conv(substring(md5(concat(
        coalesce(col(groupCol).cast("string"), lit("")), lit(seed))), 1, 15), 16, 10)
      .cast("long") % nBuckets).cast("int")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        (col("__n") * 1000000L +
          element_at(typedLit(lut), bucket + 1)).as("noisy_count_micro"),
        lit(epsMicro).as("epsilon_micro"))
  }

  /** Seeded ε-DP SUM release (bounded-sum Laplace mechanism): each
    * row's value is CLAMPED to [0, capMicro] micro-units — clamping
    * is what bounds one individual's influence, making the query's
    * sensitivity exactly `cap` — and the per-group clamped sum is
    * released with Laplace(cap/ε) noise from the same seeded LUT
    * discipline as [[dpCounts]]. The cap is a real modeling choice
    * (too low biases, too high drowns in noise) so it rides in the
    * report row. Output: (group, noisy_sum_micro, epsilon_micro,
    * cap_micro). Same scale shape and seeding caveat as
    * [[dpCounts]]. */
  def dpSum(df: DataFrame, groupCol: String, valueCol: String,
            capMicro: Long, epsMicro: Long, seed: String = "dp-sum",
            nBuckets: Int = 512): DataFrame = {
    require(capMicro > 0, s"need cap > 0 micro-units, got $capMicro")
    require(epsMicro > 0, s"need epsilon > 0 micro-units, got $epsMicro")
    require(nBuckets >= 2 && nBuckets % 2 == 0,
      s"need an even bucket count >= 2, got $nBuckets")
    val lut = laplaceLutMicro(epsMicro, nBuckets, sensMicro = capMicro)
    val bucket = (conv(substring(md5(concat(
        coalesce(col(groupCol).cast("string"), lit("")), lit(seed))), 1, 15), 16, 10)
      .cast("long") % nBuckets).cast("int")
    val clamped = greatest(lit(0L), least(lit(capMicro),
      round(col(valueCol).cast("double") * 1000000.0).cast("long")))
    df.groupBy(col(groupCol))
      .agg(sum(clamped).as("__s"))
      .select(col(groupCol),
        (col("__s") + element_at(typedLit(lut), bucket + 1)).as("noisy_sum_micro"),
        lit(epsMicro).as("epsilon_micro"),
        lit(capMicro).as("cap_micro"))
  }

  /** Inverse-CDF table of Laplace(b = sensitivity/ε) at the
    * `nBuckets` bucket midpoints, in integer micro-units: entry i is
    * the noise for uniform draw u = (i + 0.5) / nBuckets
    * (sensitivity defaults to 1 — the counting-query table). The
    * upper half mirrors the lower with exact negation (never
    * `round(-x)`, whose half-up tie rule would bias the table), so
    * the LUT sums to exactly zero. Exposed for the oracle, which
    * inlines the SAME literals. */
  def laplaceLutMicro(epsMicro: Long, nBuckets: Int,
                      sensMicro: Long = 1000000L): Seq[Long] = {
    val b = sensMicro.toDouble / epsMicro.toDouble
    val lower = (0 until nBuckets / 2).map { i =>
      val u = (i + 0.5) / nBuckets
      math.round(b * math.log(2.0 * u) * 1e6)
    }
    lower ++ lower.reverse.map(x => -x)
  }

  def lDiversityGroups(df: DataFrame, qiCols: Seq[String],
                       sensitiveCol: String, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l-diversity needs l >= 2, got $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("sensitive_distinct"))
      .filter(col("sensitive_distinct") < l)
  }
}
