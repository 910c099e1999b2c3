package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality engine — replaces the reference's Great
  * Expectations suite (reference: data_validation/gx/expectations/
  * validate_trip_data.json:5-92) with a single-pass conditional-count
  * aggregate: all rules evaluate in ONE scan of the table regardless of
  * rule count (A4/F5 in SURVEY.md §2), so cost is one job at any scale.
  */
object Expectations {

  sealed trait Expectation {
    def name: String
    /** Violation count as an aggregate expression (evaluated in the
      * shared single-pass `report` aggregate). */
    def agg: Column
  }

  /** Per-row rules: a boolean violation predicate summed up. */
  sealed trait RowRule extends Expectation {
    /** true ⇔ the row violates the rule. */
    def violation: Column
    final def agg: Column = sum(when(violation, 1L).otherwise(0L))
  }

  /** expect_column_values_to_not_be_null. */
  final case class NotNull(column: String) extends RowRule {
    val name = s"not_null_$column"
    def violation: Column = col(column).isNull
  }

  /** expect_column_values_to_be_between — GX ignores nulls for range
    * rules, so null is not a violation here (NotNull covers it). */
  final case class Between(column: String, lo: Double, hi: Double) extends RowRule {
    val name = s"between_$column"
    def violation: Column =
      col(column).isNotNull && (col(column) < lo || col(column) > hi)
  }

  /** expect_column_values_to_be_in_set / dbt accepted_values. Nulls
    * are not violations (NotNull covers them). */
  final case class InSet(column: String, values: Seq[String]) extends RowRule {
    val name = s"in_set_$column"
    def violation: Column =
      col(column).isNotNull && !col(column).isin(values: _*)
  }

  /** expect_column_values_to_match_regex (keep patterns to the common
    * RE2-compatible subset so any oracle engine agrees). */
  final case class MatchesRegex(column: String, pattern: String) extends RowRule {
    val name = s"regex_$column"
    def violation: Column =
      col(column).isNotNull && !col(column).rlike(pattern)
  }

  /** dbt `unique` schema test. Violations = duplicate extras: the count
    * of fully-non-null key tuples minus the count of distinct tuples —
    * still one aggregate, no second scan. */
  final case class Unique(columns: Seq[String]) extends Expectation {
    val name = s"unique_${columns.mkString("_")}"
    def agg: Column = {
      val allNonNull = columns.map(col(_).isNotNull).reduce(_ && _)
      sum(when(allNonNull, 1L).otherwise(0L)) -
        count_distinct(col(columns.head), columns.tail.map(col): _*)
    }
  }

  /** One row; one BIGINT violation-count column per rule — all rules in
    * ONE scan regardless of suite size. */
  def report(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val aggs = suite.map(e => e.agg.as(e.name))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Row-level quarantine: annotate each row with the names of the
    * row-rules it violates (suite order) and a validity flag —
    * the split-good/bad pattern for training-data pipelines. Aggregate
    * rules (Unique) are corpus-level and don't apply per row. */
  def annotate(df: DataFrame, suite: Seq[RowRule]): DataFrame =
    df.withColumn("violations",
      filter(array(suite.map(e =>
        when(e.violation, e.name).otherwise(lit(null).cast("string"))): _*),
        v => v.isNotNull))
      .withColumn("is_valid", size(col("violations")) === 0)

  /** (valid rows, quarantined rows with their violation lists). */
  def partitionValid(df: DataFrame, suite: Seq[RowRule]): (DataFrame, DataFrame) = {
    val a = annotate(df, suite)
    (a.filter(col("is_valid")).drop("violations", "is_valid"),
      a.filter(!col("is_valid")))
  }

  /** Inline (zero-extra-pass) validation: attaches the suite's
    * violation counters to the frame as OBSERVED metrics — Spark's
    * `CollectMetrics` node computes them on the rows flowing through
    * the MAIN job, so validation costs nothing beyond the action the
    * caller was already running (vs [[report]], a second full scan).
    * Read the counts from the returned [[org.apache.spark.sql.Observation]]
    * after any action; in Structured Streaming the same node surfaces
    * per-batch in `StreamingQueryProgress.observedMetrics` — the
    * continuous-quality-monitoring shape.
    *
    * The metric set must be aggregates over the observed plan node,
    * which RowRule violation sums are; a row count rides along so
    * rates can be derived. */
  def observed(df: DataFrame, suite: Seq[RowRule],
               name: String = "graft_checks")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(!df.isStreaming, "streaming frames: use observedStream " +
      "(Observation handles are batch-only; metrics arrive per micro-batch)")
    val obs = org.apache.spark.sql.Observation(name)
    val metrics = suiteMetrics(suite)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Streaming twin of [[observed]]: same `CollectMetrics` node via the
    * name-based overload (Observation handles are batch-only). Each
    * micro-batch's counts surface in
    * `StreamingQueryProgress.observedMetrics(name)` — continuous
    * quality monitoring with zero extra passes. */
  def observedStream(df: DataFrame, suite: Seq[RowRule],
                     name: String = "graft_checks"): DataFrame = {
    val metrics = suiteMetrics(suite)
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  private def suiteMetrics(suite: Seq[RowRule]): Seq[Column] =
    count(lit(1)).as("n_rows") +: suite.map(e => e.agg.as(e.name))

  /** Boolean per-rule pass view over a report row. */
  def passed(reportRow: DataFrame): DataFrame =
    reportRow.select(reportRow.columns.toIndexedSeq.map(c => (col(c) === 0L).as(c)): _*)

  /** Per-group z-score outlier detection with ENGINE-EXACT decisions:
    * a row is an outlier iff |v − mean| > z·σ_pop over its group. The
    * test is evaluated as `(v·n − S)² > z²·(n·SS − S²)` on integer-cents
    * moments (n, S = Σcents, SS = Σcents²) — every input to the final
    * double comparison is an exactly-represented integer, and both
    * sides use the same two IEEE multiplications in any engine, so the
    * flag never wobbles the way a streaming mean/stddev would.
    *
    * Plan shape: one grouped aggregate for the moments (3 longs per
    * group), joined back by group key — AQE broadcasts the tiny stats
    * side; the fact side never shuffles. Returns only the outlier rows,
    * originals untouched. */
  def outliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
               z: Int = 3): DataFrame = {
    require(z > 0 && groupCols.nonEmpty, s"need z > 0 and group columns")
    val cents = round(col(valueCol) * 100).cast("long")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(cents).as("__s"),
        sum(cents * cents).as("__ss"))
    val d = (cents * col("__n") - col("__s")).cast("double")
    val rhs = lit((z * z).toDouble) *
      (col("__n").cast("double") * col("__ss").cast("double") -
        col("__s").cast("double") * col("__s").cast("double"))
    df.join(stats, groupCols)
      .filter(d * d > rhs)
      .drop("__n", "__s", "__ss")
  }

  /** Auto-profiling → suggested CHECK constraints — the missing first
    * step of the quality loop (profile → SUGGEST → `TxnLog.addCheck`
    * → every later commit gated): from one profiling pass, emit named
    * SQL predicates a human reviews and registers.
    *
    *  - a column observed with ZERO nulls suggests `IS NOT NULL`;
    *  - a long-family column suggests a BETWEEN of its observed range
    *    widened by `headroomPct` (integer arithmetic — suggestions are
    *    deterministic and cross-engine replayable), so ordinary drift
    *    passes and a broken upstream fails;
    *  - a string column with ≤ `domainMax` distinct values suggests an
    *    IN-list of its sorted observed domain (quotes escaped).
    *
    * One agg pass for the profile; one bounded (≤ domainMax rows)
    * collect per low-cardinality string column for its domain. All
    * suggested predicates use SQL CHECK null semantics downstream
    * (NULL passes range/domain checks — pair with the not-null
    * suggestion when nulls should gate). Output: one row per
    * suggestion (col_name, check_name, predicate, rationale). */
  def suggestChecks(df: DataFrame, domainMax: Int = 20,
                    headroomPct: Int = 10): DataFrame = {
    import org.apache.spark.sql.types._
    require(domainMax >= 1 && headroomPct >= 0,
      s"bad suggest params: domainMax=$domainMax headroomPct=$headroomPct")
    val longCols = df.schema.fields.filter(f => f.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }).map(_.name).toSeq
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq
    val aggs =
      (longCols ++ strCols).map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c")) ++
      longCols.flatMap(c => Seq(
        min(col(c)).cast("long").as(s"__mn_$c"),
        max(col(c)).cast("long").as(s"__mx_$c"))) ++
      strCols.map(c => countDistinct(col(c)).as(s"__dc_$c")) :+
      count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*).head
    val n = row.getAs[Long]("__n")
    val out = Seq.newBuilder[(String, String, String, String)]
    (longCols ++ strCols).foreach { c =>
      if (n > 0 && row.getAs[Long](s"__nn_$c") == 0L)
        out += ((c, s"${c}_not_null", s"$c IS NOT NULL",
          s"0 nulls in $n rows"))
    }
    longCols.foreach { c =>
      val mnAny = row.get(row.fieldIndex(s"__mn_$c"))
      if (mnAny != null) {
        val mn = mnAny.asInstanceOf[Long]
        val mx = row.getAs[Long](s"__mx_$c")
        val pad = math.max(1L, (mx - mn) * headroomPct / 100)
        out += ((c, s"${c}_range", s"$c BETWEEN ${mn - pad} AND ${mx + pad}",
          s"observed [$mn, $mx], $headroomPct% headroom"))
      }
    }
    strCols.foreach { c =>
      val dc = row.getAs[Long](s"__dc_$c")
      if (dc >= 1 && dc <= domainMax) {
        val domain = df.select(col(c)).filter(col(c).isNotNull).distinct()
          .collect().map(_.getString(0)).sorted // bounded by domainMax
        val lits = domain.map(v => s"'${v.replace("'", "''")}'").mkString(", ")
        out += ((c, s"${c}_domain", s"$c IN ($lits)",
          s"$dc distinct values"))
      }
    }
    import df.sparkSession.implicits._
    out.result().toDF("col_name", "check_name", "predicate", "rationale")
  }

  /** The reference's 12-rule suite (validate_trip_data.json:5-92):
    * 10 not-null columns + 2 range rules. */
  val referenceSuite: Seq[Expectation] = Seq(
    NotNull("vendor_id"), NotNull("rate_code_id"),
    NotNull("pickup_location_id"), NotNull("dropoff_location_id"),
    NotNull("payment_type_id"), NotNull("service_type"),
    NotNull("pickup_latitude"), NotNull("pickup_longitude"),
    NotNull("dropoff_latitude"), NotNull("dropoff_longitude"),
    Between("trip_distance", 0, 100), Between("extra", 0, 3))
}
