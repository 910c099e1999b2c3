package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-exact aggregation helpers.
  *
  * Double sums are order-dependent, so a Spark `sum(double)` and a
  * DuckDB `SUM(double)` over the same rows can differ in the last bits
  * and fail the driver's hash compare. All testdata measures carry at
  * most 2 decimal digits, so summing in `DECIMAL` is mathematically
  * exact in both engines; casting the exact decimal result back to
  * `double` is then deterministic (nearest-double is engine-independent).
  *
  * Oracle-side equivalent of `dsum(c)`:
  *   `CAST(SUM(CAST(c AS DECIMAL(18,2))) AS DOUBLE)`
  */
/** Partitioning guards. */
object Parallelism {
  /** CPU-bound per-row operators (hash signatures, dot products) are
    * throughput-limited by input partition count, and a small parquet
    * file arrives as ONE partition. Repartition up to the cluster's
    * default parallelism when the input has fewer partitions; a no-op
    * on inputs that are already well-split (the 100 TB case, where the
    * scan itself produces thousands of splits). */
  def ensure(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

object Exact {
  private val D = DecimalType(18, 2)

  /** Exact sum of a ≤2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact average (decimal sum / long count), returned as double. */
  def davg(c: Column): Column =
    (sum(c.cast(D)).cast("double") / count(c)).cast("double")
}
