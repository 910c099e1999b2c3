package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional scan pruning.
  *
  * A 100 TB table sorted by one column prunes scans on that column
  * only; interleaving the bits of two filter columns and range-
  * partitioning + sorting by the interleaved value gives every output
  * file a small bounding box in BOTH dimensions, so parquet min/max
  * stats prune selective scans on either column (the layout trick
  * behind Delta/Iceberg Z-ORDER clustering, built here from plain
  * engine-portable integer arithmetic — shifts, masks, or).
  *
  * The z-value itself is deterministic arithmetic on the low 16 bits
  * of each coordinate, so the oracle reproduces it exactly; the SQL
  * generator and the Column builder share one table of spreading
  * steps.
  */
object ZOrder {

  /** Bit-spreading steps (shift, mask): 16 bits → 32 bits with zeros
    * interleaved — the classic Morton magic numbers. */
  private val steps = Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL,
    2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Low 16 bits of `c` spread to even bit positions. */
  def spread(c: Column): Column =
    steps.foldLeft(c.cast("long").bitwiseAND(lit(65535L))) { case (v, (s, m)) =>
      v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }

  /** Morton interleave of two coordinate columns (low 16 bits each):
    * x gets even bit positions, y odd. */
  def zValue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Inverse of [[spread]]: collapse even bit positions back into the
    * low 16 bits (the steps run in reverse with right shifts). */
  def unspread(c: Column): Column =
    steps.reverse.foldLeft(c.cast("long").bitwiseAND(lit(0x55555555L))) {
      case (v, (s, _)) =>
        val m = s match {
          case 1 => 0x33333333L
          case 2 => 0x0F0F0F0FL
          case 4 => 0x00FF00FFL
          case 8 => 0x0000FFFFL
        }
        v.bitwiseOR(shiftright(v, s)).bitwiseAND(lit(m))
    }

  /** Recover the coordinates from a z-value (inverse of [[zValue]]). */
  def xOf(z: Column): Column = unspread(z)
  def yOf(z: Column): Column = unspread(shiftright(z.cast("long"), 1))

  /** The same spreading as a SQL string (ANSI shifts/and/or — runs in
    * DuckDB, Trino, Spark SQL identically). Each step substitutes the
    * previous expression textually; fine for an oracle statement. */
  def spreadSql(expr: String): String =
    steps.foldLeft(s"($expr & 65535)") { case (v, (s, m)) =>
      s"(($v | ($v << $s)) & $m)"
    }

  def zValueSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Rewrite `df` into `nFiles` z-clustered parquet files: range-
    * partition on the z-value (one total-order sample pass, the same
    * exchange `ORDER BY` plans) and sort within partitions, so each
    * file covers a compact z-range = a small (x, y) box. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    nFiles: Int): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Mean per-file bounding-box area over (xCol, yCol) — the pruning
    * figure of merit a layout minimizes (smaller boxes ⇒ fewer files
    * overlap any given predicate rectangle). */
  def meanBoxArea(df: DataFrame, xCol: String, yCol: String): Double =
    df.groupBy(input_file_name())
      .agg(((max(col(xCol)) - min(col(xCol)) + 1) *
        (max(col(yCol)) - min(col(yCol)) + 1)).cast("double").as("area"))
      .agg(avg(col("area"))).head().getDouble(0)
}
