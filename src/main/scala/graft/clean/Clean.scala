package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cleaning stage — replaces the reference's pandas cleaning script
  * (reference: scripts/transform_data.py) with pure `DataFrame =>
  * DataFrame` operators. All are metadata-only or narrow (no shuffle),
  * so they scale linearly with input size.
  */
object Clean {

  /** P1 — lowercase every column name
    * (reference: batch_processing_optimized.py:133, transform_data.py:162). */
  def lowercaseColumns(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(c.toLowerCase)).toIndexedSeq: _*)

  /** P12 — canonical (alphabetical) column order
    * (reference: transform_data.py:118). */
  def sortColumns(df: DataFrame): DataFrame =
    df.select(df.columns.sorted.toIndexedSeq.map(col): _*)

  /** P3 — drop operational columns, tolerating absence
    * (reference: transform_data.py:26-36,88-89,112-114). */
  def dropColumns(df: DataFrame, names: String*): DataFrame = {
    val present = names.filter(df.columns.contains)
    if (present.isEmpty) df else df.drop(present: _*)
  }

  /** P6 — cast id columns to int, skipping absent ones
    * (reference: transform_data.py:103-110). */
  def castColumns(df: DataFrame, casts: Map[String, String]): DataFrame =
    casts.filter { case (c, _) => df.columns.contains(c) }
      .foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }

  /** Drift-tolerant int cast: null-on-failure → 0
    * (reference: elt_pipeline_optimized_dag.py:116-118). */
  def castIntOrZero(df: DataFrame, names: String*): DataFrame =
    names.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(c, coalesce(col(c).try_cast("int"), lit(0)))
    }

  /** F2 — drop rows with any null (reference: transform_data.py:117). */
  def dropNullRows(df: DataFrame): DataFrame = df.na.drop("any")

  /** Deterministic pseudonymization: replace each named column with
    * `sha2(salt || value, 256)` — referential integrity survives (the
    * same value maps to the same token everywhere, so joins and
    * distinct-counts still work) while the cleartext leaves the lake.
    * A pure codegen'd projection: no shuffle, no UDF, safe to run
    * inline in any 100 TB scan. The salt defeats rainbow-table
    * reversal of low-entropy columns (names, phones); rotate it and
    * every token rotates. NULLs stay NULL ("unknown" must not collide
    * with a real token). */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"pseudonymize columns missing from frame: ${cols.filterNot(df.columns.contains)}")
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        when(col(c).isNull, lit(null).cast("string"))
          .otherwise(sha2(concat(lit(salt), col(c).cast("string")), 256)))
    }
  }

  /** P2 — canonicalize datetime column names across schema-drift
    * variants: `tpep_*` (yellow) / `lpep_*` (green) / already-plain
    * (reference: batch_processing_optimized.py:104-125).
    * Throws if no pickup-datetime variant is present, matching the
    * reference's explicit error path.
    */
  def canonicalizeDatetimeColumns(df: DataFrame): DataFrame = {
    val cols = df.columns.map(_.toLowerCase).toSet
    def pick(target: String): Option[String] =
      Seq(target, s"tpep_$target", s"lpep_$target")
        .find(v => cols.contains(v))
    val pickup = pick("pickup_datetime").getOrElse(
      throw new IllegalArgumentException(
        s"no pickup datetime column among ${df.columns.mkString(",")}"))
    val dropoff = pick("dropoff_datetime").getOrElse(
      throw new IllegalArgumentException(
        s"no dropoff datetime column among ${df.columns.mkString(",")}"))
    df.withColumnRenamed(pickup, "pickup_datetime")
      .withColumnRenamed(dropoff, "dropoff_datetime")
  }

  /** J1 — zone-lookup enrichment. Inner broadcast hash join against a
    * small lookup table keyed by `LocationID`; renames the lookup's
    * `latitude`/`longitude` to `<prefix>_latitude`/`<prefix>_longitude`
    * and drops the remaining lookup columns. The INNER join silently
    * drops unmatched ids — load-bearing referential-integrity behavior
    * of the reference's pandas merge (reference: transform_data.py:39-64).
    *
    * Scale: lookup is ~265 rows in the reference; `broadcast()` keeps
    * this a map-side join with zero shuffle at any fact-side size.
    */
  def zoneEnrich(trips: DataFrame, lookup: DataFrame,
                 idCol: String, prefix: String): DataFrame = {
    val lk = lookup.select(
      col("LocationID"),
      col("latitude").as(s"${prefix}_latitude"),
      col("longitude").as(s"${prefix}_longitude"))
    trips.join(broadcast(lk), trips(idCol) === lk("LocationID"), "inner")
      .drop("LocationID")
  }
}
