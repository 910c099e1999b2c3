package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Warehouse (star-schema) stage — replaces the reference's dbt model
  * layer (reference: nyc_taxi/models/production dbt models) with pure
  * `DataFrame => DataFrame` model functions. Each dim is a DISTINCT
  * over a key plus a surrogate key and a description map; the fact
  * joins the staging frame to three dims.
  *
  * Scale notes: dims are tiny by construction (DISTINCT over low-card
  * codes), so every fact↔dim join is a broadcast hash join — zero
  * shuffle on the fact side. The only wide operations are the DISTINCTs
  * themselves (partial-agg'd map-side) and the optional ORDER BY, which
  * sorts only the already-tiny dim output.
  */
object Warehouse {

  /** `dbt_utils.surrogate_key` semantics, v0.8.0 (reference:
    * dim_vendor.sql:13 et al.; packages.yml pins dbt_utils 0.8.0):
    * md5 of '-'-joined values, each cast to string with null → ''.
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(""))): _*))

  // ---- description maps — reconstructed from the public NYC TLC data
  // dictionary; the reference invokes dbt macros whose bodies are
  // missing from its repo (nyc_taxi/macros/ holds only .gitkeep).

  /** reference: dim_payment.sql:15 (get_payment_description). */
  def paymentDescription(id: Column): Column =
    when(id === 1, "Credit card")
      .when(id === 2, "Cash")
      .when(id === 3, "No charge")
      .when(id === 4, "Dispute")
      .when(id === 5, "Unknown")
      .when(id === 6, "Voided trip")
      .otherwise("Other")

  /** reference: dim_rate_code.sql:15 (get_rate_code_description). */
  def rateCodeDescription(id: Column): Column =
    when(id === 1, "Standard rate")
      .when(id === 2, "JFK")
      .when(id === 3, "Newark")
      .when(id === 4, "Nassau or Westchester")
      .when(id === 5, "Negotiated fare")
      .when(id === 6, "Group ride")
      .otherwise("Other")

  /** reference: dim_vendor.sql:15 (get_vendor_description). */
  def vendorDescription(id: Column): Column =
    when(id === 1, "Creative Mobile Technologies")
      .when(id === 2, "VeriFone Inc")
      .otherwise("Other")

  /** reference: dim_service_type.sql:14 (get_service_name);
    * consistent with the 1=yellow/2=green tagging at
    * datalake_to_dw.py:133-136. */
  def serviceName(id: Column): Column =
    when(id === 1, "Yellow").when(id === 2, "Green").otherwise("Other")

  // ---- dims (A2 distinct + F3 null guards + F4 domain ranges + O1 sort)

  /** reference: dim_vendor.sql:3-23. */
  def dimVendor(staging: DataFrame): DataFrame =
    staging.select("vendor_id").filter(col("vendor_id").isNotNull).distinct()
      .filter(col("vendor_id").cast("int") < 3)
      .select(
        surrogateKey(col("vendor_id")).as("vendor_key"),
        col("vendor_id").cast("int").as("vendor_id"),
        vendorDescription(col("vendor_id").cast("int")).as("vendor_name"))
      .orderBy(col("vendor_id").asc)

  /** reference: dim_rate_code.sql:3-23. */
  def dimRateCode(staging: DataFrame): DataFrame =
    staging.select("rate_code_id").filter(col("rate_code_id").isNotNull).distinct()
      .filter(col("rate_code_id").cast("int") < 7)
      .select(
        surrogateKey(col("rate_code_id")).as("rate_code_key"),
        col("rate_code_id").cast("int").as("rate_code_id"),
        rateCodeDescription(col("rate_code_id").cast("int")).as("rate_code_description"))
      .orderBy(col("rate_code_id").asc)

  /** reference: dim_payment.sql:3-21. */
  def dimPayment(staging: DataFrame): DataFrame =
    staging.select("payment_type_id").filter(col("payment_type_id").isNotNull).distinct()
      .select(
        surrogateKey(col("payment_type_id")).as("payment_type_key"),
        col("payment_type_id").cast("int").as("payment_type_id"),
        paymentDescription(col("payment_type_id").cast("int")).as("payment_description"))
      .orderBy(col("payment_type_id").asc)

  /** reference: dim_service_type.sql:3-20. */
  def dimServiceType(staging: DataFrame): DataFrame =
    staging.select("service_type").filter(col("service_type").isNotNull).distinct()
      .select(
        col("service_type").cast("int").as("service_type_id"),
        serviceName(col("service_type").cast("int")).as("service_name"))
      .orderBy(col("service_type_id").asc)

  /** reference: dim_pickup_location.sql:3-21. */
  def dimPickupLocation(staging: DataFrame): DataFrame =
    staging.select("pickup_location_id", "pickup_latitude", "pickup_longitude")
      .filter(col("pickup_location_id").isNotNull).distinct()
      .orderBy(col("pickup_location_id").asc)

  /** reference: dim_dropoff_location.sql:3-21. */
  def dimDropoffLocation(staging: DataFrame): DataFrame =
    staging.select("dropoff_location_id", "dropoff_latitude", "dropoff_longitude")
      .filter(col("dropoff_location_id").isNotNull).distinct()
      .orderBy(col("dropoff_location_id").asc)

  /** J2 — fact model: staging joined to vendor/rate-code/payment dims
    * (all inner equi-joins) plus an 8-column md5 trip id
    * (reference: fact_trip.sql:4-45). Dims are broadcast — they are
    * DISTINCTs of low-cardinality codes, so this stays shuffle-free on
    * the fact side at any scale.
    */
  def factTrip(staging: DataFrame): DataFrame = {
    val dv = broadcast(dimVendor(staging).select("vendor_key", "vendor_id"))
    val dr = broadcast(dimRateCode(staging).select("rate_code_key", "rate_code_id"))
    val dp = broadcast(dimPayment(staging).select("payment_type_key", "payment_type_id"))
    staging
      .withColumn("trip_id", surrogateKey(
        col("vendor_id"), col("rate_code_id"),
        col("pickup_location_id"), col("dropoff_location_id"),
        col("payment_type_id"), col("service_type"),
        col("pickup_datetime"), col("dropoff_datetime")))
      .join(dv, staging("vendor_id").cast("int") === dv("vendor_id"), "inner")
      .join(dr, staging("rate_code_id").cast("int") === dr("rate_code_id"), "inner")
      .join(dp, staging("payment_type_id").cast("int") === dp("payment_type_id"), "inner")
      .select(
        col("trip_id"), col("vendor_key"), col("rate_code_key"),
        col("pickup_location_id"), col("dropoff_location_id"),
        col("payment_type_key"),
        col("service_type").as("service_type_id"),
        col("pickup_datetime"), col("dropoff_datetime"),
        col("passenger_count"), col("trip_distance"), col("extra"),
        col("mta_tax"), col("fare_amount"), col("tip_amount"),
        col("tolls_amount"), col("total_amount"),
        col("improvement_surcharge"), col("congestion_surcharge"))
  }
}
