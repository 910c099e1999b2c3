package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema → serving-SQL DDL generator — the engine's counterpart of
  * the reference's pandas-dtype → Trino DDL script
  * (reference: utils/trinp_db.py:10-27, which samples one parquet file
  * and emits CREATE SCHEMA + external CREATE TABLE statements).
  *
  * Here the source of truth is the Spark schema (no sampling needed —
  * `spark.read.parquet(...).schema` carries exact types), and the type
  * map is complete and recursive (the reference collapses every int64
  * to INT and everything unknown to VARCHAR; this maps each Spark type
  * to its Trino equivalent, including nested ARRAY/MAP/ROW).
  */
object TrinoDdl {

  /** Trino type name for a Spark type (recursive). */
  def trinoType(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE"
    case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
    case StringType => "VARCHAR"
    case BinaryType => "VARBINARY"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case a: ArrayType => s"ARRAY(${trinoType(a.elementType)})"
    case m: MapType => s"MAP(${trinoType(m.keyType)}, ${trinoType(m.valueType)})"
    case s: StructType =>
      s.fields.map(f => s"${quote(f.name)} ${trinoType(f.dataType)}")
        .mkString("ROW(", ", ", ")")
    case other => "VARCHAR" // reference fallback for unmapped dtypes
  }

  private def quote(name: String): String = "\"" + name.replace("\"", "\"\"") + "\""

  /** Quote an identifier only when it needs it (keeps simple names
    * readable while making reserved words / mixed case / punctuation
    * valid DDL instead of a syntax error or injection vector). */
  private def ident(name: String): String =
    if (name.matches("[a-z_][a-z0-9_]*")) name else quote(name)

  /** Single-quote-escape a string literal (locations, formats). */
  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `CREATE SCHEMA IF NOT EXISTS catalog.schema WITH (location=...)`. */
  def createSchemaSql(catalog: String, schema: String, location: String): String =
    s"""CREATE SCHEMA IF NOT EXISTS ${ident(catalog)}.${ident(schema)}
       |WITH (location = ${lit(location)});""".stripMargin

  /** External-table DDL for a frame's schema (the reference's
    * CREATE TABLE ... WITH (external_location, format) shape). */
  def createTableSql(df: DataFrame, catalog: String, schema: String,
                     table: String, externalLocation: String,
                     format: String = "PARQUET"): String = {
    val cols = df.schema.fields
      .map(f => s"  ${quote(f.name)} ${trinoType(f.dataType)}")
      .mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS ${ident(catalog)}.${ident(schema)}.${ident(table)} (
       |$cols
       |) WITH (
       |  external_location = ${lit(externalLocation)},
       |  format = ${lit(format)}
       |);""".stripMargin
  }

  /** Full script: schema + table, matching the reference's output
    * shape end-to-end. */
  def script(df: DataFrame, catalog: String, schema: String, table: String,
             schemaLocation: String, externalLocation: String,
             format: String = "PARQUET"): String =
    createSchemaSql(catalog, schema, schemaLocation) + "\n\n" +
      createTableSql(df, catalog, schema, table, externalLocation, format)
}
