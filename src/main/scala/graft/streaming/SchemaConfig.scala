package graft.streaming

import org.apache.spark.sql.types._

/** Config-driven schema loading: a JSON file maps column name → type
  * name, and the loader builds the Debezium `payload.after` schema from
  * it (reference: streaming_processing/schema_config.json:1-21 consumed
  * by streaming_to_datalake.py:100-123).
  *
  * The type-name vocabulary matches the reference's config exactly
  * (`"IntegerType"`, `"DoubleType"`, …). The full envelope schema wraps
  * the payload as `payload.after.<fields>`.
  */
object SchemaConfig {

  private val typeMapping: Map[String, DataType] = Map(
    "IntegerType" -> IntegerType,
    "StringType" -> StringType,
    "TimestampNTZType" -> TimestampNTZType,
    "TimestampType" -> TimestampType,
    "DoubleType" -> DoubleType,
    "FloatType" -> FloatType,
    "LongType" -> LongType,
    "BooleanType" -> BooleanType,
    "BinaryType" -> BinaryType,
    "DateType" -> DateType)

  /** Parse a `{"fields": [{"name","type","nullable"}]}` config document
    * into the flat `after` StructType. */
  def payloadSchema(configJson: String): StructType = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(configJson)
    val fields = (root \ "fields") match {
      case JArray(fs) => fs.map { f =>
        val name = (f \ "name") match {
          case JString(s) => s
          case other => throw new IllegalArgumentException(s"field name missing: $other")
        }
        val tpe = (f \ "type") match {
          case JString(s) => typeMapping.getOrElse(s,
            throw new IllegalArgumentException(s"unknown type name: $s"))
          case other => throw new IllegalArgumentException(s"field type missing: $other")
        }
        val nullable = (f \ "nullable") match {
          case JBool(b) => b
          case _ => true
        }
        StructField(name, tpe, nullable)
      }
      case other => throw new IllegalArgumentException(s"'fields' array missing: $other")
    }
    StructType(fields)
  }

  /** Load `payloadSchema` from a file path. */
  def payloadSchemaFromFile(path: String): StructType =
    payloadSchema(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Wrap an `after` schema into the Debezium envelope
    * `{"payload": {"after": {...}}}` (streaming_to_datalake.py:119-123). */
  def envelopeSchema(after: StructType): StructType =
    new StructType().add("payload", new StructType().add("after", after))
}
