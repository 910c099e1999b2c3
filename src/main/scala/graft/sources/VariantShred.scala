package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.VariantType

/** Variant SHREDDING write path — the write-side twin of the
  * `json_variant` read path: materialize the merged
  * `schema_of_variant_agg` schema of each variant column as typed
  * parquet columns (`<col>$<field>`), with the original variant kept
  * as `<col>$residual` ONLY when some field's merged type is
  * untypable (VARIANT = conflicting types across rows).
  *
  * Why this is the 100 TB shape: a variant binary is opaque to the
  * scan — every extraction decodes every row's full payload, no
  * column pruning, no min/max stats, no dictionary pages. Shredded,
  * each stable field is an ordinary parquet column: extraction of one
  * field reads ONE column (ReadSchema-pruned, PlanSpec-guarded),
  * predicates on it push down to row-group stats, and only the
  * genuinely polymorphic tail pays variant decode via the residual.
  * The schema inference is one aggregate pass (`schema_of_variant_agg`
  * merges per-partition; only schema STRINGS reach the driver — cost
  * bounded by schema complexity, never data volume).
  *
  * Residual granularity: untypable fields keep the WHOLE original
  * variant (coarse fallback), not a per-field stripped remainder —
  * simpler than the parquet variant-shredding spec's per-field
  * `typed_value`/`value` pairs, at the cost of storing typed fields
  * twice when ANY sibling conflicts. For a payload with a stable core
  * and no conflicts (the common telemetry case) the residual is
  * absent entirely. */
object VariantShred {

  /** Top-level fields of a merged `OBJECT<name: TYPE, ...>` schema
    * string as (name, variant-DDL type). Non-object schemas (scalar
    * payloads, or top-level VARIANT = nothing stable) have no fields.
    *
    * `schema_of_variant_agg` backtick-quotes field names that need it
    * (embedded backticks doubled), and a quoted name may legally
    * contain every structural character this parser otherwise splits
    * on (':', ',', '<', '(') — so the scan tracks quote state and
    * treats a quoted run as opaque name characters. */
  private[graft] def objectFields(merged: String): Seq[(String, String)] = {
    val t = merged.trim
    if (!t.startsWith("OBJECT<") || !t.endsWith(">")) return Seq.empty
    val body = t.stripPrefix("OBJECT<").stripSuffix(">")
    if (body.trim.isEmpty) return Seq.empty
    // split on top-level commas: angle brackets (nested OBJECT/ARRAY)
    // and parens (DECIMAL(p,s)) both nest; backtick-quoted runs are
    // opaque (a doubled backtick inside one is an escaped backtick,
    // not a quote boundary)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inQuote = false
    var i = 0
    val cur = new StringBuilder
    while (i < body.length) {
      val c = body(i)
      if (c == '`') {
        if (inQuote && i + 1 < body.length && body(i + 1) == '`') {
          cur += '`'; cur += '`'; i += 1 // escaped backtick, stay quoted
        } else { inQuote = !inQuote; cur += c }
      } else if (inQuote) cur += c
      else c match {
        case '<' | '(' => depth += 1; cur += c
        case '>' | ')' => depth -= 1; cur += c
        case ',' if depth == 0 => parts += cur.result(); cur.clear()
        case other => cur += other
      }
      i += 1
    }
    parts += cur.result()
    parts.toSeq.map { p =>
      // name/type separator: first ':' at depth 0 OUTSIDE quotes (a
      // quoted name can itself contain ':')
      var j = 0; var inQ = false; var colon = -1
      while (j < p.length && colon < 0) {
        val c = p(j)
        if (c == '`') {
          if (inQ && j + 1 < p.length && p(j + 1) == '`') j += 1
          else inQ = !inQ
        } else if (!inQ && c == ':') colon = j
        j += 1
      }
      require(colon > 0, s"malformed field in variant schema: '$p' ($merged)")
      val raw = p.take(colon).trim
      val name =
        if (raw.length >= 2 && raw.startsWith("`") && raw.endsWith("`"))
          raw.substring(1, raw.length - 1).replace("``", "`")
        else raw
      (name, p.drop(colon + 1).trim)
    }
  }

  /** A merged type is typable iff no VARIANT appears anywhere in it —
    * VARIANT marks a cross-row type conflict that only the binary
    * encoding can hold. */
  private[graft] def typable(ddl: String): Boolean = {
    // word-boundary scan, not substring: guards hypothetical
    // identifiers containing "VARIANT"
    val re = "\\bVARIANT\\b".r
    re.findFirstIn(ddl).isEmpty
  }

  /** Variant schema DDL → Spark DDL (`OBJECT<` → `STRUCT<`; field
    * names inside nested objects keep their `name: TYPE` shape, which
    * Spark's DDL parser accepts). */
  private[graft] def toSparkDdl(ddl: String): String =
    ddl.replace("OBJECT<", "STRUCT<")

  private def shredColName(variantCol: String, field: String) =
    s"$variantCol$$$field"
  private def residualColName(variantCol: String) = s"$variantCol$$residual"

  /** Variant extraction path for a top-level field name, or None when
    * the name cannot be expressed in Spark's variant path syntax. Dot
    * form `$.name` accepts any character except '.' and '['; names
    * containing those go through the quoted bracket form `$['name']`,
    * which in turn cannot carry a single quote. The (pathological)
    * leftover — a name with BOTH a dot/bracket and a single quote —
    * stays in the residual rather than mis-shredding. */
  private[graft] def pathFor(name: String): Option[String] =
    if (name.isEmpty) None
    else if (!name.exists(c => c == '.' || c == '[')) Some(s"$$.$name")
    else if (!name.exists(c => c == '\'' || c == '?')) Some(s"$$['$name']")
    else None

  /** Merged schema per variant-typed column of `df`, in ONE aggregate
    * pass over all of them. */
  def mergedSchemas(df: DataFrame): Map[String, String] = {
    val vCols = df.schema.fields.filter(_.dataType == VariantType).map(_.name)
    if (vCols.isEmpty) return Map.empty
    val row = df.agg(
      schema_of_variant_agg(col(vCols.head)),
      vCols.tail.map(c => schema_of_variant_agg(col(c))).toIndexedSeq: _*).head()
    vCols.zipWithIndex.map { case (c, i) => c -> row.getString(i) }.toMap
  }

  /** Write `df` to parquet with every variant column shredded. Returns
    * the (columnName → merged schema) map used, so callers/tests can
    * assert on the inferred shape. Pass `schemas` to skip the
    * inference pass (e.g. a schema pinned from a previous snapshot —
    * the production pattern, where the shredding schema evolves slowly
    * and deliberately rather than per-write). */
  def writeShredded(df: DataFrame, path: String,
                    schemas: Option[Map[String, String]] = None): Map[String, String] = {
    val merged = schemas.getOrElse(mergedSchemas(df))
    val out = df.schema.fields.toIndexedSeq.flatMap { f =>
      if (f.dataType != VariantType) Seq(col(f.name))
      else {
        val fields = objectFields(merged.getOrElse(f.name, "VARIANT"))
        // a field shreds only when its merged type is stable AND its
        // name is expressible as a variant extraction path; everything
        // else stays reachable through the residual
        val (shredded, residualFields) = fields.partition {
          case (name, t) => typable(t) && pathFor(name).isDefined
        }
        val typed = shredded.map { case (name, t) =>
          variant_get(col(f.name), pathFor(name).get, toSparkDdl(t))
            .as(shredColName(f.name, name))
        }
        val needsResidual = fields.isEmpty || residualFields.nonEmpty
        typed ++ (if (needsResidual)
          Seq(col(f.name).as(residualColName(f.name))) else Seq.empty)
      }
    }
    df.select(out: _*).write.mode("overwrite").parquet(path)
    merged
  }

  /** Pruned extraction over a shredded table: a `"$.f..."` path whose
    * top-level field was shredded reads ONLY that typed column (the
    * remaining path applied as ordinary struct/array access); anything
    * else falls back to `variant_get` on the residual, or NULL when no
    * residual was written (the field never occurred). */
  def extract(df: DataFrame, variantCol: String, path: String,
              targetDdl: String): Column = {
    val segs = parsePath(path)
    require(segs.nonEmpty && segs.head.isLeft,
      s"path must start with a field: $path")
    val top = segs.head.left.toOption.get
    val cols = df.columns.toSet
    if (cols.contains(shredColName(variantCol, top))) {
      val base = segs.tail.foldLeft(col(shredColName(variantCol, top))) {
        case (c, Left(name)) => c.getField(name)
        case (c, Right(idx)) => element_at(c, idx + 1) // variant paths are 0-based
      }
      base.cast(targetDdl)
    } else if (cols.contains(residualColName(variantCol))) {
      variant_get(col(residualColName(variantCol)), path, targetDdl)
    } else lit(null).cast(targetDdl)
  }

  /** `"$.a[3].b"` → Seq(Left(a), Right(3), Left(b)). */
  private[graft] def parsePath(path: String): Seq[Either[String, Int]] = {
    require(path.startsWith("$"), s"variant path must start with $$: $path")
    val segs = scala.collection.mutable.ArrayBuffer.empty[Either[String, Int]]
    var rest = path.drop(1)
    while (rest.nonEmpty) {
      if (rest.startsWith(".")) {
        val name = rest.drop(1).takeWhile(c => c != '.' && c != '[')
        require(name.nonEmpty, s"empty field segment in $path")
        segs += Left(name)
        rest = rest.drop(1 + name.length)
      } else if (rest.startsWith("[")) {
        val idx = rest.drop(1).takeWhile(_ != ']')
        require(rest.length > idx.length + 1 && rest(idx.length + 1) == ']',
          s"unclosed [ in $path")
        segs += Right(idx.toInt)
        rest = rest.drop(idx.length + 2)
      } else throw new IllegalArgumentException(s"bad path segment at '$rest' in $path")
    }
    segs.toSeq
  }
}
