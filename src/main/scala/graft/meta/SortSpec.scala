package graft.meta

import graft.meta.model.SortFieldMeta
import graft.meta.transforms._

/** Textual sort/transform term parsing, shared by the SQL parser extension
  * (`WRITE ORDERED BY ...`, `ALTER TABLE ... ADD PARTITION FIELD ...`) and
  * the sort-rewrite procedure (`sort_order => 'bucket(4, id) ASC'`), so the
  * two surfaces accept the same grammar (ref `IcebergSqlExtensions.g4`
  * order/transform rules).
  */
object SortSpec {

  private val TransformArgRe =
    """(?i)^(\w+)\s*\(\s*(?:(\d+)\s*,\s*)?`?([\w.]+)`?\s*\)$""".r
  private val FieldRe =
    """(?is)^(.+?)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?$""".r

  /** Split on top-level commas (quotes and parens nest) — `bucket(4, id),
    * ts DESC` is two terms, not three. */
  def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0; var inStr = false
    s.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case '(' if !inStr => depth += 1; cur += '('
      case ')' if !inStr => depth -= 1; cur += ')'
      case ',' if !inStr && depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** `bucket(8, id)` / `days(ts)` / `truncate(4, s)` / bare column name →
    * (source column, transform). */
  def parseTransformTerm(s: String): (String, Transform) = s.trim match {
    case TransformArgRe(fn, num, col) => fn.toLowerCase match {
      case "bucket" => (col, BucketTransform(num.toInt))
      case "truncate" => (col, TruncateTransform(num.toInt))
      case "year" | "years" => (col, YearTransform)
      case "month" | "months" => (col, MonthTransform)
      case "day" | "days" => (col, DayTransform)
      case "hour" | "hours" => (col, HourTransform)
      case "void" => (col, VoidTransform)
      case "identity" => (col, IdentityTransform)
      case other => throw new UnsupportedOperationException(s"Transform: $other")
    }
    case bare if bare.matches("`?[\\w.]+`?") =>
      (bare.replace("`", ""), IdentityTransform)
    case other => throw new IllegalArgumentException(s"Cannot parse partition field: $other")
  }

  /** `bucket(4, id) ASC, ts DESC NULLS LAST` → sort fields bound to
    * `schema`. SQL default null order: NULLS FIRST iff ASC. */
  def parseFields(schema: Schema, spec: String): Seq[SortFieldMeta] =
    splitTop(spec).map {
      case FieldRe(term, dir, nulls) =>
        val (colName, transform) = parseTransformTerm(term.trim)
        val asc = dir == null || dir.equalsIgnoreCase("ASC")
        val nullsFirst =
          if (nulls == null) asc
          else nulls.equalsIgnoreCase("FIRST")
        SortFieldMeta(schema.fieldId(colName), transform.name, asc, nullsFirst)
      case other => throw new IllegalArgumentException(s"Cannot parse sort field: $other")
    }
}
