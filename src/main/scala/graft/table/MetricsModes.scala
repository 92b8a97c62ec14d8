package graft.table

import graft.meta.Schema
import graft.meta.model.{TableMetadata, TableProperties}

/** Per-column metrics collection modes (ref `core/.../MetricsModes.java:43-98`
  * + `TableProperties.java` METRICS_MODE_*): what a data file's manifest
  * entry records per column.
  *
  *  - `none`      — no counts, no bounds (wide blob/embedding columns: keeps
  *                  manifests small and planning fast)
  *  - `counts`    — value/null/NaN counts only
  *  - `truncate(N)` — counts + bounds, string/binary bounds cut to N
  *                  (lower: prefix — still ≤ every value; upper: next
  *                  greater prefix — still ≥ every value). The default,
  *                  N=16.
  *  - `full`      — counts + untruncated bounds
  *
  * `write.metadata.metrics.default` sets the table default;
  * `write.metadata.metrics.column.<name>` overrides per column. Evaluators
  * already treat missing stats conservatively (inclusive: might match;
  * strict: cannot prove), and aggregate pushdown declines when any file
  * lacks the counts/bounds it needs — so dropping metrics is always safe,
  * only less prunable.
  */
object MetricsModes {

  sealed trait Mode
  case object NoMetrics extends Mode
  case object Counts extends Mode
  final case class Truncate(length: Int) extends Mode
  case object Full extends Mode

  val DefaultProp = "write.metadata.metrics.default"
  val ColumnPropPrefix = "write.metadata.metrics.column."
  val Default: Mode = Truncate(ParquetMetrics.BoundTruncateLength)

  private val TruncateRe = """(?i)truncate\((\d+)\)""".r

  def parse(s: String): Mode = s.trim match {
    case t if t.equalsIgnoreCase("none") => NoMetrics
    case t if t.equalsIgnoreCase("counts") => Counts
    case t if t.equalsIgnoreCase("full") => Full
    case TruncateRe(n) if n.toInt > 0 => Truncate(n.toInt)
    case other => throw new IllegalArgumentException(
      s"Invalid metrics mode: $other (none|counts|truncate(N)|full)")
  }

  /** fieldId → mode for the current schema under `m`'s properties.
    * LENIENT like the reference's config reading: a property naming a
    * column that no longer exists (dropped/renamed after the property was
    * set) is skipped, and an unparseable mode value falls back to the
    * default — a stale table property must never fail every write. */
  def forTable(m: TableMetadata): Int => Mode = {
    val default = m.properties.get(DefaultProp)
      .flatMap(v => scala.util.Try(parse(v)).toOption).getOrElse(Default)
    val byId: Map[Int, Mode] = m.properties.iterator.collect {
      case (k, v) if k.startsWith(ColumnPropPrefix) =>
        scala.util.Try(m.schema.fieldId(k.stripPrefix(ColumnPropPrefix)))
          .toOption.map(_ -> scala.util.Try(parse(v)).getOrElse(default))
    }.flatten.toMap
    id => byId.getOrElse(id, default)
  }

  /** Filter footer metrics down to what each column's mode records. */
  def apply(metrics: ParquetMetrics.FileMetrics, schema: Schema,
      modeOf: Int => Mode): ParquetMetrics.FileMetrics = {
    def counts(m: Map[Int, Long]) = m.filter { case (id, _) => modeOf(id) != NoMetrics }
    def bounds(m: Map[Int, Any], upper: Boolean) = m.flatMap { case (id, v) =>
      modeOf(id) match {
        case Full => Some(id -> v)
        case Truncate(n) => truncateBound(v, n, upper).map(id -> _)
        case _ => None
      }
    }
    metrics.copy(
      valueCounts = counts(metrics.valueCounts),
      nullCounts = counts(metrics.nullCounts),
      nanCounts = counts(metrics.nanCounts),
      lowerBounds = bounds(metrics.lowerBounds, upper = false),
      upperBounds = bounds(metrics.upperBounds, upper = true))
  }

  /** Sound truncation: lower bounds shrink to a prefix (≤ original ≤ every
    * value); upper bounds round UP to the next string/bytes greater than
    * every value with the truncated prefix (None when not representable —
    * the bound is then dropped, which is conservative). */
  private[table] def truncateBound(v: Any, n: Int, upper: Boolean): Option[Any] = v match {
    case s: String if s.length > n =>
      if (upper) ParquetMetrics.incrementString(s.substring(0, n))
      else Some(s.substring(0, n))
    case b: Array[Byte] if b.length > n =>
      if (upper) incrementBytes(java.util.Arrays.copyOf(b, n))
      else Some(java.util.Arrays.copyOf(b, n))
    case other => Some(other)
  }

  private def incrementBytes(b: Array[Byte]): Option[Array[Byte]] = {
    var i = b.length - 1
    while (i >= 0) {
      if (b(i) != -1) { // 0xFF
        b(i) = (b(i) + 1).toByte
        return Some(java.util.Arrays.copyOf(b, i + 1))
      }
      i -= 1
    }
    None
  }
}
