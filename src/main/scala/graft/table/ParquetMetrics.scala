package graft.table

import scala.jdk.CollectionConverters._

import graft.meta.Schema

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.types._

/** Per-file column metrics from parquet footers (ref
  * `parquet/.../ParquetUtil.java` footerMetrics): value/null counts and
  * min/max bounds keyed by field ID, in internal repr. Bounds are FULL
  * here — [[MetricsModes]] applies the per-column mode (default
  * truncate(16), upper bounds rounded *up*) when manifest entries are
  * built, so one footer read serves every mode.
  */
object ParquetMetrics {
  val BoundTruncateLength = 16

  final case class FileMetrics(
      recordCount: Long,
      valueCounts: Map[Int, Long],
      nullCounts: Map[Int, Long],
      nanCounts: Map[Int, Long],
      lowerBounds: Map[Int, Any],
      upperBounds: Map[Int, Any],
      splitOffsets: Seq[Long])

  def read(conf: Configuration, path: String, schema: Schema): FileMetrics = {
    // HadoopReadOptions (not the bare open) so a `parquet.crypto.factory
    // .class` on the conf engages modular decryption for encrypted footers
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), conf),
      org.apache.parquet.HadoopReadOptions
        .builder(conf, new Path(path)).build())
    try metricsOf(reader, schema) finally reader.close()
  }

  /** Footer read for files we did not write (import): one open resolves the
    * write schema AND computes metrics keyed by its field IDs. The physical
    * top-level column names are matched against each candidate schema —
    * most names in common wins, ties prefer `preferredId` — so a file that
    * predates a rename binds to the historical schema carrying its naming
    * (the rebuild's name-mapping equivalent; ref
    * `core/.../mapping/NameMapping.java` applied via
    * `ParquetSchemaUtil.applyNameMapping`: there IDs are grafted onto the
    * file schema, here the chosen schema version IS the name→ID mapping).
    * Returns (chosen schemaId, metrics, file length). */
  def readResolved(conf: Configuration, path: String, candidates: Seq[Schema],
      preferredId: Int): (Int, FileMetrics, Long) = {
    val in = HadoopInputFile.fromPath(new Path(path), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val physical = reader.getFooter.getFileMetaData.getSchema
        .getFields.asScala.map(_.getName).toSet
      val schema = candidates
        .maxByOption { s =>
          val hits = s.nameToId.keySet.count(physical)
          // score by coverage; break ties toward the preferred, then newest
          (hits, if (s.schemaId == preferredId) 1 else 0, s.schemaId)
        }
        .getOrElse(throw new IllegalArgumentException("No candidate schemas"))
      (schema.schemaId, metricsOf(reader, schema), in.getLength)
    } finally reader.close()
  }

  private def metricsOf(reader: ParquetFileReader, schema: Schema): FileMetrics = {
    {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val recordCount = blocks.map(_.getRowCount).sum
      val splitOffsets = blocks.map(_.getStartingPos).sorted

      val valueCounts = scala.collection.mutable.Map[Int, Long]()
      val nullCounts = scala.collection.mutable.Map[Int, Long]()
      val lowers = scala.collection.mutable.Map[Int, Any]()
      val uppers = scala.collection.mutable.Map[Int, Any]()
      val statsBroken = scala.collection.mutable.Set[Int]()

      for (block <- blocks; col <- block.getColumns.asScala) {
        val name = col.getPath.toDotString
        schema.nameToId.get(name).foreach { id =>
          val t = schema.fieldType(id)
          valueCounts(id) = valueCounts.getOrElse(id, 0L) + col.getValueCount
          val stats = col.getStatistics
          if (stats == null || stats.isEmpty) { statsBroken += id }
          else {
            if (stats.isNumNullsSet) {
              nullCounts(id) = nullCounts.getOrElse(id, 0L) + stats.getNumNulls
            } else statsBroken += id
            if (stats.hasNonNullValue) {
              (toInternal(stats.genericGetMin.asInstanceOf[AnyRef], t),
                  toInternal(stats.genericGetMax.asInstanceOf[AnyRef], t)) match {
                case (Some(mn), Some(mx)) =>
                  if (!lowers.contains(id) ||
                      graft.meta.expr.Literals.compare(t, mn, lowers(id)) < 0) lowers(id) = mn
                  if (!uppers.contains(id) ||
                      graft.meta.expr.Literals.compare(t, mx, uppers(id)) > 0) uppers(id) = mx
                case _ => statsBroken += id
              }
            }
          }
        }
      }
      statsBroken.foreach { id => lowers.remove(id); uppers.remove(id); nullCounts.remove(id) }
      // bounds are FULL here; per-column metrics modes (incl. the default
      // truncate(16)) are applied by MetricsModes at manifest-entry build
      FileMetrics(recordCount, valueCounts.toMap, nullCounts.toMap, Map.empty,
        lowers.toMap, uppers.toMap, splitOffsets)
    }
  }

  /** Next string ≥ every string with this prefix (bump last bumpable char;
    * ref `util/UnicodeUtil.truncateStringMax`). None if not representable. */
  private[table] def incrementString(s: String): Option[String] = {
    val chars = s.toCharArray
    var i = chars.length - 1
    while (i >= 0) {
      if (chars(i) != Char.MaxValue) {
        chars(i) = (chars(i) + 1).toChar
        return Some(new String(chars, 0, i + 1))
      }
      i -= 1
    }
    None
  }

  private def toInternal(v: AnyRef, t: DataType): Option[Any] = (v, t) match {
    case (i: java.lang.Integer, IntegerType | DateType) => Some(i.intValue)
    case (l: java.lang.Long, LongType | TimestampType | TimestampNTZType) => Some(l.longValue)
    case (f: java.lang.Float, FloatType) => Some(f.floatValue)
    case (d: java.lang.Double, DoubleType) => Some(d.doubleValue)
    case (b: Binary, StringType) => Some(b.toStringUsingUTF8)
    case (b: Binary, BinaryType) => Some(b.getBytes)
    case (b: java.lang.Boolean, BooleanType) => Some(b.booleanValue)
    case (b: Binary, dt: DecimalType) =>
      Some(new java.math.BigDecimal(new java.math.BigInteger(b.getBytes), dt.scale))
    case (i: java.lang.Integer, dt: DecimalType) =>
      Some(new java.math.BigDecimal(java.math.BigInteger.valueOf(i.longValue), dt.scale))
    case (l: java.lang.Long, dt: DecimalType) =>
      Some(new java.math.BigDecimal(java.math.BigInteger.valueOf(l.longValue), dt.scale))
    case _ => None
  }
}
