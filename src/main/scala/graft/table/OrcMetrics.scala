package graft.table

import graft.meta.Schema

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.orc.{ColumnStatistics, DateColumnStatistics, DoubleColumnStatistics,
  IntegerColumnStatistics, OrcFile, StringColumnStatistics}
import org.apache.spark.sql.types._

/** Per-file column metrics from ORC footers (ref `orc/.../OrcMetrics.java`):
  * value/null counts and min/max for integer/floating/string/date columns;
  * timestamp bounds are skipped (conservative pruning). */
object OrcMetrics {

  def read(conf: Configuration, path: String, schema: Schema): ParquetMetrics.FileMetrics = {
    val reader = OrcFile.createReader(new Path(path), OrcFile.readerOptions(conf))
    try {
      val rows = reader.getNumberOfRows
      val stats = reader.getStatistics // index 0 = root; top-level col i at i+1
      val orcSchema = reader.getSchema
      val names = orcSchema.getFieldNames
      val valueCounts = scala.collection.mutable.Map[Int, Long]()
      val nullCounts = scala.collection.mutable.Map[Int, Long]()
      val lowers = scala.collection.mutable.Map[Int, Any]()
      val uppers = scala.collection.mutable.Map[Int, Any]()
      var i = 0
      while (i < names.size()) {
        val name = names.get(i)
        schema.nameToId.get(name).foreach { id =>
          val t = schema.fieldType(id)
          val colId = orcSchema.getChildren.get(i).getId
          val s: ColumnStatistics = stats(colId)
          valueCounts(id) = rows
          nullCounts(id) = rows - s.getNumberOfValues
          if (s.getNumberOfValues > 0) bounds(s, t).foreach { case (lo, hi) =>
            lowers(id) = lo; uppers(id) = hi
          }
        }
        i += 1
      }
      ParquetMetrics.FileMetrics(rows, valueCounts.toMap, nullCounts.toMap,
        Map.empty, lowers.toMap, uppers.toMap, Nil)
    } finally reader.close()
  }

  private def bounds(s: ColumnStatistics, t: DataType): Option[(Any, Any)] = (s, t) match {
    case (is: IntegerColumnStatistics, IntegerType) =>
      Some((is.getMinimum.toInt, is.getMaximum.toInt))
    case (is: IntegerColumnStatistics, LongType) =>
      Some((is.getMinimum, is.getMaximum))
    case (ds: DoubleColumnStatistics, DoubleType) =>
      Some((ds.getMinimum, ds.getMaximum))
    case (ds: DoubleColumnStatistics, FloatType) =>
      Some((ds.getMinimum.toFloat, ds.getMaximum.toFloat))
    case (ss: StringColumnStatistics, StringType) if ss.getMinimum != null =>
      Some((ss.getMinimum, ss.getMaximum))
    case (ds: DateColumnStatistics, DateType) if ds.getMinimumLocalDate != null =>
      Some((ds.getMinimumLocalDate.toEpochDay.toInt, ds.getMaximumLocalDate.toEpochDay.toInt))
    case _ => None // timestamps etc.: no bounds (conservative)
  }
}
