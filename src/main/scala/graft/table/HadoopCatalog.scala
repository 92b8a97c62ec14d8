package graft.table

import graft.meta.{PartitionSpec, Schema}
import graft.meta.model.SortOrderMeta

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Directory-based catalog: `warehouse/<namespace>/<table>` (ref
  * `core/.../hadoop/HadoopCatalog.java` — atomic-rename commits on a
  * filesystem; SURVEY §2.9 says one such catalog suffices for parity).
  */
final class HadoopCatalog(spark: SparkSession, warehouse: String) {
  private val io = new FileIO(spark.sparkContext.hadoopConfiguration)

  private def tablePath(name: String): String =
    s"$warehouse/${name.replace('.', '/')}"

  def createTable(name: String, schema: Schema,
      spec: PartitionSpec = PartitionSpec.unpartitioned,
      sortOrder: SortOrderMeta = SortOrderMeta.unsorted,
      properties: Map[String, String] = Map.empty): IceTable =
    IceTable.create(spark, tablePath(name), schema, spec, sortOrder, properties)

  /** CTAS: create + append in one go (ref `SparkCatalog.stageCreate` CTAS). */
  def createTableAs(name: String, df: DataFrame,
      spec: PartitionSpec.Builder => PartitionSpec.Builder = identity,
      properties: Map[String, String] = Map.empty): IceTable = {
    val schema = Schema.fresh(df.schema)
    val t = IceTable.create(spark, tablePath(name), schema,
      spec(PartitionSpec.builderFor(schema)).build(), properties = properties)
    t.append(df)
    t
  }

  /** RTAS: atomic replace of the table's content with `df` (same location,
    * history preserved as a new overwrite snapshot). */
  def replaceTableAs(name: String, df: DataFrame): IceTable = {
    val t = loadTable(name)
    t.overwrite(graft.meta.expr.TrueExpr, df)
    t
  }

  def loadTable(name: String): IceTable = IceTable.load(spark, tablePath(name))

  def tableExists(name: String): Boolean = IceTable.exists(spark, tablePath(name))

  def dropTable(name: String, purge: Boolean = true): Boolean = {
    if (!tableExists(name)) return false
    if (purge) io.deleteRecursive(tablePath(name))
    else io.deleteRecursive(s"${tablePath(name)}/metadata")
    true
  }

  def listTables(namespace: String = ""): Seq[String] = {
    val dir = if (namespace.isEmpty) warehouse else s"$warehouse/$namespace"
    io.list(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => io.exists(s"$dir/$n/metadata/version-hint.text"))
  }
}
