package graft.spark

import java.util

import org.apache.spark.sql.connector.catalog.{DelegatingCatalogExtension, Identifier,
  Table, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Session-catalog extension (ref `spark3/.../SparkSessionCatalog.java`):
  * installed as `spark.sql.catalog.spark_catalog`, it keeps every built-in
  * table working through delegation while tables created `USING graft` (and
  * any table already present in the graft warehouse) route to the graft
  * catalog — so unqualified SQL (`SELECT * FROM db.t`) reaches graft tables
  * without a catalog prefix.
  *
  * CTAS through the session catalog is create-then-insert (Spark's
  * non-staged fallback drops the table on failure); use a dedicated
  * [[GraftCatalog]] when atomic staged CTAS matters.
  */
class GraftSessionCatalog extends DelegatingCatalogExtension {

  private var graft: GraftCatalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    super.initialize(name, options)
    require(options.containsKey("warehouse"),
      "GraftSessionCatalog requires a 'warehouse' option")
    graft = new GraftCatalog()
    graft.initialize(name, options)
  }

  private def inGraft(ident: Identifier): Boolean =
    graft != null && graft.tableExists(ident)

  private def isGraftProvider(properties: util.Map[String, String]): Boolean =
    "graft".equalsIgnoreCase(properties.get("provider"))

  override def loadTable(ident: Identifier): Table =
    if (inGraft(ident)) graft.loadTable(ident) else super.loadTable(ident)

  override def loadTable(ident: Identifier, version: String): Table =
    if (inGraft(ident)) graft.loadTable(ident, version)
    else super.loadTable(ident, version)

  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    if (inGraft(ident)) graft.loadTable(ident, timestampMicros)
    else super.loadTable(ident, timestampMicros)

  override def tableExists(ident: Identifier): Boolean =
    inGraft(ident) || super.tableExists(ident)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    if (isGraftProvider(properties)) {
      // the graft warehouse needs no pre-created namespace directory; Spark
      // has already checked the database exists in the session catalog
      graft.createTable(ident, schema, partitions, properties)
    } else super.createTable(ident, schema, partitions, properties)

  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    createTable(ident,
      org.apache.spark.sql.graft.ColumnBridge.v2ColumnsToStructType(columns),
      partitions, properties)

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    if (inGraft(ident)) graft.alterTable(ident, changes: _*)
    else super.alterTable(ident, changes: _*)

  override def dropTable(ident: Identifier): Boolean =
    if (inGraft(ident)) graft.dropTable(ident) else super.dropTable(ident)

  override def purgeTable(ident: Identifier): Boolean =
    if (inGraft(ident)) graft.dropTable(ident) else super.purgeTable(ident)

  override def renameTable(from: Identifier, to: Identifier): Unit =
    if (inGraft(from)) graft.renameTable(from, to)
    else super.renameTable(from, to)

  override def invalidateTable(ident: Identifier): Unit =
    if (!inGraft(ident)) super.invalidateTable(ident)
}
