package graft.table

import scala.jdk.CollectionConverters._

import graft.meta.Schema
import graft.meta.model.{JsonCodecs, MetadataLogEntry, TableMetadata}

import org.apache.hadoop.hive.conf.HiveConf
import org.apache.hadoop.hive.metastore.HiveMetaStoreClient
import org.apache.hadoop.hive.metastore.api.{Database, FieldSchema, LockComponent, LockLevel, LockRequest, LockState, LockType, NoSuchObjectException, SerDeInfo, StorageDescriptor, Table => HmsTable}

import org.apache.spark.sql.types._

/** Hive-metastore-backed catalog store (ref
  * `hive-metastore/.../HiveTableOperations.java`): the table's current
  * metadata pointer lives in HMS table PARAMETERS (`metadata_location`),
  * and commits follow the reference's lock protocol — acquire an HMS
  * EXCLUSIVE table lock, re-read the pointer, verify it matches the
  * commit's base, `alter_table` the new pointer, unlock. HMS has no native
  * compare-and-swap, which is exactly why the lock exists; the lock + check
  * composes one.
  *
  * Works against a remote metastore (`uri` = thrift://...) or an embedded
  * one (no uri → in-process HMS over Derby at `jdo-uri`, with the TXN/lock
  * schema bootstrapped via `TxnDbUtil.prepDb` — the embedded shape tests
  * run against). One client per store, serialized: HMS clients are not
  * thread-safe, and catalog traffic is driver-side metadata traffic. */
final class HiveCatalogStore(uri: Option[String], jdoUri: Option[String],
    warehouse: String) {

  private val conf = new HiveConf()
  uri match {
    case Some(u) => conf.set("hive.metastore.uris", u)
    case None =>
      val jdo = jdoUri.getOrElse(
        s"jdbc:derby:;databaseName=$warehouse/_hms_db;create=true")
      conf.set("javax.jdo.option.ConnectionURL", jdo)
      conf.set("javax.jdo.option.ConnectionDriverName",
        "org.apache.derby.jdbc.EmbeddedDriver")
      conf.set("datanucleus.schema.autoCreateAll", "true")
      conf.set("hive.metastore.schema.verification", "false")
      // TxnHandler's default pool (BoneCP) is not on the classpath; dbcp is
      conf.set("datanucleus.connectionPoolingType", "dbcp")
      conf.set("hive.metastore.warehouse.dir", warehouse)
      // embedded Derby has no schematool run against it: create the TXN/lock
      // tables the lock endpoint needs (idempotent — rerun throws on
      // existing tables, which is the signal the schema is already there)
      try org.apache.hadoop.hive.metastore.txn.TxnDbUtil.prepDb(conf)
      catch { case _: Throwable => () }
  }

  private val client = new HiveMetaStoreClient(conf)
  private val agent = "graft"
  private val host = java.net.InetAddress.getLocalHost.getHostName

  val MetadataLocationProp = "metadata_location"
  val PreviousMetadataLocationProp = "previous_metadata_location"
  val PointerVersionProp = "pointer_version"
  val TableTypeProp = "table_type"
  val TableTypeValue = "GRAFT"

  // ------------------------------------------------------------------ locks

  /** Run `f` holding an HMS EXCLUSIVE lock on db.name (ref
    * `HiveTableOperations.acquireLock`): poll WAITING via checkLock until
    * ACQUIRED or timeout; always unlock. */
  def withTableLock[A](db: String, name: String)(f: => A): A = synchronized {
    val comp = new LockComponent(LockType.EXCLUSIVE, LockLevel.TABLE, db)
    comp.setTablename(name)
    var resp = client.lock(new LockRequest(List(comp).asJava, agent, host))
    val deadline = System.currentTimeMillis() + 180000L
    try {
      while (resp.getState == LockState.WAITING &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
        resp = client.checkLock(resp.getLockid)
      }
      if (resp.getState != LockState.ACQUIRED)
        throw new CommitFailedException(
          s"Could not acquire metastore lock on $db.$name: ${resp.getState}")
      f
    } finally {
      try client.unlock(resp.getLockid) catch { case _: Exception => () }
    }
  }

  // ----------------------------------------------------------------- tables

  def getTable(db: String, name: String): Option[HmsTable] = synchronized {
    try Some(client.getTable(db, name))
    catch { case _: NoSuchObjectException => None }
  }

  /** (pointer version, metadata location, table location). */
  def getPointer(db: String, name: String): Option[(Int, String, String)] =
    getTable(db, name).map { t =>
      (Option(t.getParameters.get(PointerVersionProp)).map(_.toInt).getOrElse(1),
        t.getParameters.get(MetadataLocationProp), t.getSd.getLocation)
    }

  /** Hive-visible column types, best effort (HMS is interop surface, the
    * metadata JSON is authoritative). */
  private def hiveType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case DateType => "date"
    case _: TimestampType => "timestamp"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case a: ArrayType => s"array<${hiveType(a.elementType)}>"
    case m: MapType => s"map<${hiveType(m.keyType)},${hiveType(m.valueType)}>"
    case s: StructType =>
      s"struct<${s.fields.map(f => s"${f.name}:${hiveType(f.dataType)}").mkString(",")}>"
    case other => "string"
  }

  private def toHmsTable(db: String, name: String, location: String,
      schema: Schema, version: Int, metadataLocation: String): HmsTable = {
    val sd = new StorageDescriptor()
    sd.setCols(schema.struct.fields.map(f =>
      new FieldSchema(f.name, hiveType(f.dataType), "")).toList.asJava)
    sd.setLocation(location)
    sd.setSerdeInfo(new SerDeInfo())
    val t = new HmsTable(name, db, agent, 0, 0, 0, sd,
      List.empty[FieldSchema].asJava, new java.util.HashMap[String, String](),
      null, null, "EXTERNAL_TABLE")
    t.getParameters.put("EXTERNAL", "TRUE")
    t.getParameters.put(TableTypeProp, TableTypeValue)
    t.getParameters.put(PointerVersionProp, version.toString)
    t.getParameters.put(MetadataLocationProp, metadataLocation)
    t
  }

  /** Publish a NEW table; false when it already exists (lost the race). */
  def insertPointer(db: String, name: String, location: String, schema: Schema,
      version: Int, metadataLocation: String): Boolean = synchronized {
    try { client.createTable(toHmsTable(db, name, location, schema, version,
      metadataLocation)); true }
    catch { case _: org.apache.hadoop.hive.metastore.api.AlreadyExistsException => false }
  }

  /** Point an EXISTING entry at a replacement table (RTAS publish). */
  def replacePointer(db: String, name: String, location: String, schema: Schema,
      version: Int, metadataLocation: String): Boolean = synchronized {
    getTable(db, name) match {
      case None => insertPointer(db, name, location, schema, version, metadataLocation)
      case Some(t) =>
        t.getSd.setLocation(location)
        t.getParameters.put(PointerVersionProp, version.toString)
        t.getParameters.put(MetadataLocationProp, metadataLocation)
        t.getParameters.remove(PreviousMetadataLocationProp)
        client.alter_table(db, name, t); true
    }
  }

  /** The reference commit protocol: under the table lock, re-read the
    * pointer, require it still equals `expectedMetadataLocation`, then
    * alter. False = someone committed underneath us. */
  def casPointer(db: String, name: String, expectedMetadataLocation: String,
      newVersion: Int, newMetadataLocation: String): Boolean =
    withTableLock(db, name) {
      getTable(db, name) match {
        case None => false
        case Some(t) =>
          if (t.getParameters.get(MetadataLocationProp) != expectedMetadataLocation)
            false
          else {
            t.getParameters.put(PreviousMetadataLocationProp, expectedMetadataLocation)
            t.getParameters.put(PointerVersionProp, newVersion.toString)
            t.getParameters.put(MetadataLocationProp, newMetadataLocation)
            client.alter_table(db, name, t)
            true
          }
      }
    }

  def dropPointer(db: String, name: String): Boolean = synchronized {
    try { client.dropTable(db, name, false, false); true }
    catch { case _: NoSuchObjectException => false }
  }

  def renamePointer(fromDb: String, fromName: String, toDb: String,
      toName: String): Unit = synchronized {
    val t = client.getTable(fromDb, fromName)
    t.setDbName(toDb)
    t.setTableName(toName)
    client.alter_table(fromDb, fromName, t)
  }

  def listTables(db: String): Seq[String] = synchronized {
    try client.getAllTables(db).asScala.toSeq
    catch { case _: NoSuchObjectException => Nil }
  }

  // ------------------------------------------------------------- databases

  def createDatabase(db: String): Unit = synchronized {
    try client.createDatabase(new Database(db, "",
      s"$warehouse/$db", Map.empty[String, String].asJava))
    catch { case _: org.apache.hadoop.hive.metastore.api.AlreadyExistsException => () }
  }

  def databaseExists(db: String): Boolean = synchronized {
    try { client.getDatabase(db); true }
    catch { case _: NoSuchObjectException => false }
  }

  def dropDatabase(db: String): Unit = synchronized {
    try client.dropDatabase(db, false, false, false)
    catch { case _: NoSuchObjectException => () }
  }

  def listDatabases(): Seq[String] = synchronized {
    client.getAllDatabases.asScala.toSeq.filterNot(_ == "default")
  }
}

/** [[TableOps]] whose pointer CAS is the Hive-metastore lock + alter
  * protocol. Metadata files use UNIQUE names (like [[JdbcTableOperations]]):
  * a racing loser deletes only its own file, and a crashed pre-commit
  * writer orphans one file rather than wedging the table. `staged = true`
  * keeps commits local until publish (CTAS/RTAS). */
final class HiveTableOperations(val location: String, val io: FileIO,
    store: HiveCatalogStore, db: String, tableName: String,
    staged: Boolean = false) extends TableOps {

  @volatile private var local: Option[(Int, String)] = None
  @volatile private var cached: (String, TableMetadata) = _

  private def metadataDir = s"$location/metadata"

  private def pointer: Option[(Int, String)] =
    if (staged) local
    else store.getPointer(db, tableName).map(p => (p._1, p._2))

  override def exists: Boolean = pointer.isDefined

  override def current(): (Int, TableMetadata) = {
    val (v, loc) = pointer.getOrElse(
      throw new NoSuchTableException(s"No table $db.$tableName at $location"))
    val c = cached
    val meta =
      if (c != null && c._1 == loc) c._2
      else {
        val m = JsonCodecs.tableMetadataFromJson(io.readString(loc))
        cached = (loc, m)
        m
      }
    (v, meta)
  }

  override def commit(expectedVersion: Int, meta: TableMetadata): Boolean = {
    val prev = pointer
    if (prev.map(_._1).getOrElse(0) != expectedVersion) return false
    val withLog = prev match {
      case Some((_, prevLoc)) => meta.copy(metadataLog = meta.metadataLog :+
        MetadataLogEntry(System.currentTimeMillis(), prevLoc))
      case None => meta
    }
    val (trimmed, dropped) = MetadataHousekeeping.trim(withLog)
    io.mkdirs(metadataDir)
    val ext =
      if (meta.property("write.metadata.compression-codec", "none") == "gzip")
        ".gz.metadata.json"
      else ".metadata.json"
    val file = s"$metadataDir/v${expectedVersion + 1}-" +
      s"${java.util.UUID.randomUUID().toString.take(8)}$ext"
    if (!io.writeAtomic(file, JsonCodecs.tableMetadataToJson(trimmed))) return false
    val ok =
      if (staged) synchronized {
        if (local == prev) { local = Some((expectedVersion + 1, file)); true }
        else false
      }
      else if (prev.isEmpty)
        store.insertPointer(db, tableName, location, meta.schema, 1, file)
      else store.casPointer(db, tableName, prev.get._2, expectedVersion + 1, file)
    if (!ok) io.delete(file)
    else MetadataHousekeeping.deleteQuietly(io, dropped)
    ok
  }

  /** Publish a staged table as a NEW metastore entry. */
  def publish(meta: TableMetadata): Boolean = local.exists { case (v, loc) =>
    store.insertPointer(db, tableName, location, meta.schema, v, loc)
  }

  /** Publish a staged table over an existing entry (RTAS); returns the
    * replaced table's location for cleanup. */
  def publishReplace(meta: TableMetadata): Option[String] = local.flatMap { case (v, loc) =>
    val old = store.getPointer(db, tableName)
    if (!store.replacePointer(db, tableName, location, meta.schema, v, loc))
      throw new CommitFailedException(
        s"Could not publish replacement for $db.$tableName")
    old.map(_._3).filter(_ != location)
  }
}
