package graft.meta

import org.apache.spark.sql.types._

/** An Iceberg-style schema: a Spark `StructType` whose every field carries a
  * stable numeric field ID (in `StructField` metadata under
  * [[Schema.FieldIdKey]]). Field IDs — not names — are the backbone of schema
  * evolution (ref `api/.../Schema.java:50`, `types/Types.java:416`): columns
  * are resolved by ID, so renames are free and adds/drops never alias old
  * data.
  */
final case class Schema(struct: StructType, schemaId: Int = 0,
    identifierFieldIds: Seq[Int] = Nil) extends Serializable {

  /** Row-identity column names (ref `Schema.java` identifierFieldIds) —
    * the default keys for equality deletes and upserts. */
  def identifierFieldNames: Seq[String] = identifierFieldIds.map(fieldName)

  lazy val idToField: Map[Int, StructField] =
    Schema.fieldsWithIds(struct).map { case (f, id) => id -> f }.toMap
  lazy val nameToId: Map[String, Int] =
    Schema.fieldsWithIds(struct).map { case (f, id) => f.name -> id }.toMap
  lazy val idToName: Map[Int, String] = nameToId.map(_.swap)

  def fieldId(name: String): Int =
    nameToId.getOrElse(name,
      nameToId.collectFirst { case (n, id) if n.equalsIgnoreCase(name) => id }
        .getOrElse(throw new IllegalArgumentException(
          s"Field not found: $name in ${struct.fieldNames.mkString(",")}")))

  def fieldName(id: Int): String = idToName(id)
  def fieldType(id: Int): DataType = idToField(id).dataType
  def contains(name: String): Boolean =
    nameToId.contains(name) || nameToId.keys.exists(_.equalsIgnoreCase(name))

  def highestFieldId: Int = (0 +: idToField.keys.toSeq).max

  /** Projection by column name, preserving IDs. */
  def select(names: String*): Schema =
    Schema(StructType(names.map(n => struct(struct.fieldIndex(n)))), schemaId,
      identifierFieldIds.filter(id =>
        names.exists(n => nameToId.get(n).contains(id))))

  /** The column names in schema order. */
  def columnNames: Seq[String] = struct.fields.map(_.name).toSeq
}

object Schema {
  val FieldIdKey = "graft.field-id"

  /** Build a schema from a Spark StructType, assigning fresh field IDs 1..n
    * (depth-first, like the ref's `TypeUtil.assignFreshIds`). */
  def fresh(struct: StructType): Schema = {
    var nextId = 0
    def assign(dt: DataType): DataType = dt match {
      case s: StructType =>
        StructType(s.fields.map { f =>
          nextId += 1
          val id = nextId
          val withId = new MetadataBuilder().withMetadata(f.metadata)
            .putLong(FieldIdKey, id.toLong).build()
          f.copy(dataType = assign(f.dataType), metadata = withId)
        })
      case a: ArrayType => a.copy(elementType = assign(a.elementType))
      case m: MapType =>
        m.copy(keyType = assign(m.keyType), valueType = assign(m.valueType))
      case other => other
    }
    Schema(assign(struct).asInstanceOf[StructType])
  }

  def fieldsWithIds(struct: StructType): Seq[(StructField, Int)] =
    struct.fields.toSeq.map { f =>
      require(f.metadata.contains(FieldIdKey), s"Field ${f.name} has no field ID")
      (f, f.metadata.getLong(FieldIdKey).toInt)
    }

  def fieldId(f: StructField): Int = f.metadata.getLong(FieldIdKey).toInt

  /** Valid type promotions (ref `api/.../types/CheckCompatibility` /
    * `SchemaUpdate.updateColumn`): int→long, float→double, decimal scale-
    * preserving precision widening. */
  def isPromotionValid(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (d1: DecimalType, d2: DecimalType) =>
      d1.scale == d2.scale && d2.precision >= d1.precision
    case _ => false
  }
}

/** Schema evolution builder (ref `core/.../SchemaUpdate.java:49`): collects
  * changes, applies them atomically via [[UpdateSchema.apply]]. Deletes win
  * over updates; IDs of deleted columns are never reused.
  */
final class UpdateSchema(base: Schema, baseLastColumnId: Int) {
  private var fields: Vector[StructField] = base.struct.fields.toVector
  private var lastColumnId: Int = math.max(baseLastColumnId, base.highestFieldId)

  def lastAssignedId: Int = lastColumnId

  private def withId(f: StructField, id: Int): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(Schema.FieldIdKey, id.toLong).build())

  private def idx(name: String): Int = {
    val i = fields.indexWhere(_.name == name)
    require(i >= 0, s"Cannot find column: $name")
    i
  }

  def addColumn(name: String, dataType: DataType, doc: String = null): UpdateSchema = {
    require(!fields.exists(_.name == name), s"Cannot add column, name exists: $name")
    lastColumnId += 1
    val md = new MetadataBuilder().putLong(Schema.FieldIdKey, lastColumnId.toLong)
    if (doc != null) md.putString("doc", doc)
    // adds are always optional: existing files have no values for them
    fields = fields :+ StructField(name, dataType, nullable = true, md.build())
    this
  }

  def addRequiredColumn(name: String, dataType: DataType): UpdateSchema = {
    addColumn(name, dataType)
    fields = fields.updated(fields.length - 1, fields.last.copy(nullable = false))
    this
  }

  def deleteColumn(name: String): UpdateSchema = {
    fields = fields.patch(idx(name), Nil, 1); this
  }

  def renameColumn(name: String, newName: String): UpdateSchema = {
    val i = idx(name)
    require(!fields.exists(_.name == newName), s"Rename target exists: $newName")
    fields = fields.updated(i, fields(i).copy(name = newName)); this
  }

  def updateColumn(name: String, newType: DataType): UpdateSchema = {
    val i = idx(name)
    require(Schema.isPromotionValid(fields(i).dataType, newType),
      s"Cannot promote ${fields(i).dataType} to $newType for $name")
    fields = fields.updated(i, fields(i).copy(dataType = newType)); this
  }

  def makeColumnOptional(name: String): UpdateSchema = {
    val i = idx(name)
    fields = fields.updated(i, fields(i).copy(nullable = true)); this
  }

  def requireColumn(name: String): UpdateSchema = {
    val i = idx(name)
    fields = fields.updated(i, fields(i).copy(nullable = false)); this
  }

  def moveFirst(name: String): UpdateSchema = {
    val i = idx(name); val f = fields(i)
    fields = f +: fields.patch(i, Nil, 1); this
  }

  def moveBefore(name: String, anchor: String): UpdateSchema = move(name, anchor, before = true)
  def moveAfter(name: String, anchor: String): UpdateSchema = move(name, anchor, before = false)

  private def move(name: String, anchor: String, before: Boolean): UpdateSchema = {
    val i = idx(name); val f = fields(i)
    val without = fields.patch(i, Nil, 1)
    val a = without.indexWhere(_.name == anchor)
    require(a >= 0, s"Cannot find anchor column: $anchor")
    val at = if (before) a else a + 1
    fields = (without.take(at) :+ f) ++ without.drop(at); this
  }

  /** Merge another schema by name (ref `SchemaUpdate.unionByNameWith:327`):
    * new names are added with fresh IDs, existing names keep their IDs and
    * are promoted if the incoming type is wider. */
  def unionByNameWith(other: StructType): UpdateSchema = {
    other.fields.foreach { in =>
      fields.find(_.name == in.name) match {
        case None => addColumn(in.name, in.dataType)
        case Some(cur) if cur.dataType != in.dataType
            && Schema.isPromotionValid(cur.dataType, in.dataType) =>
          updateColumn(in.name, in.dataType)
        case Some(cur) if cur.dataType != in.dataType
            && !Schema.isPromotionValid(in.dataType, cur.dataType) =>
          throw new IllegalArgumentException(
            s"Cannot union ${in.name}: ${in.dataType} vs ${cur.dataType}")
        case _ => // same or narrower: keep
      }
    }
    this
  }

  def apply(): Schema = {
    val surviving = Schema.fieldsWithIds(StructType(fields)).map(_._2).toSet
    // identifier fields cannot be dropped implicitly (ref SchemaUpdate
    // "Cannot delete identifier field") — clear them first
    base.identifierFieldIds.filterNot(surviving.contains).foreach { id =>
      throw new IllegalArgumentException(
        s"Cannot delete identifier field: ${base.fieldName(id)} (id $id); " +
          "drop it from the identifier fields first")
    }
    Schema(StructType(fields), base.schemaId + 1,
      base.identifierFieldIds)
  }
}
