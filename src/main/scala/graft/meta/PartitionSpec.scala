package graft.meta

import graft.meta.transforms.{IdentityTransform, Transform}

import org.apache.spark.sql.types.DataType

/** One partition field: a transform applied to a source column
  * (ref `api/.../PartitionSpec.java`). Partition field IDs start at 1000 by
  * convention, disjoint from data field IDs. */
final case class PartitionField(sourceId: Int, fieldId: Int, name: String,
    transform: Transform) extends Serializable

final case class PartitionSpec(specId: Int, fields: Seq[PartitionField])
    extends Serializable {
  def isUnpartitioned: Boolean = fields.isEmpty
  def isPartitioned: Boolean = fields.nonEmpty

  /** Transform-result type of each partition field under `schema`. */
  def fieldType(schema: Schema, f: PartitionField): DataType =
    f.transform.resultType(schema.fieldType(f.sourceId))

  def fieldsBySourceId(sourceId: Int): Seq[PartitionField] =
    fields.filter(_.sourceId == sourceId)

  /** True when `fieldId`'s value is exactly recoverable from the partition
    * tuple (identity-transformed). */
  def identitySourceIds: Set[Int] =
    fields.collect { case f if f.transform == IdentityTransform => f.sourceId }.toSet
}

object PartitionSpec {
  val unpartitioned: PartitionSpec = PartitionSpec(0, Nil)

  /** Builder: `PartitionSpec.builderFor(schema).bucket("id", 8).day("ts").build()` */
  def builderFor(schema: Schema): Builder = new Builder(schema)

  final class Builder(schema: Schema) {
    private var nextFieldId = 999
    private val fields = Vector.newBuilder[PartitionField]
    private def freshId(): Int = { nextFieldId += 1; nextFieldId }

    def add(sourceName: String, transform: Transform, name: String = null): Builder = {
      val srcId = schema.fieldId(sourceName)
      val srcType = schema.fieldType(srcId)
      require(transform.canTransform(srcType),
        s"Cannot apply ${transform.name} to $sourceName: $srcType")
      val n = if (name != null) name else transform.columnName(schema.fieldName(srcId))
      fields += PartitionField(srcId, freshId(), n, transform)
      this
    }
    def identity(col: String): Builder = add(col, IdentityTransform)
    def bucket(col: String, n: Int): Builder =
      add(col, graft.meta.transforms.BucketTransform(n))
    def truncate(col: String, w: Int): Builder =
      add(col, graft.meta.transforms.TruncateTransform(w))
    def year(col: String): Builder = add(col, graft.meta.transforms.YearTransform)
    def month(col: String): Builder = add(col, graft.meta.transforms.MonthTransform)
    def day(col: String): Builder = add(col, graft.meta.transforms.DayTransform)
    def hour(col: String): Builder = add(col, graft.meta.transforms.HourTransform)

    def build(specId: Int = 0): PartitionSpec = PartitionSpec(specId, fields.result())
  }
}
