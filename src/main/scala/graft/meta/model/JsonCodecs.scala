package graft.meta.model

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.meta.{PartitionField, PartitionSpec, Schema}
import graft.meta.transforms.Transform

import org.apache.spark.sql.types._

/** JSON (de)serialization for the metadata tree (ref
  * `core/.../TableMetadataParser.java`, `SnapshotParser`, `DataFileParser`).
  * Schemas round-trip through Spark's own `StructType.json`, which preserves
  * the field-ID metadata. Bound/partition values are type-directed strings.
  */
object JsonCodecs {
  val mapper = new ObjectMapper()

  // ---- typed single values (bounds, partition values) ----
  def valueToJson(t: DataType, v: Any, node: ObjectNode, field: String): Unit = v match {
    case null => node.putNull(field)
    case _ => t match {
      case IntegerType | DateType => node.put(field, v.asInstanceOf[Int])
      case LongType | TimestampType | TimestampNTZType => node.put(field, v.asInstanceOf[Long])
      case FloatType => node.put(field, v.asInstanceOf[Float])
      case DoubleType => node.put(field, v.asInstanceOf[Double])
      case StringType => node.put(field, v.asInstanceOf[String])
      case BooleanType => node.put(field, v.asInstanceOf[Boolean])
      case BinaryType =>
        node.put(field, java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]]))
      case _: DecimalType =>
        node.put(field, v.asInstanceOf[java.math.BigDecimal].toPlainString)
      case other => throw new IllegalArgumentException(s"Cannot serialize value of $other")
    }
  }

  def valueFromJson(t: DataType, n: JsonNode): Any =
    if (n == null || n.isNull) null
    else t match {
      case IntegerType | DateType => n.asInt
      case LongType | TimestampType | TimestampNTZType => n.asLong
      case FloatType => n.asDouble.toFloat
      case DoubleType => n.asDouble
      case StringType => n.asText
      case BooleanType => n.asBoolean
      case BinaryType => java.util.Base64.getDecoder.decode(n.asText)
      case _: DecimalType => new java.math.BigDecimal(n.asText)
      case other => throw new IllegalArgumentException(s"Cannot deserialize value of $other")
    }

  private def longMapToJson(m: Map[Int, Long], node: ObjectNode, field: String): Unit = {
    val o = node.putObject(field)
    m.foreach { case (k, v) => o.put(k.toString, v) }
  }
  private def longMapFromJson(n: JsonNode): Map[Int, Long] =
    if (n == null) Map.empty
    else n.properties().asScala.map(e => e.getKey.toInt -> e.getValue.asLong).toMap

  private def boundsToJson(m: Map[Int, Any], types: Int => DataType,
      node: ObjectNode, field: String): Unit = {
    val o = node.putObject(field)
    m.foreach { case (k, v) => valueToJson(types(k), v, o, k.toString) }
  }
  private def boundsFromJson(n: JsonNode, types: Int => Option[DataType]): Map[Int, Any] =
    if (n == null) Map.empty
    else n.properties().asScala.flatMap { e =>
      types(e.getKey.toInt).map(t => e.getKey.toInt -> valueFromJson(t, e.getValue))
    }.toMap

  // ---- data file ----
  def dataFileToJson(f: DataFileMeta, schema: Schema, spec: PartitionSpec): String = {
    val node = mapper.createObjectNode()
    node.put("path", f.path).put("format", f.format).put("spec-id", f.specId)
    node.put("record-count", f.recordCount).put("file-size", f.fileSizeBytes)
    node.put("sort-order-id", f.sortOrderId).put("schema-id", f.schemaId)
    node.put("content", f.content)
    if (f.equalityIds.nonEmpty) {
      val a = node.putArray("equality-ids"); f.equalityIds.foreach(a.add)
    }
    f.referencedFile.foreach(node.put("referenced-file", _))
    f.firstRowId.foreach(node.put("first-row-id", _))
    f.contentOffset.foreach(node.put("content-offset", _))
    f.contentSize.foreach(node.put("content-size", _))
    val p = node.putObject("partition")
    spec.fields.zip(f.partition).foreach { case (pf, v) =>
      valueToJson(spec.fieldType(schema, pf), v, p, pf.fieldId.toString)
    }
    longMapToJson(f.valueCounts, node, "value-counts")
    longMapToJson(f.nullCounts, node, "null-counts")
    longMapToJson(f.nanCounts, node, "nan-counts")
    boundsToJson(f.lowerBounds, schema.fieldType, node, "lower-bounds")
    boundsToJson(f.upperBounds, schema.fieldType, node, "upper-bounds")
    if (f.splitOffsets.nonEmpty) {
      val a = node.putArray("split-offsets"); f.splitOffsets.foreach(a.add)
    }
    f.keyMetadata.foreach(km => node.put("key-metadata",
      java.util.Base64.getEncoder.encodeToString(km.toArray)))
    mapper.writeValueAsString(node)
  }

  def dataFileFromJson(s: String, schema: Schema, specById: Int => PartitionSpec): DataFileMeta = {
    val n = mapper.readTree(s)
    val specId = n.get("spec-id").asInt
    val spec = specById(specId)
    val p = n.get("partition")
    val partition = spec.fields.map { pf =>
      valueFromJson(spec.fieldType(schema, pf), p.get(pf.fieldId.toString))
    }
    def fieldTypeOpt(id: Int): Option[DataType] = schema.idToField.get(id).map(_.dataType)
    DataFileMeta(
      path = n.get("path").asText,
      format = n.get("format").asText,
      specId = specId,
      partition = partition,
      recordCount = n.get("record-count").asLong,
      fileSizeBytes = n.get("file-size").asLong,
      valueCounts = longMapFromJson(n.get("value-counts")),
      nullCounts = longMapFromJson(n.get("null-counts")),
      nanCounts = longMapFromJson(n.get("nan-counts")),
      lowerBounds = boundsFromJson(n.get("lower-bounds"), fieldTypeOpt),
      upperBounds = boundsFromJson(n.get("upper-bounds"), fieldTypeOpt),
      splitOffsets = Option(n.get("split-offsets"))
        .map(_.elements.asScala.map(_.asLong).toSeq).getOrElse(Nil),
      sortOrderId = Option(n.get("sort-order-id")).map(_.asInt).getOrElse(0),
      schemaId = Option(n.get("schema-id")).map(_.asInt).getOrElse(0),
      content = Option(n.get("content")).map(_.asInt).getOrElse(FileContent.Data),
      equalityIds = Option(n.get("equality-ids"))
        .map(_.elements.asScala.map(_.asInt).toSeq).getOrElse(Nil),
      referencedFile = Option(n.get("referenced-file")).map(_.asText),
      firstRowId = Option(n.get("first-row-id")).map(_.asLong),
      contentOffset = Option(n.get("content-offset")).map(_.asLong),
      contentSize = Option(n.get("content-size")).map(_.asLong),
      keyMetadata = Option(n.get("key-metadata")).map(km =>
        java.util.Base64.getDecoder.decode(km.asText).toSeq))
  }

  // ---- manifest entry (one JSON line) ----
  def entryToJson(e: ManifestEntry, schema: Schema, spec: PartitionSpec): String = {
    val node = mapper.createObjectNode()
    node.put("status", e.status).put("snapshot-id", e.snapshotId)
    node.put("sequence-number", e.sequenceNumber)
    node.set[ObjectNode]("data-file",
      mapper.readTree(dataFileToJson(e.dataFile, schema, spec)).asInstanceOf[ObjectNode])
    mapper.writeValueAsString(node)
  }

  /** Only the data-file path of one entry line (path-projected reads). */
  def entryPathFromJson(s: String): String =
    mapper.readTree(s).get("data-file").get("path").asText

  def entryFromJson(s: String, schema: Schema, specById: Int => PartitionSpec): ManifestEntry = {
    val n = mapper.readTree(s)
    ManifestEntry(
      status = n.get("status").asInt,
      snapshotId = n.get("snapshot-id").asLong,
      sequenceNumber = n.get("sequence-number").asLong,
      dataFile = dataFileFromJson(mapper.writeValueAsString(n.get("data-file")),
        schema, specById))
  }

  // ---- manifest list ----
  def manifestListToJson(manifests: Seq[ManifestFileMeta], schema: Schema,
      specById: Int => PartitionSpec): String = {
    val root = mapper.createArrayNode()
    manifests.foreach { m =>
      val spec = specById(m.specId)
      val node = root.addObject()
      node.put("path", m.path).put("length", m.length).put("spec-id", m.specId)
      node.put("added-snapshot-id", m.addedSnapshotId)
      node.put("min-sequence-number", m.minSequenceNumber)
      node.put("added-files-count", m.addedFilesCount)
      node.put("existing-files-count", m.existingFilesCount)
      node.put("deleted-files-count", m.deletedFilesCount)
      node.put("added-rows-count", m.addedRowsCount)
      node.put("existing-rows-count", m.existingRowsCount)
      node.put("deleted-rows-count", m.deletedRowsCount)
      val sums = node.putArray("partition-summaries")
      m.partitionSummaries.zip(spec.fields).foreach { case (s, pf) =>
        val t = spec.fieldType(schema, pf)
        val sn = sums.addObject()
        sn.put("contains-null", s.containsNull)
        s.containsNan.foreach(v => sn.put("contains-nan", v))
        s.lowerBound.foreach(v => valueToJson(t, v, sn, "lower"))
        s.upperBound.foreach(v => valueToJson(t, v, sn, "upper"))
      }
    }
    mapper.writeValueAsString(root)
  }

  def manifestListFromJson(s: String, schema: Schema,
      specById: Int => PartitionSpec): Seq[ManifestFileMeta] = {
    mapper.readTree(s).elements.asScala.map { n =>
      val specId = n.get("spec-id").asInt
      val spec = specById(specId)
      val sums = Option(n.get("partition-summaries")).map(_.elements.asScala.toSeq).getOrElse(Nil)
      val parsed = sums.zip(spec.fields).map { case (sn, pf) =>
        val t = spec.fieldType(schema, pf)
        FieldSummaryMeta(
          containsNull = sn.get("contains-null").asBoolean,
          containsNan = Option(sn.get("contains-nan")).map(_.asBoolean),
          lowerBound = Option(sn.get("lower")).filterNot(_.isNull).map(valueFromJson(t, _)),
          upperBound = Option(sn.get("upper")).filterNot(_.isNull).map(valueFromJson(t, _)))
      }
      ManifestFileMeta(
        path = n.get("path").asText,
        length = n.get("length").asLong,
        specId = specId,
        addedSnapshotId = n.get("added-snapshot-id").asLong,
        minSequenceNumber = n.get("min-sequence-number").asLong,
        addedFilesCount = n.get("added-files-count").asInt,
        existingFilesCount = n.get("existing-files-count").asInt,
        deletedFilesCount = n.get("deleted-files-count").asInt,
        addedRowsCount = n.get("added-rows-count").asLong,
        existingRowsCount = n.get("existing-rows-count").asLong,
        deletedRowsCount = n.get("deleted-rows-count").asLong,
        partitionSummaries = parsed)
    }.toSeq
  }

  // ---- snapshots / table metadata ----
  private def snapshotToJson(s: SnapshotMeta, node: ObjectNode): Unit = {
    node.put("snapshot-id", s.snapshotId)
    s.parentId.foreach(node.put("parent-snapshot-id", _))
    node.put("sequence-number", s.sequenceNumber)
    node.put("timestamp-ms", s.timestampMillis)
    node.put("operation", s.operation)
    val sum = node.putObject("summary")
    s.summary.foreach { case (k, v) => sum.put(k, v) }
    node.put("manifest-list", s.manifestList)
  }

  private def snapshotFromJson(n: JsonNode): SnapshotMeta = SnapshotMeta(
    snapshotId = n.get("snapshot-id").asLong,
    parentId = Option(n.get("parent-snapshot-id")).map(_.asLong),
    sequenceNumber = n.get("sequence-number").asLong,
    timestampMillis = n.get("timestamp-ms").asLong,
    operation = n.get("operation").asText,
    summary = Option(n.get("summary"))
      .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
      .getOrElse(Map.empty),
    manifestList = n.get("manifest-list").asText)

  private def specToJson(spec: PartitionSpec, node: ObjectNode): Unit = {
    node.put("spec-id", spec.specId)
    val fs = node.putArray("fields")
    spec.fields.foreach { f =>
      val fn = fs.addObject()
      fn.put("source-id", f.sourceId).put("field-id", f.fieldId)
      fn.put("name", f.name).put("transform", f.transform.name)
    }
  }

  private def specFromJson(n: JsonNode): PartitionSpec = PartitionSpec(
    n.get("spec-id").asInt,
    n.get("fields").elements.asScala.map { fn =>
      PartitionField(fn.get("source-id").asInt, fn.get("field-id").asInt,
        fn.get("name").asText, Transform.parse(fn.get("transform").asText))
    }.toSeq)

  def tableMetadataToJson(m: TableMetadata): String = {
    val node = mapper.createObjectNode()
    node.put("format-version", m.formatVersion)
    node.put("table-uuid", m.tableUuid)
    node.put("location", m.location)
    node.put("last-sequence-number", m.lastSequenceNumber)
    if (m.nextRowId != 0L) node.put("next-row-id", m.nextRowId)
    node.put("last-updated-ms", m.lastUpdatedMillis)
    node.put("last-column-id", m.lastColumnId)
    node.put("current-schema-id", m.currentSchemaId)
    val schemas = node.putArray("schemas")
    m.schemas.foreach { s =>
      val sn = schemas.addObject()
      sn.put("schema-id", s.schemaId)
      if (s.identifierFieldIds.nonEmpty) {
        val ids = sn.putArray("identifier-field-ids")
        s.identifierFieldIds.foreach(ids.add)
      }
      sn.set[ObjectNode]("struct", mapper.readTree(s.struct.json))
    }
    node.put("default-spec-id", m.defaultSpecId)
    val specs = node.putArray("partition-specs")
    m.specs.foreach(s => specToJson(s, specs.addObject()))
    node.put("last-partition-id", m.lastPartitionId)
    node.put("default-sort-order-id", m.defaultSortOrderId)
    val orders = node.putArray("sort-orders")
    m.sortOrders.foreach { o =>
      val on = orders.addObject()
      on.put("order-id", o.orderId)
      val fs = on.putArray("fields")
      o.fields.foreach { f =>
        val fn = fs.addObject()
        fn.put("source-id", f.sourceId).put("transform", f.transform)
        fn.put("ascending", f.ascending).put("nulls-first", f.nullsFirst)
      }
    }
    val props = node.putObject("properties")
    m.properties.foreach { case (k, v) => props.put(k, v) }
    m.currentSnapshotId.foreach(node.put("current-snapshot-id", _))
    val snaps = node.putArray("snapshots")
    m.snapshots.foreach(s => snapshotToJson(s, snaps.addObject()))
    val slog = node.putArray("snapshot-log")
    m.snapshotLog.foreach { e =>
      slog.addObject().put("timestamp-ms", e.timestampMillis).put("snapshot-id", e.snapshotId)
    }
    val mlog = node.putArray("metadata-log")
    m.metadataLog.foreach { e =>
      mlog.addObject().put("timestamp-ms", e.timestampMillis).put("metadata-file", e.file)
    }
    if (m.refs.nonEmpty) {
      val rn = node.putObject("refs")
      m.refs.toSeq.sortBy(_._1).foreach { case (name, r) =>
        val o = rn.putObject(name)
        o.put("snapshot-id", r.snapshotId)
        o.put("type", r.refType)
        r.minSnapshotsToKeep.foreach(o.put("min-snapshots-to-keep", _))
        r.maxSnapshotAgeMs.foreach(o.put("max-snapshot-age-ms", _))
        r.maxRefAgeMs.foreach(o.put("max-ref-age-ms", _))
      }
    }
    if (m.statsFiles.nonEmpty) {
      val st = node.putArray("statistics")
      m.statsFiles.foreach { f =>
        st.addObject()
          .put("snapshot-id", f.snapshotId)
          .put("statistics-path", f.path)
          .put("file-size-in-bytes", f.fileSizeBytes)
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }

  def tableMetadataFromJson(s: String): TableMetadata = {
    val n = mapper.readTree(s)
    TableMetadata(
      formatVersion = n.get("format-version").asInt,
      tableUuid = n.get("table-uuid").asText,
      location = n.get("location").asText,
      lastSequenceNumber = n.get("last-sequence-number").asLong,
      lastUpdatedMillis = n.get("last-updated-ms").asLong,
      lastColumnId = n.get("last-column-id").asInt,
      currentSchemaId = n.get("current-schema-id").asInt,
      schemas = n.get("schemas").elements.asScala.map { sn =>
        Schema(DataType.fromJson(mapper.writeValueAsString(sn.get("struct")))
          .asInstanceOf[StructType], sn.get("schema-id").asInt,
          Option(sn.get("identifier-field-ids"))
            .map(_.elements.asScala.map(_.asInt).toSeq).getOrElse(Nil))
      }.toSeq,
      defaultSpecId = n.get("default-spec-id").asInt,
      specs = n.get("partition-specs").elements.asScala.map(specFromJson).toSeq,
      lastPartitionId = n.get("last-partition-id").asInt,
      defaultSortOrderId = n.get("default-sort-order-id").asInt,
      sortOrders = n.get("sort-orders").elements.asScala.map { on =>
        SortOrderMeta(on.get("order-id").asInt,
          on.get("fields").elements.asScala.map { fn =>
            SortFieldMeta(fn.get("source-id").asInt, fn.get("transform").asText,
              fn.get("ascending").asBoolean, fn.get("nulls-first").asBoolean)
          }.toSeq)
      }.toSeq,
      properties = Option(n.get("properties"))
        .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
        .getOrElse(Map.empty),
      currentSnapshotId = Option(n.get("current-snapshot-id")).map(_.asLong),
      snapshots = n.get("snapshots").elements.asScala.map(snapshotFromJson).toSeq,
      snapshotLog = n.get("snapshot-log").elements.asScala.map { e =>
        SnapshotLogEntry(e.get("timestamp-ms").asLong, e.get("snapshot-id").asLong)
      }.toSeq,
      metadataLog = n.get("metadata-log").elements.asScala.map { e =>
        MetadataLogEntry(e.get("timestamp-ms").asLong, e.get("metadata-file").asText)
      }.toSeq,
      refs = Option(n.get("refs")).map(_.properties().asScala.map { e =>
        val o = e.getValue
        e.getKey -> SnapshotRefMeta(
          snapshotId = o.get("snapshot-id").asLong,
          refType = o.get("type").asText,
          minSnapshotsToKeep = Option(o.get("min-snapshots-to-keep")).map(_.asInt),
          maxSnapshotAgeMs = Option(o.get("max-snapshot-age-ms")).map(_.asLong),
          maxRefAgeMs = Option(o.get("max-ref-age-ms")).map(_.asLong))
      }.toMap).getOrElse(Map.empty),
      statsFiles = Option(n.get("statistics")).map(_.elements.asScala.map { e =>
        StatsFileMeta(
          snapshotId = e.get("snapshot-id").asLong,
          path = e.get("statistics-path").asText,
          fileSizeBytes = e.get("file-size-in-bytes").asLong)
      }.toSeq).getOrElse(Nil),
      nextRowId = Option(n.get("next-row-id")).map(_.asLong).getOrElse(0L))
  }
}
