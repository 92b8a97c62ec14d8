package graft.sources

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalType, LogicalTypes, Schema => AvroSchema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter,
  GenericFixed, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData,
  MapData}
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter,
  OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Avro data-file format for graft tables (ref `avro/.../Avro.java` write
  * surface, `spark/.../data/AvroWithSparkSchemaVisitor.java` conversions).
  *
  * The runtime ships `avro-1.12.1` but not the `spark-avro` module, so this
  * is a from-scratch V1 `FileFormat`: `prepareWrite` hands Spark an
  * `OutputWriter` that encodes `InternalRow`s as Avro generic records
  * (snappy-compressed object-container files), and `buildReader` decodes a
  * sync-marker-aligned byte range back into rows, so files stay splittable
  * for parallel scans exactly like the built-in formats. Registered as
  * `graft-avro`; table metadata keeps the public name `avro`.
  *
  * Type mapping follows the Avro logical-type spec: date = int/`date`,
  * timestamp = long/`timestamp-micros` (NTZ = `local-timestamp-micros`),
  * decimal = bytes/`decimal(p,s)`; maps with non-string keys become arrays
  * of `{key, value}` records (Avro map keys must be strings).
  */
class GraftAvroFileFormat extends FileFormat with DataSourceRegister with Serializable {

  override def shortName(): String = "graft-avro"
  override def toString: String = "GraftAvro"

  override def inferSchema(spark: SparkSession, options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] = {
    val conf = spark.sessionState.newHadoopConfWithOptions(options)
    files.find(_.getLen > 0).map { st =>
      val in = new FsInput(st.getPath, conf)
      val reader = new DataFileReader(in, new GenericDatumReader[GenericRecord]())
      try AvroConv.toSqlType(reader.getSchema).asInstanceOf[StructType]
      finally reader.close()
    }
  }

  override def prepareWrite(spark: SparkSession, job: Job, options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    val avroJson = AvroConv.toAvroSchema(dataSchema, "graft_record").toString
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String = ".avro"
      override def newInstance(path: String, dataSchema: StructType,
          context: TaskAttemptContext): OutputWriter =
        new GraftAvroOutputWriter(path, context, dataSchema, avroJson)
    }
  }

  override def isSplitable(spark: SparkSession, options: Map[String, String],
      path: Path): Boolean = true

  override def supportDataType(dataType: DataType): Boolean = dataType match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | BinaryType | DateType | TimestampType |
         TimestampNTZType => true
    case _: DecimalType => true
    case ArrayType(et, _) => supportDataType(et)
    case MapType(kt, vt, _) => supportDataType(kt) && supportDataType(vt)
    case StructType(fields) => fields.forall(f => supportDataType(f.dataType))
    case _ => false
  }

  override def buildReader(spark: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType, filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: org.apache.hadoop.conf.Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val broadcastConf =
      spark.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    val required = requiredSchema // serialize the struct, not the session
    // encryption manager rides the scan options (serialized — the scan
    // builder sets it from the table's FileIO); files self-describe via the
    // GAC1 magic, so plaintext files in a later-encrypted table still read
    val encManager = options.get(graft.table.EncryptionManagers.OptionKey)
      .map(graft.table.EncryptionManagers.deserialize)
    val plaintextAllowed = options
      .get(graft.table.EncryptionManagers.PlaintextFilesAllowedKey)
      .forall(_.toBoolean)
    (file: PartitionedFile) => {
      val reader = GraftAvroFileFormat.openReader(
        file.toPath, broadcastConf.value.value, encManager, plaintextAllowed)
      // align to the split: first sync past start, stop once past the end
      reader.sync(file.start)
      val stop = file.start + file.length
      val fileSchema = reader.getSchema
      val getters: Array[GenericRecord => Any] = required.fields.map { f =>
        Option(fileSchema.getField(f.name)) match {
          case None => (_: GenericRecord) => null // column added after write
          case Some(af) =>
            val conv = AvroConv.reader(AvroConv.nonNull(af.schema), f.dataType)
            val pos = af.pos
            (r: GenericRecord) => { val v = r.get(pos); if (v == null) null else conv(v) }
        }
      }
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => reader.close()))
      new Iterator[InternalRow] {
        private var closed = false
        override def hasNext: Boolean = {
          val more = !closed && reader.hasNext && !reader.pastSync(stop)
          if (!more && !closed) { reader.close(); closed = true }
          more
        }
        override def next(): InternalRow = {
          val rec = reader.next()
          val row = new GenericInternalRow(getters.length)
          var i = 0
          while (i < getters.length) { row.update(i, getters(i)(rec)); i += 1 }
          row
        }
      }
    }
  }

  private def TaskContext = org.apache.spark.TaskContext

  override def equals(other: Any): Boolean = other.isInstanceOf[GraftAvroFileFormat]
  override def hashCode(): Int = getClass.hashCode()
}

private[graft] object GraftAvroFileFormat {
  import graft.table.{AesGcmEncryptionManager, EncryptionManager}

  /** Open an Avro container reader over a possibly-encrypted file: the GAC1
    * magic decides. Encrypted files decrypt through the manager's SEEKABLE
    * surface (chunked AES-GCM: one decrypted block in memory, `sync` lands
    * on split boundaries like any plaintext container); a manager without
    * seekable support falls back to buffering the decrypted container. A
    * file that IS encrypted but reaches a reader with no manager fails
    * loudly — never ciphertext rows. */
  def openReader(path: Path, conf: org.apache.hadoop.conf.Configuration,
      manager: Option[EncryptionManager],
      plaintextAllowed: Boolean = true): DataFileReader[GenericRecord] = {
    val fs = path.getFileSystem(conf)
    val raw = fs.open(path)
    if (!AesGcmEncryptionManager.isEncrypted(raw)) {
      raw.close()
      // a table that REQUIRES encryption never legitimately holds a
      // plaintext container — refuse the forged substitute
      if (!plaintextAllowed && manager.nonEmpty)
        throw new IllegalStateException(
          s"$path is a plaintext avro container but the table requires " +
            "encrypted content — refusing a possibly forged file")
      new DataFileReader(new FsInput(path, conf),
        new GenericDatumReader[GenericRecord]())
    } else manager match {
      case None =>
        raw.close()
        throw new IllegalStateException(
          s"$path is AES-GCM encrypted; read it through its graft table so " +
            "the table's encryption manager applies")
      case Some(m) =>
        // the raw stream must not leak when header validation or the
        // container constructor throws (truncated/tampered files fail here
        // by design — repeated failed opens must not exhaust handles)
        try {
          val fileLen = fs.getFileStatus(path).getLen
          m.decryptSeekable(path.toString, raw, fileLen,
              m.keyMetadata(path.toString)) match {
            case Some(seekable) =>
              new DataFileReader(seekable, new GenericDatumReader[GenericRecord]())
            case None =>
              val bytes =
                try m.decrypt(path.toString, raw, m.keyMetadata(path.toString))
                  .readAllBytes()
                finally raw.close()
              new DataFileReader(
                new org.apache.avro.file.SeekableByteArrayInput(bytes),
                new GenericDatumReader[GenericRecord]())
          }
        } catch {
          case e: Throwable =>
            try raw.close() catch { case _: Exception => () }
            throw e
        }
    }
  }
}

/** One Avro object-container file per Spark write task. */
private[sources] class GraftAvroOutputWriter(val path: String, context: TaskAttemptContext,
    dataSchema: StructType, avroSchemaJson: String) extends OutputWriter {

  private val avroSchema = new AvroSchema.Parser().parse(avroSchemaJson)
  private val converters: Array[InternalRow => Any] =
    dataSchema.fields.zipWithIndex.map { case (f, i) =>
      val conv = AvroConv.writer(f.dataType, AvroConv.nonNull(avroSchema.getFields.get(i).schema))
      (row: InternalRow) => if (row.isNullAt(i)) null else conv(row, i)
    }
  private val writer = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    // container-block (sync-marker) granularity: splits can only land on
    // sync boundaries, so scans of big rows/files tune this down for
    // finer parallelism (write.avro.sync-interval-bytes table property)
    w.setSyncInterval(context.getConfiguration.getInt("graft.avro.sync.interval",
      org.apache.avro.file.DataFileConstants.DEFAULT_SYNC_INTERVAL))
    // codec rides the per-write hadoop conf (write.avro.compression-codec)
    w.setCodec(context.getConfiguration.get("graft.avro.codec", "snappy") match {
      case "deflate" => CodecFactory.deflateCodec(CodecFactory.DEFAULT_DEFLATE_LEVEL)
      case "zstandard" => CodecFactory.zstandardCodec(3)
      case "bzip2" => CodecFactory.bzip2Codec()
      case "xz" => CodecFactory.xzCodec(6)
      case "uncompressed" | "none" | "null" => CodecFactory.nullCodec()
      case _ => CodecFactory.snappyCodec()
    })
    val out = new Path(path).getFileSystem(context.getConfiguration)
      .create(new Path(path), false)
    // table-level encryption manager (serialized write option): the Avro
    // container is written THROUGH the encrypting stream, header included —
    // closing the DataFileWriter finalizes the GCM tag via the chain
    val enc = Option(context.getConfiguration
        .get(graft.table.EncryptionManagers.OptionKey))
      .map(graft.table.EncryptionManagers.deserialize)
      .map(_.encrypt(path, out)).getOrElse(out)
    w.create(avroSchema, enc)
  }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < converters.length) { rec.put(i, converters(i)(row)); i += 1 }
    writer.append(rec)
  }

  override def close(): Unit = writer.close()
}

/** Spark <-> Avro schema and value conversion for the graft type set. */
private[graft] object AvroConv {

  /** Unwrap `union(null, T)` to `T`. */
  def nonNull(s: AvroSchema): AvroSchema =
    if (s.getType != AvroSchema.Type.UNION) s
    else s.getTypes.asScala.find(_.getType != AvroSchema.Type.NULL).getOrElse(s)

  private def nullable(s: AvroSchema): AvroSchema =
    AvroSchema.createUnion(java.util.List.of(AvroSchema.create(AvroSchema.Type.NULL), s))

  // ---------------------------------------------------------------- schemas

  def toAvroSchema(st: StructType, name: String): AvroSchema = {
    val fields = st.fields.map { f =>
      val t = typeToAvro(f.dataType, s"${name}_${f.name}")
      val s = if (f.nullable) nullable(t) else t
      new AvroSchema.Field(f.name, s, null,
        if (f.nullable) AvroSchema.Field.NULL_DEFAULT_VALUE else null)
    }
    AvroSchema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def typeToAvro(dt: DataType, path: String): AvroSchema = dt match {
    case BooleanType => AvroSchema.create(AvroSchema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => AvroSchema.create(AvroSchema.Type.INT)
    case LongType => AvroSchema.create(AvroSchema.Type.LONG)
    case FloatType => AvroSchema.create(AvroSchema.Type.FLOAT)
    case DoubleType => AvroSchema.create(AvroSchema.Type.DOUBLE)
    case StringType => AvroSchema.create(AvroSchema.Type.STRING)
    case BinaryType => AvroSchema.create(AvroSchema.Type.BYTES)
    case DateType => LogicalTypes.date().addToSchema(AvroSchema.create(AvroSchema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(AvroSchema.create(AvroSchema.Type.BYTES))
    case ArrayType(et, containsNull) =>
      val e = typeToAvro(et, path + "_item")
      AvroSchema.createArray(if (containsNull) nullable(e) else e)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = typeToAvro(vt, path + "_value")
      AvroSchema.createMap(if (valueContainsNull) nullable(v) else v)
    case MapType(kt, vt, valueContainsNull) =>
      // Avro map keys must be strings: non-string-key maps become kv arrays
      val v0 = typeToAvro(vt, path + "_value")
      val kv = AvroSchema.createRecord(path + "_kv", null, "graft.avro", false, List(
        new AvroSchema.Field("key", typeToAvro(kt, path + "_key"), null, null),
        new AvroSchema.Field("value", if (valueContainsNull) nullable(v0) else v0, null,
          if (valueContainsNull) AvroSchema.Field.NULL_DEFAULT_VALUE else null)).asJava)
      AvroSchema.createArray(kv)
    case st: StructType => toAvroSchema(st, path + "_struct")
    case other => throw new UnsupportedOperationException(s"Avro: unsupported type $other")
  }

  def toSqlType(s: AvroSchema): DataType = nonNull(s) match {
    case r if r.getType == AvroSchema.Type.RECORD =>
      StructType(r.getFields.asScala.map { f =>
        StructField(f.name, toSqlType(f.schema),
          f.schema.getType == AvroSchema.Type.UNION)
      }.toArray)
    case a if a.getType == AvroSchema.Type.ARRAY =>
      ArrayType(toSqlType(a.getElementType),
        a.getElementType.getType == AvroSchema.Type.UNION)
    case m if m.getType == AvroSchema.Type.MAP =>
      MapType(StringType, toSqlType(m.getValueType),
        m.getValueType.getType == AvroSchema.Type.UNION)
    case p => (p.getType, Option(p.getLogicalType)) match {
      case (AvroSchema.Type.BOOLEAN, _) => BooleanType
      case (AvroSchema.Type.INT, Some(_: LogicalTypes.Date)) => DateType
      case (AvroSchema.Type.INT, _) => IntegerType
      case (AvroSchema.Type.LONG, Some(_: LogicalTypes.TimestampMicros)) => TimestampType
      case (AvroSchema.Type.LONG, Some(_: LogicalTypes.LocalTimestampMicros)) =>
        TimestampNTZType
      case (AvroSchema.Type.LONG, _) => LongType
      case (AvroSchema.Type.FLOAT, _) => FloatType
      case (AvroSchema.Type.DOUBLE, _) => DoubleType
      case (AvroSchema.Type.STRING, _) => StringType
      case (AvroSchema.Type.BYTES | AvroSchema.Type.FIXED, Some(d: LogicalTypes.Decimal)) =>
        DecimalType(d.getPrecision, d.getScale)
      case (AvroSchema.Type.BYTES | AvroSchema.Type.FIXED, _) => BinaryType
      case (t, _) => throw new UnsupportedOperationException(s"Avro: unsupported read type $t")
    }
  }

  // ------------------------------------------------- catalyst value -> avro

  /** Converter from an `InternalRow` ordinal to the Avro datum. */
  def writer(dt: DataType, avro: AvroSchema): (InternalRow, Int) => Any = {
    val fromValue = valueWriter(dt, avro)
    dt match {
      case BooleanType => (r, i) => r.getBoolean(i)
      case ByteType => (r, i) => r.getByte(i).toInt
      case ShortType => (r, i) => r.getShort(i).toInt
      case IntegerType | DateType => (r, i) => r.getInt(i)
      case LongType | TimestampType | TimestampNTZType => (r, i) => r.getLong(i)
      case FloatType => (r, i) => r.getFloat(i)
      case DoubleType => (r, i) => r.getDouble(i)
      case StringType => (r, i) => r.getUTF8String(i).toString
      case BinaryType => (r, i) => ByteBuffer.wrap(r.getBinary(i))
      case d: DecimalType => (r, i) =>
        ByteBuffer.wrap(r.getDecimal(i, d.precision, d.scale)
          .toJavaBigDecimal.unscaledValue.toByteArray)
      case _ => (r, i) => fromValue(r.get(i, dt))
    }
  }

  /** Converter from a catalyst VALUE (as stored in ArrayData/InternalRow). */
  private def valueWriter(dt: DataType, avro: AvroSchema): Any => Any = dt match {
    case BooleanType | IntegerType | DateType | LongType | TimestampType |
         TimestampNTZType | FloatType | DoubleType => identity
    case ByteType => v => v.asInstanceOf[Byte].toInt
    case ShortType => v => v.asInstanceOf[Short].toInt
    case StringType => v => v.toString
    case BinaryType => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case d: DecimalType => v =>
      ByteBuffer.wrap(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.unscaledValue.toByteArray)
    case ArrayType(et, _) =>
      val elemAvro = nonNull(avro.getElementType)
      val elem = valueWriter(et, elemAvro)
      v => {
        val arr = v.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[Any](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(if (arr.isNullAt(i)) null else elem(arr.get(i, et)))
          i += 1
        }
        out
      }
    case MapType(StringType, vt, _) =>
      val valAvro = nonNull(avro.getValueType)
      val vw = valueWriter(vt, valAvro)
      v => {
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray
        val vals = m.valueArray
        val out = new java.util.HashMap[String, Any](m.numElements())
        var i = 0
        while (i < m.numElements()) {
          out.put(keys.getUTF8String(i).toString,
            if (vals.isNullAt(i)) null else vw(vals.get(i, vt)))
          i += 1
        }
        out
      }
    case MapType(kt, vt, _) =>
      val kvAvro = nonNull(avro.getElementType)
      val kw = valueWriter(kt, nonNull(kvAvro.getField("key").schema))
      val vw = valueWriter(vt, nonNull(kvAvro.getField("value").schema))
      v => {
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray
        val vals = m.valueArray
        val out = new java.util.ArrayList[Any](m.numElements())
        var i = 0
        while (i < m.numElements()) {
          val rec = new GenericData.Record(kvAvro)
          rec.put(0, kw(keys.get(i, kt)))
          rec.put(1, if (vals.isNullAt(i)) null else vw(vals.get(i, vt)))
          out.add(rec)
          i += 1
        }
        out
      }
    case st: StructType =>
      val fields = st.fields.zipWithIndex.map { case (f, i) =>
        val conv = writer(f.dataType, nonNull(avro.getFields.get(i).schema))
        (row: InternalRow) => if (row.isNullAt(i)) null else conv(row, i)
      }
      v => {
        val row = v.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(avro)
        var i = 0
        while (i < fields.length) { rec.put(i, fields(i)(row)); i += 1 }
        rec
      }
    case other => throw new UnsupportedOperationException(s"Avro: unsupported type $other")
  }

  // ------------------------------------------------- avro -> catalyst value

  def reader(avro: AvroSchema, dt: DataType): Any => Any = (dt, avro.getType) match {
    case (BooleanType | IntegerType | DateType | LongType | TimestampType |
          TimestampNTZType | FloatType | DoubleType, _) => identity
    // tinyint/smallint are widened to Avro INT on write — narrow them back
    case (ByteType, _) => v => v.asInstanceOf[Int].toByte
    case (ShortType, _) => v => v.asInstanceOf[Int].toShort
    case (StringType, _) => v => UTF8String.fromString(v.toString)
    case (BinaryType, AvroSchema.Type.FIXED) => v => v.asInstanceOf[GenericFixed].bytes.clone
    case (BinaryType, _) => v => byteBufferToArray(v.asInstanceOf[ByteBuffer])
    case (d: DecimalType, t) =>
      v => {
        val bytes = if (t == AvroSchema.Type.FIXED) v.asInstanceOf[GenericFixed].bytes
          else byteBufferToArray(v.asInstanceOf[ByteBuffer])
        Decimal(new JBigDecimal(new BigInteger(bytes), d.scale), d.precision, d.scale)
      }
    case (ArrayType(et, _), AvroSchema.Type.ARRAY) =>
      val elem = reader(nonNull(avro.getElementType), et)
      v => {
        val in = v.asInstanceOf[java.util.Collection[Any]]
        val out = new Array[Any](in.size)
        val it = in.iterator()
        var i = 0
        while (it.hasNext) {
          val e = it.next()
          out(i) = if (e == null) null else elem(e)
          i += 1
        }
        new GenericArrayData(out)
      }
    case (MapType(StringType, vt, _), AvroSchema.Type.MAP) =>
      val vr = reader(nonNull(avro.getValueType), vt)
      v => {
        val in = v.asInstanceOf[java.util.Map[Any, Any]]
        val keys = new Array[Any](in.size)
        val vals = new Array[Any](in.size)
        val it = in.entrySet.iterator()
        var i = 0
        while (it.hasNext) {
          val e = it.next()
          keys(i) = UTF8String.fromString(e.getKey.toString)
          vals(i) = if (e.getValue == null) null else vr(e.getValue)
          i += 1
        }
        ArrayBasedMapData(keys, vals)
      }
    case (MapType(kt, vt, _), AvroSchema.Type.ARRAY) =>
      // kv-record array written by typeToAvro for non-string keys
      val kvAvro = nonNull(avro.getElementType)
      val kr = reader(nonNull(kvAvro.getField("key").schema), kt)
      val vr = reader(nonNull(kvAvro.getField("value").schema), vt)
      v => {
        val in = v.asInstanceOf[java.util.Collection[Any]]
        val keys = new Array[Any](in.size)
        val vals = new Array[Any](in.size)
        val it = in.iterator()
        var i = 0
        while (it.hasNext) {
          val rec = it.next().asInstanceOf[GenericRecord]
          keys(i) = kr(rec.get(0))
          val rv = rec.get(1)
          vals(i) = if (rv == null) null else vr(rv)
          i += 1
        }
        ArrayBasedMapData(keys, vals)
      }
    case (st: StructType, AvroSchema.Type.RECORD) =>
      val getters = st.fields.map { f =>
        Option(avro.getField(f.name)) match {
          case None => (_: GenericRecord) => null
          case Some(af) =>
            val conv = reader(nonNull(af.schema), f.dataType)
            val pos = af.pos
            (r: GenericRecord) => { val v = r.get(pos); if (v == null) null else conv(v) }
        }
      }
      v => {
        val rec = v.asInstanceOf[GenericRecord]
        val row = new GenericInternalRow(getters.length)
        var i = 0
        while (i < getters.length) { row.update(i, getters(i)(rec)); i += 1 }
        row
      }
    case (t, a) =>
      throw new UnsupportedOperationException(s"Avro: cannot read $a as $t")
  }

  private def byteBufferToArray(b: ByteBuffer): Array[Byte] = {
    val dup = b.duplicate()
    val out = new Array[Byte](dup.remaining())
    dup.get(out)
    out
  }
}
