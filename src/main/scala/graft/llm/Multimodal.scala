package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (NEW; SURVEY §7 item 10): media as opaque
  * `binary` columns + typed metadata structs. The Spark-side shape —
  * schema, batched per-partition decode, frame sampling via expressions —
  * is real and tested; the pixel/audio decode itself is a clearly-marked
  * deterministic STUB (image/audio libraries are not in this container).
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("size_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("checksum", StringType)))

  /** Pack a fake media payload column from text (UTF-8 bytes) — stands in
    * for real image/audio bytes in tests. */
  def packFakeMedia(df: DataFrame, textCol: String, mediaCol: String = "media"): DataFrame =
    df.withColumn(mediaCol, col(textCol).cast("binary"))

  /** STUB decoder: "parses" media header fields deterministically from the
    * first payload bytes. A real deployment swaps only this function for a
    * JNI/ImageIO decode; the batching shape stays identical. */
  private def stubDecode(payload: Array[Byte]): (String, Int, Int) = {
    if (payload == null || payload.isEmpty) ("empty", 0, 0)
    else {
      val b0 = payload(0) & 0xff
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      // STUB: real decode (e.g. javax.imageio / ffmpeg) goes here
      ("image/fake", 16 + (b0 % 240), 16 + (b1 % 240))
    }
  }

  /** Batched per-partition metadata extraction: one decoder instance per
    * partition (the expensive-init shape real decoders need), emitting the
    * input row + a typed `meta` struct. */
  def extractMeta(df: DataFrame, mediaCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("meta", metaSchema)
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      // a real decoder (image/audio lib handle) would init once per
      // partition here — that is why this is mapPartitions, not a UDF
      rows.map { r =>
        val payload = r.get(mediaIdx).asInstanceOf[Array[Byte]]
        val (kind, w, h) = stubDecode(payload)
        val checksum = if (payload == null) null
        else payload.map("%02x".format(_)).mkString.take(8)
        Row.fromSeq(r.toSeq :+ Row(kind,
          Option(payload).map(_.length.toLong).getOrElse(0L), w, h, checksum))
      }
    }(Encoders.row(outSchema))
  }

  /** Batched per-partition feature extraction: media payload → a unit-norm
    * `array<float>` embedding, the column every similarity/ANN operator in
    * [[Similarity]] / [[IvfIndex]] consumes — so media dedup and media
    * search are the SAME pipelines as text, swapping only this step. The
    * embedding itself is a clearly-marked deterministic STUB (byte-histogram
    * features — a real deployment swaps in an ONNX/JNI encoder handle,
    * initialized once per partition exactly where the comment says);
    * the Spark-side shape (mapPartitions batching, fixed `dim`, unit
    * normalization, null → null) is the real contract. */
  def featurize(df: DataFrame, mediaCol: String, dim: Int = 64,
      embeddingCol: String = "embedding"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(embeddingCol, ArrayType(FloatType))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      // a real encoder (ONNX session / JNI model handle) inits once per
      // partition here; the per-row call below is then a batched forward
      rows.map { r =>
        val payload = r.get(mediaIdx).asInstanceOf[Array[Byte]]
        val emb: Array[Float] = if (payload == null) null
        else {
          // STUB featurizer: L2-normalized byte histogram folded to `dim`
          val acc = new Array[Float](dim)
          var i = 0
          while (i < payload.length) {
            acc((payload(i) & 0xff) % dim) += 1f; i += 1
          }
          val norm = math.sqrt(acc.foldLeft(0.0)((s, x) => s + x.toDouble * x))
          if (norm > 0) { var j = 0; while (j < dim) { acc(j) = (acc(j) / norm).toFloat; j += 1 } }
          acc
        }
        Row.fromSeq(r.toSeq :+ emb)
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling via expressions: split the payload into fixed-size
    * "frames" and keep every `everyN`-th — the plumbing (explode + binary
    * slicing, no driver work) matches real video frame extraction. */
  def sampleFrames(df: DataFrame, mediaCol: String, frameBytes: Int,
      everyN: Int): DataFrame = {
    val nFrames = ceil(length(col(mediaCol)).cast("double") / frameBytes).cast("int")
    df.withColumn("frame_idx",
        explode(filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => i % everyN === 0)))
      .withColumn("frame",
        col(mediaCol).substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
  }
}
