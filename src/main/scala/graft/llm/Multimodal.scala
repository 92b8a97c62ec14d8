package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (NEW; SURVEY §7 item 10): media as opaque
  * `binary` columns + typed metadata structs.
  *
  * Since r11 the image path is REAL: payloads that `javax.imageio` can
  * decode (PNG/JPEG/BMP/GIF — pure-JDK, no native libs) yield true
  * dimensions, a format kind sniffed from the magic bytes, and a
  * downsampled-luma visual embedding, so two byte-DIFFERENT encodings of
  * the same pixels (a PNG and a BMP) land at cosine ≈ 1 — which no
  * byte-level feature can do. Since r12 the audio path is real too:
  * WAV/AIFF parse via `javax.sound.sampled` (sample rate, channels,
  * duration in [[extractMeta]]) and embed as an RMS energy envelope over
  * the decoded samples, so a WAV and an AIFF of the same recording meet
  * at cosine ≈ 1. Undecodable payloads (video, compressed audio, corrupt
  * bytes, or the test fixtures' text bytes) fall back to the original
  * deterministic byte-level features, clearly marked below; a production
  * deployment swaps ONLY that fallback (and the video kinds) for an
  * ONNX/JNI encoder — the batching shape stays identical.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("size_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("checksum", StringType),
    // audio fields (r12): null for non-audio payloads — appended so the
    // image columns and the llm_mm_meta oracle stay byte-stable
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType),
    // animation field (r12b): frame count for GIF payloads (1 for static
    // GIFs), null otherwise — appended, same stability contract
    StructField("n_frames", IntegerType)))

  /** Pack a fake media payload column from text (UTF-8 bytes) — stands in
    * for real image/audio bytes in tests. */
  def packFakeMedia(df: DataFrame, textCol: String, mediaCol: String = "media"): DataFrame =
    df.withColumn(mediaCol, col(textCol).cast("binary"))

  /** Image format by magic bytes (decode is attempted only for these —
    * ImageIO probing arbitrary binary is wasted work at 100 TB scale). */
  private def sniffImageKind(p: Array[Byte]): Option[String] = {
    def at(i: Int, v: Int) = p.length > i && (p(i) & 0xff) == v
    if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) Some("image/png")
    else if (at(0, 0xff) && at(1, 0xd8) && at(2, 0xff)) Some("image/jpeg")
    else if (at(0, 'B') && at(1, 'M')) Some("image/bmp")
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F')) Some("image/gif")
    else None
  }

  /** Decode refuses images above this many pixels (≈256 MB of ARGB): a
    * few-KB payload DECLARING 40000×40000 would otherwise make ImageIO
    * allocate gigabytes and kill the executor with an uncatchable OOM —
    * decompression-bomb inputs must fall back to byte-level features,
    * not take tasks down. */
  val MaxDecodePixels: Long = 64L * 1000 * 1000

  /** Pure-JDK pixel decode; None for non-images, corrupt payloads, or
    * images whose DECLARED dimensions exceed [[MaxDecodePixels]]. The
    * reader checks header dimensions BEFORE decoding pixels, and the
    * in-memory image input stream avoids ImageIO's default per-decode
    * temp-FILE cache (per-row disk I/O at scale). */
  private def decodeImage(p: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (p == null || sniffImageKind(p).isEmpty) None
    else {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val w = r.getWidth(0).toLong // header-only, no pixel decode yet
            val h = r.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) None
            else Option(r.read(0))
          } finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally iis.close()
    }

  /** Frames to temporally pool from an animated payload: evenly sampled
    * across the animation, like video frame sampling — more frames buy
    * little for a near-dup signal and multiply decode cost. */
  val MaxVideoFrames: Int = 8

  /** Header-only GIF frame count (no pixel decode): the meta surface for
    * animated payloads. None for non-GIFs or corrupt streams. */
  private def gifFrameCount(p: Array[Byte]): Option[Int] =
    if (p == null || !sniffImageKind(p).contains("image/gif")) None
    else {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, false, true)
            val n = r.getNumImages(true)
            if (n > 0) Some(n) else None
          } finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally iis.close()
    }

  /** Evenly-sampled decoded frames of an animated GIF — the pure-JDK
    * "video" path (frame-sample → per-frame features → temporal pooling,
    * the same shape a real codec would feed). Scoped HONESTLY to
    * full-frame animations: GIF frames may be DELTAS over a composited
    * canvas, and rather than reimplement GIF disposal compositing, a
    * sampled frame smaller than the logical screen degrades the decode to
    * the first frame alone (always full). The per-frame bomb guard is the
    * image guard times the sample count. None for non-GIF payloads. */
  private def decodeGifFrames(p: Array[Byte]): Option[Seq[java.awt.image.BufferedImage]] =
    if (p == null || !sniffImageKind(p).contains("image/gif")) None
    else {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, false, true)
            val n = r.getNumImages(true)
            val w0 = if (n > 0) r.getWidth(0).toLong else 0L
            val h0 = if (n > 0) r.getHeight(0).toLong else 0L
            if (n <= 0 || w0 <= 0 || h0 <= 0) None
            else {
              val sample =
                if (n <= MaxVideoFrames) 0 until n
                else (0 until MaxVideoFrames).map(i => (i.toLong * n / MaxVideoFrames).toInt)
              if (w0 * h0 * sample.size > MaxDecodePixels) None
              else {
                val idxs =
                  if (sample.forall(i => r.getWidth(i) == w0 && r.getHeight(i) == h0))
                    sample
                  else Seq(0) // delta-frame animation: first frame only
                Some(idxs.map(r.read(_)))
              }
            }
          } finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally iis.close()
    }

  /** Audio container by magic bytes (same cheap pre-sniff as images —
    * `AudioSystem` probing arbitrary binary is wasted work at scale). */
  private def sniffAudioKind(p: Array[Byte]): Option[String] = {
    def ascii(i: Int, s: String) = p != null && p.length >= i + s.length &&
      s.indices.forall(j => p(i + j) == s(j).toByte)
    if (ascii(0, "RIFF") && ascii(8, "WAVE")) Some("audio/wav")
    else if (ascii(0, "FORM") && (ascii(8, "AIFF") || ascii(8, "AIFC")))
      Some("audio/aiff")
    else None
  }

  private final case class AudioDecoded(kind: String, sampleRate: Int,
      channels: Int, durationMs: Long, mono: Array[Double])

  /** Pure-JDK audio decode (`javax.sound.sampled` parses WAV/AIFF —
    * same no-native-libs stance as the ImageIO path): header fields plus
    * channel-averaged mono samples in [-1, 1]. Handles the PCM layouts
    * the JDK writers produce (8/16-bit signed/unsigned, either
    * endianness); compressed or exotic encodings return None and fall
    * back to byte-level features. WAV/AIFF are uncompressed, so decoded
    * size ≈ payload size — no decompression-bomb exposure beyond the
    * already-in-memory payload. */
  private def decodeAudio(p: Array[Byte]): Option[AudioDecoded] =
    sniffAudioKind(p).flatMap { kind =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(p))
        try {
          val fmt = in.getFormat
          val bits = fmt.getSampleSizeInBits
          val ch = fmt.getChannels
          val enc = fmt.getEncoding
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          if (ch <= 0 || (!signed && !unsigned) || (bits != 8 && bits != 16))
            None
          else {
            val bytes = in.readAllBytes()
            val bytesPerSample = bits / 8
            val frameBytes = bytesPerSample * ch
            val frames = bytes.length / frameBytes
            val mono = new Array[Double](frames)
            var f = 0
            while (f < frames) {
              var acc = 0.0
              var c = 0
              while (c < ch) {
                val o = f * frameBytes + c * bytesPerSample
                val v =
                  if (bits == 8) {
                    if (signed) bytes(o).toDouble / 128.0
                    else ((bytes(o) & 0xff) - 128).toDouble / 128.0
                  } else {
                    val (lo, hi) =
                      if (fmt.isBigEndian) (bytes(o + 1) & 0xff, bytes(o).toInt)
                      else (bytes(o) & 0xff, bytes(o + 1).toInt)
                    val s16 = (hi << 8) | lo
                    (if (signed) s16 else s16 - 32768).toDouble / 32768.0
                  }
                acc += v
                c += 1
              }
              mono(f) = acc / ch
              f += 1
            }
            val rate = math.round(fmt.getSampleRate)
            Some(AudioDecoded(kind, rate, ch,
              if (rate > 0) frames.toLong * 1000L / rate else 0L, mono))
          }
        } finally in.close()
      } catch { case _: Exception => None }
    }

  /** RMS-envelope embedding — the audio analogue of [[lumaGridEmbedding]]:
    * per-block root-mean-square energy over `dim` equal time blocks,
    * mean-centered (gain-offset-invariant) and L2-normalized
    * (volume-invariant). Byte-different containers of the SAME samples
    * (a WAV and an AIFF) produce the identical vector. */
  private def rmsEnvelopeEmbedding(mono: Array[Double], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = mono.length
    if (n == 0) return out
    val sums = new Array[Double](dim)
    val counts = new Array[Int](dim)
    var i = 0
    while (i < n) {
      val b = math.min(dim - 1, (i.toLong * dim / n).toInt)
      sums(b) += mono(i) * mono(i)
      counts(b) += 1
      i += 1
    }
    val cells = Array.tabulate(dim)(j =>
      if (counts(j) == 0) 0.0 else math.sqrt(sums(j) / counts(j)))
    val mean = cells.sum / dim
    val centered = cells.map(_ - mean)
    val norm = math.sqrt(centered.foldLeft(0.0)((s, v) => s + v * v))
    var j = 0
    while (j < dim) {
      out(j) = if (norm > 1e-9) (centered(j) / norm).toFloat else 0f
      j += 1
    }
    out
  }

  /** FALLBACK decoder for undecodable payloads: "parses" header fields
    * deterministically from the first bytes (the pre-r11 stub, kept
    * byte-identical — the llm_mm_meta oracle replays it in SQL). A real
    * deployment swaps this for audio/video probes. */
  private def stubDecode(payload: Array[Byte]): (String, Int, Int) = {
    if (payload == null || payload.isEmpty) ("empty", 0, 0)
    else {
      val b0 = payload(0) & 0xff
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      ("image/fake", 16 + (b0 % 240), 16 + (b1 % 240))
    }
  }

  /** Batched per-partition metadata extraction: one decoder instance per
    * partition, emitting the input row + a typed `meta` struct. Real
    * images report true width/height and the sniffed format kind;
    * everything else keeps the deterministic fallback fields. */
  def extractMeta(df: DataFrame, mediaCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("meta", metaSchema)
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      // decoder init once per partition — that is why this is
      // mapPartitions, not a UDF (ImageIO's registry is static; a JNI
      // decoder handle would be created here)
      rows.map { r =>
        val payload = r.get(mediaIdx).asInstanceOf[Array[Byte]]
        val audio = decodeAudio(payload)
        val (kind, w, h) = audio match {
          case Some(a) => (a.kind, 0, 0)
          case None => decodeImage(payload) match {
            case Some(img) =>
              (sniffImageKind(payload).get, img.getWidth, img.getHeight)
            case None => stubDecode(payload)
          }
        }
        // 8 hex chars = the first 4 bytes: hex-encode ONLY those (the old
        // full-payload encode built a 2×payload string per row to keep 8
        // characters — material once payloads are multi-MB images)
        val checksum = if (payload == null) null
        else payload.take(4).map("%02x".format(_)).mkString
        Row.fromSeq(r.toSeq :+ Row(kind,
          Option(payload).map(_.length.toLong).getOrElse(0L), w, h, checksum,
          audio.map(_.sampleRate).orNull,
          audio.map(_.channels).orNull,
          audio.map(_.durationMs).orNull,
          // header-only frame count; pays a stream scan only for GIFs
          gifFrameCount(payload).map(Int.box).orNull))
      }
    }(Encoders.row(outSchema))
  }

  /** Downsampled-luma grid embedding: the image is block-averaged onto a
    * g×g luma grid (g = ⌊√dim⌋), mean-centered (brightness-invariant) and
    * L2-normalized — a real low-level visual feature: identical pixels
    * under different lossless encodings produce the IDENTICAL vector, and
    * near-identical pixels (mild JPEG loss) land at cosine ≈ 1. */
  private def lumaGridEmbedding(img: java.awt.image.BufferedImage,
      dim: Int): Array[Float] = {
    val g = math.max(1, math.sqrt(dim.toDouble).toInt)
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](g * g)
    val counts = new Array[Int](g * g)
    var y = 0
    while (y < h) {
      val gy = math.min(g - 1, y * g / h)
      var x = 0
      while (x < w) {
        val gx = math.min(g - 1, x * g / w)
        val rgb = img.getRGB(x, y)
        val luma = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        val c = gy * g + gx
        sums(c) += luma
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    val cells = Array.tabulate(g * g)(i =>
      if (counts(i) == 0) 0.0 else sums(i) / counts(i))
    val mean = cells.sum / cells.length
    val centered = cells.map(_ - mean)
    val norm = math.sqrt(centered.foldLeft(0.0)((s, v) => s + v * v))
    val out = new Array[Float](dim) // cells fill the g² prefix, rest zero
    var i = 0
    while (i < g * g) {
      out(i) = if (norm > 1e-9) (centered(i) / norm).toFloat else 0f
      i += 1
    }
    out
  }

  /** Batched per-partition feature extraction: media payload → a unit-norm
    * `array<float>` embedding, the column every similarity/ANN operator in
    * [[Similarity]] / [[IvfIndex]] consumes — media dedup and media search
    * are the SAME pipelines as text, swapping only this step. Decodable
    * images embed as a [[lumaGridEmbedding]] (REAL pixels); undecodable
    * payloads keep the deterministic byte-histogram FALLBACK (a production
    * deployment swaps that fallback for an ONNX/JNI encoder handle,
    * initialized once per partition exactly where the comment says). */
  def featurize(df: DataFrame, mediaCol: String, dim: Int = 64,
      embeddingCol: String = "embedding"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(embeddingCol, ArrayType(FloatType))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      // encoder init once per partition; the per-row call below is then a
      // batched forward
      rows.map { r =>
        val payload = r.get(mediaIdx).asInstanceOf[Array[Byte]]
        val emb: Array[Float] = if (payload == null) null
        else decodeAudio(payload) match {
          case Some(a) => rmsEnvelopeEmbedding(a.mono, dim) // REAL samples
          // animated GIFs: the pure-JDK video path — evenly sampled
          // frames, per-frame luma embedding, temporal MEAN pooling,
          // renormalized (a static GIF takes the single-image branch
          // below, bit-identical to before)
          case None => decodeGifFrames(payload).filter(_.size > 1) match {
            case Some(frames) =>
              val per = frames.map(lumaGridEmbedding(_, dim))
              val pooled = Array.tabulate(dim)(i =>
                per.foldLeft(0.0)((s, v) => s + v(i)) / per.size)
              val norm = math.sqrt(pooled.foldLeft(0.0)((s, v) => s + v * v))
              Array.tabulate(dim)(i =>
                if (norm > 1e-9) (pooled(i) / norm).toFloat else 0f)
            case None => decodeImage(payload) match {
              case Some(img) => lumaGridEmbedding(img, dim) // REAL pixels
              case None =>
              // FALLBACK featurizer: L2-normalized byte histogram folded to
              // `dim` — byte-level only, kept for undecodable payloads
              val acc = new Array[Float](dim)
              var i = 0
              while (i < payload.length) {
                acc((payload(i) & 0xff) % dim) += 1f; i += 1
              }
              val norm = math.sqrt(acc.foldLeft(0.0)((s, x) => s + x.toDouble * x))
              if (norm > 0) { var j = 0; while (j < dim) { acc(j) = (acc(j) / norm).toFloat; j += 1 } }
              acc
            }
          }
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
