package graft.table

import java.io.{InputStream, OutputStream}

/** Pluggable table-data encryption (ref
  * `api/src/main/java/org/apache/iceberg/encryption/EncryptionManager.java`):
  * a manager wraps the raw file streams and owns the per-file key material.
  * The key metadata travels on every data-file entry
  * (`DataFileMeta.keyMetadata`, ref `DataFile.java:62`) and is handed back
  * verbatim at read time — the table format itself never interprets it.
  *
  * CONTRACT: `keyMetadata` must be a pure function of the file path. The
  * V1 `FileFormat` write path encrypts on the task but stamps manifests on
  * the driver (there is no per-file task→driver side channel), so both
  * sides derive the same metadata independently. Schemes wanting a random
  * per-file data key derive it from the master key and a path-determined
  * salt instead of fresh randomness (see [[AesGcmEncryptionManager]]) —
  * file paths are UUID-unique per write, so derived keys never repeat.
  *
  * Serializable because the manager rides to executors with write/read
  * tasks (same constraint the reference documents).
  *
  * The shipped default is [[PlaintextEncryptionManager]] — pass-through
  * streams, no key metadata. Real encryption is wired END-TO-END for
  * Avro (library-owned streams, chunked AES-GCM) AND for parquet — the
  * default format — through Parquet Modular Encryption driven by a
  * [[KeyedFileEncryption]] manager (parquet-hadoop encrypts pages and
  * footer itself; see [[graft.sources.GraftParquetCryptoFactory]]). A
  * keyed manager on ORC, or a stream-only manager on parquet, FAILS FAST
  * at write time rather than silently writing plaintext.
  */
trait EncryptionManager extends Serializable {

  /** Key metadata to persist on `path`'s manifest entry (None = plaintext).
    * Pure function of the path — called on the write task (to key the
    * stream) and on the driver (to stamp the manifest). Derive from the
    * file NAME component only: committers rename temp paths to final ones
    * and only the name survives (see [[KeyedFileEncryption]]). */
  def keyMetadata(path: String): Option[Seq[Byte]]

  /** Wrap the stream that writes one data file. */
  def encrypt(path: String, rawOut: OutputStream): OutputStream

  /** Wrap the stream that reads one data file, given the key metadata its
    * manifest entry carries. */
  def decrypt(path: String, rawIn: InputStream,
      keyMetadata: Option[Seq[Byte]]): InputStream

  /** Optional SEEKABLE decryption over a positioned raw stream. A scheme
    * whose layout supports random access (per-block encryption) returns an
    * input the Avro container reader can `seek`/`sync` — encrypted files
    * then split across tasks and decrypt with bounded memory. `None` (the
    * default) makes readers fall back to buffering [[decrypt]]'s whole
    * output, which stays correct under splitting but costs a full-file
    * buffer per slice task. Ownership of `rawIn` transfers on `Some`
    * (closed via the returned input). */
  def decryptSeekable(path: String,
      rawIn: org.apache.hadoop.fs.FSDataInputStream, fileLen: Long,
      keyMetadata: Option[Seq[Byte]]): Option[org.apache.avro.file.SeekableInput] =
    None

  /** Whether [[decryptSeekable]] is implemented. Planners keep encrypted
    * files WHOLE-FILE-sliced for stream-only schemes — splitting them
    * would make every slice task decrypt and buffer the entire file. */
  def supportsSeekableDecryption: Boolean = false

  /** Can this manager decrypt a file whose manifest entry stores `km`?
    * The plan-time guard asks this for every keyed file; a rotation
    * handle accepts BOTH of its keys' derivations. */
  def accepts(path: String, km: Option[Seq[Byte]]): Boolean =
    km == keyMetadata(path)

  /** Does `bytes` look like THIS manager's sealed metadata output? The
    * default recognizes the chunked-GCM magic ([[AesGcmEncryptionManager]]
    * and rotation handles over it); a CUSTOM manager sealing with its own
    * framing MUST override, or metadata it writes through [[FileIO]] will
    * be read back as plaintext and fail to parse. */
  def recognizesSealed(bytes: Array[Byte]): Boolean =
    AesGcmEncryptionManager.isEncrypted(bytes)

  /** Decrypt a fully-buffered METADATA file (metadata JSON, manifest
    * list, jsonl manifest, stats) — no manifest entry carries ITS key
    * metadata, so the manager derives its own (the purity contract).
    * Rotation handles override with trial decryption across their keys. */
  def decryptMetadata(path: String, bytes: Array[Byte]): Array[Byte] = {
    val in = decrypt(path, new java.io.ByteArrayInputStream(bytes),
      keyMetadata(path))
    try in.readAllBytes() finally in.close()
  }
}

/** A manager that can expose the raw per-file data key. Required to drive
  * Parquet Modular Encryption (parquet-hadoop encrypts its own pages and
  * footer, so it needs the KEY, not a wrapped stream).
  *
  * CONTRACT (stricter than `keyMetadata`'s): `fileKey` and `keyMetadata`
  * MUST derive from the file NAME only, never the full path. Parquet
  * writes go through a committer that encrypts at a TEMP path and renames
  * to the final one — the name survives the rename, the directory does
  * not. An implementation keying on the directory would produce
  * permanently unreadable files. ([[AesGcmEncryptionManager]] complies —
  * it hashes `path.substring(lastIndexOf('/') + 1)`.) */
trait KeyedFileEncryption extends EncryptionManager {
  /** The per-file AES key (16 bytes) for `path` — derived from the file
    * NAME component only (see the trait contract). */
  def fileKey(path: String): Array[Byte]

  /** Managers whose derivations may have keyed EXISTING files: the
    * parquet decryption retriever tries each against a file's stored
    * footer key metadata. One for a plain manager; a rotation handle
    * carries two. */
  def candidateManagers: Seq[KeyedFileEncryption] = Seq(this)
}

/** The no-op manager: plaintext bytes through, no key metadata. A file
  * that DOES carry key metadata cannot be decrypted by this manager —
  * failing loudly beats silently returning ciphertext. */
object PlaintextEncryptionManager extends EncryptionManager {
  override def keyMetadata(path: String): Option[Seq[Byte]] = None

  override def encrypt(path: String, rawOut: OutputStream): OutputStream = rawOut

  override def decrypt(path: String, rawIn: InputStream,
      keyMetadata: Option[Seq[Byte]]): InputStream = {
    require(keyMetadata.isEmpty,
      s"$path carries encryption key metadata but the table's encryption " +
        "manager is plaintext — configure the manager that wrote this file")
    rawIn
  }
}

/** Chunked AES-GCM encryption keyed from one master key (the ref format
  * spec's AES-GCM-stream idea: independently authenticated blocks so
  * encrypted files SEEK and SPLIT; cf.
  * `api/src/main/java/org/apache/iceberg/encryption/EncryptionManager.java`
  * for the manager surface this implements).
  *
  * Per-file data key = HMAC-SHA256(master, "key:" + fileName) truncated to
  * 128 bits — unique per file because write paths are UUID-unique, and
  * derivable on writer task, driver, and reader alike (the `keyMetadata`
  * purity contract). Key metadata = `aes-gcm-v1:<keyId>:<fingerprint>`
  * where the fingerprint is HMAC(master, "meta:" + fileName): the reader
  * refuses a file whose metadata does not match its own derivation, so a
  * wrong master key (or a foreign file) fails loudly before any
  * ciphertext is interpreted as rows.
  *
  * File layout (self-describing — readers take the block size from the
  * header, not from this manager's configuration):
  *
  *   `GAC1` magic (4) | plaintext block size (4, big-endian) | base IV (12)
  *   then per block: ciphertext (== plaintext length) | GCM tag (16)
  *
  * Every block is its own GCM unit: IV = base IV XOR block index, AAD =
  * (block index, is-last flag). The index in IV+AAD refuses block
  * reordering/substitution; the is-last flag refuses whole-block
  * truncation (the new "last" block was sealed with last=0); intra-block
  * tampering or byte truncation fails the tag. Plaintext length is
  * recoverable from the ciphertext length alone, so a reader can map any
  * plaintext offset to its block — random access with one decrypted block
  * (default 1 MiB) in memory, which is what lets the Avro container
  * `sync` to a split boundary instead of buffering the whole file. */
final class AesGcmEncryptionManager(masterKey: Array[Byte],
    keyId: String = "k1", blockSize: Int = 1 << 20)
    extends KeyedFileEncryption {
  require(masterKey.nonEmpty, "master key must be non-empty")
  require(blockSize >= 64 && blockSize <= (1 << 28),
    s"blockSize must be in [64B, 256MiB], got $blockSize")

  import AesGcmEncryptionManager._

  private def fileName(path: String): String =
    path.substring(path.lastIndexOf('/') + 1)

  private def hmac(label: String, path: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(masterKey, "HmacSHA256"))
    mac.doFinal((label + fileName(path)).getBytes("UTF-8"))
  }

  private def dataKey(path: String) =
    new javax.crypto.spec.SecretKeySpec(fileKey(path), "AES")

  /** Exposed for Parquet Modular Encryption ([[KeyedFileEncryption]]) —
    * the same per-file derivation the Avro streams key with. */
  override def fileKey(path: String): Array[Byte] =
    hmac("key:", path).take(16)

  override def keyMetadata(path: String): Option[Seq[Byte]] = Some(
    (s"aes-gcm-v1:$keyId:" +
      hmac("meta:", path).take(8).map("%02x".format(_)).mkString)
      .getBytes("UTF-8").toSeq)

  override def encrypt(path: String, rawOut: OutputStream): OutputStream = {
    val iv = new Array[Byte](IvLen)
    new java.security.SecureRandom().nextBytes(iv)
    rawOut.write(Magic)
    rawOut.write(java.nio.ByteBuffer.allocate(4).putInt(blockSize).array())
    rawOut.write(iv)
    new ChunkedGcmOutputStream(dataKey(path), iv, blockSize, rawOut)
  }

  private def validateMeta(path: String, keyMetadata: Option[Seq[Byte]]): Unit = {
    val expected = this.keyMetadata(path)
    require(keyMetadata == expected,
      s"$path: key metadata ${keyMetadata.map(renderMeta)} does not match " +
        s"this manager's derivation ${expected.map(renderMeta)} — the file " +
        "was written with a different master key (or is not managed by " +
        s"key id '$keyId')")
  }

  private def parseHeader(path: String, header: Array[Byte]): (Int, Array[Byte]) = {
    require(header.length == HeaderLen && header.startsWith(Magic),
      if (header.length >= LegacyMagic.length &&
          header.startsWith(LegacyMagic))
        s"$path: written with the superseded whole-file GAE1 layout " +
          "(pre-chunked builds) — re-ingest or rewrite it under the build " +
          "that wrote it; this build reads only the chunked GAC1 layout"
      else s"$path: not a chunked AES-GCM encrypted file (missing GAC1 header)")
    val bs = java.nio.ByteBuffer.wrap(header, Magic.length, 4).getInt
    // the header is outside any GCM tag: bound-check before any allocation
    // sized by it (the writer enforces the same range) — a tampered size
    // must refuse cleanly, not overflow `blockSize + TagLen` allocations
    require(bs >= 64 && bs <= (1 << 28),
      s"$path: corrupt GAC1 header (block size $bs outside [64B, 256MiB])")
    (bs, java.util.Arrays.copyOfRange(header, Magic.length + 4, HeaderLen))
  }

  override def decrypt(path: String, rawIn: InputStream,
      keyMetadata: Option[Seq[Byte]]): InputStream = {
    validateMeta(path, keyMetadata)
    val (bs, baseIv) = parseHeader(path, rawIn.readNBytes(HeaderLen))
    new ChunkedGcmInputStream(dataKey(path), baseIv, bs, rawIn, path)
  }

  override def supportsSeekableDecryption: Boolean = true

  override def decryptSeekable(path: String,
      rawIn: org.apache.hadoop.fs.FSDataInputStream, fileLen: Long,
      keyMetadata: Option[Seq[Byte]]): Option[org.apache.avro.file.SeekableInput] = {
    validateMeta(path, keyMetadata)
    val header = new Array[Byte](HeaderLen)
    rawIn.readFully(0L, header)
    val (bs, baseIv) = parseHeader(path, header)
    Some(new ChunkedGcmSeekableInput(dataKey(path), baseIv, bs, rawIn,
      fileLen, path))
  }

  private def renderMeta(m: Seq[Byte]): String = new String(m.toArray, "UTF-8")
}

object AesGcmEncryptionManager {
  val Magic: Array[Byte] = "GAC1".getBytes("UTF-8")
  /** The superseded whole-file layout's magic — detected only to refuse
    * with a message naming the layout instead of a confusing Avro error. */
  val LegacyMagic: Array[Byte] = "GAE1".getBytes("UTF-8")
  val IvLen = 12
  val TagBits = 128
  val TagLen = 16
  /** magic + block size + base IV */
  val HeaderLen: Int = 4 + 4 + IvLen

  /** Does this (seekable) stream start with an encrypted-file magic
    * (current chunked GAC1 or the superseded GAE1 — the latter so legacy
    * ciphertext is routed to the loud layout refusal rather than being
    * parsed as plaintext Avro)? Leaves the stream positioned back at 0. */
  def isEncrypted(in: org.apache.hadoop.fs.FSDataInputStream): Boolean = {
    // readNBytes, not a single read(): a network stream may legally return
    // 1–3 bytes on the first call, and a short read must not classify an
    // encrypted file as plaintext
    val head = in.readNBytes(Magic.length)
    in.seek(0L)
    head.length == Magic.length && (java.util.Arrays.equals(head, Magic) ||
      java.util.Arrays.equals(head, LegacyMagic))
  }

  /** Buffered-bytes variant of the magic sniff. */
  def isEncrypted(bytes: Array[Byte]): Boolean =
    bytes.length >= Magic.length &&
      (bytes.startsWith(Magic) || bytes.startsWith(LegacyMagic))

  /** Per-block IV: the file's random base IV with the block index folded
    * into the low 8 bytes (XOR keeps the base entropy; the index makes
    * every block's IV unique under the per-file key). */
  private[table] def blockIv(base: Array[Byte], idx: Long): Array[Byte] = {
    val iv = base.clone()
    var i = 0
    while (i < 8) {
      iv(IvLen - 1 - i) = (iv(IvLen - 1 - i) ^ ((idx >>> (8 * i)) & 0xffL)).toByte
      i += 1
    }
    iv
  }

  /** Per-block AAD: (index, is-last). The index refuses reorder even if
    * IVs were equal; the flag refuses dropping trailing blocks. */
  private[table] def blockAad(idx: Long, last: Boolean): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(9).putLong(idx)
    b.put(if (last) 1.toByte else 0.toByte)
    b.array()
  }

  private[table] def gcm(mode: Int, key: javax.crypto.spec.SecretKeySpec,
      baseIv: Array[Byte], idx: Long, last: Boolean): javax.crypto.Cipher = {
    val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(mode, key,
      new javax.crypto.spec.GCMParameterSpec(TagBits, blockIv(baseIv, idx)))
    cipher.updateAAD(blockAad(idx, last))
    cipher
  }

  private[table] def authFailure(path: String, idx: Long, e: Throwable) =
    new IllegalStateException(
      s"$path: GCM authentication failed on block $idx — the file was " +
        "truncated, tampered with, or written under a different key", e)
}

/** Buffers one plaintext block, sealing each as its own GCM unit; close
  * seals the (possibly empty) final block with the is-last flag. `flush`
  * is a no-op for buffered plaintext by design — a partial block cannot
  * be emitted without breaking the fixed-stride layout. */
private[table] final class ChunkedGcmOutputStream(
    key: javax.crypto.spec.SecretKeySpec, baseIv: Array[Byte],
    blockSize: Int, out: OutputStream) extends OutputStream {
  import AesGcmEncryptionManager._
  private val buf = new Array[Byte](blockSize)
  private var n = 0
  private var idx = 0L
  private var closed = false

  private def seal(last: Boolean): Unit = {
    out.write(gcm(javax.crypto.Cipher.ENCRYPT_MODE, key, baseIv, idx, last)
      .doFinal(buf, 0, n))
    idx += 1
    n = 0
  }

  override def write(b: Int): Unit = {
    if (n == blockSize) seal(last = false)
    buf(n) = b.toByte
    n += 1
  }

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    var o = off
    var rem = len
    while (rem > 0) {
      if (n == blockSize) seal(last = false)
      val take = math.min(blockSize - n, rem)
      System.arraycopy(b, o, buf, n, take)
      n += take
      o += take
      rem -= take
    }
  }

  override def flush(): Unit = out.flush()

  override def close(): Unit = if (!closed) {
    closed = true
    try seal(last = true) finally out.close()
  }
}

/** Random-access decryption: plaintext length is derived from the cipher
  * length, any offset maps to its block, and ONE decrypted block stays
  * cached — bounded memory no matter the file size. Positioned reads
  * (`readFully(pos, …)`) leave no seek state on the shared raw stream. */
private[table] final class ChunkedGcmSeekableInput(
    key: javax.crypto.spec.SecretKeySpec, baseIv: Array[Byte], blockSize: Int,
    in: org.apache.hadoop.fs.FSDataInputStream, fileLen: Long, path: String)
    extends org.apache.avro.file.SeekableInput {
  import AesGcmEncryptionManager._
  private val cipherStride = blockSize.toLong + TagLen
  private val nBlocks =
    math.max(0L, (fileLen - HeaderLen + cipherStride - 1) / cipherStride)
  private val plainLen = fileLen - HeaderLen - TagLen * nBlocks
  require(fileLen >= HeaderLen + TagLen && plainLen >= 0,
    s"$path: truncated encrypted file ($fileLen bytes)")
  private var pos = 0L
  private var cachedIdx = -1L
  private var cached: Array[Byte] = null

  private def block(idx: Long): Array[Byte] = {
    if (idx != cachedIdx) {
      val start = HeaderLen + idx * cipherStride
      val clen = (math.min(fileLen, start + cipherStride) - start).toInt
      val enc = new Array[Byte](clen)
      in.readFully(start, enc)
      cached =
        try gcm(javax.crypto.Cipher.DECRYPT_MODE, key, baseIv, idx,
          last = idx == nBlocks - 1).doFinal(enc)
        catch { case e: java.security.GeneralSecurityException =>
          throw authFailure(path, idx, e) }
      cachedIdx = idx
    }
    cached
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= plainLen || len == 0) return if (len == 0) 0 else -1
    val idx = pos / blockSize
    val blk = block(idx)
    val inBlk = (pos - idx * blockSize).toInt
    val take = math.min(len, blk.length - inBlk)
    System.arraycopy(blk, inBlk, b, off, take)
    pos += take
    take
  }

  override def seek(p: Long): Unit = pos = p
  override def tell(): Long = pos
  override def length(): Long = plainLen
  override def close(): Unit = in.close()
}

/** Sequential decryption over a plain (non-seekable) stream: a one-block
  * lookahead decides the is-last flag (the block with nothing after it is
  * the final one). */
private[table] final class ChunkedGcmInputStream(
    key: javax.crypto.spec.SecretKeySpec, baseIv: Array[Byte], blockSize: Int,
    in: InputStream, path: String) extends InputStream {
  import AesGcmEncryptionManager._
  private var idx = 0L
  private var cur: Array[Byte] = Array.emptyByteArray
  private var curPos = 0
  private var pending: Array[Byte] = readCipherBlock()
  require(pending != null, s"$path: truncated encrypted file (no blocks)")

  private def readCipherBlock(): Array[Byte] = {
    val buf = new Array[Byte](blockSize + TagLen)
    var n = 0
    while (n < buf.length) {
      val r = in.read(buf, n, buf.length - n)
      if (r < 0) return if (n == 0) null else java.util.Arrays.copyOf(buf, n)
      n += r
    }
    buf
  }

  private def advance(): Boolean = {
    if (pending == null) return false
    val next = readCipherBlock()
    cur =
      try gcm(javax.crypto.Cipher.DECRYPT_MODE, key, baseIv, idx,
        last = next == null).doFinal(pending)
      catch { case e: java.security.GeneralSecurityException =>
        throw authFailure(path, idx, e) }
    curPos = 0
    idx += 1
    pending = next
    true
  }

  override def read(): Int = {
    val one = new Array[Byte](1)
    if (read(one, 0, 1) < 0) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    while (curPos >= cur.length) if (!advance()) return -1
    val take = math.min(len, cur.length - curPos)
    System.arraycopy(cur, curPos, b, off, take)
    curPos += take
    take
  }

  override def close(): Unit = in.close()
}

/** Master-key rotation handle: WRITES go under `primary` (the new key);
  * READS fall back to `previous` per file — by stored manifest metadata
  * where the caller has it, by trial decryption (block-0 authentication)
  * where it doesn't. `previous` may be [[PlaintextEncryptionManager]]:
  * that is "encrypt an existing plaintext table", the same flow.
  *
  * Protocol (no reference counterpart — the incubator-era reference ships
  * only the manager INTERFACE; rotation is original work):
  *   1. load the table with `new KeyRotationManager(newMgr, oldMgr)`;
  *   2. run [[Maintenance.rotateEncryptionKeys]] — every live content
  *      file is rewritten under the new key in partial-progress Replace
  *      commits; an interruption leaves a readable MIXED table under this
  *      same handle (rerun to finish — already-rotated files are skipped);
  *   3. reload with just `newMgr`: the current snapshot now needs only the
  *      new key; the OLD key's ciphertext survives only in history —
  *      `expireSnapshots` past the rotation commit deletes it, which is
  *      the point of rotating after a suspected key compromise. */
final class KeyRotationManager(val primary: KeyedFileEncryption,
    val previous: EncryptionManager) extends KeyedFileEncryption {
  require(!previous.isInstanceOf[KeyRotationManager],
    "chain rotations one at a time — finish (and expire) the previous " +
      "rotation before starting the next")

  override def keyMetadata(path: String): Option[Seq[Byte]] =
    primary.keyMetadata(path)
  override def fileKey(path: String): Array[Byte] = primary.fileKey(path)
  override def encrypt(path: String, rawOut: OutputStream): OutputStream =
    primary.encrypt(path, rawOut)

  override def accepts(path: String, km: Option[Seq[Byte]]): Boolean =
    primary.accepts(path, km) || previous.accepts(path, km)

  override def candidateManagers: Seq[KeyedFileEncryption] =
    primary.candidateManagers ++ (previous match {
      case k: KeyedFileEncryption => k.candidateManagers
      case _ => Nil
    })

  /** Sequential streams can't rewind for a second trial: buffer, then
    * reuse the metadata-style trial decryption. Only metadata-sized reads
    * and the non-seekable fallback land here. */
  override def decrypt(path: String, rawIn: InputStream,
      km: Option[Seq[Byte]]): InputStream = {
    val bytes = try rawIn.readAllBytes() finally rawIn.close()
    // decryptMetadata expects the full file INCLUDING header — callers of
    // decrypt() have already had nothing consumed (FileIO hands the raw
    // stream over whole)
    new java.io.ByteArrayInputStream(decryptMetadata(path, bytes))
  }

  override def decryptMetadata(path: String, bytes: Array[Byte]): Array[Byte] =
    try primary.decryptMetadata(path, bytes)
    catch { case e: RuntimeException =>
      previous match {
        case PlaintextEncryptionManager => throw e
        case p =>
          try p.decryptMetadata(path, bytes)
          catch { case e2: RuntimeException => e2.addSuppressed(e); throw e2 }
      }
    }

  override def supportsSeekableDecryption: Boolean =
    primary.supportsSeekableDecryption

  override def decryptSeekable(path: String,
      rawIn: org.apache.hadoop.fs.FSDataInputStream, fileLen: Long,
      km: Option[Seq[Byte]]): Option[org.apache.avro.file.SeekableInput] = {
    // readers derive km themselves, so it cannot dispatch between the two
    // keys: authenticate block 0 under the primary and fall back on
    // failure (positioned reads leave no state on the shared raw stream)
    def open(m: EncryptionManager) =
      m.decryptSeekable(path, rawIn, fileLen, m.keyMetadata(path))
    def probe(s: org.apache.avro.file.SeekableInput)
        : org.apache.avro.file.SeekableInput = {
      val one = new Array[Byte](1)
      s.seek(0L); s.read(one, 0, 1); s.seek(0L)
      s
    }
    try open(primary).map(probe)
    catch { case e: RuntimeException =>
      previous match {
        case p if p != PlaintextEncryptionManager && p.supportsSeekableDecryption =>
          try open(p).map(probe)
          catch { case e2: RuntimeException => e2.addSuppressed(e); throw e2 }
        case _ => throw e
      }
    }
  }
}

/** Managers ride to write/read tasks as a string option (the V1 FileFormat
  * surface has no richer channel): java serialization + base64. */
object EncryptionManagers {
  val OptionKey = "graft.avro.encryption"

  /** When "false", readers refuse PLAINTEXT content files (parquet PAR1
    * footers, unsealed avro containers): set on scans of tables that
    * REQUIRE encryption, where plaintext bytes at a keyed path are a
    * forged substitute, not history. Defaults to allowed — later-keyed
    * mixed tables must keep reading their pre-encryption files. */
  val PlaintextFilesAllowedKey = "graft.encryption.plaintext-files-allowed"

  /** [[contentOptions]] plus the plaintext-refusal flag when the table
    * requires encryption. Parquet honors the flag inside
    * [[graft.sources.GraftParquetCryptoFactory]], avro inside the graft
    * FileFormat's magic sniff, and ORC via an explicit tail probe at task
    * open ([[graft.sources.OrcContentGuard]] — Spark's ORC reader itself
    * has no per-file decryption hook and reads plaintext files silently). */
  def contentOptionsFor(m: EncryptionManager, format: String,
      requireEncrypted: Boolean): Map[String, String] =
    contentOptions(m, format) ++
      (if (requireEncrypted && m.isInstanceOf[KeyedFileEncryption])
        Map(PlaintextFilesAllowedKey -> "false")
      else Map.empty)

  /** Read/write options that engage Parquet Modular Encryption through
    * [[graft.sources.GraftParquetCryptoFactory]] for keyed managers —
    * parquet-hadoop encrypts pages and footer itself, keyed per file by
    * the manager's derivation. Empty for plaintext or stream-only
    * managers. Applied to every parquet read/write of table CONTENT
    * (data files AND delete files; manifests stay plaintext like the
    * reference's manager scope). */
  def parquetCryptoOptions(m: EncryptionManager): Map[String, String] = m match {
    case _: KeyedFileEncryption => Map(
      "parquet.crypto.factory.class" -> "graft.sources.GraftParquetCryptoFactory",
      OptionKey -> serialize(m))
    case _ => Map.empty
  }

  /** Read-side ORC options: select the graft [[org.apache.orc.impl.KeyProvider]]
    * (ServiceLoader SPI — see `sources/GraftOrcKeyProvider.scala`) and
    * carry the manager. Readers and footer-metrics opens then unseal the
    * per-file local keys; writers additionally need the `orc.encrypt`
    * column spec (schema-dependent — built in `Writes.writeDataFiles`).
    *
    * The provider NAME carries a fingerprint of the serialized manager:
    * ORC's `CryptoUtils.getKeyProvider` caches providers statically BY
    * NAME for the JVM lifetime, so a bare constant name would hand the
    * first table's master key to every later graft-keyed ORC read in the
    * session — two tables under different masters would cross-decrypt or
    * cross-refuse. Distinct names give each manager its own cache slot
    * (the factory re-verifies the fingerprint against the conf's manager). */
  def orcCryptoOptions(m: EncryptionManager): Map[String, String] = m match {
    case _: KeyedFileEncryption =>
      val ser = serialize(m)
      Map(
        "orc.key.provider" -> s"graft-${managerFingerprint(ser)}",
        OptionKey -> ser)
    case _ => Map.empty
  }

  /** Short stable digest of a serialized manager — keys ORC's static
    * provider cache; NOT secret material (it hashes the serialized form,
    * which already rides the conf). */
  def managerFingerprint(serialized: String): String =
    managerFingerprintBytes(serialized).map("%02x".format(_)).mkString

  /** The raw 8 digest bytes behind [[managerFingerprint]] — stored inside
    * ORC sealed-local-key blobs so a cross-manager unseal failure is
    * distinguishable from blob corruption. */
  def managerFingerprintBytes(serialized: String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(serialized.getBytes("UTF-8")).take(8)

  /** Per-format Spark read/write options that key table-content IO:
    * avro rides the manager to the graft FileFormat's own streams;
    * parquet engages modular encryption via [[parquetCryptoOptions]];
    * ORC resolves the graft KeyProvider via [[orcCryptoOptions]]. */
  def contentOptions(m: EncryptionManager, format: String): Map[String, String] =
    format match {
      case "avro" if m != PlaintextEncryptionManager => Map(OptionKey -> serialize(m))
      case "parquet" => parquetCryptoOptions(m)
      case "orc" => orcCryptoOptions(m)
      case _ => Map.empty
    }

  /** A conf copy carrying [[orcCryptoOptions]] — for direct ORC footer
    * opens (metrics collection on encrypted stats). */
  def orcCryptoConf(conf: org.apache.hadoop.conf.Configuration,
      m: Option[EncryptionManager]): org.apache.hadoop.conf.Configuration =
    confWith(conf, m.map(orcCryptoOptions).getOrElse(Map.empty))

  /** A conf copy carrying `opts` — identity when there is nothing to add
    * (the copy is not free; metrics paths call this per file). */
  private def confWith(conf: org.apache.hadoop.conf.Configuration,
      opts: Map[String, String]): org.apache.hadoop.conf.Configuration =
    if (opts.isEmpty) conf
    else {
      val c = new org.apache.hadoop.conf.Configuration(conf)
      opts.foreach { case (k, v) => c.set(k, v) }
      c
    }

  /** A conf copy carrying [[parquetCryptoOptions]] — for direct
    * parquet-hadoop footer opens (metrics collection). */
  def parquetCryptoConf(conf: org.apache.hadoop.conf.Configuration,
      m: Option[EncryptionManager]): org.apache.hadoop.conf.Configuration =
    confWith(conf, m.map(parquetCryptoOptions).getOrElse(Map.empty))

  def serialize(m: EncryptionManager): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(m); oos.close()
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  /** Deserialization is FILTERED: the option string is reachable from
    * read/write options, which may one day arrive from a catalog or
    * SQL-only surface — an unfiltered ObjectInputStream would let anyone
    * who can set an option instantiate arbitrary serializable classes on
    * driver and executors. Allowlist: graft classes (custom managers must
    * live under the `graft` namespace to ride options), the JDK/Scala
    * pieces their fields need, and byte arrays. */
  private val deserializationFilter: java.io.ObjectInputFilter =
    java.io.ObjectInputFilter.Config.createFilter(
      // resource limits too: an allowlisted-classes-only graph can still
      // stack-overflow the reader if nested 100k deep
      "maxdepth=32;maxarray=1048576;maxrefs=65536;" +
        "graft.**;java.lang.*;scala.**;[B;!*")

  def deserialize(s: String): EncryptionManager = {
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(s)))
    in.setObjectInputFilter(deserializationFilter)
    try in.readObject().asInstanceOf[EncryptionManager] finally in.close()
  }
}
