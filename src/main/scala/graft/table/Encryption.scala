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
  * streams, no key metadata. Real encryption is wired END-TO-END for the
  * Avro data format (the one format whose file streams this library owns);
  * a non-plaintext manager on a parquet/ORC table FAILS FAST at write time
  * rather than silently writing plaintext (Spark's builtin writers own
  * those streams).
  */
trait EncryptionManager extends Serializable {

  /** Key metadata to persist on `path`'s manifest entry (None = plaintext).
    * Pure function of the path — called on the write task (to key the
    * stream) and on the driver (to stamp the manifest). */
  def keyMetadata(path: String): Option[Seq[Byte]]

  /** Wrap the stream that writes one data file. */
  def encrypt(path: String, rawOut: OutputStream): OutputStream

  /** Wrap the stream that reads one data file, given the key metadata its
    * manifest entry carries. */
  def decrypt(path: String, rawIn: InputStream,
      keyMetadata: Option[Seq[Byte]]): InputStream
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

/** AES-GCM whole-file encryption keyed from one master key.
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
  * File layout: 4-byte magic `GAE1` + 12-byte random IV, then the GCM
  * ciphertext (tag at end, verified on stream close/EOF). Whole-file GCM
  * is not seekable — the Avro reader buffers the decrypted container (at
  * 100 TB the upgrade path is the chunked AES-GCM stream layout the ref's
  * format spec defines, each block independently seekable).
  */
final class AesGcmEncryptionManager(masterKey: Array[Byte], keyId: String = "k1")
    extends EncryptionManager {
  require(masterKey.nonEmpty, "master key must be non-empty")

  import AesGcmEncryptionManager._

  private def fileName(path: String): String =
    path.substring(path.lastIndexOf('/') + 1)

  private def hmac(label: String, path: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(masterKey, "HmacSHA256"))
    mac.doFinal((label + fileName(path)).getBytes("UTF-8"))
  }

  private def dataKey(path: String) =
    new javax.crypto.spec.SecretKeySpec(hmac("key:", path).take(16), "AES")

  override def keyMetadata(path: String): Option[Seq[Byte]] = Some(
    (s"aes-gcm-v1:$keyId:" +
      hmac("meta:", path).take(8).map("%02x".format(_)).mkString)
      .getBytes("UTF-8").toSeq)

  override def encrypt(path: String, rawOut: OutputStream): OutputStream = {
    val iv = new Array[Byte](IvLen)
    new java.security.SecureRandom().nextBytes(iv)
    rawOut.write(Magic)
    rawOut.write(iv)
    val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE, dataKey(path),
      new javax.crypto.spec.GCMParameterSpec(TagBits, iv))
    new javax.crypto.CipherOutputStream(rawOut, cipher)
  }

  override def decrypt(path: String, rawIn: InputStream,
      keyMetadata: Option[Seq[Byte]]): InputStream = {
    val expected = this.keyMetadata(path)
    require(keyMetadata == expected,
      s"$path: key metadata ${keyMetadata.map(renderMeta)} does not match " +
        s"this manager's derivation ${expected.map(renderMeta)} — the file " +
        "was written with a different master key (or is not managed by " +
        s"key id '$keyId')")
    val header = rawIn.readNBytes(Magic.length + IvLen)
    require(header.length == Magic.length + IvLen &&
      header.startsWith(Magic),
      s"$path: not an AES-GCM encrypted file (missing GAE1 header)")
    val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(javax.crypto.Cipher.DECRYPT_MODE, dataKey(path),
      new javax.crypto.spec.GCMParameterSpec(TagBits,
        header.drop(Magic.length)))
    new javax.crypto.CipherInputStream(rawIn, cipher)
  }

  private def renderMeta(m: Seq[Byte]): String = new String(m.toArray, "UTF-8")
}

object AesGcmEncryptionManager {
  val Magic: Array[Byte] = "GAE1".getBytes("UTF-8")
  val IvLen = 12
  val TagBits = 128

  /** Does this (seekable) stream start with the encrypted-file magic? Leaves
    * the stream positioned back at 0. */
  def isEncrypted(in: org.apache.hadoop.fs.FSDataInputStream): Boolean = {
    val head = new Array[Byte](Magic.length)
    val n = in.read(head, 0, Magic.length)
    in.seek(0L)
    n == Magic.length && java.util.Arrays.equals(head, Magic)
  }
}

/** Managers ride to write/read tasks as a string option (the V1 FileFormat
  * surface has no richer channel): java serialization + base64. */
object EncryptionManagers {
  val OptionKey = "graft.avro.encryption"

  def serialize(m: EncryptionManager): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(m); oos.close()
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  def deserialize(s: String): EncryptionManager = {
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(s)))
    try in.readObject().asInstanceOf[EncryptionManager] finally in.close()
  }
}
