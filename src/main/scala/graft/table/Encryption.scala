package graft.table

import java.io.{InputStream, OutputStream}

/** Pluggable table-data encryption (ref
  * `api/src/main/java/org/apache/iceberg/encryption/EncryptionManager.java`):
  * a manager wraps the raw file streams and owns the per-file key material.
  * The key metadata it returns travels on every data-file entry
  * (`DataFileMeta.keyMetadata`, ref `DataFile.java:62`) and is handed back
  * verbatim at read time — the table format itself never interprets it.
  *
  * Serializable because the manager rides to executors with write/read
  * tasks (same constraint the reference documents).
  *
  * The shipped default is [[PlaintextEncryptionManager]] — pass-through
  * streams, no key metadata — matching the reference era's default. A real
  * KMS-backed manager plugs in through `FileIO(conf, manager)` without any
  * metadata-format change: the `key-metadata` slot is already written,
  * round-tripped, and carried through manifests.
  */
trait EncryptionManager extends Serializable {

  /** Wrap the stream that writes one data file. Returns the (possibly
    * encrypting) stream plus the key metadata to persist on the file's
    * manifest entry (None = written in plaintext). */
  def encrypt(path: String, rawOut: OutputStream): (OutputStream, Option[Seq[Byte]])

  /** Wrap the stream that reads one data file, given the key metadata its
    * manifest entry carries. */
  def decrypt(path: String, rawIn: InputStream,
      keyMetadata: Option[Seq[Byte]]): InputStream
}

/** The no-op manager: plaintext bytes through, no key metadata. A file
  * that DOES carry key metadata cannot be decrypted by this manager —
  * failing loudly beats silently returning ciphertext. */
object PlaintextEncryptionManager extends EncryptionManager {
  override def encrypt(path: String,
      rawOut: OutputStream): (OutputStream, Option[Seq[Byte]]) = (rawOut, None)

  override def decrypt(path: String, rawIn: InputStream,
      keyMetadata: Option[Seq[Byte]]): InputStream = {
    require(keyMetadata.isEmpty,
      s"$path carries encryption key metadata but the table's encryption " +
        "manager is plaintext — configure the manager that wrote this file")
    rawIn
  }
}
