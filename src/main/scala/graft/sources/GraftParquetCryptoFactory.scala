package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.crypto.{DecryptionKeyRetriever, DecryptionPropertiesFactory,
  EncryptionPropertiesFactory, FileDecryptionProperties, FileEncryptionProperties,
  KeyAccessDeniedException}
import org.apache.parquet.hadoop.api.WriteSupport

import graft.table.{EncryptionManagers, KeyedFileEncryption}

/** Parquet Modular Encryption driven by a graft [[KeyedFileEncryption]]
  * manager (ref threads its `EncryptionManager` through its own parquet IO
  * in `parquet/.../Parquet.java`; Spark owns the parquet streams here, so
  * the hook is parquet-hadoop's own factory SPI instead — loaded via
  * `parquet.crypto.factory.class` from the per-read/per-write conf, which
  * is how Spark's builtin columnar encryption wires KMS factories too).
  *
  * Per file: uniform encryption (footer + every column) under the
  * manager's path-derived key, with the manager's `keyMetadata` stored as
  * footer key metadata. At read the retriever re-derives both from the
  * path and REFUSES a file whose stored metadata disagrees — the same
  * wrong-key loudness the Avro streams have. The factory only ever
  * activates on conf that carries a serialized manager (our own scans and
  * writes); unrelated parquet reads in the session never see it.
  *
  * Derivation uses the file NAME only, so the committer's temp-path →
  * final-path rename (which preserves the name) keeps write-time and
  * read-time keys identical.
  */
class GraftParquetCryptoFactory extends EncryptionPropertiesFactory
    with DecryptionPropertiesFactory {

  private def manager(conf: Configuration): Option[KeyedFileEncryption] =
    Option(conf.get(EncryptionManagers.OptionKey))
      .map(GraftParquetCryptoFactory.cached)
      .collect { case k: KeyedFileEncryption => k }

  override def getFileEncryptionProperties(conf: Configuration,
      tempFilePath: Path,
      fileWriteContext: WriteSupport.WriteContext): FileEncryptionProperties =
    manager(conf).map { m =>
      val p = tempFilePath.toString
      FileEncryptionProperties.builder(m.fileKey(p))
        .withFooterKeyMetadata(m.keyMetadata(p).get.toArray)
        .build()
    }.orNull

  override def getFileDecryptionProperties(conf: Configuration,
      filePath: Path): FileDecryptionProperties =
    manager(conf).map { m =>
      val p = filePath.toString
      val builder = FileDecryptionProperties.builder()
        .withKeyRetriever(new DecryptionKeyRetriever {
          override def getKey(keyMetadata: Array[Byte]): Array[Byte] =
            // a plain manager offers one candidate; a KeyRotationManager
            // offers its new AND old keys — match the stored footer
            // metadata against each derivation
            m.candidateManagers.find(c => c.keyMetadata(p).exists(e =>
                java.util.Arrays.equals(e.toArray, keyMetadata))) match {
              case Some(c) => c.fileKey(p)
              case None => throw new KeyAccessDeniedException(
                s"$p: footer key metadata does not match any of this " +
                  "manager's derivations — the file was encrypted under a " +
                  "different master key")
            }
        })
      // a later-encrypted table still holds plaintext PAR1 files from
      // before the manager swap: they must keep reading (files
      // self-describe — same contract as the Avro magic sniff). But a
      // table that REQUIRES encryption sets the flag to false, and then a
      // plaintext file at a keyed path is refused as a forged substitute.
      if (conf.getBoolean(EncryptionManagers.PlaintextFilesAllowedKey, true))
        builder.withPlaintextFilesAllowed()
      builder.build()
    }.orNull
}

object GraftParquetCryptoFactory {
  /** Deserialized-manager cache: the factory is re-instantiated per file
    * open, but the serialized manager string is stable per scan/write.
    * BOUNDED (small LRU) so rotated or abandoned managers — and their
    * master-key material — don't stay resident for the JVM lifetime in
    * long-lived sessions touching many tables. */
  private val MaxCached = 32
  private val managers = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, graft.table.EncryptionManager](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, graft.table.EncryptionManager]): Boolean =
        size() > MaxCached
    })

  // Collections.synchronizedMap already synchronizes computeIfAbsent on
  // the wrapper itself — no extra locking needed
  private def cached(serialized: String): graft.table.EncryptionManager =
    managers.computeIfAbsent(serialized, EncryptionManagers.deserialize)

  /** Shared with [[GraftOrcKeyProviderFactory]] — both SPIs re-hydrate the
    * same serialized manager per file open. */
  private[sources] def cachedManager(serialized: String): graft.table.EncryptionManager =
    cached(serialized)
}
