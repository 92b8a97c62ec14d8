package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.orc.OrcFile

/** Open-time integrity check for ORC content on encryption-required
  * tables: parquet and avro reads refuse plaintext files via their own
  * format hooks ([[GraftParquetCryptoFactory]] honors
  * `PlaintextFilesAllowedKey`; the avro FileFormat sniffs its container
  * magic), but Spark's ORC reader happily serves a plaintext file even
  * when the scan carries a key provider — so a forged plaintext ORC file
  * swapped at a live keyed path (the manifest's key_metadata entry is
  * intact; only the bytes on disk changed) would be read as ordinary rows.
  * This guard runs at task open, BEFORE any rows are served: one ORC tail
  * read per file slice (amortized over the stripe IO that follows — and
  * deliberately UNCACHED: the attacker model is content swapped at a
  * LIVE path, so a path-keyed "already verified" cache would whitelist a
  * path forever and defeat the guard on long-lived executors; the probe
  * must observe the bytes the reader is about to consume), refusing
  * tails that carry no column-encryption keys.
  *
  * The reference has no integrity story at all (its incubator-era
  * encryption surface is 280 LoC of interfaces,
  * `api/.../encryption/EncryptionManager.java`) — this closes the gap the
  * repo's own encryption-required headline promises.
  */
object OrcContentGuard {
  /** Throws unless the ORC file at `path` declares column encryption in
    * its tail. Opening only parses footer/postscript (no stripe reads);
    * the masked-key default means parsing succeeds even without the
    * decryption key in hand — we only ask whether encryption metadata is
    * PRESENT. */
  def requireEncrypted(path: String, conf: Configuration): Unit = {
    val reader = OrcFile.createReader(new Path(path),
      OrcFile.readerOptions(conf))
    val keys = try reader.getColumnEncryptionKeys finally reader.close()
    if (keys == null || keys.isEmpty)
      throw new IllegalStateException(
        s"$path is a plaintext ORC file but this table requires encryption " +
          "(graft.encryption.required) — refusing a possibly forged " +
          "substitute before serving any rows")
  }
}
