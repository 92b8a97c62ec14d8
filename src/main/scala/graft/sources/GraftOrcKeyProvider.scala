package graft.sources

import java.security.{Key, SecureRandom}
import java.util.Random

import org.apache.hadoop.conf.Configuration
import org.apache.orc.EncryptionAlgorithm
import org.apache.orc.impl.{HadoopShims, KeyProvider, LocalKey}

import graft.table.{EncryptionManagers, KeyedFileEncryption}

/** ORC columnar encryption driven by a graft [[KeyedFileEncryption]]
  * manager — the third and last data format (parquet has Modular
  * Encryption, avro the chunked-GCM streams; the r10 audit carried ORC as
  * honestly fail-fast because `WriterOptions.encrypt` looked
  * programmatic-only; it isn't: Spark's OrcOutputWriter goes through
  * `org.apache.orc.mapred.OrcOutputFormat.buildOptions`, which DOES read
  * `orc.encrypt` / `orc.mask` from the conf, and both reader and writer
  * resolve their [[KeyProvider]] from `orc.key.provider` via the JDK
  * ServiceLoader — this class plugs that SPI, exactly like
  * [[GraftParquetCryptoFactory]] plugs parquet's).
  *
  * Scheme: ORC generates one random LOCAL key per file and asks the
  * provider to seal it; the sealed bytes travel in the file, so per-file
  * uniqueness comes from ORC itself and the provider only needs ONE
  * stable master secret. That master is derived through the manager's
  * pure name-keyed derivation at a reserved constant name — the same
  * derivation discipline every other format uses, so one
  * `AesGcmEncryptionManager` keys all three formats. Sealing is AES-GCM
  * (IV + tag in the sealed bytes): a wrong master key fails
  * AUTHENTICATION and the read refuses loudly — deliberately stricter
  * than ORC's stock providers, whose unauthenticated CTR unseal would
  * surface a wrong key as garbage rows or a checksum error deep in a
  * task. Under a [[graft.table.KeyRotationManager]] the unseal tries the
  * new master first, then the previous one, so rotation covers ORC
  * tables too.
  *
  * Residual-exposure caveat (documented, not fixable from here): ORC's
  * `CryptoUtils` static provider cache holds one provider per distinct
  * manager fingerprint for the JVM lifetime, so a rotated-away master's
  * derived ORC key stays resident until the JVM exits — the same class of
  * exposure as any long-lived KMS client cache. Our own manager cache is
  * LRU-bounded; restart long-lived sessions after retiring a compromised
  * key.
  */
final class GraftOrcKeyProvider(manager: KeyedFileEncryption)
    extends KeyProvider {
  import GraftOrcKeyProvider._

  private val rng = new SecureRandom()

  /** One stable AES master per underlying manager (rotation handles carry
    * two), alongside that manager's 8-byte fingerprint — `fileKey` is a
    * pure function of the name component, and data files are UUID-named
    * so the reserved name can never collide. Computed ONCE: the provider
    * is cached and unseals a local key per file, so a per-call HMAC
    * derivation would rerun for every file of a scan. */
  private val masters: Seq[(Array[Byte], Array[Byte])] =
    manager.candidateManagers.map(m => (
      EncryptionManagers.managerFingerprintBytes(EncryptionManagers.serialize(m)),
      m.fileKey(MasterName)))

  override def getKeyNames: java.util.List[String] =
    java.util.Collections.singletonList(KeyName)

  override def getCurrentKeyVersion(keyName: String): HadoopShims.KeyMetadata = {
    require(keyName == KeyName,
      s"unknown ORC encryption key '$keyName' (graft tables key as '$KeyName')")
    new HadoopShims.KeyMetadata(keyName, 0, EncryptionAlgorithm.AES_CTR_128)
  }

  override def createLocalKey(meta: HadoopShims.KeyMetadata): LocalKey = {
    val material = new Array[Byte](meta.getAlgorithm.keyLength())
    rng.nextBytes(material)
    val iv = new Array[Byte](IvLen)
    rng.nextBytes(iv)
    val (fp, master) = masters.head
    val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(master, "AES"),
      new javax.crypto.spec.GCMParameterSpec(TagBits, iv))
    val wrapped = cipher.doFinal(material)
    // v2 blob: Version | sealing-manager fingerprint (8B) | IV | GCM(material)
    // — the fingerprint makes a cross-manager unseal failure diagnosable
    // as "wrong manager" instead of looking like blob corruption
    val out = new Array[Byte](1 + FpLen + IvLen + wrapped.length)
    out(0) = Version
    System.arraycopy(fp, 0, out, 1, FpLen)
    System.arraycopy(iv, 0, out, 1 + FpLen, IvLen)
    System.arraycopy(wrapped, 0, out, 1 + FpLen + IvLen, wrapped.length)
    new LocalKey(meta.getAlgorithm, material, out)
  }

  override def decryptLocalKey(meta: HadoopShims.KeyMetadata,
      encrypted: Array[Byte]): Key = {
    def unseal(master: Array[Byte], iv: Array[Byte],
        wrapped: Array[Byte]): Option[Array[Byte]] =
      try {
        val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
        cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(master, "AES"),
          new javax.crypto.spec.GCMParameterSpec(TagBits, iv))
        Some(cipher.doFinal(wrapped))
      } catch { case _: java.security.GeneralSecurityException => None }
    val material = encrypted.headOption match {
      // r11 files: no fingerprint — trial-unseal every candidate master
      case Some(VersionLegacy) if encrypted.length > 1 + IvLen =>
        val iv = java.util.Arrays.copyOfRange(encrypted, 1, 1 + IvLen)
        val wrapped = java.util.Arrays.copyOfRange(
          encrypted, 1 + IvLen, encrypted.length)
        masters.view.flatMap { case (_, m) => unseal(m, iv, wrapped) }
          .headOption.getOrElse(throw new IllegalStateException(
            "ORC local key authentication failed — the file was encrypted " +
              "under a different master key than this manager derives (a " +
              "loud refusal by design: ORC's stock unseal would surface a " +
              "wrong key as garbage rows)"))
      // v2: the stored fingerprint names the sealing manager, so "wrong
      // manager" and "corrupt blob" are DISTINCT failures
      case Some(Version) if encrypted.length > 1 + FpLen + IvLen =>
        val fp = java.util.Arrays.copyOfRange(encrypted, 1, 1 + FpLen)
        val iv = java.util.Arrays.copyOfRange(
          encrypted, 1 + FpLen, 1 + FpLen + IvLen)
        val wrapped = java.util.Arrays.copyOfRange(
          encrypted, 1 + FpLen + IvLen, encrypted.length)
        masters.find { case (f, _) => java.util.Arrays.equals(f, fp) } match {
          case None => throw new IllegalStateException(
            s"ORC local key was sealed by manager ${hex(fp)} but this " +
              s"handle derives ${masters.map(m => hex(m._1)).mkString("/")} " +
              "— configure the manager that wrote this file (or its " +
              "rotation handle)")
          case Some((_, master)) => unseal(master, iv, wrapped).getOrElse(
            throw new IllegalStateException(
              "ORC local key failed GCM authentication under its OWN " +
                "sealing manager — the sealed blob is corrupt or tampered"))
        }
      case _ => throw new IllegalArgumentException(
        s"corrupt graft-sealed ORC local key (${encrypted.length} bytes)")
    }
    new javax.crypto.spec.SecretKeySpec(material, meta.getAlgorithm.getAlgorithm)
  }

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  override def getKind: HadoopShims.KeyProviderKind =
    HadoopShims.KeyProviderKind.UNKNOWN
}

object GraftOrcKeyProvider {
  /** The provider name in `orc.key.provider` and the key name in
    * `orc.encrypt` specs. */
  val KeyName = "graft"
  /** Reserved derivation name for the ORC master (never a real file name —
    * data files are UUID-named). */
  val MasterName = "graft-orc-master.key"
  /** r11 blob layout: Version | IV | GCM(material) — still readable. */
  val VersionLegacy: Byte = 1
  /** r12 blob layout adds the sealing manager's fingerprint after the
    * version byte (see decryptLocalKey). */
  val Version: Byte = 2
  val FpLen = 8
  val IvLen = 12
  val TagBits = 128
}

/** ServiceLoader hook (`META-INF/services/org.apache.orc.impl.KeyProvider$Factory`):
  * activates only on `orc.key.provider=graft-<fingerprint>` names AND a
  * conf carrying the MATCHING serialized keyed manager — unrelated ORC
  * reads in the session never see it, and ORC's static per-name provider
  * cache can never serve one table's master to another (the fingerprint
  * in the name pins the cache slot to exactly one manager). */
class GraftOrcKeyProviderFactory extends KeyProvider.Factory {
  override def create(name: String, conf: Configuration,
      random: Random): KeyProvider =
    if (!name.startsWith(s"${GraftOrcKeyProvider.KeyName}-")) null
    else Option(conf.get(EncryptionManagers.OptionKey)) match {
      case None => throw new IllegalStateException(
        s"orc.key.provider=$name but the conf carries no serialized " +
          s"manager (${EncryptionManagers.OptionKey})")
      case Some(ser) =>
        val expected = s"${GraftOrcKeyProvider.KeyName}-" +
          EncryptionManagers.managerFingerprint(ser)
        if (name != expected) throw new IllegalStateException(
          s"orc.key.provider=$name does not match the conf's manager " +
            s"(fingerprint $expected) — mixed-up crypto conf")
        GraftParquetCryptoFactory.cachedManager(ser) match {
          case k: KeyedFileEncryption => new GraftOrcKeyProvider(k)
          case other => throw new IllegalStateException(
            s"orc.key.provider=$name needs a KeyedFileEncryption " +
              s"manager, got ${other.getClass.getSimpleName}")
        }
    }
}
