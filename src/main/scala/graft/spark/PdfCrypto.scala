package graft.spark

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** PDF standard security handler (PDF 32000 §7.6) — the EMPTY-USER-PASSWORD
  * case that dominates crawl PDFs (files "encrypted" only to set permission
  * bits open with no password at all).
  *
  * Covers the whole deployed range:
  *  - R2/R3 (V1/V2): RC4 40..128-bit, per-object keys (algorithms 1 and 2)
  *  - R4 (V4): crypt filters, /AESV2 (AES-128-CBC) or /V2 (RC4), /Identity
  *  - R5/R6 (V5): AES-256; R6 with the hardened 2.B key-derivation hash
  *
  * Both DIRECTIONS are here: [[standardFileKey]] validates /U against the
  * empty user password and derives the file key for readers, while the
  * compute* entries build valid /O and /U values so [[PdfOps]] can
  * synthesize real encrypted fixtures under the closed-form oracle.
  * RC4 is implemented inline (10 lines, no provider dependence); AES rides
  * javax.crypto. Callers treat any throw as "unsupported encryption" and
  * fall back per-row — never a task failure. */
private[spark] object PdfCrypto {

  /** the 32-byte password pad (PDF 32000 7.6.3.3, table 21's constant). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  // ----------------------------------------------------------- primitives

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  /** plain RC4 — self-contained so no JCE provider lookup is needed. */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xFF
      y = (y + s(x)) & 0xFF
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  /** AES/CBC/NoPadding, both directions (R6 internals, /UE, stream data). */
  def aesCbcRaw(key: Array[Byte], iv: Array[Byte], data: Array[Byte],
      encrypt: Boolean): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (encrypt) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE,
      new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** stream decrypt: leading 16-byte IV, PKCS#5 pad stripped tolerantly
    * (a malformed pad keeps the plaintext rather than throwing — crawl
    * tolerance; the oracle never depends on a broken pad). */
  def aesStreamDecrypt(key: Array[Byte], ivAndData: Array[Byte]): Array[Byte] = {
    if (ivAndData.length < 16 || (ivAndData.length - 16) % 16 != 0)
      throw new IllegalArgumentException("bad AES stream length")
    val plain = aesCbcRaw(key, java.util.Arrays.copyOfRange(ivAndData, 0, 16),
      java.util.Arrays.copyOfRange(ivAndData, 16, ivAndData.length), encrypt = false)
    if (plain.isEmpty) return plain
    val pad = plain(plain.length - 1) & 0xFF
    if (pad >= 1 && pad <= 16 && pad <= plain.length)
      java.util.Arrays.copyOfRange(plain, 0, plain.length - pad)
    else plain
  }

  /** stream encrypt (synthesis): PKCS#5 pad, IV prepended. */
  def aesStreamEncrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val padLen = 16 - (data.length % 16)
    val padded = java.util.Arrays.copyOf(data, data.length + padLen)
    java.util.Arrays.fill(padded, data.length, padded.length, padLen.toByte)
    iv ++ aesCbcRaw(key, iv, padded, encrypt = true)
  }

  def intLE(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  // ------------------------------------------------- key schedule (V1-V4)

  /** algorithm 2: the RC4/AES-128 file key for the (empty) user password. */
  def fileKeyR234(o: Array[Byte], p: Long, id0: Array[Byte], r: Int,
      keyLen: Int, encryptMetadata: Boolean): Array[Byte] = {
    var h = md5(Pad, java.util.Arrays.copyOf(o, 32), intLE(p), id0,
      if (r >= 4 && !encryptMetadata) Array.fill[Byte](4)(0xFF.toByte)
      else Array.emptyByteArray)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(java.util.Arrays.copyOf(h, keyLen)); i += 1 }
    }
    java.util.Arrays.copyOf(h, keyLen)
  }

  /** algorithm 3 forward: /O for empty owner AND user passwords. */
  def computeOwnerEntry(r: Int, keyLen: Int): Array[Byte] = {
    var h = md5(Pad)
    if (r >= 3) { var i = 0; while (i < 50) { h = md5(h); i += 1 } }
    val rc4key = java.util.Arrays.copyOf(h, keyLen)
    var o = rc4(rc4key, Pad)
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        val k = rc4key.map(b => (b ^ i).toByte)
        o = rc4(k, o)
        i += 1
      }
    }
    o
  }

  /** algorithms 4/5 forward: /U for the empty user password. */
  def computeUserEntry(fileKey: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] = {
    if (r == 2) rc4(fileKey, Pad)
    else {
      var e = rc4(fileKey, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        val k = fileKey.map(b => (b ^ i).toByte)
        e = rc4(k, e)
        i += 1
      }
      e ++ new Array[Byte](16) // 16 bytes of arbitrary padding
    }
  }

  /** algorithms 4/5 check: does /U match the empty user password? */
  def userPasswordIsEmpty(u: Array[Byte], fileKey: Array[Byte],
      id0: Array[Byte], r: Int): Boolean = {
    val expect = computeUserEntry(fileKey, id0, r)
    val n = if (r == 2) 32 else 16
    u.length >= n && java.util.Arrays.equals(
      java.util.Arrays.copyOf(u, n), java.util.Arrays.copyOf(expect, n))
  }

  // ---------------------------------------------------- key schedule (V5)

  /** algorithm 2.B (R6 hardened hash); R5 uses plain SHA-256. `salt` is the
    * 8-byte validation or key salt from /U. Empty password throughout. */
  def hash2B(salt: Array[Byte], r6: Boolean): Array[Byte] = {
    var k = sha("SHA-256", salt)
    if (!r6) return k
    // the loop runs >=64 rounds: hoist the JCE service lookups (Cipher +
    // the three digests) out of it — getInstance per round dominated the
    // R6 derivation cost (~2 ms/doc measured), the AES itself is microseconds
    val cipher = Cipher.getInstance("AES/CBC/NoPadding")
    val sha256 = MessageDigest.getInstance("SHA-256")
    val sha384 = MessageDigest.getInstance("SHA-384")
    val sha512 = MessageDigest.getInstance("SHA-512")
    var e: Array[Byte] = null
    var round = 0
    while (round < 64 || (e(e.length - 1) & 0xFF) > round - 32) {
      // K1 = (password ++ K ++ userdata) x 64 — password and userdata empty
      val k1 = new Array[Byte](k.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(k, 0, k1, i * k.length, k.length); i += 1 }
      cipher.init(Cipher.ENCRYPT_MODE,
        new SecretKeySpec(java.util.Arrays.copyOf(k, 16), "AES"),
        new IvParameterSpec(java.util.Arrays.copyOfRange(k, 16, 32)))
      e = cipher.doFinal(k1)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xFF; i += 1 }
      val d = sum % 3 match {
        case 0 => sha256
        case 1 => sha384
        case _ => sha512
      }
      d.reset(); d.update(e); k = d.digest()
      round += 1
    }
    java.util.Arrays.copyOf(k, 32)
  }

  /** V5 (R5/R6) file key for the empty user password: validate against
    * /U's validation salt, then unwrap /UE with the key salt. Null when
    * the user password is not empty. */
  def fileKeyV5(u: Array[Byte], ue: Array[Byte], r: Int): Array[Byte] = {
    if (u.length < 48 || ue.length < 32) return null
    val vsalt = java.util.Arrays.copyOfRange(u, 32, 40)
    val ksalt = java.util.Arrays.copyOfRange(u, 40, 48)
    val hash = hash2B(vsalt, r6 = r >= 6)
    if (!java.util.Arrays.equals(hash, java.util.Arrays.copyOf(u, 32))) return null
    val ik = hash2B(ksalt, r6 = r >= 6)
    aesCbcRaw(ik, new Array[Byte](16), java.util.Arrays.copyOf(ue, 32), encrypt = false)
  }

  /** V5 forward (synthesis): (/U, /UE) for the empty user password around
    * a chosen 32-byte file key; salts are caller-provided (deterministic
    * fixtures). */
  def computeUserEntryV5(fileKey: Array[Byte], vsalt: Array[Byte],
      ksalt: Array[Byte], r: Int): (Array[Byte], Array[Byte]) = {
    val u = hash2B(vsalt, r6 = r >= 6) ++ vsalt ++ ksalt
    val ue = aesCbcRaw(hash2B(ksalt, r6 = r >= 6), new Array[Byte](16),
      fileKey, encrypt = true)
    (u, ue)
  }

  // -------------------------------------------------------- per-object key

  /** algorithm 1: the per-object key (V1-V4); V5 uses the file key as-is. */
  def objectKey(fileKey: Array[Byte], num: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val tail = Array(
      (num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte, ((num >> 16) & 0xFF).toByte,
      (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte)
    val salt = if (aes) Array(0x73.toByte, 0x41.toByte, 0x6C.toByte, 0x54.toByte)
      else Array.emptyByteArray
    val h = md5(fileKey, tail, salt)
    java.util.Arrays.copyOf(h, math.min(fileKey.length + 5, 16))
  }

  // ------------------------------------------------------------- resolved

  /** what a Doc needs per stream: scheme + key material. */
  sealed trait Scheme
  case object SchemeIdentity extends Scheme
  case object SchemeRc4 extends Scheme
  case object SchemeAes128 extends Scheme
  case object SchemeAes256 extends Scheme

  final case class FileKey(key: Array[Byte], scheme: Scheme) {
    def decryptStream(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = scheme match {
      case SchemeIdentity => data
      case SchemeRc4 => rc4(objectKey(key, num, gen, aes = false), data)
      case SchemeAes128 => aesStreamDecrypt(objectKey(key, num, gen, aes = true), data)
      case SchemeAes256 => aesStreamDecrypt(key, data)
    }
  }

  /** resolve the /Encrypt dict for the empty user password: the FileKey
    * for stream data, or a throw when the handler/password is unsupported
    * (caller falls back to the tolerant scan). `id0` is the first /ID
    * element's bytes (empty when absent — tolerated like readers do). */
  def standardFileKey(enc: Map[String, Any], id0: Array[Byte],
      resolve: Any => Any): FileKey = {
    def str(k: String): Array[Byte] = resolve(enc.getOrElse(k, null)) match {
      case s: String => s.getBytes(ISO_8859_1)
      case _ => Array.emptyByteArray
    }
    def num(k: String, dflt: Long): Long = resolve(enc.getOrElse(k, null)) match {
      case l: java.lang.Long => l.longValue()
      case d: java.lang.Double => d.longValue()
      case _ => dflt
    }
    if (resolve(enc.getOrElse("Filter", null)) != "Standard")
      throw new IllegalArgumentException("non-standard security handler")
    val v = num("V", 0).toInt
    val r = num("R", if (v >= 4) 4 else 2).toInt
    val p = num("P", -1L) // signed 32-bit; intLE keeps the low 32 bits
    v match {
      case 1 | 2 =>
        val keyLen = if (v == 1) 5 else math.max(5, math.min(16, num("Length", 40).toInt / 8))
        val fk = fileKeyR234(str("O"), p, id0, r, keyLen, encryptMetadata = true)
        if (!userPasswordIsEmpty(str("U"), fk, id0, r))
          throw new IllegalArgumentException("user password not empty")
        FileKey(fk, SchemeRc4)
      case 4 =>
        val em = resolve(enc.getOrElse("EncryptMetadata", null)) match {
          case b: java.lang.Boolean => b.booleanValue()
          case _ => true
        }
        val keyLen = math.max(5, math.min(16, num("Length", 128).toInt / 8))
        val fk = fileKeyR234(str("O"), p, id0, r, keyLen, em)
        if (!userPasswordIsEmpty(str("U"), fk, id0, math.max(r, 3)))
          throw new IllegalArgumentException("user password not empty")
        FileKey(fk, streamScheme(enc, resolve))
      case 5 =>
        val fk = fileKeyV5(str("U"), str("UE"), r)
        if (fk == null) throw new IllegalArgumentException("user password not empty")
        FileKey(fk, SchemeAes256)
      case other => throw new IllegalArgumentException(s"unsupported /V $other")
    }
  }

  /** V4's stream crypt filter: /StmF names a /CF entry whose /CFM picks
    * the cipher; /Identity means not encrypted. */
  private def streamScheme(enc: Map[String, Any], resolve: Any => Any): Scheme = {
    val stmf = resolve(enc.getOrElse("StmF", "Identity")) match {
      case s: String => s
      case _ => "Identity"
    }
    if (stmf == "Identity") return SchemeIdentity
    val cfm = resolve(enc.getOrElse("CF", null)) match {
      case cf: Map[_, _] =>
        resolve(cf.asInstanceOf[Map[String, Any]].getOrElse(stmf, null)) match {
          case e: Map[_, _] =>
            resolve(e.asInstanceOf[Map[String, Any]].getOrElse("CFM", "None")) match {
              case s: String => s
              case _ => "None"
            }
          case _ => "None"
        }
      case _ => "None"
    }
    cfm match {
      case "AESV2" => SchemeAes128
      case "AESV3" => SchemeAes256
      case "V2" => SchemeRc4
      case _ => SchemeIdentity
    }
  }
}
