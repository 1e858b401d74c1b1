package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pgcrypto surface (reference `contrib/pgcrypto/pgcrypto.c:129
  * pg_digest`, `:165 pg_hmac`; HMAC algorithm `px-hmac.c:52 hmac_init` —
  * the RFC 2104 construction H(key⊕opad ‖ H(key⊕ipad ‖ msg))).
  *
  * Spark-first: digests are the built-in codegen'd `md5`/`sha1`/`sha2`
  * expressions; HMAC is COMPOSED from them — the pads are plan-time hex
  * literals (key ⊕ 0x36/0x5c, zero-padded to the 64-byte SHA-256 block
  * exactly as hmac_init does), the inner digest's raw bytes come back
  * via `unhex`, and both hash passes stay native binary expressions
  * inside whole-stage codegen. No UDF, no driver-side crypto.
  *
  * Correctness: HmacSpec pins the composition to the RFC 4231 test
  * vectors (the same vectors pgcrypto's expected/hmac-sha2.out checks).
  */
object PgCrypto {

  private val BlockSize = 64 // SHA-256 block, px-hmac.c hmac_init h->p.block_size

  private def hex(bs: Array[Byte]): String = bs.map("%02x".format(_)).mkString

  /** hmac(msg, key, 'sha256') — key as a plan-time constant (the usual
    * deployment shape: one signing key, many rows). Returns lowercase
    * hex like pgcrypto's encode(hmac(...), 'hex'). */
  def hmacSha256(msg: Column, key: Array[Byte]): Column = {
    val k = if (key.length > BlockSize)
      java.security.MessageDigest.getInstance("SHA-256").digest(key)
    else key
    val padded = k ++ Array.fill(BlockSize - k.length)(0.toByte)
    val ipad = padded.map(b => (b ^ 0x36).toByte)
    val opad = padded.map(b => (b ^ 0x5c).toByte)
    sha2(concat(unhex(lit(hex(opad))),
      unhex(sha2(concat(unhex(lit(hex(ipad))), msg.cast("binary")), 256))), 256)
  }

  def hmacSha256(msg: Column, key: String): Column =
    hmacSha256(msg, key.getBytes("UTF-8"))
}
