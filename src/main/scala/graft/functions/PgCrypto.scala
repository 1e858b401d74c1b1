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
  * SECURITY NOTE (benchmark-only key handling): because the pads are
  * plan-time literals, the key-derived ipad/opad bytes are visible in
  * `explain` output, the Spark UI SQL tab, and event logs — anyone who
  * can read the plan can reconstruct the key. That is fine for this
  * benchmark's fixed public key, but a production deployment MUST pass
  * the pads through a non-logged channel instead (e.g. a broadcast
  * variable read by a custom Expression, or a credential-provider UDF),
  * exactly as pgcrypto keeps key material out of `EXPLAIN VERBOSE`.
  *
  * Correctness: HmacSpec pins the composition to the RFC 4231 test
  * vectors (the same vectors pgcrypto's expected/hmac-sha2.out checks),
  * and cr02 folds the same vector check into the driver-hash-compared
  * result as a constant-foldable boolean column.
  */
object PgCrypto {

  private val BlockSize = 64 // SHA-256 block, px-hmac.c hmac_init h->p.block_size

  private def hex(bs: Array[Byte]): String = bs.map("%02x".format(_)).mkString

  /** key ⊕ ipad / key ⊕ opad over the zero-padded 64-byte block. */
  def pads(key: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val k = if (key.length > BlockSize)
      java.security.MessageDigest.getInstance("SHA-256").digest(key)
    else key
    val padded = k ++ Array.fill(BlockSize - k.length)(0.toByte)
    (padded.map(b => (b ^ 0x36).toByte), padded.map(b => (b ^ 0x5c).toByte))
  }

  /** hmac(msg, key, 'sha256') — key as a plan-time constant (the usual
    * deployment shape: one signing key, many rows). Returns lowercase
    * hex like pgcrypto's encode(hmac(...), 'hex'). */
  def hmacSha256(msg: Column, key: Array[Byte]): Column = {
    val (ipad, opad) = pads(key)
    sha2(concat(unhex(lit(hex(opad))),
      unhex(sha2(concat(unhex(lit(hex(ipad))), msg.cast("binary")), 256))), 256)
  }

  def hmacSha256(msg: Column, key: String): Column =
    hmacSha256(msg, key.getBytes("UTF-8"))

  /** Hexified-inner-digest keyed tag: sha256(opad_str ‖ hex(sha256(
    * ipad_str ‖ msg))). NOT RFC 2104 (the inner digest enters the outer
    * hash as 64 hex chars, not 32 raw bytes) — it exists because DuckDB's
    * sha256 is VARCHAR-only, so this is the strongest keyed construction
    * a SQL oracle can recompute byte-for-byte. Only defined for keys
    * whose pads are valid single-byte UTF-8 (ASCII + C0 controls), which
    * any printable-ASCII key ≤ 64 bytes satisfies. The true RFC 2104
    * path above stays gated by the RFC 4231 vectors. */
  def hmacSha256Hexpad(msg: Column, key: String): Column = {
    val (ipad, opad) = pads(key.getBytes("UTF-8"))
    require((ipad ++ opad).forall(b => b >= 0), s"non-ASCII pad for key")
    val is = new String(ipad, "ISO-8859-1")
    val os = new String(opad, "ISO-8859-1")
    sha2(concat(lit(os), sha2(concat(lit(is), msg), 256)).cast("binary"), 256)
  }

  /** The same pads as SQL-literal-safe strings, for oracle interpolation. */
  def padStrings(key: String): (String, String) = {
    val (ipad, opad) = pads(key.getBytes("UTF-8"))
    (new String(ipad, "ISO-8859-1"), new String(opad, "ISO-8859-1"))
  }
}
