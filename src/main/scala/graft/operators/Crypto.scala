package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PgCrypto

/** pgcrypto slice (reference `contrib/pgcrypto/pgcrypto.c:129 pg_digest`,
  * `:165 pg_hmac`): content hashing as used by a data pipeline —
  * stable content addresses (digest) and keyed integrity tags (hmac).
  *
  *  - cr01: digest family — md5 + sha256 content addresses per document
  *    plus a leading-nibble distribution audit (a uniform digest spreads
  *    the corpus ~evenly over 16 nibbles; the count column makes the
  *    audit part of the hash-compared result). Full DuckDB oracle.
  *  - cr02: hmac-sha256 content tags (px-hmac.c RFC 2104 construction,
  *    composed from native sha2/unhex/concat — see functions/PgCrypto).
  *    DuckDB has no blob digest, so no SQL oracle is expressible —
  *    driver records the rows-only check; the construction itself is
  *    pinned to the RFC 4231 test vectors in HmacSpec (the same vectors
  *    pgcrypto's expected/hmac-sha2.out regression uses).
  *
  * The random/crypt half of pgcrypto (gen_salt, crypt, pgp_*,
  * gen_random_uuid) is deliberately out: nondeterministic by design,
  * nothing a reproducible analytics pipeline can assert on.
  */
object Crypto {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cr01_digest" -> { (s, dir) =>
      val d = Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("md5_hex"),
          sha2(col("text").cast("binary"), 256).as("sha256_hex"))
      val dist = d.groupBy(substring(col("sha256_hex"), 1, 1).as("nibble"))
        .agg(count(lit(1)).as("n_docs"))
      d.join(broadcast(dist), substring(col("sha256_hex"), 1, 1) === col("nibble"))
        .select(col("doc_id"), col("md5_hex"), col("sha256_hex"),
          col("nibble"), col("n_docs"))
        .orderBy(col("doc_id"))
    },

    "cr02_hmac" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          PgCrypto.hmacSha256(col("text"), "graft-signing-key").as("tag"))
        .orderBy(col("doc_id"))
    }
  )

  def oracle: Map[String, String] = Map(
    "cr01_digest" -> """
      WITH d AS (
        SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
        FROM documents),
      dist AS (
        SELECT substring(sha256_hex, 1, 1) AS nibble, count(*) AS n_docs
        FROM d GROUP BY 1)
      SELECT doc_id, md5_hex, sha256_hex, nibble, n_docs
      FROM d JOIN dist ON substring(d.sha256_hex, 1, 1) = dist.nibble
      ORDER BY doc_id"""
    // cr02_hmac: no oracle — DuckDB has no blob digest, so the RFC 2104
    // inner-digest concatenation is inexpressible; HmacSpec pins the
    // construction to RFC 4231 vectors instead.
  )
}
