package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Network-type slice — `inet` containment (`<<=`) and text form
  * (reference `src/backend/utils/adt/network.c`: network_sub/network_subeq
  * are masked-prefix compares over the address words; inet_out renders
  * dotted-quad). SURVEY §1.3 scoped geo/network/money/bit types to
  * "as far as tests demand"; this is the demanded slice: addresses as
  * plain integer arithmetic (codegen'd, no UDF), containment as a shift
  * compare — exactly the reference's uint32 mask compare — and the text
  * form via concat. Deterministic synthetic IPs derived from customer
  * keys, identical bytes in both engines.
  */
object Network {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q105_inet_contains" -> { (s, dir) =>
      Tables.df(s, dir, "customer")
        // 10.b2.b1.b0 from the customer key — a deterministic host grid
        .withColumn("b2", expr("CAST(c_custkey % 64 AS BIGINT)"))
        .withColumn("b1", expr("CAST((c_custkey * 7) % 256 AS BIGINT)"))
        .withColumn("b0", expr("CAST((c_custkey * 13) % 254 + 1 AS BIGINT)"))
        .withColumn("ip_int", expr("10 * 16777216 + b2 * 65536 + b1 * 256 + b0"))
        .withColumn("ip", concat(lit("10."), col("b2"), lit("."), col("b1"),
          lit("."), col("b0")))
        // inet '10.37.0.0/16' >>= ip  ⇔  ip_int >> 16 == (10<<8)|37
        .withColumn("in_16", (expr("ip_int div 65536") === lit(10 * 256 + 37)).cast("int"))
        // inet '10.37.91.0/24' >>= ip
        .withColumn("in_24",
          (expr("ip_int div 256") === lit((10 * 256 + 37) * 256 + 91)).cast("int"))
        .agg(
          count(lit(1)).as("n_hosts"),
          sum(col("in_16")).cast("bigint").as("n_in_16"),
          sum(col("in_24")).cast("bigint").as("n_in_24"),
          min(col("ip")).as("min_ip"),
          max(col("ip")).as("max_ip"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q105_inet_contains" -> """
      WITH hosts AS (
        SELECT CAST(c_custkey % 64 AS BIGINT) AS b2,
               CAST((c_custkey * 7) % 256 AS BIGINT) AS b1,
               CAST((c_custkey * 13) % 254 + 1 AS BIGINT) AS b0
        FROM customer),
      ips AS (
        SELECT 10 * 16777216 + b2 * 65536 + b1 * 256 + b0 AS ip_int,
               '10.' || b2 || '.' || b1 || '.' || b0 AS ip
        FROM hosts)
      SELECT count(*) AS n_hosts,
        CAST(sum(CASE WHEN ip_int // 65536 = 10 * 256 + 37 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_16,
        CAST(sum(CASE WHEN ip_int // 256 = (10 * 256 + 37) * 256 + 91 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_24,
        min(ip) AS min_ip,
        max(ip) AS max_ip
      FROM ips"""
  )
}
