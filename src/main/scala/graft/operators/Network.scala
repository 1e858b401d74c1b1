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
    },

    // -- q140: macaddr/macaddr8 slice (`src/backend/utils/adt/mac.c`,
    //    `mac8.c`) — the network type q105's inet slice didn't touch.
    //    Deterministic MACs from supplier keys over three vendor OUIs;
    //    per-OUI report = the q105 grouping pattern on trunc(macaddr)
    //    (mac.c:341 — zero the NIC-specific low 3 bytes, the vendor
    //    aggregation macaddr exists for). Each device also derives its
    //    modified EUI-64 (macaddrtomacaddr8's FF:FE infix + mac8.c:499
    //    macaddr8_set7bit — the IPv6 interface-id construction); the
    //    per-OUI eui64 sum rides BIGINT so the whole derivation is
    //    hash-compared. All byte work is integer arithmetic + hex
    //    formatting inside whole-stage codegen — no UDF --
    "q140_macaddr" -> { (s, dir) =>
      Tables.df(s, dir, "supplier")
        .withColumn("oui", expr(
          """CASE s_suppkey % 3 WHEN 0 THEN 6980L  -- 00:1b:44
                               WHEN 1 THEN 524320L -- 08:00:20
                               ELSE 11329096L      -- ac:de:48
             END"""))
        .withColumn("lo", expr(
          """(s_suppkey * 7) % 256 * 65536 + (s_suppkey * 13) % 256 * 256
             + (s_suppkey * 31) % 256"""))
        .withColumn("mac", expr("oui * 16777216 + lo"))
        // modified EUI-64 a:b:c:FF:FE:d:e:f with bit 0x02 of byte a set:
        // the full 64-bit value overflows BIGINT for the ac:de:48 OUI,
        // so the derivation splits — the (a|02):b:c:ff:fe prefix (text,
        // constant per OUI group) and the 40-bit interface tail (summed
        // exactly: ≤ 2^40 per device, BIGINT-safe at any corpus size)
        .withColumn("eui_if", expr("65534L * 16777216L + lo"))
        .withColumn("mac_txt", expr(
          """concat_ws(':',
               lpad(lower(hex(mac div 1099511627776 % 256)), 2, '0'),
               lpad(lower(hex(mac div 4294967296 % 256)), 2, '0'),
               lpad(lower(hex(mac div 16777216 % 256)), 2, '0'),
               lpad(lower(hex(mac div 65536 % 256)), 2, '0'),
               lpad(lower(hex(mac div 256 % 256)), 2, '0'),
               lpad(lower(hex(mac % 256)), 2, '0'))"""))
        .groupBy(expr(
          """concat_ws(':',
               lpad(lower(hex(oui div 65536 % 256)), 2, '0'),
               lpad(lower(hex(oui div 256 % 256)), 2, '0'),
               lpad(lower(hex(oui % 256)), 2, '0'))""").as("oui_txt"))
        .agg(
          count(lit(1)).as("n_devices"),
          countDistinct(expr("mac div 16777216 * 16777216")).as("n_trunc"),
          min(expr(
            """concat_ws(':',
                 lpad(lower(hex((oui + 131072) div 65536 % 256)), 2, '0'),
                 lpad(lower(hex(oui div 256 % 256)), 2, '0'),
                 lpad(lower(hex(oui % 256)), 2, '0'), 'ff', 'fe')"""))
            .as("eui64_prefix"),
          sum(col("eui_if")).cast("bigint").as("eui_if_sum"),
          min(col("mac_txt")).as("min_mac"),
          max(col("mac_txt")).as("max_mac"))
        .orderBy(col("oui_txt"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q140_macaddr" -> """
      WITH macs AS (
        SELECT
          CAST(CASE s_suppkey % 3 WHEN 0 THEN 6980 WHEN 1 THEN 524320
               ELSE 11329096 END AS BIGINT) AS oui,
          (s_suppkey * 7) % 256 * 65536 + (s_suppkey * 13) % 256 * 256
            + (s_suppkey * 31) % 256 AS lo
        FROM supplier),
      m AS (
        SELECT oui, lo, oui * 16777216 + lo AS mac,
          CAST(65534 AS BIGINT) * 16777216 + lo AS eui_if,
          lpad(lower(to_hex(oui // 65536 % 256)), 2, '0') || ':' ||
          lpad(lower(to_hex(oui // 256 % 256)), 2, '0') || ':' ||
          lpad(lower(to_hex(oui % 256)), 2, '0') AS oui_txt,
          lpad(lower(to_hex((oui + 131072) // 65536 % 256)), 2, '0') || ':' ||
          lpad(lower(to_hex(oui // 256 % 256)), 2, '0') || ':' ||
          lpad(lower(to_hex(oui % 256)), 2, '0') || ':ff:fe' AS eui64_prefix
        FROM macs),
      t AS (
        SELECT *,
          lpad(lower(to_hex(mac // 1099511627776 % 256)), 2, '0') || ':' ||
          lpad(lower(to_hex(mac // 4294967296 % 256)), 2, '0') || ':' ||
          lpad(lower(to_hex(mac // 16777216 % 256)), 2, '0') || ':' ||
          lpad(lower(to_hex(mac // 65536 % 256)), 2, '0') || ':' ||
          lpad(lower(to_hex(mac // 256 % 256)), 2, '0') || ':' ||
          lpad(lower(to_hex(mac % 256)), 2, '0') AS mac_txt
        FROM m)
      SELECT oui_txt, count(*) AS n_devices,
        count(DISTINCT mac // 16777216 * 16777216) AS n_trunc,
        min(eui64_prefix) AS eui64_prefix,
        CAST(sum(eui_if) AS BIGINT) AS eui_if_sum,
        min(mac_txt) AS min_mac, max(mac_txt) AS max_mac
      FROM t GROUP BY oui_txt ORDER BY oui_txt""",

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
