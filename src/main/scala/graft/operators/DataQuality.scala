package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality constraint audit — the validation stage every training
  * pipeline runs before a corpus ships (Deequ/Great-Expectations shape;
  * reference analogs: ANALYZE's null_frac / n_distinct probes,
  * `src/backend/commands/analyze.c` compute_scalar_stats, and the
  * COPY-reject accounting the sreh machinery keeps, c01/c02).
  *
  * One audit-summary relation, one row per constraint:
  *   (constraint, n_checked, n_violations) over
  *   - primary-key uniqueness   (duplicate o_orderkey count)
  *   - referential integrity    (lineitem → orders orphan count)
  *   - range constraints        (o_totalprice > 0, 0 ≤ l_discount ≤ 0.1)
  *   - completeness             (null o_orderdate count)
  *   - domain membership        (o_orderstatus ∈ {O, F, P})
  *
  * Scale shape: each check is a single-pass aggregate over its table —
  * the PK check aggregates key-grouped counts (map-side combine), the
  * FK check is a broadcast-able LEFT ANTI join counted without
  * materializing orphans, and the scalar checks fuse into ONE scan of
  * orders (no per-constraint rescans — at 100 TB you pay one pass per
  * table, not per rule). The audit rows union to a tiny summary.
  */
object DataQuality {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq01_constraint_audit" -> { (s, dir) =>
      val orders = Tables.df(s, dir, "orders")
      val lineitem = Tables.df(s, dir, "lineitem")

      // PK uniqueness: rows beyond the first per key
      val pkDup = orders.groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("c"))
        .agg(sum(col("c") - 1).cast("bigint").as("n_violations"),
          count(lit(1)).cast("bigint").as("n_keys"))
        .select(lit("pk_orders_unique").as("check_name"),
          col("n_keys").as("n_checked"), col("n_violations"))

      // FK: lineitems whose order does not exist (left anti, counted)
      val orphans = lineitem.select(col("l_orderkey"))
        .join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).cast("bigint").as("n_violations"))
      val fkRow = lineitem.agg(count(lit(1)).cast("bigint").as("n_checked"))
        .crossJoin(orphans)
        .select(lit("fk_lineitem_orders").as("check_name"),
          col("n_checked"), col("n_violations"))

      // scalar constraints over orders: ONE scan, three rules
      val ordersScan = orders.agg(
        count(lit(1)).cast("bigint").as("n"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).cast("bigint")
          .as("v_price"),
        sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).cast("bigint")
          .as("v_null_date"),
        sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L).otherwise(1L))
          .cast("bigint").as("v_status"))
      val priceRow = ordersScan.select(
        lit("range_o_totalprice_pos").as("check_name"),
        col("n").as("n_checked"), col("v_price").as("n_violations"))
      val dateRow = ordersScan.select(
        lit("not_null_o_orderdate").as("check_name"),
        col("n").as("n_checked"), col("v_null_date").as("n_violations"))
      val statusRow = ordersScan.select(
        lit("domain_o_orderstatus").as("check_name"),
        col("n").as("n_checked"), col("v_status").as("n_violations"))

      // range over lineitem: one scan
      val discRow = lineitem.agg(
        count(lit(1)).cast("bigint").as("n_checked"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
          .otherwise(0L)).cast("bigint").as("n_violations"))
        .select(lit("range_l_discount").as("check_name"),
          col("n_checked"), col("n_violations"))

      pkDup.unionAll(fkRow).unionAll(priceRow).unionAll(dateRow)
        .unionAll(statusRow).unionAll(discRow)
        .orderBy(col("check_name"))
    },

    // -- dq02: Benford first-digit audit — the fraud/corruption screen
    //    auditors run on financial columns (Benford's law: P(d) =
    //    log10(1 + 1/d) for the leading digit of naturally-occurring
    //    amounts; a synthetic or tampered column deviates). Pipeline
    //    shape: ONE map-side-combined census of 9 digit buckets per
    //    column — at 100 TB the shuffle is 9 rows. The statistic is
    //    the chi-square distance Σ (obs − exp)²/exp over exact BIGINT
    //    counts; expectations are the same IEEE log10 on both engines.
    //    (TPC-H totalprice is sum-of-uniforms, NOT Benford — the audit
    //    correctly reports the deviation; the oracle proves the math,
    //    the data proves the detector fires.)
    //    Cross-engine determinism note (t18 discipline): every libm-
    //    derived value here (p_benford, chi_term) is round(...,6) and
    //    HASHED in the output — a 1-ulp log10 divergence would fail the
    //    oracle compare loudly, not flip a hidden gate; no boolean in
    //    dq02 depends on an unrounded double. --
    "dq02_benford" -> { (s, dir) =>
      // leading digit numerically (floor(x / 10^floor(log10 x))) — a
      // string cast would hit engine-specific double formatting
      val digits = Tables.df(s, dir, "orders")
        .filter(col("o_totalprice") > 0)
        .select(expr(
          "CAST(floor(o_totalprice / pow(10.0, floor(log10(o_totalprice)))) AS INT)")
          .as("digit"))
        .filter(col("digit").between(1, 9))
        .groupBy(col("digit"))
        .agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("total"))
      digits.crossJoin(broadcast(tot))
        .withColumn("p_obs", round(col("n").cast("double") / col("total"), 6))
        .withColumn("p_benford", round(expr("log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit)"), 6))
        .withColumn("chi_term", round(
          expr("""pow(n - total * log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit), 2)
                  / (total * log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit))"""), 6))
        .select(col("digit").cast("bigint").as("digit"), col("n"),
          col("p_obs"), col("p_benford"), col("chi_term"))
        .orderBy(col("digit"))
    },

    // -- dq03: corpus snapshot diff — the dataset-versioning audit
    //    (Delta/Iceberg snapshot compare; the reference ecosystem's
    //    answer is table diff via EXCEPT or audit triggers): classify
    //    every doc_id across two snapshots as added / removed /
    //    changed / unchanged by content hash. The two snapshots derive
    //    deterministically from the corpus (prev drops doc_id%13=0 and
    //    drifts the text of doc_id%7=0; curr drops doc_id%11=0), so
    //    every class is populated. Scale shape: ONE full-outer
    //    equi-join on doc_id between two 32-byte (id, md5) projections
    //    — the diff of two 100 TB snapshots moves hashes, never text —
    //    then a 4-row census. The scan is spooled: both snapshot
    //    projections read it once --
    "dq03_snapshot_diff" -> { (s, dir) =>
      val base = Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("text")).localCheckpoint()
      val prev = base.filter(pmod(col("doc_id"), lit(13)) =!= 0)
        .select(col("doc_id"), md5(when(pmod(col("doc_id"), lit(7)) === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text"))).as("prev_h"))
      val curr = base.filter(pmod(col("doc_id"), lit(11)) =!= 0)
        .select(col("doc_id"), md5(col("text")).as("curr_h"))
      prev.join(curr, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("prev_h").isNull, "added")
            .when(col("curr_h").isNull, "removed")
            .when(col("prev_h") =!= col("curr_h"), "changed")
            .otherwise("unchanged"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("status"))
    },

    // -- dq05: COLUMN-PROFILE (schema) drift audit — the other half of
    //    the Deequ-style monitoring next to dq04's volume alarm: per
    //    column, compare null rate / distinct count / numeric profile
    //    between two snapshot versions and flag drifts. The curr
    //    snapshot derives deterministically from the corpus with two
    //    injected regressions (lang nulled on doc_id%9 — a broken
    //    extractor; n_chars inflated on doc_id%5 — a changed
    //    normalization), so the detector provably fires on the right
    //    columns and stays quiet on source. Shape: ONE map-side
    //    aggregate pass per snapshot (profiles are a fixed handful of
    //    counters), a 1-row × 1-row join, and a 3-row stack — at 100 TB
    //    the audit moves two rows through its shuffle. Flags compare
    //    EXACT cross-multiplied BIGINTs (t22's integer-gate discipline):
    //    null drift ⇔ |nc·rp − np·rc|·20 > rp·rc (Δrate > 5%), profile
    //    drift ⇔ |sc·np' − sp·nc'|·10 > sp·nc' (mean ratio > 10%) --
    "dq05_schema_drift" -> { (s, dir) =>
      val base = Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .localCheckpoint() // both snapshot profiles read it
      val curr = base
        .withColumn("lang", when(pmod(col("doc_id"), lit(9)) === 0, lit(null:String))
          .otherwise(col("lang")))
        .withColumn("n_chars", when(pmod(col("doc_id"), lit(5)) === 0,
          col("n_chars") + 40).otherwise(col("n_chars")))
      def profile(df: org.apache.spark.sql.DataFrame, tag: String) = df.agg(
        count(lit(1)).as(s"rows_$tag"),
        (count(lit(1)) - count(col("lang"))).as(s"null_lang_$tag"),
        (count(lit(1)) - count(col("source"))).as(s"null_source_$tag"),
        (count(lit(1)) - count(col("n_chars"))).as(s"null_nchars_$tag"),
        countDistinct(col("lang")).as(s"dist_lang_$tag"),
        countDistinct(col("source")).as(s"dist_source_$tag"),
        countDistinct(col("n_chars")).as(s"dist_nchars_$tag"),
        sum(length(col("lang"))).as(s"sum_lang_$tag"),
        sum(length(col("source"))).as(s"sum_source_$tag"),
        sum(col("n_chars")).as(s"sum_nchars_$tag"),
        count(col("lang")).as(s"nn_lang_$tag"),
        count(col("source")).as(s"nn_source_$tag"),
        count(col("n_chars")).as(s"nn_nchars_$tag"))
      profile(base, "p").crossJoin(profile(curr, "c"))
        .selectExpr(
          """stack(3,
               'lang',    null_lang_p,   null_lang_c,   dist_lang_p,   dist_lang_c,   sum_lang_p,   sum_lang_c,   nn_lang_p,   nn_lang_c,   rows_p, rows_c,
               'n_chars', null_nchars_p, null_nchars_c, dist_nchars_p, dist_nchars_c, sum_nchars_p, sum_nchars_c, nn_nchars_p, nn_nchars_c, rows_p, rows_c,
               'source',  null_source_p, null_source_c, dist_source_p, dist_source_c, sum_source_p, sum_source_c, nn_source_p, nn_source_c, rows_p, rows_c)
             AS (col_name, null_p, null_c, dist_p, dist_c, sum_p, sum_c, nn_p, nn_c, rows_p, rows_c)""")
        .selectExpr("col_name",
          "null_p", "null_c", "dist_p", "dist_c",
          "round(CAST(sum_p AS DOUBLE) / nn_p, 4) AS mean_p",
          "round(CAST(sum_c AS DOUBLE) / nn_c, 4) AS mean_c",
          "CAST(abs(null_c * rows_p - null_p * rows_c) * 20 > rows_p * rows_c AS INT) AS null_drift",
          "CAST(abs(sum_c * nn_p - sum_p * nn_c) * 10 > sum_p * nn_c AS INT) AS mean_drift",
          "CAST(dist_p <> dist_c AS INT) AS dist_drift")
        .orderBy(col("col_name"))
    },

    // -- dq04: ingest VOLUME-DRIFT monitor — the freshness/volume alarm
    //    every pipeline schedules (Deequ anomaly detection on row
    //    counts; month-over-month deviation beyond a band pages
    //    someone). Shape: the corpus collapses to a per-month census
    //    FIRST (map-side combined — the only corpus-scale work), and
    //    the lag window runs over the ~80-row month relation, where an
    //    unpartitioned window is free. pct change over exact BIGINT
    //    counts, drift = |Δ| > 30% --
    "dq04_volume_drift" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("month"))
      Tables.df(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prev_n", lag(col("n"), 1).over(w))
        .withColumn("pct_change", round(
          (col("n") - col("prev_n")).cast("double") * 100.0 / col("prev_n"), 4))
        .withColumn("drift_flag",
          (abs(col("n") - col("prev_n")) * 100 > col("prev_n") * 30).cast("int"))
        .select(col("month"), col("n"), col("prev_n"),
          col("pct_change"), col("drift_flag"))
        .orderBy(col("month"))
    }
  )

  def oracle: Map[String, String] = Map(
    "dq05_schema_drift" -> """
      WITH curr AS (
        SELECT doc_id,
          CASE WHEN doc_id % 9 = 0 THEN NULL ELSE lang END AS lang,
          source,
          CASE WHEN doc_id % 5 = 0 THEN n_chars + 40 ELSE n_chars END AS n_chars
        FROM documents),
      p AS (
        SELECT CAST(count(*) AS BIGINT) AS rows_p,
          CAST(count(*) - count(lang) AS BIGINT) AS null_lang,
          CAST(count(*) - count(source) AS BIGINT) AS null_source,
          CAST(count(*) - count(n_chars) AS BIGINT) AS null_nchars,
          CAST(count(DISTINCT lang) AS BIGINT) AS dist_lang,
          CAST(count(DISTINCT source) AS BIGINT) AS dist_source,
          CAST(count(DISTINCT n_chars) AS BIGINT) AS dist_nchars,
          CAST(sum(length(lang)) AS BIGINT) AS sum_lang,
          CAST(sum(length(source)) AS BIGINT) AS sum_source,
          CAST(sum(n_chars) AS BIGINT) AS sum_nchars,
          CAST(count(lang) AS BIGINT) AS nn_lang,
          CAST(count(source) AS BIGINT) AS nn_source,
          CAST(count(n_chars) AS BIGINT) AS nn_nchars
        FROM documents),
      c AS (
        SELECT CAST(count(*) AS BIGINT) AS rows_c,
          CAST(count(*) - count(lang) AS BIGINT) AS null_lang,
          CAST(count(*) - count(source) AS BIGINT) AS null_source,
          CAST(count(*) - count(n_chars) AS BIGINT) AS null_nchars,
          CAST(count(DISTINCT lang) AS BIGINT) AS dist_lang,
          CAST(count(DISTINCT source) AS BIGINT) AS dist_source,
          CAST(count(DISTINCT n_chars) AS BIGINT) AS dist_nchars,
          CAST(sum(length(lang)) AS BIGINT) AS sum_lang,
          CAST(sum(length(source)) AS BIGINT) AS sum_source,
          CAST(sum(n_chars) AS BIGINT) AS sum_nchars,
          CAST(count(lang) AS BIGINT) AS nn_lang,
          CAST(count(source) AS BIGINT) AS nn_source,
          CAST(count(n_chars) AS BIGINT) AS nn_nchars
        FROM curr),
      rows3 AS (
        SELECT 'lang' AS col_name, p.null_lang AS null_p, c.null_lang AS null_c,
          p.dist_lang AS dist_p, c.dist_lang AS dist_c,
          p.sum_lang AS sum_p, c.sum_lang AS sum_c,
          p.nn_lang AS nn_p, c.nn_lang AS nn_c, p.rows_p, c.rows_c FROM p, c
        UNION ALL
        SELECT 'n_chars', p.null_nchars, c.null_nchars, p.dist_nchars, c.dist_nchars,
          p.sum_nchars, c.sum_nchars, p.nn_nchars, c.nn_nchars, p.rows_p, c.rows_c FROM p, c
        UNION ALL
        SELECT 'source', p.null_source, c.null_source, p.dist_source, c.dist_source,
          p.sum_source, c.sum_source, p.nn_source, c.nn_source, p.rows_p, c.rows_c FROM p, c)
      SELECT col_name, null_p, null_c, dist_p, dist_c,
        round(CAST(sum_p AS DOUBLE) / nn_p, 4) AS mean_p,
        round(CAST(sum_c AS DOUBLE) / nn_c, 4) AS mean_c,
        CAST(CASE WHEN abs(null_c * rows_p - null_p * rows_c) * 20 > rows_p * rows_c
             THEN 1 ELSE 0 END AS INT) AS null_drift,
        CAST(CASE WHEN abs(sum_c * nn_p - sum_p * nn_c) * 10 > sum_p * nn_c
             THEN 1 ELSE 0 END AS INT) AS mean_drift,
        CAST(CASE WHEN dist_p <> dist_c THEN 1 ELSE 0 END AS INT) AS dist_drift
      FROM rows3 ORDER BY col_name""",
    "dq01_constraint_audit" -> """
      WITH pk AS (
        SELECT 'pk_orders_unique' AS check_name,
               CAST(count(*) AS BIGINT) AS n_checked,
               CAST(sum(c - 1) AS BIGINT) AS n_violations
        FROM (SELECT o_orderkey, count(*) AS c FROM orders
              GROUP BY o_orderkey) t),
      fk AS (
        SELECT 'fk_lineitem_orders' AS check_name,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_checked,
               CAST((SELECT count(*) FROM lineitem
                     WHERE l_orderkey NOT IN
                       (SELECT o_orderkey FROM orders)) AS BIGINT)
                 AS n_violations),
      osc AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS v_price,
          CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS v_null_date,
          CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1
            END) AS BIGINT) AS v_status
        FROM orders),
      disc AS (
        SELECT 'range_l_discount' AS check_name,
               CAST(count(*) AS BIGINT) AS n_checked,
               CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM lineitem)
      SELECT * FROM pk
      UNION ALL SELECT * FROM fk
      UNION ALL SELECT 'range_o_totalprice_pos', n, v_price FROM osc
      UNION ALL SELECT 'not_null_o_orderdate', n, v_null_date FROM osc
      UNION ALL SELECT 'domain_o_orderstatus', n, v_status FROM osc
      UNION ALL SELECT * FROM disc
      ORDER BY check_name""",

    "dq02_benford" -> """
      WITH d AS (
        SELECT CAST(floor(o_totalprice / pow(10.0, floor(log10(o_totalprice))))
          AS INT) AS digit
        FROM orders WHERE o_totalprice > 0),
      c AS (
        SELECT digit, count(*) AS n FROM d
        WHERE digit BETWEEN 1 AND 9 GROUP BY digit),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
      SELECT CAST(digit AS BIGINT) AS digit, CAST(n AS BIGINT) AS n,
        round(CAST(n AS DOUBLE) / total, 6) AS p_obs,
        round(log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit), 6) AS p_benford,
        round(pow(n - total * log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit), 2)
              / (total * log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit)), 6) AS chi_term
      FROM c, t ORDER BY digit""",

    "dq03_snapshot_diff" -> """
      WITH prev AS (
        SELECT doc_id,
          md5(CASE WHEN doc_id % 7 = 0 THEN concat(text, ' v2') ELSE text END)
            AS prev_h
        FROM documents WHERE doc_id % 13 <> 0),
      curr AS (
        SELECT doc_id, md5(text) AS curr_h
        FROM documents WHERE doc_id % 11 <> 0),
      d AS (
        SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
          CASE WHEN p.prev_h IS NULL THEN 'added'
               WHEN c.curr_h IS NULL THEN 'removed'
               WHEN p.prev_h <> c.curr_h THEN 'changed'
               ELSE 'unchanged' END AS status
        FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id)
      SELECT status, count(*) AS n,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM d GROUP BY status ORDER BY status""",

    "dq04_volume_drift" -> """
      WITH m AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
        FROM orders GROUP BY 1),
      lagged AS (
        SELECT month, n, lag(n) OVER (ORDER BY month) AS prev_n FROM m)
      SELECT month, n, prev_n,
        round(CAST(n - prev_n AS DOUBLE) * 100.0 / prev_n, 4) AS pct_change,
        CAST(CASE WHEN prev_n IS NULL THEN NULL
                  WHEN abs(n - prev_n) * 100 > prev_n * 30 THEN 1
                  ELSE 0 END AS INTEGER) AS drift_flag
      FROM lagged ORDER BY month"""
  )
}
