package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression gate for every `SparkEntry.queries` entry: each query runs
  * at sf0.001 and must reproduce its snapshotted row count and column
  * names (the driver's DuckDB hash-compare sorts columns by name, so a
  * renamed column is as fatal as a wrong value). Snapshot counts were
  * captured from the DuckDB-oracle-verified run of 2026-08-12.
  *
  * Analog of the reference's golden-output regress layer
  * (`src/test/regress/`, 623 suites driven by pg_regress + atmsort).
  */
class QueriesSpec extends AnyFunSuite {
  import SparkSuite._

  // name -> (expected rows at sf0.001, expected column names in order)
  val expected: Map[String, (Long, Seq[String])] = Map(
    "c03_series_source" -> (10L, Seq("bucket", "n", "sum_sq")),
    "s06_quantized_ann" -> (10L, Seq("q_id", "recall3", "top1_c_id", "top1_qcos")),
    "q83_string_agg" -> (1L, Seq("c_nationkey", "n", "names")),
    "q84_regr_family" -> (3L, Seq("l_returnflag", "n", "slope", "intercept", "r2", "corr")),
    "f03_fts_weighted" -> (30L, Seq("doc_id", "tf_title", "tf_body", "rank")),
    "i06_merge_upsert" -> (147L, Seq("o_custkey", "n_orders", "cents", "action")),
    "q79_lateral_topn" -> (75L, Seq("n_name", "c_name", "c_acctbal")),
    "q80_uuid" -> (5L, Seq("o_orderpriority", "n", "min_uuid", "max_uuid", "n_v4")),
    "q81_date_bin" -> (960L, Seq("bin", "event_type", "n", "total_value")),
    "ch01_doc_chunking" -> (1388L, Seq("doc_id", "chunk_no", "chunk_tokens", "chunk_md5")),
    "d06_boilerplate_ngrams" -> (500L, Seq("doc_id", "n_grams", "n_boiler", "boiler_ratio")),
    "x02_contamination" -> (100L, Seq("doc_id", "n_test_grams", "n_contaminated", "contamination_ratio")),
    "t08_pii_scrub" -> (500L, Seq("doc_id", "n_emails", "n_phones", "scrub_md5")),
    "t09_token_histogram" -> (9L, Seq("bucket", "n_docs", "min_tokens", "max_tokens", "avg_chars")),
    "d01_exact_dedup" -> (500L, Seq("keeper_id", "n_copies", "text_md5")),
    "d02_ngram_jaccard" -> (28L, Seq("a_id", "b_id", "jaccard")),
    "d03_minhash_lsh" -> (40L, Seq("a_id", "b_id")),
    "d04_simhash" -> (500L, Seq("doc_id", "simhash", "hi_band", "lo_band")),
    "d05_simhash_dedup" -> (396L, Seq("doc_id", "keeper_id")),
    "e01_hourly_rollup" -> (868L, Seq("hour", "event_type", "n", "total_value")),
    "e02_sessionize" -> (15L, Seq("user_id", "n_sessions", "n_events")),
    "e03_asof_last_order" -> (202L, Seq("event_id", "user_id", "last_orderkey", "last_orderdate")),
    "e04_signup_purchase_funnel" -> (15L, Seq("user_id", "signed_up", "purchased", "converted")),
    "f01_fts_rank" -> (30L, Seq("doc_id", "tf_merge", "tf_vector", "rank")),
    "f02_fts_phrase" -> (24L, Seq("doc_id", "n_phrase")),
    "h02_min_cost_supplier" -> (5L, Seq("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")),
    "h04_order_priority" -> (5L, Seq("o_orderpriority", "order_count")),
    "h07_volume_shipping" -> (20L, Seq("supp_nation", "cust_nation", "l_year", "revenue")),
    "h08_market_share" -> (2L, Seq("o_year", "mkt_share")),
    "h10_returned_items" -> (20L, Seq("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")),
    "h11_important_stock" -> (177L, Seq("partkey", "part_value")),
    "h12_priority_shipclass" -> (3L, Seq("ship_class", "high_line_count", "low_line_count")),
    "h13_customer_distribution" -> (15L, Seq("c_count", "custdist")),
    "h14_promo_revenue" -> (1L, Seq("promo_revenue")),
    "h15_top_supplier" -> (1L, Seq("s_suppkey", "s_name", "total_revenue")),
    "h16_supplier_cnt" -> (25L, Seq("p_brand", "p_type", "p_size", "supplier_cnt")),
    "h17_small_qty_revenue" -> (1L, Seq("avg_yearly")),
    "h18_large_volume_cust" -> (100L, Seq("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")),
    "h19_bracketed_revenue" -> (1L, Seq("revenue")),
    "h20_promotion_suppliers" -> (1L, Seq("s_name", "s_suppkey")),
    "h22_sales_opportunity" -> (2L, Seq("cntrycode", "numcust", "totacctbal")),
    "x01_cbo_reorder" -> (5L, Seq("o_orderpriority", "n_items", "revenue")),
    "e05_daily_type_share" -> (150L, Seq("day", "event_type", "n", "share")),
    "e06_session_window" -> (946L, Seq("user_id", "session_start", "session_end", "n_events")),
    "m01_binary_metadata" -> (500L, Seq("doc_id", "n_bytes", "payload_md5", "width", "height")),
    "m02_media_features" -> (500L, Seq("doc_id", "mime", "width", "height", "n_bytes", "byte_checksum", "first_byte")),
    "m03_frame_sample" -> (2520L, Seq("doc_id", "frame_no", "frame_md5")),
    "p01_partition_pruning" -> (3L, Seq("o_month", "n_orders", "total")),
    "p02_dynamic_pruning" -> (3L, Seq("o_month", "n_orders", "n_customers")),
    "p03_multilevel_pruning" -> (5L, Seq("o_region", "o_month", "n_orders", "total")),
    "q51_to_char" -> (1500L, Seq("o_orderkey", "padded", "plain")),
    "q52_age" -> (1500L, Seq("o_orderkey", "age_years", "age_months", "age_days")),
    "q53_generate_series" -> (142L, Seq("i", "sq")),
    "q54_string_to_array" -> (1500L, Seq("o_orderkey", "prio_code", "n_parts", "empty_sz")),
    "q77_range_ops" -> (5L, Seq("o_orderpriority", "n_overlapping", "total_overlap_days", "n_contain_apr1")),
    "q78_complex_arith" -> (1500L, Seq("o_orderkey", "add_re", "add_im", "mul_re", "mul_im", "conj_im", "abs_z1", "arg_z1")),
    "c01_csv_sreh" -> (1L, Seq("n_loaded", "n_rejected", "within_limit")),
    "c05_http_source" -> (9L, Seq("label", "cnt", "total_v", "total_n")),
    "c06_copy_binary" -> (5L, Seq("tag", "cnt", "sum_i", "total_v")),
    "q94_xmltable" -> (5L, Seq("prio", "n_orders", "key_checksum", "total_price")),
    "c02_copy_to_sreh" -> (1L, Seq("n_written", "n_diverted", "within_limit")),
    "i01_ivm_matview" -> (75L, Seq("user_id", "event_type", "n", "total_value", "avg_value")),
    "i02_dynamic_table" -> (1094L, Seq("day", "n_orders", "revenue")),
    "i03_aqumv" -> (3L, Seq("o_orderstatus", "n_orders", "revenue")),
    "i04_aqumv_rollup" -> (5L, Seq("o_orderpriority", "n_orders", "revenue", "avg_revenue")),
    "i07_ivm_join" -> (15L, Seq("o_orderpriority", "l_returnflag", "n_items", "revenue")),
    "i08_ivm_retract" -> (75L, Seq("user_id", "event_type", "n", "total_value", "avg_value")),
    "c04_exec_source" -> (7L, Seq("label", "cnt", "total")),
    "q85_multirange" -> (150L, Seq("o_custkey", "n_ranges", "covered", "overlap_200_600", "n_contain_500")),
    "m04_resize" -> (430L, Seq("doc_id", "orig_len", "resized_len", "resized_md5")),
    "q86_hypothetical_dist" -> (3L, Seq("l_returnflag", "pr_25", "cd_25", "pr_49_5", "dr_25", "n")),
    "x03_eager_agg" -> (5L, Seq("o_orderpriority", "n_items", "revenue", "qty", "avg_qty")),
    "q55_json_extract" -> (1500L, Seq("o_orderkey", "k", "status", "tag1", "n_tags")),
    "q56_json_table" -> (2002L, Seq("o_orderkey", "pos", "val")),
    "q76_jsonpath_filter" -> (120L, Seq("o_orderkey", "ln", "qty", "flag")),
    "q57_within_group" -> (3L, Seq("l_returnflag", "pc25", "pc50", "pd50", "pd90", "mode_qty")),
    "q58_hypothetical_rank" -> (3L, Seq("l_returnflag", "rank_of_25", "rank_of_49_5", "n")),
    "q59_intersect_all" -> (6L, Seq("flag", "status", "n")),
    "q60_with_ties" -> (10L, Seq("o_orderkey", "o_totalprice")),
    "q61_approx_distinct" -> (3L, Seq("l_returnflag", "n_exact", "approx_within_5pct")),
    "q62_tablesample" -> (169L, Seq("o_orderkey", "o_custkey")),
    "q63_groups_frame" -> (508L, Seq("o_orderkey", "o_orderpriority", "grp_sum_dollars")),
    "q64_exclude_current" -> (508L, Seq("o_orderkey", "o_orderstatus", "others_total")),
    "q65_shared_subtree" -> (79L, Seq("month", "total", "mom_delta")),
    "q66_tid_scan" -> (100L, Seq("doc_id", "tid")),
    "q67_external_json" -> (5L, Seq("lang", "n_docs", "total_chars")),
    "q68_to_char_date" -> (1500L, Seq("o_orderkey", "iso", "pretty", "qtr", "doy")),
    "q69_regex" -> (150L, Seq("c_custkey", "has_digits", "first_num", "n_digits", "devoweled")),
    "q70_zorder" -> (200L, Seq("p_partkey", "p_size", "zval")),
    "q71_mdqa_rollup" -> (10L, Seq("l_returnflag", "l_linestatus", "n_parts", "n_supps", "n")),
    "q72_exclude_group" -> (508L, Seq("o_orderkey", "o_orderstatus", "non_peer_total")),
    "q73_interval_arith" -> (1500L, Seq("o_orderkey", "due_date", "month_before", "plus_quarter", "days_to_eoy")),
    "q74_null_funcs" -> (150L, Seq("c_custkey", "seg_or_null", "seg_coalesced", "neg_or_zero", "pos_or_zero", "pos_or_null")),
    "b01_bucketed_join" -> (5L, Seq("o_orderpriority", "n_items", "revenue")),
    "q01_pricing_summary" -> (6L, Seq("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc", "count_order")),
    "q02_filter_pushdown" -> (12L, Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")),
    "q03_shipping_priority" -> (10L, Seq("l_orderkey", "o_orderdate", "revenue")),
    "q05_local_supplier_volume" -> (1L, Seq("n_name", "revenue")),
    "q06_revenue_delta" -> (1L, Seq("revenue")),
    "q07_customers_without_orders" -> (0L, Seq("c_nationkey", "n_customers")),
    "q08_notin_suppliers" -> (0L, Seq("s_suppkey", "s_name")),
    "q09_profit_by_nation_year" -> (70L, Seq("nation", "o_year", "profit")),
    "q10_nation_customer_counts" -> (25L, Seq("n_nationkey", "n_name", "n_rich_customers")),
    "q11_right_join_suppliers" -> (25L, Seq("n_nationkey", "n_name", "n_suppliers")),
    "q12_full_outer_activity" -> (150L, Seq("custkey", "n_fulfilled", "n_open")),
    "q13_region_nation_matrix" -> (125L, Seq("r_name", "n_name", "is_home")),
    "q14_segment_distinct" -> (5L, Seq("c_mktsegment", "n_nations", "n_customers", "total_balance")),
    "q15_multi_distinct" -> (3L, Seq("l_returnflag", "n_parts", "n_suppliers", "n_orders", "avg_qty")),
    "q16_union_all_parties" -> (35L, Seq("nationkey", "party", "n")),
    "q17_intersect_buyers" -> (34L, Seq("custkey")),
    "q18_except_nations" -> (15L, Seq("nationkey")),
    "q19_except_all_flags" -> (3L, Seq("flag", "n")),
    "q20_distinct_pairs" -> (6L, Seq("l_returnflag", "l_linestatus")),
    "q21_limit_offset" -> (100L, Seq("o_orderkey", "o_custkey", "o_totalprice")),
    "q22_frequent_buyers" -> (1L, Seq("o_custkey", "n_orders", "spend")),
    "q23_priority_weights" -> (5L, Seq("priority", "weight", "n_orders", "weight_sum")),
    "q24_series_buckets" -> (7L, Seq("bucket", "n", "total")),
    "q25_systematic_sample" -> (16L, Seq("o_orderkey", "o_custkey", "o_orderstatus")),
    "q30_window_rank" -> (50L, Seq("c_custkey", "c_mktsegment", "c_acctbal", "rn", "rnk", "drnk")),
    "q31_running_spend" -> (1021L, Seq("o_custkey", "o_orderkey", "running_spend")),
    "q32_range_frame_peers" -> (150L, Seq("c_custkey", "c_mktsegment", "c_acctbal", "peers_within_100")),
    "q33_event_deltas" -> (1000L, Seq("user_id", "event_id", "value", "prev_value", "next_value")),
    "q34_order_quartiles" -> (1500L, Seq("o_orderkey", "o_orderstatus", "quartile", "pct_rank", "cdist")),
    "q35_first_last_order" -> (150L, Seq("o_custkey", "first_order", "last_order", "second_order")),
    "q36_top_parts_per_brand" -> (75L, Seq("p_brand", "p_partkey", "p_retailprice", "rn")),
    "q37_grouping_sets" -> (10L, Seq("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n")),
    "q38_rollup_orders" -> (19L, Seq("o_orderstatus", "o_orderpriority", "n", "total")),
    "q39_cube_lineitem" -> (12L, Seq("l_returnflag", "l_linestatus", "n", "sum_qty")),
    "q40_quantity_percentiles" -> (3L, Seq("l_returnflag", "p25", "p50", "p75", "p90", "qmin", "qmax")),
    "q41_quantity_mode" -> (3L, Seq("l_returnflag", "mode_qty", "mode_count")),
    "q42_pivot_status" -> (3L, Seq("l_returnflag", "F", "O")),
    "q43_conditional_agg" -> (15L, Seq("user_id", "n_events", "n_purchases", "purchase_value", "max_click")),
    "q44_above_avg_parts" -> (0L, Seq("p_partkey", "p_brand", "p_retailprice")),
    "q45_small_quantity_revenue" -> (1L, Seq("avg_yearly")),
    "q46_in_subquery" -> (10L, Seq("s_suppkey", "s_name")),
    "q47_exists_priority" -> (5L, Seq("o_orderpriority", "n_orders")),
    "q48_string_funcs" -> (150L, Seq("c_custkey", "uname", "lseg", "name_len", "prefix", "tag", "trimmed", "padded", "masked", "has_one")),
    "q49_date_funcs" -> (27L, Seq("o_year", "o_quarter", "n", "first_month", "last_day_max")),
    "q50_math_funcs" -> (200L, Seq("p_partkey", "abs_dev", "ceiled", "floored", "sq", "ln_price", "size_sq", "mod10", "sgn")),
    "q75_waiting_suppliers" -> (10L, Seq("s_name", "numwait")),
    "r01_recursive_collatz" -> (1023L, Seq("seed", "step", "val")),
    "r02_connected_dedup" -> (444L, Seq("doc_id", "keeper_id")),
    "s01_cosine_topk" -> (100L, Seq("q_id", "c_id", "cosine", "rn")),
    "s02_ann_lsh_buckets" -> (161L, Seq("bucket", "n_vectors", "min_vec", "n_labels")),
    "s03_embedding_near_dup" -> (16L, Seq("a_id", "b_id", "cosine")),
    "s04_ivf_ann" -> (60L, Seq("q_id", "c_id", "cosine", "rn")),
    "s05_label_centroids" -> (640L, Seq("label", "pos", "centroid")),
    "t01_token_stats" -> (500L, Seq("doc_id", "n_tokens", "n_distinct_tokens", "avg_token_len")),
    "t02_quality_score" -> (500L, Seq("doc_id", "n_chars", "n_tokens", "punct_ratio", "stopword_ratio", "ttr")),
    "t03_langid" -> (500L, Seq("doc_id", "labeled_lang", "detected_lang", "en_score")),
    "t04_fingerprint" -> (500L, Seq("doc_id", "fingerprint", "text_md5")),
    "t05_top_words" -> (30L, Seq("word", "n")),
    "t06_bpe_tokens" -> (500L, Seq("doc_id", "n_pieces", "n_word_pieces", "n_num_pieces", "avg_piece_len")),
    "t07_quality_filter" -> (500L, Seq("doc_id", "len_ok", "punct_ok", "diversity_ok", "keep")),
    "e07_gapfill" -> (10500L, Seq("user_id", "hour", "n_obs", "v_locf")),
    "f04_fts_boolean" -> (30L, Seq("doc_id", "tf_merge", "tf_sort", "rank")),
    "f05_fts_headline" -> (403L, Seq("doc_id", "first_pos", "headline")),
    "q87_approx_percentile" -> (3L, Seq("l_returnflag", "p50_exact", "approx_within_2pct", "n")),
    "q88_to_number" -> (1500L, Seq("o_orderkey", "price_txt", "price_back", "neg_back", "cur_back")),
    "q89_ignore_nulls" -> (1500L, Seq("o_custkey", "o_orderkey", "prev_f", "fill_f", "second_f")),
    "q90_stratified_sample" -> (3L, Seq("o_orderstatus", "n_sampled", "sampled_total")),
    "q91_array_agg_ordered" -> (1L, Seq("c_nationkey", "n", "names_by_balance")),
    "q92_interval_range_frame" -> (1021L, Seq("o_custkey", "o_orderkey", "o_orderdate", "rev_30d")),
    "q93_exclude_ties" -> (508L, Seq("o_orderkey", "o_orderstatus", "non_ties_total")),
    "x04_join_elim" -> (5L, Seq("o_orderpriority", "n", "total")),
    "b02_presorted_merge_join" -> (3L, Seq("o_orderstatus", "n_orders", "n_items", "total_qty")),
    "e08_retention_cohorts" -> (5L, Seq("cohort_week", "week_offset", "n_users")),
    "f06_ts_stat" -> (25L, Seq("word", "ndoc", "nentry")),
    "q95_distinct_on" -> (25L, Seq("c_nationkey", "c_custkey", "c_name", "acctbal")),
    "q96_with_ordinality" -> (1139L, Seq("doc_id", "ord", "word")),
    "t10_tfidf" -> (255L, Seq("doc_id", "term", "tf", "df", "rn", "tfidf")),
    "t11_repetition" -> (500L, Seq("doc_id", "n_tokens", "top_token_share", "dup_token_ratio", "keep")),
    "q97_percentile_array" -> (3L, Seq("l_returnflag", "p25", "p50", "p75", "n")),
    "q98_array_ops" -> (501L, Seq("o_orderkey", "pos2", "removed", "sorted_distinct", "arr_sum", "appended")),
    "q99_at_time_zone" -> (1001L, Seq("o_orderkey", "ny_time", "tokyo_time", "berlin_time")),
    "q100_trgm_similarity" -> (300L, Seq("name_a", "name_b", "sim")),
    "m05_phash_neardup" -> (18L, Seq("a_id", "b_id", "hamming")),
    "e09_windowed_funnel" -> (3L, Seq("steps_completed", "n_users")),
    "f07_fts_prefix" -> (30L, Seq("doc_id", "tf_prefix", "rank")),
    "i09_ivm_variance" -> (75L, Seq("user_id", "event_type", "n", "avg_value", "stddev_value")),
    "t12_stemming" -> (500L, Seq("doc_id", "n_tokens", "n_stemmed", "stem_md5")),
    "q101_count_min" -> (20L, Seq("word", "n_exact", "n_est", "one_sided_ok")),
    "q102_dist_ranks" -> (150L, Seq("c_custkey", "c_mktsegment", "pct_rank", "cume", "quartile")),
    "c07_csv_quoting" -> (200L, Seq("id", "payload_md5", "roundtrip_ok")),
    "e10_ohlc_bars" -> (868L, Seq("event_type", "hour", "open", "high", "low", "close", "n")),
    "q103_regexp_split" -> (1139L, Seq("doc_id", "ord", "piece")),
    "q104_similar_to" -> (5L, Seq("pat", "n")),
    "p04_partition_overwrite" -> (3L, Seq("o_orderstatus", "n", "total")),
    "i10_aqumv_filter" -> (5L, Seq("o_orderpriority", "n_orders", "revenue"))
  )

  test("every declared query has a snapshot and vice versa") {
    val qs = SparkEntry.queries.keySet
    val missingSnapshot = qs -- expected.keySet
    val extraSnapshot = expected.keySet -- qs
    assert(missingSnapshot.isEmpty, s"queries without a snapshot: $missingSnapshot")
    assert(extraSnapshot.isEmpty, s"snapshots without a query: $extraSnapshot")
  }

  test("every query with an oracle entry, and no orphan oracle entries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries with no query: $orphans")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, (rows, cols)) <- expected.toSeq.sortBy(_._1)) {
    test(s"$name: schema and row count at sf0.001") {
      val df = SparkEntry.queries(name)(spark, Sf)
      assert(df.columns.toSeq == cols, s"$name columns changed")
      assert(df.count() == rows, s"$name row count changed")
    }
  }
}
