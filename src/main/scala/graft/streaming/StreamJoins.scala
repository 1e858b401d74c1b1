package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the streaming rendition of the e04 funnel
  * (signup ⋈ purchase within an attribution window). The reference has
  * no stream engine; its dynamic tables re-run the batch join on refresh
  * (`matview.c`). Structured Streaming's watermarked interval join is
  * the incremental form of the same semantics: each side buffers only
  * rows newer than `watermark − window`, so state is bounded by
  * (join window + watermark delay) × arrival rate — the property that
  * lets the join run forever over a 100 TB/day event stream, where the
  * batch re-join would rescan history every refresh.
  */
object StreamJoins {

  /** Watermarked interval inner join: purchases attributed to a signup of
    * the same user within `attribution` after the signup. Works on batch
    * DataFrames (watermark is a no-op) and streaming ones identically —
    * the contract the StreamingSpec test pins.
    *
    * Both inputs need columns (user_id, ts). The time-bound predicate is
    * what lets the state store evict: without it, a stream-stream join
    * keeps every row forever.
    */
  def attributedPurchases(signups: DataFrame, purchases: DataFrame,
      attribution: String = "1 hour", delay: String = "10 minutes"): DataFrame = {
    val s = signups.withWatermark("ts", delay)
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
    val p = purchases.withWatermark("ts", delay)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    s.join(p,
      col("s_user") === col("p_user") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $attribution"))
      .select(col("s_user").as("user_id"), col("signup_ts"), col("purchase_ts"))
  }

  /** The full funnel: LEFT OUTER variant. A signup with no purchase in
    * its attribution window emits exactly once, null-padded — but only
    * after the watermark passes `signup_ts + attribution`, when "no
    * match" is final (the streaming rendition of e04's
    * signed_up-but-not-converted rows). Inner matches still emit
    * incrementally; only the negative verdict waits for the watermark.
    */
  def attributionOutcomes(signups: DataFrame, purchases: DataFrame,
      attribution: String = "1 hour", delay: String = "10 minutes"): DataFrame = {
    val s = signups.withWatermark("ts", delay)
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
    val p = purchases.withWatermark("ts", delay)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    s.join(p,
      col("s_user") === col("p_user") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $attribution"),
      "left_outer")
      .select(col("s_user").as("user_id"), col("signup_ts"), col("purchase_ts"),
        col("purchase_ts").isNotNull.cast("int").as("converted"))
  }
}
