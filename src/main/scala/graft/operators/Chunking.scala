package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Document chunking + corpus-level n-gram analyses for LLM training-data
  * pipelines over the `documents` table.
  *
  * Three operators:
  *  - ch01: overlapping token-window chunking (the pre-embedding /
  *    pre-tokenization split every RAG or pretraining pipeline runs);
  *  - d06: boilerplate detection — 8-grams occurring in many distinct
  *    documents are template/boilerplate text; per-document boilerplate
  *    ratio is a standard quality signal (C4/RefinedWeb-style filtering);
  *  - x02: train/test contamination — the fraction of a held-out split's
  *    8-grams that also appear anywhere in the training split.
  *
  * Scale design (the part that must survive 100 TB):
  *  - chunking is a pure per-row explode — linear, no shuffle, stays in
  *    whole-stage codegen until the explode;
  *  - n-gram work never self-joins documents: grams are reduced to md5
  *    keys first (fixed 32-byte shuffle key, same trick as d01's exact
  *    dedup), aggregated map-side, and the doc⋈gram-set joins are plain
  *    equi-joins whose build side (distinct flagged grams) AQE can
  *    broadcast when small;
  *  - nothing here is quadratic in documents: candidate volume is
  *    O(total tokens), the same bound the posting-list caps give d02/d05.
  *
  * Reference analogs: the reference ships the text-processing scaffolding
  * (tsvector n-gram machinery, `src/backend/utils/adt/tsvector_op.c`;
  * `contrib/pg_trgm/trgm_op.c` trigram extraction) but leaves corpus-level
  * dedup/contamination to external jobs; these queries are that job
  * expressed as declarative plans.
  */
object Chunking {

  private val toks = "filter(split(text, ' '), x -> x <> '')"

  /** Window of 32 tokens, stride 24 (8-token overlap) — chunk count per
    * doc is floor((n-1)/24)+1, each emitted with a cross-engine md5 id. */
  private val W = 32
  private val S = 24

  /** 8-gram md5 stream, one row per gram position. */
  /** 8-gram BIGINT fingerprints (d06/x02). r13 (r12 verdict #3): the
    * word_grams31 kernel replaces md5-of-concat — the census/join key
    * through every exchange is 8 bytes instead of a 32-char hex string,
    * and the gram is never materialized as a string. `true` = docs with
    * < 8 tokens emit no grams (the empty-series semantics the md5 form
    * guarded by hand). */
  private def grams(s: SparkSession, dir: String): DataFrame = {
    graft.functions.PgFunctions.register(s)
    Tables.df(s, dir, "documents")
      .select(col("doc_id"), explode(expr("word_grams31(text, 8, true)")).as("gram"))
  }

  /** ch02: training-sequence packing parameters. Capacity is the context
    * window (tokens per packed sequence); the prefix-sum bucket width is
    * deliberately small (128 docs) so the two-phase cumsum exercises >1
    * bucket even on the sf0.001 fixture — a production run would size it
    * ~10⁶ so the bucket-subtotal relation is ~corpus/10⁶ rows. */
  private val Cap = 2048
  private val PackBkt = 128

  /** The two-phase distributed prefix sum behind ch02, reusable so the
    * scale tests can drive synthetic corpora through the exact
    * production path. Input: (doc_id, source, tok); output adds the
    * doc's global token offset within its source stream (`start`) and
    * the first/last `cap`-token sequence it lands in. No window ever
    * spans more than one (source, bucket) group of the full relation;
    * the source-wide window runs over the bucket-subtotal relation,
    * |docs|/bktWidth rows — reapply the same reduction recursively if
    * even that is too wide. */
  private[graft] def packedPlacement(docs: DataFrame, cap: Long, bktWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = docs.withColumn("bkt", expr(s"doc_id div $bktWidth"))
    val off = bucketed.groupBy(col("source"), col("bkt"))
      .agg(sum(col("tok")).as("btok"))
      .withColumn("offset",
        coalesce(sum(col("btok")).over(
          Window.partitionBy(col("source")).orderBy(col("bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("bkt"), col("offset"))
    val localW = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn("lstart", coalesce(sum(col("tok")).over(localW), lit(0L)))
      .join(off, Seq("source", "bkt"))
      .withColumn("start", col("offset") + col("lstart"))
      .withColumn("seq_first", expr(s"start div $cap"))
      .withColumn("seq_last", expr(s"(start + tok - 1) div $cap"))
  }

  /** ONE SQL text shared by the Spark run and the DuckDB oracle (ch04).
    * ORDER BY + LIMIT (not row_number over the corpus) so Spark plans a
    * distributed top-k; the window numbers only the 25 survivors. */
  private val EpochShuffleSql = """
    WITH keyed AS (
      SELECT doc_id, source,
             md5(concat('epoch-7:', CAST(doc_id AS STRING))) AS shuffle_key
      FROM documents),
    head AS (
      SELECT doc_id, source, shuffle_key
      FROM keyed ORDER BY shuffle_key, doc_id LIMIT 25)
    SELECT row_number() OVER (ORDER BY shuffle_key, doc_id) AS pos,
           doc_id, source, shuffle_key
    FROM head ORDER BY pos"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- ch06: TOKEN-BUDGET MIXTURE ALLOCATION — the dataset-mixing step
    //    of a pretraining pipeline (multilingual/multi-source sampling à
    //    la temperature scaling): allocate a global token budget across
    //    sources with weight ∝ tokens^α, α = 1/2 (upsamples small
    //    sources, the standard T=2 mixing), then select documents per
    //    source by a deterministic cursor until the quota fills.
    //    Exactness discipline: the integer square root is computed with
    //    an exact post-correction (floor(sqrt) can sit 1 ulp off at
    //    perfect squares; the ±1 fixup makes it libm-independent), and
    //    the per-source quotas use LARGEST-REMAINDER apportionment in
    //    pure BIGINT (e21's credit discipline) so Σ quota == budget
    //    exactly on any engine. Scale shape: weights/quotas live on the
    //    |sources|-sized census; the only corpus-sized work is one
    //    map-side token count and one per-source cumulative-sum window
    //    (spillable sort, no arrays). Selection policy: a doc is taken
    //    while the tokens BEFORE it are under quota, so the last doc may
    //    overshoot — the policy every packing stage uses (ch02) --
    "ch06_token_budget_mix" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val budget = 100000L
      val docs = Tables.df(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          expr("CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)").as("ntok"))
        .localCheckpoint() // census + selection both read it
      val census = docs.groupBy(col("source"))
        .agg(sum(col("ntok")).as("tok_cnt"), count(lit(1)).as("n_docs"))
        .withColumn("s0", expr("CAST(floor(sqrt(CAST(tok_cnt AS DOUBLE))) AS BIGINT)"))
        .withColumn("weight", expr(
          """CASE WHEN (s0 + 1) * (s0 + 1) <= tok_cnt THEN s0 + 1
                  WHEN s0 * s0 > tok_cnt THEN s0 - 1 ELSE s0 END"""))
      // largest-remainder apportionment, all integer; the rank window is
      // unpartitioned but runs over the |sources|-sized census (20 rows)
      val wTot = census.crossJoin(broadcast(
        census.agg(sum(col("weight")).as("wsum"))))
        .withColumn("base", expr(s"$budget * weight DIV wsum"))
        .withColumn("rem", expr(s"($budget * weight) % wsum"))
      val leftover = wTot.agg((lit(budget) - sum(col("base"))).as("leftover"))
      val quotas = wTot.crossJoin(broadcast(leftover))
        .withColumn("rr", expr(
          "row_number() OVER (ORDER BY rem DESC, source)"))
        .withColumn("quota", expr("base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END"))
        .select(col("source"), col("n_docs"), col("tok_cnt"), col("weight"), col("quota"))
      // deterministic per-source selection cursor
      val wCum = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val sel = docs.withColumn("prev_tok", coalesce(sum(col("ntok")).over(wCum), lit(0L)))
        .join(quotas.select(col("source"), col("quota")), Seq("source"))
        .filter(col("prev_tok") < col("quota"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sel"), sum(col("ntok")).as("tok_sel"))
      quotas.join(sel, Seq("source"))
        .select(col("source"), col("n_docs"), col("tok_cnt"), col("weight"),
          col("quota"), col("n_sel"), col("tok_sel"))
        .orderBy(col("source"))
    },
    // -- ch02: GPT-style training-sequence packing (concat-and-chop) --
    // Tokenized docs are concatenated per source stream in doc_id order
    // and chopped into fixed `Cap`-token sequences; the answer per source
    // is the packing audit every pretraining data pipeline runs: how many
    // sequences, how many docs straddle a boundary, how full the bins are.
    //
    // Scale design: the global running token offset is the textbook
    // DISTRIBUTED PREFIX SUM, not one giant window. A window partitioned
    // only by `source` would drag every document of a source through a
    // single task (the reference's Motion-to-one-segment analog,
    // nodeWindowAgg.c has the same serialization); instead
    //   (1) docs fold into `PackBkt`-wide doc_id buckets; per-(source,
    //       bucket) token subtotals partial-aggregate map-side,
    //   (2) the bucket-offset prefix runs a window over the SUBTOTAL
    //       relation (corpus/PackBkt rows — reapply the same reduction
    //       recursively if even that is too wide),
    //   (3) each doc's offset = bucket offset + a window-local cumsum
    //       inside its own (source, bucket) group — bounded partitions.
    // The equi-join carrying offsets back is broadcast-able at sf and a
    // plain shuffle join at 100 TB; AQE picks. Identical arithmetic to
    // the oracle's single window, proven in InvariantsSpec.
    "ch02_sequence_packing" -> { (s, dir) =>
      // chars/4 ≈ tokens: deterministic from the n_chars column, immune
      // to cross-engine regex-split edge cases
      val docs = Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          expr("greatest(1L, n_chars div 4)").as("tok"))
      packedPlacement(docs, Cap, PackBkt)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("tok")).as("total_tokens"),
          (max(col("seq_last")) + 1).as("n_seqs"),
          sum(when(col("seq_first") =!= col("seq_last"), 1L).otherwise(0L))
            .as("boundary_docs"),
          round(sum(col("tok")).cast("double") /
            ((max(col("seq_last")) + 1) * lit(Cap.toDouble)), 6).as("avg_fill"))
        .orderBy(col("source"))
    },

    // -- ch03: token-budget curriculum mixing --
    // The Pile/Dolma source-mixing step: given per-source sampling
    // weights and a total token budget (50% of the corpus here), compute
    // each source's sampling rate = min(1, budget_s / tokens_s) with
    // budget_s ∝ weight. One groupBy to the per-source token census
    // (map-side combined), one scalar aggregate over the 20-row census,
    // broadcast back — nothing here grows with the corpus except the
    // first aggregation's input.
    "ch03_curriculum_mix" -> { (s, dir) =>
      val per = Tables.df(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(expr("greatest(1L, n_chars div 4)")).as("tokens"))
        .withColumn("weight", expr(
          "CASE WHEN source IN ('src0','src1','src2','src3','src4') " +
            "THEN CAST(2.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END"))
      val tot = per.agg(sum(col("tokens")).as("all_toks"), sum(col("weight")).as("all_w"))
      per.crossJoin(broadcast(tot))
        .withColumn("rate", round(least(lit(1.0),
          (lit(0.5) * col("all_toks") * col("weight") / col("all_w")) / col("tokens")), 6))
        .select(col("source"), col("tokens"), col("weight"), col("rate"),
          expr("CAST(round(rate * tokens) AS BIGINT)").as("sampled_tokens"))
        .orderBy(col("source"))
    },

    // -- ch04: epoch-seeded deterministic corpus shuffle. Training reads
    //    the corpus in a different but REPRODUCIBLE order each epoch:
    //    order by md5(seed || doc_id). At 100 TB this is exactly Spark's
    //    distributed sort (range-partitioned by sampled key quantiles) —
    //    never a single-partition global window. The query takes the
    //    head of epoch 7's order as a distributed top-k
    //    (TakeOrderedAndProject, plan-asserted) and only then numbers
    //    the 25 survivors with a window. --
    "ch04_epoch_shuffle" -> { (s, dir) =>
      Tables.register(s, dir)
      s.sql(EpochShuffleSql)
    },

    // -- ch05: LENGTH-BUCKETED batching — the dynamic-padding
    //    efficiency step (group sequences of similar length so a
    //    batch pads to its bucket's max, not the corpus max; every
    //    training framework's bucket_by_sequence_length). Buckets are
    //    powers of two of the token count; per bucket the padding
    //    waste is n·bucket_max − Σtokens, and the report compares the
    //    bucketed waste to the pad-to-global-max strategy. One
    //    map-side-combined aggregate + a broadcast scalar — the 100 TB
    //    plan is the census, not a shuffle of documents --
    "ch05_length_buckets" -> { (s, dir) =>
      val docs = Tables.df(s, dir, "documents")
        .withColumn("n_toks", size(expr(toks)).cast("bigint"))
        .filter(col("n_toks") > 0)
        // smallest power of two ≥ n, via the BIT LENGTH of n-1 — integer
        // exact in both engines (a float log2 can land on either side of
        // an exact power by one ulp and flip the bucket cross-engine)
        .withColumn("bucket", expr(
          "CASE WHEN n_toks = 1 THEN 1L ELSE shiftleft(1L, length(bin(n_toks - 1))) END"))
      val globalMax = docs.agg(max(col("n_toks")).as("gmax"))
      docs.crossJoin(broadcast(globalMax))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("total_toks"),
          (count(lit(1)) * first(col("gmax")) - sum(col("n_toks")))
            .as("waste_global"),
          (count(lit(1)) * max(col("bucket")) - sum(col("n_toks")))
            .as("waste_bucketed"))
        .withColumn("saving_pct", round(
          (col("waste_global") - col("waste_bucketed")).cast("double") * 100.0 /
            greatest(col("waste_global"), lit(1L)), 2))
        .select(col("bucket"), col("n_docs"), col("total_toks"),
          col("waste_bucketed"), col("waste_global"), col("saving_pct"))
        .orderBy(col("bucket"))
    },

    // -- ch01: overlapping token-window chunking --
    "ch01_doc_chunking" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .withColumn("toks", expr(toks))
        .withColumn("chunk_no",
          explode(expr(s"sequence(0, CAST(greatest(size(toks) - 1, 0) AS INT) DIV $S)")))
        .withColumn("chunk", expr(s"slice(toks, chunk_no * $S + 1, $W)"))
        .filter(size(col("chunk")) > 0)
        .select(
          col("doc_id"),
          col("chunk_no").cast("bigint").as("chunk_no"),
          size(col("chunk")).cast("bigint").as("chunk_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_no"))
    },

    // -- d06: boilerplate 8-grams (≥5 distinct docs) + per-doc ratio --
    "d06_boilerplate_ngrams" -> { (s, dir) =>
      // spool: the gram stream feeds BOTH the boilerplate census and the
      // per-doc join — without it the scan+tokenize+md5 runs twice (the
      // s06-class double-computation the r4 verdict flagged). The spool is
      // O(grams) ≈ O(tokens) rows of (doc_id, md5) — executor-local, no
      // driver involvement; at cluster scale the same spool is a
      // persist(DISK_ONLY), trading one sequential write/read against a
      // second full scan + tokenize of the corpus.
      val g = grams(s, dir).localCheckpoint()
      // distinct-doc frequency per gram; partial agg collapses repeats
      // map-side, so the shuffle carries ≤ one row per (gram, doc).
      val boiler = g.distinct()
        .groupBy("gram").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 5)
        .select(col("gram"), lit(1).as("is_boiler"))
      g.join(boiler, Seq("gram"), "left")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_grams"),
          count(col("is_boiler")).as("n_boiler"))
        .withColumn("boiler_ratio",
          round(col("n_boiler").cast("double") / col("n_grams"), 6))
        .orderBy(col("doc_id"))
    },

    // -- x02: train/test 8-gram contamination (test = doc_id%10 ∈ {8,9}) --
    "x02_contamination" -> { (s, dir) =>
      // spool for the same reason as d06: train-side distinct and
      // test-side probe both read the gram stream
      val g = grams(s, dir).localCheckpoint()
      val trainGrams = g.filter(pmod(col("doc_id"), lit(10)) < 8)
        .select("gram").distinct()
        .withColumn("in_train", lit(1))
      g.filter(pmod(col("doc_id"), lit(10)) >= 8)
        .join(trainGrams, Seq("gram"), "left")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_test_grams"),
          count(col("in_train")).as("n_contaminated"))
        .withColumn("contamination_ratio",
          round(col("n_contaminated").cast("double") / col("n_test_grams"), 6))
        .orderBy(col("doc_id"))
    },

    // -- d12: C4-style line-level dedup WITH reassembly — d06 reports
    //    boilerplate, this one REMOVES it and emits the rewritten
    //    corpus (the C4 pipeline's "discard any line occurring more
    //    than once in the corpus" rule; RefinedWeb line-wise filtering).
    //    Our documents are single-line word bags, so "lines" are the
    //    deterministic L-token segmentation (documented proxy — on real
    //    data this is split('\n')). Shape that survives 100 TB:
    //      segment (per-row explode, codegen) →
    //      census shuffle on the 32-byte line md5 (map-side combined
    //      distinct-doc counts, exactly d01/d06's key discipline) →
    //      one equi-join back (AQE broadcasts the flagged-line set when
    //      it fits — duplicated lines are the minority) →
    //      per-doc reassembly: ONE groupBy(doc_id) whose state is
    //      bounded by the document's own line count (array_sort fixes
    //      collect_list's arrival order, so the rebuild is
    //      deterministic without any window or global sort).
    //    Nothing is quadratic; the rewritten text never shuffles twice.
    //    Output is the rewritten doc: line census + kept-token count +
    //    md5 of the reassembled text (the driver hash-compares the
    //    actual rebuilt string on both engines) --
    "d12_line_dedup" -> { (s, dir) =>
      val L = 3 // tokens per synthetic "line" (small vocab → real dups)
      val lines = Tables.df(s, dir, "documents")
        .withColumn("toks", expr(toks))
        .select(col("doc_id"), col("toks"), explode(expr(
          s"sequence(0, CAST(greatest(size(toks) - 1, 0) DIV $L AS INT))")).as("line_no"))
        .withColumn("line", expr(s"slice(toks, line_no * $L + 1, $L)"))
        .filter(size(col("line")) > 0)
        .withColumn("lh", md5(concat_ws(" ", col("line"))))
        .select(col("doc_id"), col("line_no"), col("line"), col("lh"))
        .localCheckpoint() // spool: census + reassembly both read it
      val boiler = lines.groupBy(col("lh"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("lh"), lit(1).as("is_boiler"))
      lines.join(boiler, Seq("lh"), "left")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_lines"),
          count(col("is_boiler")).as("n_removed"),
          expr("""flatten(transform(
                    array_sort(collect_list(CASE WHEN is_boiler IS NULL
                      THEN struct(line_no, line) END)),
                    e -> e.line))""").as("kept"))
        .select(col("doc_id"), col("n_lines"), col("n_removed"),
          size(col("kept")).cast("bigint").as("kept_tokens"),
          md5(concat_ws(" ", col("kept"))).as("kept_md5"))
        .orderBy(col("doc_id"))
    },

    // -- t24: SOURCE-OVERLAP matrix via MinHash sketches — the
    //    dataset-vs-dataset contamination audit (does crawl snapshot A
    //    duplicate snapshot B? how much of source X is boilerplate
    //    shared with Y?) run BEFORE mixing sources into a training
    //    corpus. Per source: a 16-permutation MinHash signature over
    //    its word-3-gram shingles (h_p = str_hash31('p:'‖shingle), the
    //    d02 codegen kernel); the pairwise Jaccard estimate is the
    //    fraction of agreeing signature positions. Scale shape: the
    //    shingle stream explodes ×16 but reduces MAP-SIDE to min per
    //    (source, permutation) — the shuffle carries |sources|×16
    //    rows no matter the corpus size, and the pair comparison is a
    //    sketch-only |sources|² join that never touches text. The full
    //    matrix (zero estimates included) is the honest audit output --
    "t24_source_overlap" -> { (s, dir) =>
      graft.functions.PgFunctions.register(s)
      val P = 16
      // r13 (the d-family kernel follow-through): shingles are
      // word_grams31 BIGINT fps (one hash per corpus character) and the
      // 16 permutations are UNIVERSAL hashes over the fp — the d03
      // pattern h_p(f) = (a_p·f + b_p) mod M — instead of 16
      // 'p:'‖shingle string concats re-walked per shingle. All 16 mins
      // fold in ONE aggregation pass (16 min() columns, map-side
      // combined), so nothing explodes ×16 and no gram string ever
      // exists. Short docs (< 3 tokens) fingerprint as the raw text's
      // rolling hash, as before.
      val fps = Tables.df(s, dir, "documents")
        .select(col("source"), explode(expr("word_grams31(text, 3, false)")).as("fp"))
      val sigCols = (0 until P).map { p =>
        min(expr(s"((1000003 * $p + 12345) * fp + 7919 * $p + 271) % 1000000007")).as(s"m$p")
      }
      val sigsWide = fps.groupBy(col("source")).agg(sigCols.head, sigCols.tail: _*)
      val sigs = sigsWide.select(col("source"), explode(array(
          (0 until P).map(p => struct(lit(p).as("p"), col(s"m$p").as("m"))): _*)).as("pm"))
        .select(col("source"), col("pm.p").as("p"), col("pm.m").as("m"))
      val a = sigs.select(col("source").as("src_a"), col("p"), col("m").as("ma"))
      val b = sigs.select(col("source").as("src_b"), col("p"), col("m").as("mb"))
      a.join(b, Seq("p")).filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(sum((col("ma") === col("mb")).cast("long")).as("n_match"))
        .withColumn("jaccard_est", round(col("n_match") / lit(P.toDouble), 6))
        .orderBy(col("src_a"), col("src_b"))
    }
  )

  def oracle: Map[String, String] = Map(
    "ch04_epoch_shuffle" -> EpochShuffleSql,

    "ch06_token_budget_mix" -> """
      WITH docs AS (
        SELECT source, doc_id,
          CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS ntok
        FROM documents),
      census AS (
        SELECT source, CAST(sum(ntok) AS BIGINT) AS tok_cnt,
          CAST(count(*) AS BIGINT) AS n_docs
        FROM docs GROUP BY source),
      wts AS (
        SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= tok_cnt THEN s0 + 1
                       WHEN s0 * s0 > tok_cnt THEN s0 - 1 ELSE s0 END AS weight
        FROM (SELECT *, CAST(floor(sqrt(CAST(tok_cnt AS DOUBLE))) AS BIGINT) AS s0
              FROM census) t),
      appor AS (
        SELECT source, n_docs, tok_cnt, weight,
          100000 * weight // wsum AS base,
          (100000 * weight) % wsum AS rem
        FROM wts, (SELECT CAST(sum(weight) AS BIGINT) AS wsum FROM wts) w),
      quotas AS (
        SELECT source, n_docs, tok_cnt, weight,
          CAST(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                             <= (SELECT 100000 - sum(base) FROM appor)
                       THEN 1 ELSE 0 END AS BIGINT) AS quota
        FROM appor),
      cum AS (
        SELECT source, doc_id, ntok,
          CAST(coalesce(sum(ntok) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev_tok
        FROM docs),
      sel AS (
        SELECT c.source, CAST(count(*) AS BIGINT) AS n_sel,
          CAST(sum(c.ntok) AS BIGINT) AS tok_sel
        FROM cum c JOIN quotas q ON q.source = c.source
        WHERE c.prev_tok < q.quota
        GROUP BY c.source)
      SELECT q.source, q.n_docs, q.tok_cnt, q.weight, q.quota, s.n_sel, s.tok_sel
      FROM quotas q JOIN sel s ON s.source = q.source
      ORDER BY q.source""",

    "ch05_length_buckets" -> """
      WITH docs AS (
        SELECT CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
          AS n_toks
        FROM documents),
      d AS (
        SELECT n_toks,
          CASE WHEN n_toks = 1 THEN CAST(1 AS BIGINT)
               ELSE (CAST(1 AS BIGINT) << length(bin(n_toks - 1))) END AS bucket
        FROM docs WHERE n_toks > 0),
      g AS (SELECT max(n_toks) AS gmax FROM d)
      SELECT bucket, count(*) AS n_docs,
        CAST(sum(n_toks) AS BIGINT) AS total_toks,
        CAST(count(*) * bucket - sum(n_toks) AS BIGINT) AS waste_bucketed,
        CAST(count(*) * gmax - sum(n_toks) AS BIGINT) AS waste_global,
        round(CAST((count(*) * gmax - sum(n_toks)) - (count(*) * bucket - sum(n_toks))
          AS DOUBLE) * 100.0
          / greatest(count(*) * gmax - sum(n_toks), 1), 2) AS saving_pct
      FROM d, g GROUP BY bucket, gmax ORDER BY bucket""",
    // the oracle states packing as ONE window per source — same
    // arithmetic the two-phase prefix sum distributes
    "ch02_sequence_packing" -> s"""
      WITH toks AS (
        SELECT doc_id, source, greatest(1, n_chars // 4) AS tok FROM documents),
      placed AS (
        SELECT source, tok,
          COALESCE(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        FROM toks)
      SELECT source,
        count(*) AS n_docs,
        CAST(sum(tok) AS BIGINT) AS total_tokens,
        CAST(max((start + tok - 1) // $Cap) + 1 AS BIGINT) AS n_seqs,
        CAST(sum(CASE WHEN start // $Cap <> (start + tok - 1) // $Cap
                      THEN 1 ELSE 0 END) AS BIGINT) AS boundary_docs,
        round(CAST(sum(tok) AS DOUBLE) /
              ((max((start + tok - 1) // $Cap) + 1) * $Cap.0), 6) AS avg_fill
      FROM placed GROUP BY source ORDER BY source""",

    "ch03_curriculum_mix" -> """
      WITH per AS (
        SELECT source, CAST(sum(greatest(1, n_chars // 4)) AS BIGINT) AS tokens,
          CASE WHEN source IN ('src0','src1','src2','src3','src4')
               THEN CAST(2.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END AS weight
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS all_toks, sum(weight) AS all_w FROM per)
      SELECT source, tokens, weight,
        round(least(1.0, (0.5 * all_toks * weight / all_w) / tokens), 6) AS rate,
        CAST(round(round(least(1.0, (0.5 * all_toks * weight / all_w) / tokens), 6) * tokens) AS BIGINT)
          AS sampled_tokens
      FROM per, tot ORDER BY source""",

    "ch01_doc_chunking" -> s"""
      WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
                 FROM documents),
      c AS (SELECT doc_id, CAST(g AS BIGINT) AS chunk_no,
                   toks[CAST(g*$S+1 AS INT) : CAST(g*$S+$W AS INT)] AS chunk
            FROM t, LATERAL (SELECT unnest(generate_series(0,
                   CAST(floor(greatest(len(toks)-1, 0) / $S.0) AS INT)))) AS u(g))
      SELECT doc_id, chunk_no, CAST(len(chunk) AS BIGINT) AS chunk_tokens,
             md5(array_to_string(chunk, ' ')) AS chunk_md5
      FROM c WHERE len(chunk) > 0 ORDER BY doc_id, chunk_no""",

    "d06_boilerplate_ngrams" -> """
      WITH t AS (SELECT doc_id,
                   list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                     tok -> list_reduce(
                              list_prepend(CAST(0 AS BIGINT),
                                list_transform(generate_series(1, length(tok)), i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT))),
                              (acc, c) -> (acc * 31 + c) % 1000000007)) AS ths
                 FROM documents),
      g AS (SELECT doc_id, list_reduce(ths[CAST(i AS INT) : CAST(i+7 AS INT)],
                     (a, b) -> (a * 1000003 + b) % 1000000007) AS gram
            FROM t, LATERAL (SELECT unnest(generate_series(1,
                   CAST(greatest(len(ths)-7, 0) AS INT)))) AS u(i)),
      boiler AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS nd
                                   FROM g GROUP BY 1) WHERE nd >= 5)
      SELECT doc_id,
             count(*) AS n_grams,
             count(CASE WHEN gram IN (SELECT gram FROM boiler) THEN 1 END) AS n_boiler,
             round(CAST(count(CASE WHEN gram IN (SELECT gram FROM boiler) THEN 1 END) AS DOUBLE)
                   / count(*), 6) AS boiler_ratio
      FROM g GROUP BY doc_id ORDER BY doc_id""",

    "x02_contamination" -> """
      WITH t AS (SELECT doc_id,
                   list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                     tok -> list_reduce(
                              list_prepend(CAST(0 AS BIGINT),
                                list_transform(generate_series(1, length(tok)), i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT))),
                              (acc, c) -> (acc * 31 + c) % 1000000007)) AS ths
                 FROM documents),
      g AS (SELECT doc_id, list_reduce(ths[CAST(i AS INT) : CAST(i+7 AS INT)],
                     (a, b) -> (a * 1000003 + b) % 1000000007) AS gram
            FROM t, LATERAL (SELECT unnest(generate_series(1,
                   CAST(greatest(len(ths)-7, 0) AS INT)))) AS u(i)),
      train AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 < 8)
      SELECT doc_id,
             count(*) AS n_test_grams,
             count(CASE WHEN gram IN (SELECT gram FROM train) THEN 1 END) AS n_contaminated,
             round(CAST(count(CASE WHEN gram IN (SELECT gram FROM train) THEN 1 END) AS DOUBLE)
                   / count(*), 6) AS contamination_ratio
      FROM g WHERE doc_id % 10 >= 8
      GROUP BY doc_id ORDER BY doc_id""",

    // one window-free aggregate per doc; string_agg(... ORDER BY line_no)
    // skips the NULL'd boilerplate lines exactly like collect_list does
    "d12_line_dedup" -> """
      WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
                 FROM documents),
      l AS (SELECT doc_id, CAST(i AS BIGINT) AS line_no,
                   toks[CAST(i*3+1 AS INT) : CAST(i*3+3 AS INT)] AS line
            FROM t, LATERAL (SELECT unnest(generate_series(0,
                   CAST(floor(greatest(len(toks)-1, 0) / 3.0) AS INT)))) AS u(i)),
      l2 AS (SELECT doc_id, line_no, line, md5(array_to_string(line, ' ')) AS lh
             FROM l WHERE len(line) > 0),
      boiler AS (SELECT lh FROM (SELECT lh, count(DISTINCT doc_id) AS nd
                                 FROM l2 GROUP BY 1) WHERE nd >= 2)
      SELECT doc_id,
        count(*) AS n_lines,
        count(CASE WHEN lh IN (SELECT lh FROM boiler) THEN 1 END) AS n_removed,
        CAST(coalesce(sum(CASE WHEN lh NOT IN (SELECT lh FROM boiler)
                               THEN len(line) END), 0) AS BIGINT) AS kept_tokens,
        md5(coalesce(string_agg(CASE WHEN lh NOT IN (SELECT lh FROM boiler)
                                     THEN array_to_string(line, ' ') END,
                                ' ' ORDER BY line_no), '')) AS kept_md5
      FROM l2 GROUP BY doc_id ORDER BY doc_id""",

    "t24_source_overlap" -> """
      WITH sh AS (
        SELECT source, unnest(
          CASE WHEN len(ths) >= 3
            THEN list_transform(generate_series(3, len(ths)),
                   i -> ((ths[i-2] * 1000003 + ths[i-1]) % 1000000007
                          * 1000003 + ths[i]) % 1000000007)
            ELSE [list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                      list_transform(generate_series(1, length(text)), i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
                    (acc, c) -> (acc * 31 + c) % 1000000007)] END) AS fp
        FROM (SELECT source, text,
                list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                  t -> list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                           list_transform(generate_series(1, length(t)), i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
                         (acc, c) -> (acc * 31 + c) % 1000000007)) AS ths
              FROM documents) t),
      hashed AS (
        SELECT source, p.p,
          ((1000003 * p.p + 12345) * fp + 7919 * p.p + 271) % 1000000007 AS h
        FROM sh, (SELECT unnest(generate_series(CAST(0 AS BIGINT), CAST(15 AS BIGINT))) AS p) p),
      sigs AS (
        SELECT source, p, min(h) AS m FROM hashed GROUP BY source, p)
      SELECT a.source AS src_a, b.source AS src_b,
        CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
        round(CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS DOUBLE) / 16.0, 6)
          AS jaccard_est
      FROM sigs a JOIN sigs b ON a.p = b.p AND a.source < b.source
      GROUP BY a.source, b.source
      ORDER BY src_a, src_b"""
  )
}
