package graft.queries

import graft.QuerySpec
import graft.QuerySpec._
import org.apache.spark.sql.functions._

/** Training-data pipeline operators, round 3: SimHash fingerprinting,
  * top-k per group, distribution profiling, benchmark decontamination,
  * the composed filter→dedup→stats pipeline, and an HLL distinct sketch.
  *
  * Oracle notes: SimHash bits come from md5 hex digits decoded as
  * `POSITION(ch IN '0123456789abcdef') - 1` — md5 evaluates identically
  * in Spark (native [[graft.functions.SimHash32]]) and DuckDB (the
  * explicit vote SQL), so the 32-bit signatures are exactly comparable.
  *
  * Scale notes: SimHash is ONE fused projection per doc (the native
  * expression folds docs × tokens × 32 vote rows into a per-row loop)
  * plus a tiny aggregate on the signature space; top-k per group plans
  * through Spark's WindowGroupLimit pushdown (only k rows per group
  * survive the partial sort); decontamination is a broadcast-able anti
  * join on fingerprints; the profile decile window partitions by lang
  * (never one global sort task).
  */
object PipelineOps {

  /** 32-bit SimHash near-dup buckets: per-token md5 bits vote per
    * position, sign forms the signature, buckets with >1 doc are
    * near-dup candidate groups (doc pairs sharing all 32 bits). The
    * DuckDB oracle spells the votes out relationally; the Spark side is
    * the native `simhash32` expression with identical bit semantics. */
  val q36 = dialect("q36_simhash_buckets",
    sparkSql = """SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
      |FROM (
      |  SELECT doc_id,
      |    simhash32(array_distinct(split(lower(text), '\\s+'))) AS simhash
      |  FROM documents) sim
      |GROUP BY simhash HAVING COUNT(*) > 1
      |ORDER BY simhash""".stripMargin,
    duckSql = """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '\s+'))) AS w
      |  FROM documents),
      |contrib AS (
      |  SELECT doc_id, g.bit,
      |    CASE WHEN (((POSITION(substr(md5(w), CAST(g.bit // 4 AS INT) + 1, 1) IN '0123456789abcdef') - 1)
      |        >> CAST(g.bit % 4 AS INT)) & 1) = 1 THEN 1 ELSE -1 END AS c
      |  FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS bit) g),
      |simbits AS (
      |  SELECT doc_id, bit, CASE WHEN SUM(c) >= 0 THEN 1 ELSE 0 END AS b
      |  FROM contrib GROUP BY doc_id, bit),
      |sim AS (
      |  SELECT doc_id,
      |    CAST(SUM(CAST(b AS BIGINT) * (CAST(1 AS BIGINT) << CAST(bit AS INT))) AS BIGINT) AS simhash
      |  FROM simbits GROUP BY doc_id)
      |SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
      |FROM sim GROUP BY simhash HAVING COUNT(*) > 1
      |ORDER BY simhash""".stripMargin)

  /** Top-3 longest docs per language — the top-k-per-group shape (Spark
    * plans WindowGroupLimit: only k rows per group leave each task). */
  val q37 = both("q37_topk_per_group",
    """SELECT lang, doc_id, n_chars FROM (
      |  SELECT lang, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM documents) t
      |WHERE rn <= 3 ORDER BY lang, doc_id""".stripMargin)

  /** Per-language length-distribution profile: decile buckets from
    * percent_rank (exact (rank-1)/(n-1) in both engines; window
    * partitions by lang so no global-sort task). */
  val q38 = both("q38_length_deciles",
    """SELECT lang, decile, COUNT(*) AS n_docs,
      |  MIN(n_chars) AS lo, MAX(n_chars) AS hi
      |FROM (
      |  SELECT lang, n_chars,
      |    CAST(FLOOR(PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) * 10) AS BIGINT) AS decile
      |  FROM documents) t
      |GROUP BY lang, decile ORDER BY lang, decile""".stripMargin)

  /** Benchmark decontamination: drop training docs whose normalized
    * fingerprint appears in the held-out set (every doc_id ≡ 0..4 mod 97
    * stands in for the benchmark). Plans as an anti join on md5 — at
    * scale the benchmark side is small and broadcasts. */
  val q39 = both("q39_decontaminate",
    """WITH bench AS (
      |  SELECT DISTINCT md5(lower(text)) AS fp FROM documents WHERE doc_id % 97 < 5)
      |SELECT lang, COUNT(*) AS n_docs
      |FROM documents d
      |WHERE NOT EXISTS (SELECT 1 FROM bench b WHERE b.fp = md5(lower(d.text)))
      |GROUP BY lang ORDER BY lang""".stripMargin)

  /** q39's decontamination re-planned for corpus scale: the same
    * held-out set is subtracted via a distributed-built Bloom filter
    * probe (codegen'd scan predicate, no UDF) with an exact anti-join
    * verifying only the bloom HITS — row-identical to the plain anti
    * join (the DuckDB oracle is exactly that), but at 100 TB the join's
    * left side is the bloom-hit sliver instead of the whole corpus.
    * See [[graft.operators.Decontaminate]]. */
  val q62 = plan("q62_bloom_decontaminate",
    fn = (s, dir) => {
      import org.apache.spark.sql.functions._
      graft.Tables.registerAll(s, dir)
      val docs = s.table("documents")
      val eval = docs.filter(col("doc_id") % 97 < 5)
        .select(md5(lower(col("text"))).as("fp"))
      graft.operators.Decontaminate
        .decontaminate(docs, eval, md5(lower(col("text"))), "fp",
          expectedItems = 1L << 16, numBits = 1L << 20)
        .groupBy("lang", "source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("n_chars").cast("long").as("total_chars"))
        .orderBy("lang", "source")
    },
    duckSql = """WITH bench AS (
      |  SELECT DISTINCT md5(lower(text)) AS fp FROM documents WHERE doc_id % 97 < 5)
      |SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents d
      |WHERE NOT EXISTS (SELECT 1 FROM bench b WHERE b.fp = md5(lower(d.text)))
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin)

  /** The composed prep pipeline: quality gate → exact dedup (lowest id
    * wins) → per-language corpus stats. One window + one aggregation. */
  val q40 = both("q40_prep_pipeline",
    """WITH scored AS (
      |  SELECT doc_id, lang, text, CAST(LENGTH(text) AS BIGINT) AS n_len
      |  FROM documents WHERE LENGTH(text) >= 20),
      |dedup AS (
      |  SELECT doc_id, lang, n_len FROM (
      |    SELECT doc_id, lang, n_len,
      |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM scored) t
      |  WHERE rn = 1)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_len) AS BIGINT) AS total_chars,
      |  MIN(doc_id) AS first_doc
      |FROM dedup GROUP BY lang ORDER BY lang""".stripMargin)

  /** HLL distinct-token sketch per language (approx by construction →
    * rows-only check; OperatorsSpec gates the relative error vs exact
    * COUNT(DISTINCT) at ≤ 5%). The sketch is mergeable partial state —
    * the 100 TB shape for distinct counting. */
  val q41 = planOnly("q41_hll_distinct", (s, dir) => {
    graft.Tables.registerAll(s, dir)
    s.sql("""SELECT lang,
      |  approx_count_distinct(w) AS approx_tokens,
      |  COUNT(*) AS n_tokens
      |FROM (SELECT lang, EXPLODE(split(lower(text), '\\s+')) AS w FROM documents) t
      |GROUP BY lang ORDER BY lang""".stripMargin)
  })

  /** Point-in-interval join: events inside derived 120 s maintenance
    * windows (every 199th event opens one). Spark side is the bin-
    * bucketed [[graft.operators.RangeJoin]] equi-join; the naive BETWEEN
    * join would plan BroadcastNestedLoopJoin. DuckDB's native IEJoin is
    * the oracle. `ts` is epoch-nanos BIGINT on the Spark side
    * (nanosAsLong) and epoch_ns(ts) duck-side — identical integers. */
  val q42 = plan("q42_range_join", (s, dir) => {
    val ev = graft.Tables.load(s, dir, "events")
      .select(col("event_id"), col("ts"), col("value"))
    val windows = ev.filter(col("event_id") % 199 === 0)
      .select(col("event_id").as("win_id"), col("ts").as("w_start"),
        (col("ts") + lit(120000000000L)).as("w_end"))
    graft.operators.RangeJoin
      .pointInInterval(ev, "ts", windows, "w_start", "w_end",
        binWidth = 120000000000L)
      .groupBy("win_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("win_id")
  },
    duckSql = """WITH ev AS (SELECT event_id, epoch_ns(ts) AS tns, value FROM events),
      |win AS (SELECT event_id AS win_id, tns AS w_start, tns + 120000000000 AS w_end
      |        FROM ev WHERE event_id % 199 = 0)
      |SELECT w.win_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM ev e JOIN win w ON e.tns BETWEEN w.w_start AND w.w_end
      |GROUP BY w.win_id ORDER BY w.win_id""".stripMargin)

  /** Deterministic stratified train/val/test split (75/12.5/12.5 by the
    * last md5 hex digit of the doc id) with per-language occupancy — the
    * reproducible-split shape every training pipeline needs (no rand():
    * replays and backfills land every doc in the same split). */
  val q43 = dialect("q43_stratified_split",
    sparkSql = """SELECT lang, split, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM (
      |  SELECT lang, n_chars,
      |    CASE WHEN d < 12 THEN 'train' WHEN d < 14 THEN 'val' ELSE 'test' END AS split
      |  FROM (
      |    SELECT lang, n_chars,
      |      POSITION(substr(md5(CAST(doc_id AS STRING)), 32, 1) IN '0123456789abcdef') - 1 AS d
      |    FROM documents) h) t
      |GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    duckSql = """SELECT lang, split, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM (
      |  SELECT lang, n_chars,
      |    CASE WHEN d < 12 THEN 'train' WHEN d < 14 THEN 'val' ELSE 'test' END AS split
      |  FROM (
      |    SELECT lang, n_chars,
      |      POSITION(substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) IN '0123456789abcdef') - 1 AS d
      |    FROM documents) h) t
      |GROUP BY lang, split ORDER BY lang, split""".stripMargin)

  /** Document chunking for a training pipeline: fixed-size token windows
    * (8 tokens, stride 4) per doc — the explode shape a tokenize-and-pack
    * stage produces. Chunk starts derive from the token count alone, so
    * the expansion is a sequence() explode (no per-token rows). */
  val q47 = dialect("q47_chunking",
    sparkSql = """WITH d AS (
      |  SELECT doc_id, lang, size(split(trim(text), '\\s+')) AS n FROM documents),
      |c AS (
      |  SELECT doc_id, lang, s, LEAST(s + 8, n) - s AS chunk_len
      |  FROM d LATERAL VIEW EXPLODE(sequence(0, GREATEST(n - 1, 0), 4)) t AS s)
      |SELECT lang, COUNT(*) AS n_chunks,
      |  CAST(SUM(chunk_len) AS BIGINT) AS total_chunk_tokens,
      |  COUNT(DISTINCT doc_id) AS n_docs
      |FROM c GROUP BY lang ORDER BY lang""".stripMargin,
    duckSql = """WITH d AS (
      |  SELECT doc_id, lang, len(regexp_split_to_array(trim(text), '\s+')) AS n FROM documents),
      |e AS (
      |  SELECT doc_id, lang, n,
      |    unnest(generate_series(0, GREATEST(n - 1, 0), 4)) AS s
      |  FROM d),
      |c AS (SELECT doc_id, lang, s, LEAST(s + 8, n) - s AS chunk_len FROM e)
      |SELECT lang, COUNT(*) AS n_chunks,
      |  CAST(SUM(chunk_len) AS BIGINT) AS total_chunk_tokens,
      |  COUNT(DISTINCT doc_id) AS n_docs
      |FROM c GROUP BY lang ORDER BY lang""".stripMargin)

  /** Repetition detection (the C4/Gopher-style quality rule): share of
    * the most-repeated trigram per doc; docs over 20% flagged. Trigrams
    * come from index arithmetic over the token array (1-based element_at
    * in both engines), so the blow-up is one row per trigram, grouped
    * map-side. */
  val q48 = dialect("q48_repetition",
    sparkSql = """WITH tok AS (
      |  SELECT doc_id, lang, split(trim(text), '\\s+') AS a FROM documents),
      |tri AS (
      |  SELECT doc_id, lang,
      |    CONCAT_WS(' ', element_at(a, i), element_at(a, i + 1), element_at(a, i + 2)) AS t3
      |  FROM tok LATERAL VIEW EXPLODE(sequence(1, GREATEST(size(a) - 2, 1))) s AS i
      |  WHERE size(a) >= 3),
      |cnt AS (SELECT doc_id, lang, t3, COUNT(*) AS c FROM tri GROUP BY doc_id, lang, t3),
      |agg AS (SELECT doc_id, lang, MAX(c) AS maxc, SUM(c) AS tot FROM cnt GROUP BY doc_id, lang)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN CAST(maxc AS DOUBLE) / CAST(tot AS DOUBLE) > 0.2
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
      |  MAX(CAST(maxc AS DOUBLE) / CAST(tot AS DOUBLE)) AS max_share
      |FROM agg GROUP BY lang ORDER BY lang""".stripMargin,
    duckSql = """WITH tok AS (
      |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS a FROM documents),
      |ix AS (
      |  SELECT doc_id, lang, a, unnest(generate_series(1, GREATEST(len(a) - 2, 1))) AS i
      |  FROM tok WHERE len(a) >= 3),
      |tri AS (
      |  SELECT doc_id, lang, CONCAT_WS(' ', a[i], a[i + 1], a[i + 2]) AS t3 FROM ix),
      |cnt AS (SELECT doc_id, lang, t3, COUNT(*) AS c FROM tri GROUP BY doc_id, lang, t3),
      |agg AS (SELECT doc_id, lang, MAX(c) AS maxc, SUM(c) AS tot FROM cnt GROUP BY doc_id, lang)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN CAST(maxc AS DOUBLE) / CAST(tot AS DOUBLE) > 0.2
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
      |  MAX(CAST(maxc AS DOUBLE) / CAST(tot AS DOUBLE)) AS max_share
      |FROM agg GROUP BY lang ORDER BY lang""".stripMargin)

  /** Clickstream conversion funnel (the reference datagen's domain,
    * datagen.py:28-60): per-user first view → first click → first
    * purchase ordering, one conditional-MIN aggregate per user then one
    * scalar rollup — two map-side-combined aggregations, no joins, no
    * windows. `ts` is epoch-nanos BIGINT Spark-side / epoch_ns() in
    * DuckDB, so the orderings are exact integer compares. */
  val q49 = dialect("q49_funnel",
    sparkSql = """WITH f AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT COUNT(*) AS n_users,
      |  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
      |  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
      |    THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
      |  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
      |    THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
      |FROM f""".stripMargin,
    duckSql = """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts FROM events),
      |f AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM e GROUP BY user_id)
      |SELECT COUNT(*) AS n_users,
      |  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
      |  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
      |    THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
      |  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
      |    THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
      |FROM f""".stripMargin)

  /** Semi-structured extraction (F13's batch shape): pull a typed field
    * out of the JSON `props` payload and aggregate — JSON decode stays a
    * fused projection inside the scan, only small typed values reach the
    * aggregate. */
  val q50 = dialect("q50_json_extract",
    sparkSql = """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MAX(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    duckSql = """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)

  /** Domain mixing weights (the sampling-weight table a pretraining run
    * feeds its data loader): per-source doc/token counts and an
    * alpha=0.5 smoothed weight w_s = sqrt(tokens_s) / Σ sqrt(tokens_s)
    * — upsamples small sources relative to proportional mixing.
    *
    * Determinism note: the sqrt weights are DOUBLEs, and a windowed
    * SUM(double) adds in engine-specific order — so each sqrt is cast
    * to DECIMAL(18,6) first and the normalizing sum runs in exact
    * decimal arithmetic (order-independent), then converts to double
    * once for the final ratio. Bit-identical across Spark and DuckDB.
    *
    * Scale shape: one map-side-combined aggregate over documents (the
    * token count is a fused projection), then a 20-row window — the
    * whole normalization happens on rows-per-source, never per-doc. */
  val q53 = dialect("q53_domain_mix",
    sparkSql = """WITH s AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(size(split(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, n_docs, n_tokens,
      |    CAST(SQRT(CAST(n_tokens AS DOUBLE)) AS DECIMAL(18,6)) AS sw
      |  FROM s)
      |SELECT source, n_docs, n_tokens,
      |  CAST(sw AS DOUBLE) / CAST(SUM(sw) OVER () AS DOUBLE) AS mix_weight
      |FROM w ORDER BY source""".stripMargin,
    duckSql = """WITH s AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, n_docs, n_tokens,
      |    CAST(SQRT(CAST(n_tokens AS DOUBLE)) AS DECIMAL(18,6)) AS sw
      |  FROM s)
      |SELECT source, n_docs, n_tokens,
      |  CAST(sw AS DOUBLE) / CAST(SUM(sw) OVER () AS DOUBLE) AS mix_weight
      |FROM w ORDER BY source""".stripMargin)

  /** Sessionization (gap-based): split each user's event stream into
    * sessions wherever the gap to the previous event exceeds 12 h, then
    * roll up per-user session stats. The batch twin of the streaming
    * session-window operator; all arithmetic is exact epoch-MICROS
    * BIGINT (each engine truncates its own timestamps per-event —
    * `ts DIV 1000` on Spark's nanos, `epoch_us` in DuckDB — because
    * DuckDB reads parquet TIMESTAMP(NANOS) at µs precision, so nanos
    * would diverge in the last three digits).
    *
    * Scale shape: LAG and the running SUM share PARTITION BY user_id
    * ORDER BY (ts, event_id), so both window functions ride ONE
    * exchange; the (user_id, sess) and user_id group-bys are satisfied
    * by that same hash-partitioning (Spark's ClusteredDistribution is
    * subset-closed) — one data shuffle end-to-end, never a global sort.
    * PlanSpec gates the exchange count. */
  val q54 = dialect("q54_sessionize",
    sparkSql = """WITH e AS (
      |  SELECT user_id, event_id, ts DIV 1000 AS ts FROM events),
      |o AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      > 43200000000 THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |s AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM o),
      |g AS (
      |  SELECT user_id, sess, COUNT(*) AS n_ev, MAX(ts) - MIN(ts) AS dur_us
      |  FROM s GROUP BY user_id, sess)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
      |  CAST(MAX(n_ev) AS BIGINT) AS max_session_events,
      |  CAST(MAX(dur_us) AS BIGINT) AS max_session_dur_us
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    duckSql = """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts FROM events),
      |o AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      > 43200000000 THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |s AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM o),
      |g AS (
      |  SELECT user_id, sess, COUNT(*) AS n_ev, MAX(ts) - MIN(ts) AS dur_us
      |  FROM s GROUP BY user_id, sess)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
      |  CAST(MAX(n_ev) AS BIGINT) AS max_session_events,
      |  CAST(MAX(dur_us) AS BIGINT) AS max_session_dur_us
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)

  /** Mixing-weight APPLICATION (the execution half of q53's weight
    * computation): down-sample each language to a target rate with a
    * DETERMINISTIC hash gate — keep a doc iff the first 4 hex chars of
    * md5(doc_id) fall below the language's threshold in the 16^4 space
    * ('8000' = 50%, '4000' = 25%, …). Deterministic sampling is what a
    * training-data pipeline needs (re-runs select the SAME subset, no
    * seed coordination across executors), and the hex-string comparison
    * is engine-portable where a hex→int conversion is not. Scale shape:
    * a fused projection + filter (no shuffle until the audit group-by);
    * the gate pushes into the scan stage at any corpus size. */
  val q60 = both("q60_mix_sample",
    """WITH s AS (
      |  SELECT doc_id, lang, substr(md5(CAST(doc_id AS STRING)), 1, 4) AS h
      |  FROM documents),
      |k AS (
      |  SELECT doc_id, lang FROM s
      |  WHERE h < CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN '4000'
      |            WHEN 'es' THEN '2000' WHEN 'fr' THEN '1000' ELSE '0800' END)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_kept,
      |  CAST(MAX(doc_id) AS BIGINT) AS last_kept
      |FROM k GROUP BY lang ORDER BY lang""".stripMargin)

  /** Sequence packing (context-window binning): assign docs to fixed
    * 512-token training windows by running token offset — doc goes to
    * bin floor(start_offset / 512), the first-fit-by-offset streaming
    * pack. Per-bin doc/token counts audit the fill. Packing is
    * per-language (PARTITION BY lang), so the running sum parallelizes
    * across languages; at 100 TB the same shape runs per (lang, shard)
    * with shards sized to executors — the window never goes global.
    * Integer division differs by dialect (Spark DIV, DuckDB //). */
  val q61 = dialect("q61_sequence_packing",
    sparkSql = """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, lang, n_tok,
      |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t),
      |b AS (
      |  SELECT lang, (cum - n_tok) DIV 512 AS bin, n_tok FROM o)
      |SELECT lang, CAST(bin AS BIGINT) AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,
    duckSql = """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, lang, n_tok,
      |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t),
      |b AS (
      |  SELECT lang, (cum - n_tok) // 512 AS bin, n_tok FROM o)
      |SELECT lang, CAST(bin AS BIGINT) AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin)

  /** Exact per-group quantiles of the document length distribution —
    * the corpus-profiling stat every curation run reports. DISCRETE
    * quantiles (the smallest value with cumulative share ≥ p): exact
    * order statistics, no interpolation arithmetic, so the values are
    * actual data points and cross-engine parity is structural (Spark
    * `percentile_disc` and DuckDB `quantile_disc` agree — probed on
    * 1..10). Spark computes each group's quantile from its sorted value
    * multiset in one aggregate per group — a single lang-keyed exchange,
    * no global sort; deciles-by-rank (q38) profiles ROW ranks, this
    * profiles the VALUE distribution. */
  val q67 = dialect("q67_length_quantiles",
    sparkSql = """SELECT lang,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MIN(n_chars) AS BIGINT) AS p0,
      |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p25,
      |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p50,
      |  CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p75,
      |  CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p95,
      |  CAST(MAX(n_chars) AS BIGINT) AS p100
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    duckSql = """SELECT lang,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MIN(n_chars) AS BIGINT) AS p0,
      |  CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS p25,
      |  CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50,
      |  CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS p75,
      |  CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS p95,
      |  CAST(MAX(n_chars) AS BIGINT) AS p100
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)

  /** The composed corpus-curation pipeline (the Dolma/CCNet shape) as ONE
    * declarative plan: quality gate → exact dedup → deterministic mixing
    * sample → per-lang audit. Each stage is an operator proven separately
    * (q17 token counting, q16 md5 last-wins dedup, q60 hash-gate
    * sampling, q53-style audit); composing them in one query is the point
    * — Catalyst fuses the quality filter and the sample gate into the
    * scan-side projection, the dedup is the pipeline's ONE md5-keyed
    * window exchange, and the audit group-by is the only other shuffle.
    * Deleting a stage or reordering the gates is a one-line change to a
    * declarative plan, not a pipeline rebuild — the reason a lakehouse
    * curation stack wants SQL, and exactly how it runs at 100 TB: no
    * intermediate materialization between stages. */
  val q69 = dialect("q69_curation_pipeline",
    sparkSql = """WITH q AS (
      |  SELECT doc_id, lang, text,
      |    CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_tok
      |  FROM documents
      |  WHERE size(split(trim(text), '\\s+')) >= 20),
      |d AS (
      |  SELECT doc_id, lang, n_tok FROM (
      |    SELECT doc_id, lang, n_tok,
      |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM q) t
      |  WHERE rn = 1),
      |s AS (
      |  SELECT doc_id, lang, n_tok FROM d
      |  WHERE substr(md5(CAST(doc_id AS STRING)), 1, 4) <
      |    CASE lang WHEN 'en' THEN 'c000' WHEN 'de' THEN '8000'
      |         WHEN 'es' THEN '6000' WHEN 'fr' THEN '4000' ELSE '2000' END)
      |SELECT lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
      |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
      |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    duckSql = """WITH q AS (
      |  SELECT doc_id, lang, text,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents
      |  WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 20),
      |d AS (
      |  SELECT doc_id, lang, n_tok FROM (
      |    SELECT doc_id, lang, n_tok,
      |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM q) t
      |  WHERE rn = 1),
      |s AS (
      |  SELECT doc_id, lang, n_tok FROM d
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      |    CASE lang WHEN 'en' THEN 'c000' WHEN 'de' THEN '8000'
      |         WHEN 'es' THEN '6000' WHEN 'fr' THEN '4000' ELSE '2000' END)
      |SELECT lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
      |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
      |FROM s GROUP BY lang ORDER BY lang""".stripMargin)

  /** Temperature-smoothed domain mixing (the GPT-3/PaLM α-sampling
    * formula, α = 0.5): per-language mixing weights p_i ∝ n_i^α flatten
    * the natural distribution so low-resource domains are up-weighted;
    * per-doc acceptance is the deterministic md5-hash gate of q60 with
    * the COMPUTED per-domain rate r_i = B·√n_i / (Σ√n_j · n_i) for a
    * target budget B = half the corpus.
    *
    * Cross-engine exactness: n^0.5 is taken as FLOOR(SQRT(n)) — IEEE
    * sqrt is correctly rounded in both engines, so the floor is
    * bit-identical — and everything after is integer arithmetic; the
    * gate compares 4-hex-char strings, with thresholds rendered by
    * printf/format_string '%04x' (rate ≥ 1 ⇒ sentinel 'zzzz' accepts
    * all). Scale shape: the weight table is one map-side-combined
    * aggregate (domains-sized), broadcast back over the corpus scan —
    * the sample itself never shuffles. */
  val q78 = dialect("q78_temperature_mix",
    sparkSql = """WITH n AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      |  GROUP BY lang),
      |w AS (SELECT lang, n_docs,
      |        CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS isq
      |      FROM n),
      |tot AS (SELECT CAST(SUM(isq) AS BIGINT) AS s,
      |               CAST(SUM(n_docs) AS BIGINT) DIV 2 AS budget FROM w),
      |th AS (SELECT lang, n_docs, isq,
      |         (65536 * budget * isq) DIV (s * n_docs) AS t
      |       FROM w CROSS JOIN tot),
      |g AS (SELECT lang, n_docs, isq,
      |        CASE WHEN t >= 65536 THEN 'zzzz'
      |             ELSE format_string('%04x', CAST(t AS INT)) END AS gate
      |      FROM th),
      |k AS (SELECT d.doc_id, d.lang
      |      FROM documents d JOIN g ON d.lang = g.lang
      |      WHERE substr(md5(CAST(d.doc_id AS STRING)), 1, 4) < g.gate)
      |SELECT g.lang, g.n_docs, g.isq AS weight, g.gate,
      |  CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept,
      |  CAST(MIN(k.doc_id) AS BIGINT) AS first_kept,
      |  CAST(MAX(k.doc_id) AS BIGINT) AS last_kept
      |FROM g LEFT JOIN k ON g.lang = k.lang
      |GROUP BY g.lang, g.n_docs, g.isq, g.gate ORDER BY g.lang""".stripMargin,
    duckSql = """WITH n AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      |  GROUP BY lang),
      |w AS (SELECT lang, n_docs,
      |        CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS isq
      |      FROM n),
      |tot AS (SELECT CAST(SUM(isq) AS BIGINT) AS s,
      |               CAST(SUM(n_docs) AS BIGINT) // 2 AS budget FROM w),
      |th AS (SELECT lang, n_docs, isq,
      |         (65536 * budget * isq) // (s * n_docs) AS t
      |       FROM w CROSS JOIN tot),
      |g AS (SELECT lang, n_docs, isq,
      |        CASE WHEN t >= 65536 THEN 'zzzz'
      |             ELSE printf('%04x', CAST(t AS INT)) END AS gate
      |      FROM th),
      |k AS (SELECT d.doc_id, d.lang
      |      FROM documents d JOIN g ON d.lang = g.lang
      |      WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < g.gate)
      |SELECT g.lang, g.n_docs, g.isq AS weight, g.gate,
      |  CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept,
      |  CAST(MIN(k.doc_id) AS BIGINT) AS first_kept,
      |  CAST(MAX(k.doc_id) AS BIGINT) AS last_kept
      |FROM g LEFT JOIN k ON g.lang = k.lang
      |GROUP BY g.lang, g.n_docs, g.isq, g.gate ORDER BY g.lang""".stripMargin)

  /** Trainer shard-manifest audit — the oracle-checkable half of
    * [[graft.operators.TrainingExport]]'s discipline: a deterministic
    * hash shard (here the first md5 hex nibble → 16 shards, the
    * engine-portable spelling; the operator's xxhash64 path and its
    * order-sensitive manifest are TrainingExportSpec-gated) with the
    * per-shard manifest stats a data-loader verifies before a run.
    * Fused projection + one 16-group aggregate — scan-bound at any
    * corpus size. */
  val q84 = QuerySpec.both("q84_train_shards",
    """WITH s AS (
      |  SELECT doc_id, n_chars,
      |    substr(md5(CAST(doc_id AS STRING)), 1, 1) AS shard
      |  FROM documents)
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_id,
      |  CAST(MAX(doc_id) AS BIGINT) AS last_id
      |FROM s GROUP BY shard ORDER BY shard""".stripMargin)

  /** 4-byte little-endian hex of an integral SQL expression — the
    * building block for composing real binary media headers in pure,
    * codegen'd SQL string functions (no UDF, no driver loop). */
  private def le32(e: String): String = {
    val hx = s"lpad(hex($e), 8, '0')"
    s"concat(substr($hx,7,2), substr($hx,5,2), substr($hx,3,2), substr($hx,1,2))"
  }

  /** Multimodal audit through the oracle gate (r11): deterministic REAL
    * media blobs — 24-bpp BI_RGB BMPs (even doc_ids) and 16-bit PCM
    * silence WAVs (odd doc_ids) — are composed per document as hex
    * strings with codegen'd string functions and `unhex`ed into a binary
    * column, then decoded by the engine's own byte-level decoders
    * ([[graft.functions.BmpFeatures]]/[[graft.functions.WavFeatures]],
    * native Catalyst expressions — zero UDFs). The per-format audit
    * (count, decode-ok count, byte volume, magic bytes, decoded
    * dimension sums) hash-matches a DuckDB oracle that derives every
    * value ARITHMETICALLY from the format specs (54 + h·rowstride BMP
    * bytes, 44 + 2n WAV bytes, n·1000/8000 ms) — so a header-layout or
    * decoder-field bug on the Spark side cannot cancel out.
    * Scale shape: one documents scan, fused blob-build+decode
    * projection, blobs never shuffle (only the 2-group audit rows move).
    * Ref: docker/notebooks multimodal ingestion treats media as opaque
    * blob + metadata columns. */
  val q85 = QuerySpec.dialect("q85_media_audit",
    s"""WITH base AS (SELECT doc_id AS d FROM documents),
      |par AS (
      |  SELECT d,
      |    CASE WHEN d % 2 = 0 THEN 'bmp' ELSE 'wav' END AS fmt,
      |    CAST(1 + d % 16 AS INT) AS w, CAST(1 + d % 8 AS INT) AS h,
      |    CAST(d % 256 AS INT) AS pr, CAST((2*d) % 256 AS INT) AS pg,
      |    CAST((3*d) % 256 AS INT) AS pb,
      |    CAST(((3*(1 + d % 16) + 3) DIV 4) * 4 AS INT) AS row_size,
      |    CAST(64 + d % 64 AS INT) AS n
      |  FROM base),
      |hexed AS (
      |  SELECT d, fmt,
      |    CASE WHEN fmt = 'bmp' THEN concat(
      |      '424D', ${le32("54 + h * row_size")}, '00000000', '36000000',
      |      '28000000', ${le32("w")}, ${le32("h")}, '0100', '1800',
      |      '00000000', ${le32("h * row_size")}, '130B0000', '130B0000',
      |      '00000000', '00000000',
      |      repeat(concat(repeat(concat(lpad(hex(pb),2,'0'), lpad(hex(pg),2,'0'),
      |                                  lpad(hex(pr),2,'0')), w),
      |                    repeat('00', row_size - 3*w)), h))
      |    ELSE concat(
      |      '52494646', ${le32("36 + 2*n")}, '57415645',
      |      '666D7420', '10000000', '0100', '0100', '401F0000', '803E0000',
      |      '0200', '1000', '64617461', ${le32("2*n")},
      |      repeat('0000', n)) END AS mh
      |  FROM par),
      |media AS (SELECT d, fmt, unhex(mh) AS media FROM hexed),
      |feat AS (
      |  SELECT fmt, media, bmp_features(media) AS bf, wav_features(media) AS wf
      |  FROM media)
      |SELECT fmt,
      |  CAST(COUNT(*) AS BIGINT) AS n_media,
      |  CAST(SUM(CASE WHEN fmt = 'bmp' AND bf.ok THEN 1
      |                WHEN fmt = 'wav' AND wf.ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
      |  CAST(SUM(octet_length(media)) AS BIGINT) AS sum_bytes,
      |  MIN(hex(substring(media, 1, 2))) AS magic_lo,
      |  MAX(hex(substring(media, 1, 2))) AS magic_hi,
      |  CAST(SUM(CASE WHEN fmt = 'bmp' THEN bf.width ELSE wf.n_samples END) AS BIGINT) AS sum_dim1,
      |  CAST(SUM(CASE WHEN fmt = 'bmp' THEN bf.height ELSE wf.duration_ms END) AS BIGINT) AS sum_dim2,
      |  CAST(SUM(CASE WHEN fmt = 'bmp' THEN CAST(bf.mean_r AS BIGINT)
      |                ELSE CAST(wf.peak AS BIGINT) END) AS BIGINT) AS sum_px
      |FROM feat GROUP BY fmt ORDER BY fmt""".stripMargin,
    """WITH base AS (SELECT doc_id AS d FROM documents),
      |bmp AS (
      |  SELECT d, 1 + d % 16 AS w, 1 + d % 8 AS h, d % 256 AS pr,
      |    ((3*(1 + d % 16) + 3) // 4) * 4 AS row_size
      |  FROM base WHERE d % 2 = 0),
      |wav AS (SELECT d, 64 + d % 64 AS n FROM base WHERE d % 2 = 1),
      |b AS (SELECT 'bmp' AS fmt,
      |  CAST(COUNT(*) AS BIGINT) AS n_media,
      |  CAST(COUNT(*) AS BIGINT) AS n_ok,
      |  CAST(SUM(54 + h * row_size) AS BIGINT) AS sum_bytes,
      |  '424D' AS magic_lo, '424D' AS magic_hi,
      |  CAST(SUM(w) AS BIGINT) AS sum_dim1,
      |  CAST(SUM(h) AS BIGINT) AS sum_dim2,
      |  CAST(SUM(pr) AS BIGINT) AS sum_px FROM bmp),
      |v AS (SELECT 'wav' AS fmt,
      |  CAST(COUNT(*) AS BIGINT) AS n_media,
      |  CAST(COUNT(*) AS BIGINT) AS n_ok,
      |  CAST(SUM(44 + 2*n) AS BIGINT) AS sum_bytes,
      |  '5249' AS magic_lo, '5249' AS magic_hi,
      |  CAST(SUM(n) AS BIGINT) AS sum_dim1,
      |  CAST(SUM(n * 1000 // 8000) AS BIGINT) AS sum_dim2,
      |  CAST(0 AS BIGINT) AS sum_px FROM wav)
      |SELECT * FROM b UNION ALL SELECT * FROM v ORDER BY fmt""".stripMargin)

  /** DSIR-style data selection ([[graft.operators.Dsir]], Xie et al.
    * 2023): rank the NON-English-labeled pool by how English-like its
    * hashed-unigram profile is under two smoothed bucket models
    * (target = lang='en' docs, source = the pool itself) and keep the
    * top 200 — the importance-resampling shape that picks pretraining
    * data matching a target domain. Scoring is engine-exact fixed point
    * (one LN per bucket over identical doubles, then BIGINT sums — see
    * the operator scaladoc), so the oracle hash gates the whole pipeline:
    * tokenize → md5 bucket → two models → ratio table → per-doc score →
    * deterministic top-k. */
  val q95 = plan("q95_dsir_select",
    fn = (s, dir) => {
      val docs = graft.Tables.load(s, dir, "documents")
      import org.apache.spark.sql.functions.col
      graft.operators.Dsir.select(
          pool = docs.filter(col("lang") =!= "en"),
          target = docs.filter(col("lang") === "en"),
          k = 200)
        .select(col("doc_id"), col("score"))
    },
    duckSql = """WITH tok AS (
      |  SELECT doc_id, lang, w FROM (
      |    SELECT doc_id, lang,
      |           unnest(regexp_split_to_array(lower(text), '\s+')) AS w
      |    FROM documents) WHERE w <> ''),
      |cnt AS (
      |  SELECT doc_id, lang,
      |      (POSITION(substr(md5(w),1,1) IN '0123456789abcdef')-1)*256
      |    + (POSITION(substr(md5(w),2,1) IN '0123456789abcdef')-1)*16
      |    + (POSITION(substr(md5(w),3,1) IN '0123456789abcdef')-1) AS bucket,
      |    COUNT(*) AS c
      |  FROM tok GROUP BY 1, 2, 3),
      |tmodel AS (SELECT bucket, SUM(c) AS cnt_t FROM cnt WHERE lang = 'en' GROUP BY 1),
      |smodel AS (SELECT bucket, SUM(c) AS cnt_s FROM cnt WHERE lang <> 'en' GROUP BY 1),
      |tot AS (SELECT (SELECT COALESCE(SUM(cnt_t), 0) FROM tmodel) AS tot_t,
      |               (SELECT COALESCE(SUM(cnt_s), 0) FROM smodel) AS tot_s),
      |ratio AS (
      |  SELECT COALESCE(t.bucket, s.bucket) AS bucket,
      |    CAST(FLOOR(LN(
      |        (CAST(COALESCE(cnt_t, 0) + 1 AS DOUBLE) / CAST(tot_t + 4096 AS DOUBLE))
      |      / (CAST(COALESCE(cnt_s, 0) + 1 AS DOUBLE) / CAST(tot_s + 4096 AS DOUBLE))
      |    ) * 1000000) AS BIGINT) AS logratio_fp
      |  FROM tmodel t FULL OUTER JOIN smodel s ON t.bucket = s.bucket CROSS JOIN tot)
      |SELECT c.doc_id, CAST(SUM(c.c * r.logratio_fp) AS BIGINT) AS score
      |FROM cnt c JOIN ratio r ON c.bucket = r.bucket
      |WHERE c.lang <> 'en'
      |GROUP BY c.doc_id
      |ORDER BY score DESC, c.doc_id LIMIT 200""".stripMargin)

  /** q95's DSIR selection re-run over hashed BIGRAM profiles (Xie et
    * al.'s headline config — `ngrams = 2` in
    * [[graft.operators.Dsir.select]]): adjacent lowercased tokens join
    * with one space before hashing, so phrase structure (not just
    * vocabulary) drives the importance weights. The oracle rebuilds the
    * same bigrams relationally (list_filter → generate_series window →
    * array_to_string), with the identical fixed-point discipline and the
    * BIGINT-cast final sum the r14 dtype lesson mandates. Same 100 TB
    * shape as q95: one fused projection per doc, a 4096-row broadcast
    * ratio table, TakeOrderedAndProject. */
  val q101 = plan("q101_dsir_bigram",
    fn = (s, dir) => {
      val docs = graft.Tables.load(s, dir, "documents")
      import org.apache.spark.sql.functions.col
      graft.operators.Dsir.select(
          pool = docs.filter(col("lang") =!= "en"),
          target = docs.filter(col("lang") === "en"),
          k = 200, ngrams = 2)
        .select(col("doc_id"), col("score"))
    },
    duckSql = """WITH tokl AS (
      |  SELECT doc_id, lang,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |                t -> len(t) > 0) AS ts
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, lang,
      |    array_to_string(ts[CAST(i AS INT):CAST(i AS INT)+1], ' ') AS w
      |  FROM tokl, UNNEST(generate_series(1, len(ts)-1)) AS g(i)),
      |cnt AS (
      |  SELECT doc_id, lang,
      |      (POSITION(substr(md5(w),1,1) IN '0123456789abcdef')-1)*256
      |    + (POSITION(substr(md5(w),2,1) IN '0123456789abcdef')-1)*16
      |    + (POSITION(substr(md5(w),3,1) IN '0123456789abcdef')-1) AS bucket,
      |    COUNT(*) AS c
      |  FROM tok GROUP BY 1, 2, 3),
      |tmodel AS (SELECT bucket, SUM(c) AS cnt_t FROM cnt WHERE lang = 'en' GROUP BY 1),
      |smodel AS (SELECT bucket, SUM(c) AS cnt_s FROM cnt WHERE lang <> 'en' GROUP BY 1),
      |tot AS (SELECT (SELECT COALESCE(SUM(cnt_t), 0) FROM tmodel) AS tot_t,
      |               (SELECT COALESCE(SUM(cnt_s), 0) FROM smodel) AS tot_s),
      |ratio AS (
      |  SELECT COALESCE(t.bucket, s.bucket) AS bucket,
      |    CAST(FLOOR(LN(
      |        (CAST(COALESCE(cnt_t, 0) + 1 AS DOUBLE) / CAST(tot_t + 4096 AS DOUBLE))
      |      / (CAST(COALESCE(cnt_s, 0) + 1 AS DOUBLE) / CAST(tot_s + 4096 AS DOUBLE))
      |    ) * 1000000) AS BIGINT) AS logratio_fp
      |  FROM tmodel t FULL OUTER JOIN smodel s ON t.bucket = s.bucket CROSS JOIN tot)
      |SELECT c.doc_id, CAST(SUM(c.c * r.logratio_fp) AS BIGINT) AS score
      |FROM cnt c JOIN ratio r ON c.bucket = r.bucket
      |WHERE c.lang <> 'en'
      |GROUP BY c.doc_id
      |ORDER BY score DESC, c.doc_id LIMIT 200""".stripMargin)

  /** Dedup-aware sampling weights (SlimPajama / RefinedWeb methodology —
    * public): instead of HARD-dropping near-duplicates, keep them all but
    * weight each document 1/|cluster| so duplicated content isn't
    * over-represented in the training mix. Clusters here come from a
    * boilerplate-prefix fingerprint (md5 of the first 60 lowercased
    * chars — the shared-prefix near-dup shape web corpora exhibit);
    * the report gives, per language, raw docs, cluster count, and the
    * EFFECTIVE character mass Σ n_chars/|cluster|.
    *
    * Cross-engine exactness: the fractional weight is applied as ONE
    * fixed-point integer division per doc — `(n_chars·10^6) DIV k` —
    * then summed as BIGINT, so no float addition order can drift
    * (Spark `DIV` ≡ DuckDB `//` on BIGINT). Scale shape: two key
    * aggregations; the doc→cluster-size join is co-partitioned on the
    * fingerprint (the GROUP BY already shuffled both sides on fp), so
    * no second shuffle and no broadcast of an O(clusters) table;
    * clusters are never materialized as row sets. */
  val q103 = dialect("q103_dedup_weights",
    sparkSql = """WITH c AS (
      |  SELECT doc_id, lang, n_chars,
      |    md5(substring(lower(text), 1, 60)) AS fp
      |  FROM documents),
      |sz AS (SELECT fp, COUNT(*) AS k FROM c GROUP BY fp)
      |SELECT c.lang,
      |  COUNT(*) AS n_docs,
      |  COUNT(DISTINCT c.fp) AS n_clusters,
      |  CAST(SUM((c.n_chars * CAST(1000000 AS BIGINT)) DIV sz.k) AS BIGINT)
      |    AS eff_chars_fp
      |FROM c JOIN sz ON c.fp = sz.fp
      |GROUP BY c.lang ORDER BY c.lang""".stripMargin,
    duckSql = """WITH c AS (
      |  SELECT doc_id, lang, n_chars,
      |    md5(substring(lower(text), 1, 60)) AS fp
      |  FROM documents),
      |sz AS (SELECT fp, COUNT(*) AS k FROM c GROUP BY fp)
      |SELECT c.lang,
      |  COUNT(*) AS n_docs,
      |  COUNT(DISTINCT c.fp) AS n_clusters,
      |  CAST(SUM((c.n_chars * CAST(1000000 AS BIGINT)) // sz.k) AS BIGINT)
      |    AS eff_chars_fp
      |FROM c JOIN sz ON c.fp = sz.fp
      |GROUP BY c.lang ORDER BY c.lang""".stripMargin)

  def specs: Seq[QuerySpec] =
    Seq(q36, q37, q38, q39, q40, q41, q42, q43, q47, q48, q49, q50, q53, q54,
      q60, q61, q62, q67, q69, q78, q84, q85, q95, q101, q103)
}
