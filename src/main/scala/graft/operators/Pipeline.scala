package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftExtensions, Tables}

/** Flagship composition queries: the training-data pipeline stages chained
  * end-to-end, and the SQL-registered custom functions exercised from pure
  * SQL.
  */
object Pipeline {

  // PII shapes shared by query and oracle; kept alternation-free and
  // anchored on \b so Java regex (leftmost-first, backtracking) and RE2
  // (leftmost-longest) produce the identical match spans
  private val PiiEmail = "[a-z0-9._]+@[a-z0-9.]+"
  private val PiiIp =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private val PiiPhone = "\\b[0-9]{3}-[0-9]{4}\\b"

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------ pipeline
    // Clean-corpus pipeline: token-count quality gate -> exact dedup
    // (keep lowest doc_id per content fingerprint) -> stable output.
    // One narrow scan + one window shuffle on the fingerprint; at 100 TB
    // the fingerprint window is the canonical "keep one copy" shape
    // (16-byte keys, partial-agg-free but spill-safe).
    QueryDef("pp_clean_corpus",
      (s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id"),
          TextAnalysis.nTokens(col("text")).as("n_tokens"),
          md5(col("text").cast("binary")).as("fp"))
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        docs.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("n_tokens") >= 10)
          .select(col("doc_id"), col("n_tokens"), col("fp"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, n_tokens, fp FROM (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
             |    md5(text) AS fp,
             |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |  FROM documents) t
             |WHERE rn = 1 AND n_tokens >= 10
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ domain mix weights
    // Training-mix calibration: per `source` (domain) token counts and
    // the per-document sampling weight that rebalances the corpus to a
    // UNIFORM target mix (weight = target_share / actual_share — the
    // number a sampling pass multiplies into each doc's keep
    // probability; >1 = upsample, <1 = downsample). The whole job is
    // one map-side-combined aggregation to a domain-sized frame; the
    // corpus total rides an empty-partition window over that tiny
    // frame (the q98 trick), never a second corpus pass or a 1-row
    // cross join. Exact integer counts + single divisions — IEEE
    // identical on both engines.
    QueryDef("pp_mix_weights",
      (s, d) => {
        val perSrc = Tables.documents(s, d)
          .select(col("source"),
            TextAnalysis.nTokens(col("text")).as("n_tokens"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        val all = Window.partitionBy()
        perSrc
          .withColumn("total", sum(col("n_tokens")).over(all))
          .withColumn("n_sources", count(lit(1)).over(all))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            (col("n_tokens").cast("double") / col("total"))
              .as("actual_share"),
            (col("total").cast("double") /
              (col("n_sources") * col("n_tokens"))).as("weight"))
          .orderBy(col("source"))
      },
      Some("""WITH per_src AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(len(regexp_extract_all(text, '\S+')))
             |      AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY source)
             |SELECT source, n_docs, n_tokens,
             |  CAST(n_tokens AS DOUBLE) / (sum(n_tokens) OVER ())
             |    AS actual_share,
             |  CAST(sum(n_tokens) OVER () AS DOUBLE)
             |    / ((count(*) OVER ()) * n_tokens) AS weight
             |FROM per_src
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------ split
    // Deterministic train/eval split on a content hash — reproducible
    // across runs, machines, and repartitions (never random()): the
    // assignment is a pure narrow map, no shuffle at any scale. 90/10 on
    // the first 8 md5 hex digits.
    QueryDef("pp_train_test_split",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"),
            when(conv(substring(md5(col("text").cast("binary")), 1, 8),
              16, 10).cast("long") % 100 < 90, "train")
              .otherwise("eval").as("split"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
             |    % 100 < 90 THEN 'train' ELSE 'eval' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------ contamination
    // Benchmark-contamination check: for each held-out doc (doc_id % 25
    // = 0), the fraction of its distinct 3-word shingles that appear
    // anywhere in the train split. Shingles are pre-hashed to 8-byte keys
    // BEFORE the explode (md5Key60 — DuckDB computes the identical key, so
    // the oracle stays hash-exact): the distinct / left-join / aggregate
    // shuffles all carry longs, never ~25-char shingle strings — the
    // 100 TB shape, ~10x fewer shuffled bytes than joining on the text.
    QueryDef("pp_contamination",
      (s, d) => {
        import graft.functions.TextHashFunctions.{md5Key60, shingles}
        val sh = Tables.documents(s, d).select(col("doc_id"),
          explode(array_distinct(transform(shingles(col("text")), md5Key60(_))))
            .as("sh"))
        val bench = sh.filter(pmod(col("doc_id"), lit(25)) === 0)
        val train = sh.filter(pmod(col("doc_id"), lit(25)) =!= 0)
          .select(col("sh"), lit(1L).as("hit")).distinct()
        bench.join(train, Seq("sh"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            count(col("hit")).as("n_contaminated"))
          .withColumn("contamination",
            col("n_contaminated") / col("n_shingles"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH sh AS (
              |  SELECT doc_id, unnest(list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3
              |    THEN list_transform(range(1, len(toks)-1),
              |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |    ELSE [array_to_string(toks, ' ')] END,
              |    s -> ${graft.functions.TextHashFunctions.md5Key60Sql("s")}))) AS sh
              |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
              |        FROM documents) t),
              |train AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 25 <> 0),
              |bench AS (SELECT * FROM sh WHERE doc_id % 25 = 0)
              |SELECT b.doc_id, count(*) AS n_shingles,
              |  count(t.sh) AS n_contaminated,
              |  CAST(count(t.sh) AS DOUBLE) / count(*) AS contamination
              |FROM bench b LEFT JOIN train t ON b.sh = t.sh
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------------------------ sampling
    // Deterministic stratified sampling: up to 50 docs per language,
    // chosen by hash rank (md5Key60 of the text — DuckDB computes the
    // identical keys, so the SAMPLE ITSELF is oracle-checked, not just
    // its size). Reproducible across runs/machines/repartitions — never
    // rand(); the shuffle carries (lang, 8-byte key) only. At 100 TB the
    // per-stratum top-k is a WindowGroupLimit: partial top-50 per
    // partition BEFORE the language shuffle.
    QueryDef("pp_stratified_sample",
      (s, d) => {
        import graft.functions.TextHashFunctions.md5Key60
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("key"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), md5Key60(col("text")).as("key"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 50)
          .select(col("doc_id"), col("lang"), col("rk"))
          .orderBy(col("lang"), col("rk"))
      },
      Some(s"""SELECT doc_id, lang, rk FROM (
              |  SELECT doc_id, lang,
              |    CAST(row_number() OVER (PARTITION BY lang
              |      ORDER BY ${graft.functions.TextHashFunctions.md5Key60Sql("text")},
              |               doc_id) AS BIGINT) AS rk
              |  FROM documents) t
              |WHERE rk <= 50 ORDER BY lang, rk""".stripMargin)),

    // ------------------------------------------------------------ packing
    // Sequence packing (the pretraining concat-then-chunk shape): docs
    // are dealt into 8 hash shards, ordered deterministically within each
    // shard, and assigned to training sequences by integer-dividing the
    // running token count by the 2048-token budget. Each shard's window
    // is independent => 8-way parallel; at 100 TB the shard count scales
    // with the cluster and the running sum stays a single window pass.
    // All-BIGINT algebra (div, not /) so both engines bin identically.
    QueryDef("pp_sequence_pack",
      (s, d) => {
        import graft.functions.TextHashFunctions.md5Key60
        val docs = Tables.documents(s, d).select(col("doc_id"),
          TextAnalysis.nTokens(col("text")).as("n_tokens"),
          md5Key60(col("text")).as("key"))
          .withColumn("shard", pmod(col("key"), lit(8)))
        val w = Window.partitionBy(col("shard"))
          .orderBy(col("key"), col("doc_id"))
        docs.withColumn("cum", sum(col("n_tokens")).over(w))
          .withColumn("seq_id", expr("(cum - n_tokens) div 2048"))
          .select(col("doc_id"), col("shard"), col("seq_id"), col("n_tokens"))
          .orderBy(col("shard"), col("seq_id"), col("doc_id"))
      },
      Some(s"""SELECT doc_id, shard, (cum - n_tokens) // 2048 AS seq_id,
              |  n_tokens
              |FROM (
              |  SELECT doc_id, n_tokens, shard,
              |    CAST(sum(n_tokens) OVER (PARTITION BY shard
              |      ORDER BY key, doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS BIGINT) AS cum
              |  FROM (
              |    SELECT doc_id,
              |      CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
              |        AS n_tokens,
              |      ${graft.functions.TextHashFunctions.md5Key60Sql("text")} AS key,
              |      ${graft.functions.TextHashFunctions.md5Key60Sql("text")} % 8
              |        AS shard
              |    FROM documents) a) b
              |ORDER BY shard, seq_id, doc_id""".stripMargin)),

    // ------------------------------------------------------------ domains
    // URL/domain curation (the provenance-filtering stage of a web-scale
    // corpus): extract the registrable host from each document's source
    // URL, drop blocklisted domains with a BROADCAST anti join (the
    // blocklist is always dim-sized — never shuffle the corpus for it),
    // and keep per-domain document counts for the mix report. The corpus
    // has no URL column, so a deterministic pseudo-URL is derived per doc
    // (md5-seeded host, doc_id-seeded TLD — identical algebra in DuckDB),
    // making the oracle exact while the operator shape stays the real one:
    // narrow derive -> regexp_extract -> anti join -> hash agg.
    QueryDef("pp_url_domains",
      (s, d) => {
        import s.implicits._
        val urls = Tables.documents(s, d).select(col("doc_id"),
          concat(lit("https://www."),
            substring(md5(col("text").cast("binary")), 1, 1),
            lit(".example."),
            when(col("doc_id") % 3 === 0, "com")
              .when(col("doc_id") % 3 === 1, "org").otherwise("net"),
            lit("/doc/"), col("doc_id").cast("string")).as("url"))
        val dom = urls.select(col("doc_id"),
          regexp_extract(col("url"), "https?://([^/]+)/", 1).as("domain"))
        val blocked = (for { c <- "abcd"; tld <- Seq("com", "org", "net") }
          yield s"www.$c.example.$tld").toDF("domain")
        dom.join(broadcast(blocked), Seq("domain"), "left_anti")
          .groupBy(col("domain"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("sample_doc"))
          .orderBy(col("domain"))
      },
      Some("""WITH urls AS (
             |  SELECT doc_id,
             |    'https://www.' || substr(md5(text), 1, 1) || '.example.' ||
             |      CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
             |        ELSE 'net' END ||
             |      '/doc/' || CAST(doc_id AS STRING) AS url
             |  FROM documents),
             |dom AS (
             |  SELECT doc_id,
             |    regexp_extract(url, 'https?://([^/]+)/', 1) AS domain
             |  FROM urls)
             |SELECT domain, count(*) AS n_docs,
             |  CAST(min(doc_id) AS BIGINT) AS sample_doc
             |FROM dom
             |WHERE substr(domain, 5, 1) NOT IN ('a', 'b', 'c', 'd')
             |GROUP BY domain ORDER BY domain""".stripMargin)),

    // ------------------------------------------------------------ SQL fns
    // The custom Catalyst expressions through their SQL registration
    // (GraftExtensions), demoed in the shape that survives 100 TB: an
    // axis-sign LSH candidate equi-join (8 tables x 4 sign bits over the
    // first 32 dims) verified by graft_cosine — never an n^2 nested-loop
    // pair join. The bucketing is plain deterministic SQL (sign bits of
    // fixed dimensions), so DuckDB computes the IDENTICAL candidate set
    // and the oracle stays hash-exact; both query texts come from ONE
    // generator below so the two engines cannot drift.
    // ------------------------------------------------------------ PII
    // PII redaction pass (the scrubbing stage every training corpus runs
    // before release): emails / phone numbers / IPv4 literals replaced by
    // typed tags, with per-document match counts kept for audit. A narrow
    // single-pass projection — no shuffle but the output sort — so it
    // scales linearly and fuses into whole-stage codegen. The synthetic
    // corpus is pure [a-z ] text, so deterministic PII is INJECTED first
    // (derived from doc_id with identical integer algebra in both
    // engines): the oracle is non-vacuous by construction, with varying
    // per-type counts (emails on even ids, phones on ids % 3 = 0, an IP
    // always).
    QueryDef("pp_pii_redact",
      (s, d) => {
        val t = concat(
          col("text"),
          when(col("doc_id") % 2 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
            concat(lit(" call 555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), (expr("doc_id div 7") % 256).cast("string"))
        // three regex passes per row, all pre-shuffle: floor the scan
        // parallelism (Spread scaladoc; no-op at scale)
        Spread.spread(Tables.documents(s, d), col("doc_id"))
          .select(col("doc_id"), t.as("t"))
          .select(col("doc_id"),
            regexp_replace(regexp_replace(regexp_replace(col("t"),
              PiiEmail, "[EMAIL]"), PiiIp, "[IP]"), PiiPhone, "[PHONE]")
              .as("red_text"),
            regexp_count(col("t"), lit(PiiEmail)).cast("long").as("n_email"),
            regexp_count(col("t"), lit(PiiIp)).cast("long").as("n_ip"),
            regexp_count(col("t"), lit(PiiPhone)).cast("long").as("n_phone"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH injected AS (
             |  SELECT doc_id, text ||
             |    CASE WHEN doc_id % 2 = 0 THEN ' contact user' ||
             |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
             |    CASE WHEN doc_id % 3 = 0 THEN ' call 555-' ||
             |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
             |    ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
             |    CAST((doc_id // 7) % 256 AS VARCHAR) AS t
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(t,
             |    '[a-z0-9._]+@[a-z0-9.]+', '[EMAIL]', 'g'),
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
             |    '[IP]', 'g'),
             |    '\b[0-9]{3}-[0-9]{4}\b', '[PHONE]', 'g') AS red_text,
             |  CAST(len(regexp_extract_all(t,
             |    '[a-z0-9._]+@[a-z0-9.]+')) AS BIGINT) AS n_email,
             |  CAST(len(regexp_extract_all(t,
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
             |    AS BIGINT) AS n_ip,
             |  CAST(len(regexp_extract_all(t,
             |    '\b[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phone
             |FROM injected ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------ mixture
    // Temperature-based domain mixture resampling (the data-mixing stage
    // of pretraining: upweight tail domains, downweight the head — the
    // alpha=0.5 "square-root temperature" used by multilingual/multi-
    // source corpora). Per-domain acceptance rate = target * w_s / (S *
    // cnt_s) with w_s = floor(sqrt(cnt_s)*1e6) as an exact BIGINT, so the
    // cross-domain sum S is integer arithmetic in both engines (a raw
    // double fold's order is engine-dependent); acceptance is a
    // deterministic per-doc hash draw (md5Key60 / 2^60 — never rand()).
    // Shape at 100 TB: one dim-sized count agg, rates broadcast back,
    // narrow accept — the corpus is never shuffled.
    QueryDef("pp_domain_mixture",
      (s, d) => {
        import graft.functions.TextHashFunctions.md5Key60
        val docs = Tables.documents(s, d)
        val all = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val rates = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("wgt",
            floor(sqrt(col("cnt").cast("double")) * 1e6).cast("long"))
          .withColumn("s_wgt", sum(col("wgt")).over(all))
          .withColumn("total", sum(col("cnt")).over(all))
          // target corpus size: half the docs, re-mixed toward the tail
          .withColumn("rate",
            (expr("(total div 2) * wgt").cast("double") /
              expr("s_wgt * cnt").cast("double")))
          .select(col("source"), col("rate"))
        docs.select(col("doc_id"), col("source"),
            md5Key60(col("text")).as("key"))
          .join(broadcast(rates), "source")
          .select(col("doc_id"), col("source"),
            ((col("key").cast("double") /
              lit(1152921504606846976L).cast("double")) < col("rate"))
              .cast("long").as("kept"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH counts AS (
              |  SELECT source, CAST(count(*) AS BIGINT) AS cnt,
              |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT)
              |      AS wgt
              |  FROM documents GROUP BY 1),
              |rates AS (
              |  SELECT source,
              |    CAST(CAST(floor(CAST(sum(cnt) OVER () AS DOUBLE) / 2)
              |           AS BIGINT) * wgt AS DOUBLE)
              |      / CAST(CAST(sum(wgt) OVER () AS BIGINT) * cnt AS DOUBLE)
              |      AS rate
              |  FROM counts)
              |SELECT d.doc_id, d.source,
              |  CAST((CAST(${graft.functions.TextHashFunctions.md5Key60Sql("d.text")} AS DOUBLE)
              |    / CAST(1152921504606846976 AS DOUBLE)) < r.rate AS BIGINT)
              |    AS kept
              |FROM documents d JOIN rates r USING (source)
              |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------ budget
    // Token-budget corpus selection: keep the highest-quality docs until a
    // global token budget (half the corpus) is spent — greedy prefix of
    // the (quality DESC, doc_id) order. The 100 TB shape is the point: NO
    // global sort. Quality is bucketed (integer ppm stopword density div
    // 1000); one dim-sized bucket agg + a tiny cumulative decide each
    // bucket as keep-all / drop-all / partial, and only the SINGLE
    // partial bucket's docs pay a window — 1/buckets of the corpus
    // through one partition, everything else a narrow broadcast-tagged
    // map. The DuckDB oracle runs the global-window form, so the
    // equivalence of the bucketed plan to the global greedy prefix is
    // itself hash-checked. All-BIGINT quality/budget algebra.
    QueryDef("pp_token_budget",
      (s, d) => {
        val t = col("text")
        val stops = size(regexp_extract_all(t,
          lit("\\b(the|a|and|of|to|in|is|it)\\b"), lit(0))).cast("long")
        val base = Tables.documents(s, d)
          .select(col("doc_id"), TextAnalysis.nTokens(t).as("n_tokens"),
            stops.as("n_stop"))
          .withColumn("q", coalesce(
            expr("(n_stop * 1000000) div nullif(n_tokens, 0)"), lit(-1L)))
          .withColumn("bkt", expr("q div 1000"))
        val all = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val wDesc = Window.orderBy(col("bkt").desc)
        val cls = base.groupBy(col("bkt"))
          .agg(sum(col("n_tokens")).as("btok"))
          .withColumn("cum", sum(col("btok")).over(wDesc))
          .withColumn("budget", expr("sum(btok) over () div 2"))
          .withColumn("above", col("cum") - col("btok"))
          .select(col("bkt"),
            when(col("cum") <= col("budget"), lit("all"))
              .when(col("above") >= col("budget"), lit("none"))
              .otherwise(lit("partial")).as("cls"),
            (col("budget") - col("above")).as("remaining"))
        val tagged = base.join(broadcast(cls), "bkt")
        val wIn = Window.partitionBy(col("bkt"))
          .orderBy(col("q").desc, col("doc_id"))
        val outCols = Seq(col("doc_id"), col("q"), col("n_tokens"),
          col("kept"))
        tagged.filter(col("cls") === "partial")
          .withColumn("cumin", sum(col("n_tokens")).over(wIn))
          .withColumn("kept",
            (col("cumin") <= col("remaining")).cast("long"))
          .select(outCols: _*)
          .unionByName(tagged.filter(col("cls") =!= "partial")
            .withColumn("kept", (col("cls") === "all").cast("long"))
            .select(outCols: _*))
          .orderBy(col("doc_id"))
      },
      Some("""WITH scored AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
             |      AS n_tokens,
             |    coalesce(
             |      (CAST(len(regexp_extract_all(text,
             |         '\b(the|a|and|of|to|in|is|it)\b')) AS BIGINT) * 1000000)
             |      // nullif(CAST(len(regexp_extract_all(text, '\S+'))
             |                AS BIGINT), 0),
             |      -1) AS q
             |  FROM documents),
             |budget AS (
             |  SELECT CAST(sum(n_tokens) AS BIGINT) // 2 AS b FROM scored),
             |ranked AS (
             |  SELECT doc_id, q, n_tokens,
             |    CAST(sum(n_tokens) OVER (ORDER BY q DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum
             |  FROM scored)
             |SELECT r.doc_id, r.q, r.n_tokens,
             |  CAST(r.cum <= b.b AS BIGINT) AS kept
             |FROM ranked r, budget b
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("pp_sql_functions",
      (s, d) => {
        GraftExtensions.register(s)
        // scan-parallelism floor for the per-vector band/cosine CPU
        // (see Spread scaladoc; no-op at scale)
        Spread.spread(Tables.embeddings(s, d), col("vec_id"))
          .createOrReplaceTempView("v_embeddings")
        s.sql(signLshSql("v_embeddings", "element_at", "graft_cosine",
          sparkForm = true))
      },
      Some(signLshSql("embeddings", "list_extract", "list_cosine_similarity",
        sparkForm = false))),

    // ------------------------------------------------------------ sharding
    // Deterministic global shuffle + sharding — the last step of every
    // training-data pipeline: each document lands in a content-addressed
    // shard and a pseudo-random (but fully reproducible) position within
    // it. Never rand(): the order is a hash of (doc_id, text), so any
    // re-run, any partitioning, any engine produces the identical layout
    // (the oracle checks the SHUFFLE itself, not just shard sizes).
    //
    // 100 TB shape: shard assignment is a narrow map; the within-shard
    // ordering is one window per shard — in the writer this is
    // repartition(shard) + sortWithinPartitions(key), a single shuffle
    // carrying (doc_id, 8-byte key) per row, then shard files stream out
    // in order. Skew-free by construction: md5 spreads keys uniformly.
    QueryDef("pp_shard_shuffle",
      (s, d) => {
        import graft.functions.TextHashFunctions.md5Key60
        val w = Window.partitionBy(col("shard"))
          .orderBy(col("key"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            md5Key60(concat(col("doc_id").cast("string"), lit(":"),
              col("text"))).as("key"))
          .withColumn("shard", pmod(col("key"), lit(16L)))
          .withColumn("ord", row_number().over(w).cast("long"))
          .select(col("doc_id"), col("shard"), col("ord"))
          .orderBy(col("shard"), col("ord"))
      },
      Some(s"""SELECT doc_id, shard, ord FROM (
              |  SELECT doc_id, key % 16 AS shard,
              |    CAST(row_number() OVER (PARTITION BY key % 16
              |      ORDER BY key, doc_id) AS BIGINT) AS ord
              |  FROM (SELECT doc_id,
              |    ${graft.functions.TextHashFunctions
                      .md5Key60Sql("doc_id || ':' || text")} AS key
              |    FROM documents) t) u
              |ORDER BY shard, ord""".stripMargin))
  )

  /** One SQL text for both engines (Spark / DuckDB): `extractFn` is the
    * 1-based array-index function name, `cosineFn` the cosine-similarity
    * function. Candidates come from an equi-join on (table, bucket); the
    * only non-equi predicate is the a<b pair ordering, applied as a
    * residual on the equi-join — the plan is broadcast/shuffle hash join,
    * never BroadcastNestedLoopJoin.
    *
    * The buckets CTE differs by engine in FORM only (both expand the same
    * per-band bit expressions from one generator, so the two engines
    * cannot drift semantically): the Spark side uses the `stack` generator
    * — ONE scan of the source emitting 8 (t, bkt) rows per vector, where
    * the portable UNION ALL form would rescan the source once per band
    * and twice more through the self-join (16 scans); DuckDB has no
    * `stack`, and the oracle runs once at a small SF where form is
    * irrelevant, so it keeps the UNION ALL.
    */
  private def signLshSql(src: String, extractFn: String, cosineFn: String,
                         sparkForm: Boolean): String = {
    def bktExpr(t: Int): String = (1 to 4).map { b =>
      val dim = t * 4 + b
      val weight = 1 << (4 - b)
      s"CAST(($extractFn(embedding, $dim) > 0) AS INT) * $weight"
    }.mkString(" + ")
    val bands =
      if (sparkForm)
        s"""  SELECT vec_id, t, bkt FROM (
           |    SELECT vec_id, stack(8,
           |${(0 until 8).map(t => s"      $t, ${bktExpr(t)}").mkString(",\n")}
           |    ) AS (t, bkt) FROM $src)""".stripMargin
      else
        (0 until 8).map(t => s"  SELECT vec_id, $t AS t, ${bktExpr(t)} AS bkt FROM $src")
          .mkString("\n  UNION ALL\n")
    s"""WITH buckets AS (
       |$bands
       |),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM buckets a JOIN buckets b ON a.t = b.t AND a.bkt = b.bkt
       |  WHERE a.vec_id < b.vec_id
       |)
       |SELECT c.a_id, c.b_id
       |FROM cand c
       |JOIN $src ea ON ea.vec_id = c.a_id
       |JOIN $src eb ON eb.vec_id = c.b_id
       |WHERE $cosineFn(ea.embedding, eb.embedding) >= 0.45
       |ORDER BY a_id, b_id""".stripMargin
  }
}
