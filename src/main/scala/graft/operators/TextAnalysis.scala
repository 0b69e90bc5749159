package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. Heuristics are
  * implemented twice — as codegen'd Column expressions here and as the
  * equivalent ANSI SQL oracle — so the driver's DuckDB gate verifies the
  * exact arithmetic, not just row counts.
  */
object TextAnalysis {

  /** Tiny per-language stopword tables for the n-gram/stopword-ratio
    * language heuristic. Scoring = |tokens in list| / |tokens|. */
  val StopwordTable: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"),
    "it" -> Seq("il", "la", "di", "che", "e", "un", "per", "con", "del", "non"),
  )

  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => length(t) > lit(0))

  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Best-language struct (score, lang) from a materialized token-array
    * column — shared by q36 and the composed [[DocumentPipeline]] so the
    * fused single-scan pipeline computes the identical signal. */
  def langBestStruct(toks: Column): Column = {
    val scoreCols = StopwordTable.map { case (lang, words) =>
      struct((stopwordHits(toks, words).cast("double") / size(toks)).as("score"),
        lit(lang).as("lang"))
    }
    sort_array(array(scoreCols: _*), asc = false)(0)
  }

  /** q36 — language-ID heuristic: stopword-hit ratio per language, argmax
    * (ties -> lexicographically first language). */
  def q36LangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // single-row-group scan + heavy per-doc scoring kernel: fan out so the
    // stopword-hit pass uses every core (Dedup.fanOutSmallScan; no-op at
    // real corpus split counts) — r19 measured A/B
    Dedup.fanOutSmallScan(documents(s, dir))
      .withColumn("best", langBestStruct(tokens($"text")))
      .select($"doc_id".cast("long").as("doc_id"),
        $"best.lang".as("pred_lang"), round($"best.score", 6).as("score"))
      // scan->project->sort has NO exchange below the sort, so the range
      // sampler would re-run the whole per-doc scoring pass (operators.Answer)
      .transform(Answer.sorted(_, $"doc_id"))
  }

  val q36Sql: String = {
    val score = StopwordTable.map { case (lang, words) =>
      val inList = words.map(w => s"'$w'").mkString(", ")
      s"(len(list_filter(toks, t -> t IN ($inList)))::DOUBLE / len(toks)) AS s_$lang"
    }.mkString(",\n  ")
    // argmax, ties broken by lang DESC — identical to Spark's struct sort
    // over (score, lang) with asc=false.
    val langs = StopwordTable.map(_._1)
    val structs = langs.map(l => s"{'score': s_$l, 'lang': '$l'}").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS toks FROM documents
       |), sc AS (
       |  SELECT doc_id,
       |  $score
       |  FROM t
       |), best AS (
       |  SELECT doc_id, list_sort([$structs], 'DESC')[1] AS b FROM sc
       |)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, b.lang AS pred_lang, round(b.score, 6) AS score
       |FROM best ORDER BY doc_id""".stripMargin
  }

  /** q37 — quality scoring: length, mean token length, stopword ratio,
    * punctuation ratio (all exact-integer-derived, round(6)). */
  /** Quality-signal columns (n_tok, mean_tok_len, stop_ratio, punct_ratio)
    * from materialized text + token-array columns — shared by q37 and the
    * composed [[DocumentPipeline]]. */
  def qualitySignals(text: Column, toks: Column): Seq[Column] = {
    val enWords = StopwordTable.head._2
    val n = size(toks)
    Seq(n.cast("long").as("n_tok"),
      round(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / n, 6)
        .as("mean_tok_len"),
      round(stopwordHits(toks, enWords).cast("double") / n, 6).as("stop_ratio"),
      round((length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("double")
        / length(text), 6).as("punct_ratio"))
  }

  def q37Quality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.fanOutSmallScan(documents(s, dir))
      .select(($"doc_id".cast("long").as("doc_id") +:
        qualitySignals($"text", tokens($"text"))): _*)
      .transform(Answer.sorted(_, $"doc_id"))
  }

  val q37Sql: String = {
    val inList = StopwordTable.head._2.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, text, list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS toks FROM documents
       |)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_tok,
       |  round(list_aggregate(list_transform(toks, t -> len(t)), 'sum')::DOUBLE / len(toks), 6) AS mean_tok_len,
       |  round(len(list_filter(toks, t -> t IN ($inList)))::DOUBLE / len(toks), 6) AS stop_ratio,
       |  round((len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE / len(text), 6) AS punct_ratio
       |FROM t ORDER BY doc_id""".stripMargin
  }

  /** q38 — token counting: whitespace tokens and a BPE-ish regex token
    * count (alnum runs + single non-alnum marks). */
  def q38TokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.fanOutSmallScan(documents(s, dir))
      .select($"doc_id".cast("long").as("doc_id"),
        size(tokens($"text")).cast("long").as("ws_tokens"),
        size(regexp_extract_all($"text", lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .cast("long").as("re_tokens"))
      .orderBy($"doc_id")
  }

  val q38Sql: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(len(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS re_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q39 — document fingerprint: position-weighted rolling hash over
    * tokens, all arithmetic kept exact (<2^53 per term) and mod 1e6+3 so
    * Spark and DuckDB agree bit-for-bit. Token hash = first 8 hex digits
    * of md5. */
  def q39Fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val hashed = transform(toks, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    val fp = aggregate(
      zip_with(hashed, sequence(lit(1), size(toks)), (h, p) => pmod(h * p, lit(1000003L))),
      lit(0L), (acc, v) => pmod(acc + v, lit(1000003L)))
    Dedup.fanOutSmallScan(documents(s, dir))
      .select($"doc_id".cast("long").as("doc_id"), fp.as("fingerprint"))
      .orderBy($"doc_id")
  }

  val q39Sql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS toks FROM documents
      |), h AS (
      |  SELECT doc_id, [(('0x' || substr(md5(toks[i]), 1, 8))::BIGINT * i) % 1000003 FOR i IN range(1, len(toks)+1)] AS hs FROM t
      |)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(list_aggregate(hs, 'sum') % 1000003 AS BIGINT) AS fingerprint
      |FROM h ORDER BY doc_id""".stripMargin

  /** q44 — token-budget data mixing: the sampling step of a training-data
    * pipeline that caps each source's contribution at a token budget.
    * Per source, docs are taken in a DETERMINISTIC pseudo-random order
    * (md5 of the text — identical in Spark and DuckDB, so the oracle gates
    * the whole selection) and kept while the running whitespace-token
    * total stays within the budget. One window over a shuffle on `source`;
    * at corpus scale the partition key is the source and the budget bounds
    * the OUTPUT per source regardless of input size. Heavily skewed
    * sources would salt the hash order into sub-buckets with per-bucket
    * sub-budgets — not needed at these SFs. */
  def q44TokenBudgetMix(s: SparkSession, dir: String, budget: Long = 800): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"ord", $"doc_id")
    documents(s, dir)
      .select($"doc_id".cast("long").as("doc_id"), $"source",
        size(tokens($"text")).cast("long").as("n_tokens"), md5($"text").as("ord"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .filter($"cum_tokens" <= budget)
      .select($"doc_id", $"source", $"n_tokens", $"cum_tokens")
      .orderBy($"doc_id")
  }

  val q44Sql: String =
    """WITH t AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
      |    CAST(len(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS BIGINT) AS n_tokens,
      |    md5(text) AS ord
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, source, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      |  FROM t
      |)
      |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
      |FROM c WHERE cum_tokens <= 800 ORDER BY doc_id""".stripMargin

  /** q54 — SALTED token-budget mixing: q44's documented skew answer as
    * gated code. q44's window puts every row of one source in a single
    * task — correct, but a 100 TB corpus dominated by one source
    * serializes on it. Salting splits each source's budget into `salts`
    * deterministic sub-budgets keyed by doc_id % salts, so the window
    * partition key becomes (source, salt) and the heaviest source fans
    * out over `salts` tasks. The selection is deterministic but
    * intentionally different from q44's (each sub-window fills
    * independently); the under-fill vs the unsalted budget is bounded by
    * salts x max doc tokens, the usual salting trade. */
  def q54TokenBudgetMixSalted(s: SparkSession, dir: String, budget: Long = 800,
      salts: Int = 4): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source", $"salt").orderBy($"ord", $"doc_id")
    documents(s, dir)
      .select($"doc_id".cast("long").as("doc_id"), $"source",
        ($"doc_id" % salts).cast("long").as("salt"),
        size(tokens($"text")).cast("long").as("n_tokens"), md5($"text").as("ord"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .filter($"cum_tokens" <= budget / salts)
      .select($"doc_id", $"source", $"salt", $"n_tokens", $"cum_tokens")
      .orderBy($"doc_id")
  }

  val q54Sql: String =
    """WITH t AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
      |    CAST(doc_id % 4 AS BIGINT) AS salt,
      |    CAST(len(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS BIGINT) AS n_tokens,
      |    md5(text) AS ord
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, source, salt, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY source, salt ORDER BY ord, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      |  FROM t
      |)
      |SELECT doc_id, source, salt, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
      |FROM c WHERE cum_tokens <= 200 ORDER BY doc_id""".stripMargin

  /** q46 — deterministic per-source downsampling, the standard
    * training-mix rebalancing op (keep 100% of a high-quality source, 10%
    * of a crawl): a document is kept when the first 8 hex digits of
    * md5(source:doc_id) fall below the source's rate threshold (fixed-
    * width lowercase hex compares lexicographically == numerically, and
    * md5 renders identically in Spark and DuckDB, so the oracle gates the
    * exact selection). Stateless row-local predicate — at corpus scale
    * this is a pure filter pushdown-adjacent scan: no shuffle, no window,
    * embarrassingly parallel, reproducible across runs and engines.
    * Rates cycle by source number: 1.0, 0.5, 0.25, 0.1. */
  def q46HashSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Lazy when(rlike) guard: under ANSI mode a bare cast would throw on
    // the empty string regexp_extract yields for digit-less source names.
    // Those coalesce to sentinel 3 → the otherwise (0.1) branch, matching
    // the oracle (TRY_CAST(NULLIF(…)) → NULL % 4 → CASE ELSE; a bare
    // CAST('' AS INT) would hard-error in DuckDB) and the pre-ANSI
    // behavior where a null pmod fell through to otherwise.
    val srcN = coalesce(
      when($"source".rlike("\\d+$"),
        regexp_extract($"source", "(\\d+)$", 1).cast("int")),
      lit(3))
    val thr = when(pmod(srcN, lit(4)) === 0, lit("zzzzzzzz")) // 1.0: above any hex
      .when(pmod(srcN, lit(4)) === 1, lit("80000000"))        // 0.5
      .when(pmod(srcN, lit(4)) === 2, lit("40000000"))        // 0.25
      .otherwise(lit("19999999"))                        // 0.1
    documents(s, dir)
      .select($"doc_id".cast("long").as("doc_id"), $"source",
        substring(md5(concat_ws(":", $"source", $"doc_id")), 1, 8).as("h8"))
      .filter($"h8" < thr)
      .orderBy($"doc_id")
  }

  val q46Sql: String =
    """WITH t AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
      |    substr(md5(concat_ws(':', source, doc_id)), 1, 8) AS h8,
      |    TRY_CAST(NULLIF(regexp_extract(source, '(\d+)$', 1), '') AS INT) % 4 AS m
      |  FROM documents
      |)
      |SELECT doc_id, source, h8 FROM t
      |WHERE h8 < CASE m WHEN 0 THEN 'zzzzzzzz' WHEN 1 THEN '80000000'
      |                  WHEN 2 THEN '40000000' ELSE '19999999' END
      |ORDER BY doc_id""".stripMargin

  /** q47 — corpus vocabulary extraction by document frequency (the
    * tokenizer-building / stopword-mining primitive): distinct tokens per
    * document, global df count, deterministic top-k (df desc, token asc).
    * One explode + one count shuffle; the top-k is a single ordered limit
    * (TakeOrderedAndProject — no global sort materialization at scale). */
  def q47VocabTopK(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id", explode(array_distinct(tokens($"text"))).as("token"))
      .groupBy($"token").agg(count(lit(1)).cast("long").as("df"))
      .orderBy($"df".desc, $"token")
      .limit(k)
  }

  val q47Sql: String =
    """SELECT token, CAST(count(*) AS BIGINT) AS df
      |FROM (SELECT doc_id, unnest(list_distinct(list_filter(string_split(lower(text), ' '), t -> len(t) > 0))) AS token
      |      FROM documents)
      |GROUP BY token ORDER BY df DESC, token LIMIT 20""".stripMargin

  /** q55 — classifier evaluation harness: confusion matrix of the q36
    * language-ID heuristic against the corpus's ground-truth `lang`
    * column. A training-data pipeline has to VALIDATE its filters, not
    * just run them — this is the eval shape (works for any per-doc
    * classifier joined to a labeled sample). One join + one count
    * aggregate; ground truth is usually a small labeled slice, so at
    * scale the join side is broadcast. */
  def q55LangEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pred = q36LangId(s, dir).select($"doc_id", $"pred_lang")
    documents(s, dir)
      .select($"doc_id".cast("long").as("doc_id"), $"lang")
      .join(pred, "doc_id")
      .groupBy($"lang", $"pred_lang").agg(count(lit(1)).cast("long").as("n"))
      .orderBy($"lang", $"pred_lang")
  }

  /** q55 oracle — q36's oracle as a CTE joined to the ground truth. */
  val q55Sql: String =
    s"""WITH pred AS (
       |${q36Sql}
       |)
       |SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
       |FROM documents d JOIN pred p ON CAST(d.doc_id AS BIGINT) = p.doc_id
       |GROUP BY d.lang, p.pred_lang ORDER BY lang, pred_lang""".stripMargin

  /** q53 — corpus-statistics quality score: the CCNet idea of scoring each
    * document against a corpus-level language model, reduced to exact
    * rational arithmetic (no logs, no transcendentals) so the DuckDB
    * oracle gates the numbers bit-for-bit. Per document: mean document
    * frequency of its token occurrences, and the fraction of occurrences
    * whose token is corpus-rare — rare self-calibrates as df below half
    * the corpus median df, so the operator needs no magic constant tied
    * to corpus size. Low mean_df / high rare_frac flags gibberish and OCR
    * noise; anomalously high mean_df flags boilerplate.
    *
    * Scale shape: one distinct-token explode + groupBy builds the df
    * table (vocabulary-sized — orders smaller than the corpus), a
    * two-value broadcast carries the median threshold, and the occurrence
    * join is vocabulary vs corpus tokens: AQE broadcasts the df side
    * until the vocabulary genuinely outgrows the executors, at which
    * point the token key is the shuffle key for both sides. One per-doc
    * aggregate ends the pipeline. */
  def q53CorpusStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val occ = documents(s, dir)
      .select($"doc_id".cast("long").as("doc_id"),
        explode(tokens($"text")).as("token"))
    val dfv = documents(s, dir)
      .select(explode(array_distinct(tokens($"text"))).as("token"))
      .groupBy($"token").agg(count(lit(1)).cast("long").as("df"))
    val thresh = dfv.agg((median($"df") / 2).as("rare_below"))
    occ.join(dfv, "token").crossJoin(broadcast(thresh))
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum($"df").cast("long").as("sum_df"),
        sum(when($"df" < $"rare_below", 1L).otherwise(0L)).cast("long").as("n_rare"))
      .select($"doc_id", $"n_tokens",
        round($"sum_df".cast("double") / $"n_tokens", 6).as("mean_df"),
        round($"n_rare".cast("double") / $"n_tokens", 6).as("rare_frac"))
      .orderBy($"doc_id")
  }

  /** q53 oracle — identical rational arithmetic in DuckDB. */
  val q53Sql: String =
    """WITH occ AS (
      |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS token
      |  FROM documents
      |), dfv AS (
      |  SELECT token, count(DISTINCT doc_id) AS df FROM occ GROUP BY token
      |), th AS (
      |  SELECT median(df) / 2 AS rare_below FROM dfv
      |)
      |SELECT CAST(o.doc_id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  round(sum(df)::DOUBLE / count(*), 6) AS mean_df,
      |  round(sum(CASE WHEN df < rare_below THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS rare_frac
      |FROM occ o JOIN dfv USING (token) CROSS JOIN th
      |GROUP BY o.doc_id ORDER BY doc_id""".stripMargin

  /** q49 — repetition-based quality signals (the Gopher-rules family):
    * duplicate-token fraction (1 - distinct/total), top-token frequency
    * fraction, duplicate-bigram fraction. Everything is computed with
    * row-local array arithmetic — size/array_distinct/zip_with — so the
    * operator is a pure projection over the corpus scan: no explode, no
    * shuffle, embarrassingly parallel at 100 TB. The top-token count is
    * O(tokens * distinct) per row, bounded by document length — cheaper
    * than the explode + two-level groupBy alternative, which would
    * shuffle every token of the corpus. All fractions exact-integer-
    * derived, round(6), so the DuckDB oracle gates the arithmetic. */
  /** Repetition-signal columns (dup_tok_frac, top_tok_frac,
    * dup_bigram_frac) from a materialized token-array column — shared by
    * q49 and the composed [[DocumentPipeline]]. Null for empty token
    * arrays (the negative-length bigram slice must not evaluate; CaseWhen
    * branches lazily). */
  def repetitionSignals(toks: Column): Seq[Column] = {
    val n = size(toks)
    val bigrams = zip_with(
      slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => concat_ws(" ", a, b))
    val maxc = array_max(transform(array_distinct(toks),
      d => size(filter(toks, t => t === d))))
    Seq(when(n > 0,
        round(lit(1.0) - size(array_distinct(toks)).cast("double") / n, 6))
        .as("dup_tok_frac"),
      when(n > 0, round(maxc.cast("double") / n, 6)).as("top_tok_frac"),
      when(n < lit(2), when(n > 0, lit(0.0))).otherwise(
        round(lit(1.0) - size(array_distinct(bigrams)).cast("double") / (n - 1), 6))
        .as("dup_bigram_frac"))
  }

  def q49Repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.fanOutSmallScan(documents(s, dir))
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") > 0)
      .select(($"doc_id".cast("long").as("doc_id") +:
        size($"toks").cast("long").as("n_tok") +:
        repetitionSignals($"toks")): _*)
      .transform(Answer.sorted(_, $"doc_id"))
  }

  val q49Sql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
      |  FROM documents
      |), b AS (
      |  SELECT doc_id, toks, len(toks) AS n,
      |    [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))] AS bigrams,
      |    list_max(list_transform(list_distinct(toks),
      |      d -> len(list_filter(toks, x -> x = d)))) AS maxc
      |  FROM t WHERE len(toks) > 0
      |)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(n AS BIGINT) AS n_tok,
      |  round(1.0 - len(list_distinct(toks))::DOUBLE / n, 6) AS dup_tok_frac,
      |  round(maxc::DOUBLE / n, 6) AS top_tok_frac,
      |  CASE WHEN n < 2 THEN 0.0
      |       ELSE round(1.0 - len(list_distinct(bigrams))::DOUBLE / (n - 1), 6) END
      |    AS dup_bigram_frac
      |FROM b ORDER BY doc_id""".stripMargin

  /** q40 — sessionization (streaming-shape computed in batch): session
    * boundary = gap > 30 min; per-user session and event counts. The same
    * logic drives the Structured Streaming path (graft.streaming). */
  def q40Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
    val gapNs = 30L * 60 * 1000000000L
    val ev = events(s, dir)
    ev
      .withColumn("ts_ns", tsEpochNanos(ev))
      .withColumn("prev_ts", lag($"ts_ns", 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_ts".isNull || ($"ts_ns" - $"prev_ts") > gapNs, 1L).otherwise(0L))
      .groupBy($"user_id")
      .agg(sum($"new_sess").cast("long").as("n_sessions"),
        count(lit(1)).cast("long").as("n_events"))
      .select($"user_id".cast("long").as("user_id"), $"n_sessions", $"n_events")
      .orderBy($"user_id")
  }

  val q40Sql: String =
    """WITH x AS (
      |  SELECT user_id, epoch_ns(ts) AS tns, event_id,
      |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_tns
      |  FROM events
      |)
      |SELECT CAST(user_id AS BIGINT) AS user_id,
      |  CAST(sum(CASE WHEN prev_tns IS NULL OR tns - prev_tns > 1800000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q41 — multimodal plumbing baseline: opaque binary payload metadata
    * (byte length + md5) — the schema/partitioning shape media pipelines
    * use; real decode kernels live in graft.operators.Multimodal. */
  def q41BinaryMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id".cast("long").as("doc_id"),
        octet_length($"text").cast("long").as("n_bytes"),
        md5($"text").as("content_md5"))
      .orderBy($"doc_id")
  }

  val q41Sql: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q58 — unigram language-model quality score (the CCNet-style LM
    * filtering proxy): fit a unigram LM on the corpus itself (token
    * frequency / total tokens) and score each document by its mean
    * negative log-probability. Low scores = highly predictable, repeated
    * boilerplate; high scores = rare-token noise (OCR garbage, code in a
    * prose corpus) — pipelines keep the middle band. Per-token surprisal
    * also yields `max_nll` for spotting single-junk-token docs.
    *
    * Scale shape: one token explode, one frequency aggregate on the
    * token key, one hash-join back on the same key (co-partitioned with
    * the aggregate's shuffle), one per-doc aggregate — identical plan
    * skeleton to q53, O(corpus tokens) shuffle, no window, no self-join.
    * The corpus total rides along as a 1-row broadcast (the q53
    * threshold pattern). */
  def q58UnigramLogprob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val occ = documents(s, dir)
      .select($"doc_id".cast("long").as("doc_id"),
        explode(tokens($"text")).as("token"))
    val uf = occ.groupBy($"token").agg(count(lit(1)).cast("long").as("cnt"))
    val tot = uf.agg(sum($"cnt").cast("double").as("tot"))
    // cross-engine float rule: per-token nll quantizes to micro-nats (a
    // BIGINT) BEFORE aggregation so the per-doc sums are exact and
    // associative — a raw double avg() is partial-aggregation-order
    // dependent and could round differently from the oracle at a 6th-
    // decimal boundary.
    occ.join(uf, "token").crossJoin(broadcast(tot))
      .withColumn("nll6", round(-log($"cnt" / $"tot") * 1e6d, 0).cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum($"nll6").as("sum6"), max($"nll6").as("max6"))
      .select($"doc_id", $"n_tokens",
        round($"sum6".cast("double") / $"n_tokens" / 1e6d, 6).as("mean_nll"),
        round($"max6".cast("double") / 1e6d, 6).as("max_nll"))
      .orderBy($"doc_id")
  }

  /** q59 — sequence packing: lay documents end-to-end into fixed-size
    * training context windows (GPT-style packing with document
    * boundaries), the last preprocessing step before tokenized shards
    * are written. Documents are concatenated in a deterministic
    * shuffle order (md5 of text, the q54 ordering) within each
    * (shard = doc_id % shards) stream, and a document lands in the
    * window its cumulative token offset falls into; `win_off` is its
    * start offset inside the window. Oversized documents (> ctx) simply
    * span windows — real packers split them; the window id of the START
    * token is still well-defined and that is what is emitted.
    *
    * Scale shape: the running sum is a window partitioned by the SHARD
    * key, so parallelism is `shards` (set ~ cluster cores; each shard's
    * stream is one training-data writer's worth of work, exactly how
    * packed shards are produced in practice). No join, one shuffle on
    * the shard key. */
  def q59SequencePacking(s: SparkSession, dir: String, ctx: Long = 512,
      shards: Int = 8): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard").orderBy($"ord", $"doc_id")
    documents(s, dir)
      .select($"doc_id".cast("long").as("doc_id"),
        ($"doc_id" % shards).cast("long").as("shard"),
        size(tokens($"text")).cast("long").as("n_tokens"),
        md5($"text").as("ord"))
      .withColumn("end_off", sum($"n_tokens").over(w))
      .withColumn("start_off", $"end_off" - $"n_tokens")
      // win_id must be INTEGER floor-division like the oracle's `//`: a
      // double `/ ctx` only agrees while ctx is a power of two and
      // offsets stay below 2^53 — `div` keeps the arithmetic in longs
      .select($"doc_id", $"shard", $"n_tokens",
        expr(s"start_off div ${ctx}L").as("win_id"),
        pmod($"start_off", lit(ctx)).cast("long").as("win_off"))
      .orderBy($"doc_id")
  }

  /** q59 oracle — the same shard-partitioned running sum in DuckDB. */
  val q59Sql: String =
    """WITH t AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    CAST(doc_id % 8 AS BIGINT) AS shard,
      |    CAST(len(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS BIGINT) AS n_tokens,
      |    md5(text) AS ord
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, shard, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
      |  FROM t
      |)
      |SELECT doc_id, shard, n_tokens,
      |  CAST(start_off // 512 AS BIGINT) AS win_id,
      |  CAST(start_off % 512 AS BIGINT) AS win_off
      |FROM c ORDER BY doc_id""".stripMargin

  /** q58 oracle — identical unigram arithmetic in DuckDB: natural log,
    * the same micro-nat quantization, exact BIGINT sums. */
  val q58Sql: String =
    """WITH occ AS (
      |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS token
      |  FROM documents
      |), uf AS (
      |  SELECT token, count(*) AS cnt FROM occ GROUP BY token
      |), tot AS (SELECT sum(cnt)::DOUBLE AS tot FROM uf),
      |q AS (
      |  SELECT occ.doc_id,
      |    CAST(round(-ln(uf.cnt / tot.tot) * 1e6, 0) AS BIGINT) AS nll6
      |  FROM occ JOIN uf USING (token) CROSS JOIN tot
      |)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(count(*) AS BIGINT) AS n_tokens,
      |  round(CAST(sum(nll6) AS DOUBLE) / count(*) / 1e6, 6) AS mean_nll,
      |  round(CAST(max(nll6) AS DOUBLE) / 1e6, 6) AS max_nll
      |FROM q GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
