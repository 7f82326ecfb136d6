package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Fingerprint

/** Text-analysis operators for a training-data pipeline over `documents`:
  * token statistics, quality scoring, language-ID heuristic, BPE-ish token
  * estimation, and document fingerprinting (custom codegen Expression).
  *
  * All per-document metrics use integer/exact arithmetic (or deterministic
  * double division of exact integers) so every query is hash-checkable
  * against a DuckDB oracle. Everything is a narrow map over the scan —
  * no shuffle at all until an aggregate; at 100 TB these run at full scan
  * throughput with column pruning (only `text` + keys read).
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Shared equi-width length band: width 100 chars, top band open-ended
    * at 19. The ONE definition behind q114's histogram bucket, q129's
    * drift band, and the streaming [[graft.streaming.EventStream
    * .bandDriftFeed]] — the stream joins a baseline produced by the batch
    * banding, so divergent copies would silently attach a baseline share
    * for a different band than the live count's. */
  def lengthBand(charsExpr: String): org.apache.spark.sql.Column =
    expr(s"least(($charsExpr) div 100, 19L)")

  /** Per-document token statistics + rolling-hash fingerprint. */
  def q30TextStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    docs(s, dir)
      .withColumn("ws", split($"text", " "))
      .select(
        $"doc_id",
        size($"ws").cast("long").as("n_words"),
        size(array_distinct($"ws")).cast("long").as("n_distinct_words"),
        length($"text").cast("long").as("n_chars"),
        // exact ints → deterministic double division
        ((length($"text") - (size($"ws") - 1)).cast("double") /
          size($"ws").cast("double")).as("avg_word_len"),
        expr("graft_fingerprint(text)").as("fingerprint"))
      .orderBy($"doc_id")
  }

  /** THE language predictor: ONE definition of the stopword set and the
    * hits·20 >= n_words threshold, shared by the q31 scorer and the q97
    * agreement audit — the audit must test the classifier actually used,
    * so the two can never drift apart. Adds `ws`, `n_words`, `stop_hits`,
    * `pred_lang`. */
  private[graft] def withLangPrediction(df: DataFrame): DataFrame =
    df.withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")))
      .withColumn("stop_hits",
        size(expr("filter(ws, w -> w = 'the' OR w = 'a' OR w = 'of')")))
      .withColumn("pred_lang",
        when(col("stop_hits") * 20 >= col("n_words"), "en").otherwise("unknown"))

  /** Language-ID heuristic (stopword-profile), quality score, token counts.
    * The heuristic is deliberately simple and *portable*: integer stopword
    * hits vs document length — the op's value is the distributed shape
    * (pure narrow map), not linguistic sophistication. */
  def q31LangQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withLangPrediction(docs(s, dir))
      .select(
        $"doc_id", $"source", $"lang", $"pred_lang",
        $"stop_hits".cast("long").as("stop_hits"),
        // distinct-word ratio ×1000, integer-exact
        (size(array_distinct($"ws")).cast("long") * 1000 / $"n_words".cast("long"))
          .cast("long").as("quality_millis"),
        $"n_words".cast("long").as("ws_tokens"),
        ceil(length($"text") / lit(4.0)).cast("long").as("bpe_tokens_est"))
      .orderBy($"doc_id")
  }

  /** TF-IDF keyword extraction: top-3 terms per document scored by
    * `tf × idf_milli` where `idf_milli = (N·1000) div df` — an integer
    * rational instead of `ln(N/df)` so the score is portable (libm log
    * differs across engines in the last bit). Shape: explode → two keyed
    * aggregations (term-frequency per doc, document-frequency per term) →
    * broadcast-join df (vocabulary is small relative to corpus) → window
    * top-k. At 100 TB the df table is the only global state and it is
    * vocabulary-sized, not corpus-sized. */
  def q49Tfidf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    // corpus size stays a LAZY broadcast 1-row aggregate (q71's rule:
    // constructing this DataFrame must not run a job) — an eager count()
    // here cost a second full corpus scan at plan-construction time
    val nDocs = d.agg(count(lit(1)).as("n_total"))
    val words = d.select($"doc_id", explode(split($"text", " ")).as("word"))
    val tf = words.groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val dfreq = words.select($"doc_id", $"word").distinct()
      .groupBy($"word").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_milli", expr("(n_total * 1000) div df"))
      .withColumn("score", $"tf" * $"idf_milli")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"score".desc, $"word")
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"doc_id", $"rk", $"word", $"tf", $"df", $"score")
      .orderBy($"doc_id", $"rk")
  }

  /** SimHash (16-bit) per document from word-level rolling hashes:
    * explode words → per-bit signed votes → assemble bits. Distributed
    * shape: one shuffle on doc_id (the explode is narrow); at scale this
    * is the standard map-reduce simhash. */
  def q35Simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    val words = docs(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .select($"doc_id", expr("graft_fingerprint(word)").as("hw"))
    val bits = s.range(0, 16).select($"id".cast("int").as("b"))
    words.crossJoin(broadcast(bits))
      .groupBy($"doc_id", $"b")
      .agg(sum(when(expr("(hw >> b) & 1") === 1, 1).otherwise(-1)).as("vote"))
      .select($"doc_id",
        when($"vote" > 0, expr("shiftleft(1L, b)")).otherwise(0L).as("v"))
      .groupBy($"doc_id")
      .agg(sum($"v").cast("long").as("simhash"))
      .orderBy($"doc_id")
  }

  /** Exact-k deterministic sample per stratum: rank documents by a content
    * hash priority and keep the k best — the hash-priority analogue of
    * reservoir sampling (A-Res with a deterministic priority), giving an
    * exactly-k, replayable, content-keyed sample per language. One window
    * per stratum, no global shuffle beyond the partitioning. */
  def q61SampleTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    Fingerprint.register(s)
    val k = 20
    val w = Window.partitionBy($"lang").orderBy($"pri", $"doc_id")
    // coalesce: a NULL text must hash (to the id-only priority), not rank
    // NULL — Spark and DuckDB disagree on NULLS FIRST/LAST defaults, so a
    // NULL priority would silently diverge the selected sample
    docs(s, dir)
      .select($"lang", $"doc_id",
        expr("graft_fingerprint(concat(coalesce(text, ''), CAST(doc_id AS STRING)))").as("pri"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"lang", $"rk", $"doc_id", $"pri")
      .orderBy($"lang", $"rk")
  }

  /** Deterministic stratified sampling — the training-data-mixing primitive:
    * per language stratum, keep documents whose content fingerprint lands in
    * 2 of 10 hash buckets (a content-keyed ~20% sample; re-running over a
    * grown corpus keeps previously-selected docs selected, unlike
    * `TABLESAMPLE`/`rand()`). Pure narrow map + one aggregate: scales at
    * scan throughput. The portable hash makes the exact sample replayable
    * in any engine — this is the property that turns sampling from a
    * statistical claim into an auditable one. */
  def q55StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    docs(s, dir)
      .select($"lang", $"doc_id",
        (expr("graft_fingerprint(text)") % 10).as("bucket"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_total"),
        sum(when($"bucket" < 2, 1L).otherwise(0L)).as("n_sampled"),
        sum(when($"bucket" < 2, $"doc_id")).as("sampled_id_sum"))
      .orderBy($"lang")
  }

  /** X36 — BPE-ish regex tokenization (the mandate's "whitespace + a BPE-ish
    * regex" token counter), run over the `events.props` JSON strings — the
    * corpus's only mixed-class text (letters, digits, punctuation). The
    * splitter is the classic pre-tokenizer shape: letter runs | digit runs
    * | single non-alnum symbols, with a 4-chars-per-BPE-unit subword
    * estimate folded per token.
    *
    * Scale: `regexp_extract_all` + higher-order filter/aggregate are all
    * narrow codegen'd expressions — token statistics at scan throughput,
    * then one partial-aggregable groupBy on the 5-value event_type key
    * (tiny reducer fan-in; the salting rewrite in q72 is the fallback if
    * the key set were hot). */
  def q75Tokenize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select($"event_type", expr(
        "regexp_extract_all(props, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)").as("toks"))
      .select($"event_type",
        size($"toks").cast("long").as("n_toks"),
        expr("CAST(size(filter(toks, t -> t RLIKE '^[A-Za-z]')) AS BIGINT)").as("n_alpha"),
        expr("CAST(size(filter(toks, t -> t RLIKE '^[0-9]')) AS BIGINT)").as("n_num"),
        expr("aggregate(toks, 0L, (a, t) -> a + ((length(t) + 3) div 4))").as("bpe"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"n_toks").as("n_tokens"),
        sum($"n_alpha").as("n_alpha"),
        sum($"n_num").as("n_num"),
        sum($"n_toks" - $"n_alpha" - $"n_num").as("n_punct"),
        sum($"bpe").as("bpe_units"))
      .orderBy($"event_type")
  }

  /** X80 — equi-width length histogram per language: documents bucketed by
    * character count (width 100, top bucket open-ended) with per-bucket
    * count and length extrema — the length-distribution profile that
    * informs chunking (X58) and trimming (X45) thresholds, as a first-class
    * operator instead of an eyeballed notebook plot.
    *
    * Scale: bucket assignment is integer math in the scan projection; the
    * aggregation is combinable and its result frame is |langs| × 20 — a
    * narrow map plus one tiny shuffle, nothing else. */
  def q114LengthHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"lang", $"n_chars",
        lengthBand("n_chars").as("bucket"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"),
        sum($"n_chars").as("sum_chars"))
      .orderBy($"lang", $"bucket")
  }

  /** X94 — distribution-drift monitor: compare the length distribution of
    * two corpus snapshots (deterministic even/odd doc_id split standing in
    * for old/new feeds) band by band, in integer ppm shares with absolute
    * drift per band — the L1-style drift report a training-data pipeline
    * alerts on when a new crawl shifts the corpus shape. Integer shares
    * instead of a PSI: PSI's ln() is engine-inexact, while Σ|Δppm| ranks
    * drifts identically for monitoring purposes.
    *
    * Scale: two combinable band aggs over one scan pass each (the split
    * predicate is scan math); the drift frame is band-cardinality-sized,
    * joined after both sides broadcast their 1-row totals. */
  def q129DistributionDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def bands(snapshot: DataFrame): DataFrame = {
      val b = snapshot
        .select(lengthBand("n_chars").as("band"))
        .groupBy($"band").agg(count(lit(1)).as("n"))
      val tot = b.agg(sum($"n").as("t"))
      b.crossJoin(broadcast(tot))
        .select($"band", $"n", expr("n * 1000000 div t").as("share_ppm"))
    }
    val docs = Tables.load(s, dir, "documents").select($"doc_id", $"n_chars")
    val a = bands(docs.filter($"doc_id" % 2 === 0))
      .select($"band", $"n".as("n_a"), $"share_ppm".as("share_a_ppm"))
    val c = bands(docs.filter($"doc_id" % 2 =!= 0))
      .select($"band", $"n".as("n_b"), $"share_ppm".as("share_b_ppm"))
    a.join(c, Seq("band"), "full_outer")
      .select($"band",
        coalesce($"n_a", lit(0L)).as("n_a"),
        coalesce($"n_b", lit(0L)).as("n_b"),
        coalesce($"share_a_ppm", lit(0L)).as("share_a_ppm"),
        coalesce($"share_b_ppm", lit(0L)).as("share_b_ppm"))
      .withColumn("drift_ppm",
        abs($"share_a_ppm" - $"share_b_ppm"))
      .orderBy($"band")
  }

  /** X106 — KS-style ECDF drift: the maximum cumulative-share gap between
    * two corpus snapshots' length distributions — the finer-grained
    * complement to q129's banded drift (a Kolmogorov-Smirnov distance in
    * integer ppm instead of a sup over real-valued ECDFs, so it is
    * engine-exact). Snapshots are the deterministic doc_id parity halves;
    * the report is the 10 lengths where the distributions diverge most.
    *
    * Scale: one combinable (length) aggregate with both snapshot counts as
    * conditional sums (the corpus is scanned ONCE); the cumulative walk is
    * an unpartitioned window — legitimate because it runs on the
    * length-histogram frame (|distinct lengths| rows, driver-sized), never
    * on the corpus (q112's horizon-window argument). Totals attach via a
    * broadcast 1-row aggregate, not a count(*) window. */
  def q140KsDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = docs(s, dir)
      .select(($"doc_id" % 2).as("grp"), $"n_chars".as("len"))
      .groupBy($"len")
      .agg(sum(when($"grp" === 0, 1L).otherwise(0L)).as("ca"),
        sum(when($"grp" === 1, 1L).otherwise(0L)).as("cb"))
    val totals = counts.agg(sum($"ca").as("ta"), sum($"cb").as("tb"))
    val wCum = Window.orderBy($"len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum_a", sum($"ca").over(wCum))
      .withColumn("cum_b", sum($"cb").over(wCum))
      .crossJoin(broadcast(totals))
      .select($"len", $"cum_a", $"cum_b",
        expr("cum_a * 1000000 div ta").as("f_a_ppm"),
        expr("cum_b * 1000000 div tb").as("f_b_ppm"))
      .withColumn("gap_ppm", abs($"f_a_ppm" - $"f_b_ppm"))
      .orderBy($"gap_ppm".desc, $"len")
      .limit(10)
  }

  /** X109 — deterministic weighted sampling (hash-priority analogue of
    * Efraimidis-Spirakis A-ES): draw 100 documents with inclusion odds
    * ∝ token count by ranking on priority = fingerprint div (n_tokens+1)
    * and keeping the k smallest — a uniform hash scaled down by the
    * weight, so heavy documents sink to the front. The float-free
    * integer-division priority is engine-exact and replayable under
    * retries (X15/X22's replay argument, now with weights): re-running
    * selects the SAME sample, and adding documents never flips the
    * relative order of existing ones.
    *
    * Scale: one narrow projection (fingerprint + token count ride the
    * scan) and a driver-k TakeOrdered — no shuffle at all. The sample is
    * auditable: the priority column IS the proof of membership. */
  def q143WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    docs(s, dir)
      .select($"doc_id",
        size(split($"text", " ")).cast("long").as("n_toks"),
        expr("graft_fingerprint(concat(coalesce(text, ''), CAST(doc_id AS STRING)))")
          .as("fp"))
      .withColumn("pri", expr("fp div (n_toks + 1)"))
      .select($"doc_id", $"n_toks", $"pri")
      .orderBy($"pri", $"doc_id")
      .limit(100)
  }

  /** X115 — per-source length-concentration audit (Gini coefficient in
    * integer ppm): how unequally document mass is distributed within each
    * source, via the rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)
    * over ascending-sorted lengths — the corpus-balance signal that flags
    * a source whose token budget is dominated by a few giant documents
    * (mixture weighting by doc count then over-trains on those). All
    * integer arithmetic on exact ranks: engine-portable, no float Lorenz
    * interpolation.
    *
    * Scale: the rank is a row_number over ONE source partitioning (each
    * source's frame sorts within its own partition — no global sort), and
    * the Gini fold is a combinable per-source aggregate of three sums.
    * The report frame is |sources| rows. */
  def q148GiniAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"source").orderBy($"n_chars", $"doc_id")
    docs(s, dir)
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        sum($"rk" * $"n_chars").as("rank_mass"))
      .withColumn("gini_ppm", expr(
        "(2 * rank_mass - (n_docs + 1) * total_chars) * 1000000" +
          " div (n_docs * total_chars)"))
      .orderBy($"source")
  }

  /** X119 — per-group exact-k sampling: the k lowest hash priorities
    * WITHIN each language — completing the deterministic sampling family
    * (X22 global exact-k, X15 stratified percentage, X109 weighted) with
    * the per-stratum quota draw every balanced eval set needs. Same
    * priority convention as q61 so the samples compose.
    *
    * Scale: ONE language partitioning carries the rank; k rows survive
    * per group before anything widens. No global sort, no driver-side
    * per-group loops — a 10⁵-language corpus costs the same one
    * shuffle. */
  def q152GroupSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    Fingerprint.register(s)
    val k = 10
    val w = Window.partitionBy($"lang").orderBy($"pri", $"doc_id")
    docs(s, dir)
      .select($"lang", $"doc_id",
        expr("graft_fingerprint(concat(coalesce(text, ''), CAST(doc_id AS STRING)))")
          .as("pri"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"lang", $"rk", $"doc_id", $"pri")
      .orderBy($"lang", $"rk")
  }

  /** THE planted-URL projection (X123's ground truth): every document gets
    * one https URL on a doc_id-derived domain; every fifth doc a second
    * http URL on the sibling domain. ONE definition shared by the q156
    * domain report and the q159 blocklist gate — q159's oracle derives
    * "blocked" purely from this plant's id rule, so a drift between two
    * copies would silently break the blocked ⟺ id%10==3 equivalence. */
  private def withPlantedUrls(df: DataFrame): DataFrame =
    df.withColumn("t2", concat(coalesce(col("text"), lit("")),
      lit(" see https://site"), ((pmod(col("doc_id"), lit(40L)) * 2654435761L) % 40L).cast("string"),
      lit(".example.org/p/"), (col("doc_id") % 7L).cast("string"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" and http://m"), ((pmod(col("doc_id"), lit(40L)) * 2654435761L) % 40L).cast("string"),
          lit(".example.net/q"))).otherwise(lit("")),
      lit(" ok")))

  /** X123 — URL/domain extraction report: the provenance histogram every
    * web-scraped corpus needs before domain-level filtering (blocklists,
    * per-domain caps). Ground truth is planted deterministically — every
    * document gets one https URL on a doc_id-derived domain, docs with
    * doc_id % 5 = 0 a second http URL on a sibling domain — so hit counts,
    * per-domain reach and shares are all independently checkable.
    *
    * The detector extracts the authority of every http(s) URL (capture
    * group 1), then aggregates per domain: total hits, distinct documents
    * reached, and corpus share in integer ppm.
    *
    * Scale: the extraction is a narrow codegen'd regexp pass (≤2 URLs per
    * doc here; bounded by text size in general); ONE combinable shuffle on
    * the domain key (count and count_distinct both partial-aggregate); the
    * grand total joins back as a broadcast 1-row aggregate (q90's rule:
    * never a window over the report frame); report is |domains|-sized. */
  def q156UrlDomains(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planted = withPlantedUrls(docs(s, dir))
    val hits = planted.select($"doc_id",
      explode(expr("regexp_extract_all(t2, 'https?://([A-Za-z0-9.-]+)', 1)"))
        .as("domain"))
    val total = hits.agg(count(lit(1)).as("total_hits"))
    hits.groupBy($"domain")
      .agg(count(lit(1)).as("n_hits"), countDistinct($"doc_id").as("n_docs"))
      .crossJoin(broadcast(total))
      .select($"domain", $"n_hits", $"n_docs",
        expr("n_hits * 1000000 div total_hits").as("share_ppm"))
      .orderBy($"n_hits".desc, $"domain")
  }

  /** X124 — encoding-health audit: the mojibake/control-character scan a
    * corpus assembled from heterogeneous crawls runs before tokenization
    * (a tokenizer happily learns 'Ã©' as a type). Three independent planted
    * defects — a UTF-8-as-Latin-1 mojibake sequence (doc_id % 11), a BEL
    * control character (doc_id % 13), a U+FFFD replacement character
    * (doc_id % 17) — make every per-source count checkable.
    *
    * Detectors: control chars via an explicit C0 class (tab/newline/CR
    * excluded), mojibake via the 'Ã' + continuation shape, replacement
    * chars by exact-char occurrence count (length delta under replace —
    * cheaper than a regex for a single fixed code point).
    *
    * Scale: all three detectors are narrow codegen'd passes at scan
    * throughput; ONE combinable shuffle to the |sources| report frame. */
  def q158EncodingAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .withColumn("t2", concat(coalesce($"text", lit("")),
        when($"doc_id" % 11 === 0, lit(" cafÃ©")).otherwise(lit("")),
        when($"doc_id" % 13 === 0, lit("\u0007")).otherwise(lit("")),
        when($"doc_id" % 17 === 0, lit("�")).otherwise(lit(""))))
      .withColumn("c_ctrl", size(regexp_extract_all($"t2",
        lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), lit(0))).cast("long"))
      .withColumn("c_moji", size(regexp_extract_all($"t2",
        lit("Ã."), lit(0))).cast("long"))
      .withColumn("c_repl",
        (length($"t2") - length(expr("replace(t2, '�', '')"))).cast("long"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"c_ctrl" > 0, 1L).otherwise(0L)).as("docs_ctrl"),
        sum(when($"c_moji" > 0, 1L).otherwise(0L)).as("docs_moji"),
        sum(when($"c_repl" > 0, 1L).otherwise(0L)).as("docs_repl"),
        sum(when($"c_ctrl" === 0 && $"c_moji" === 0 && $"c_repl" === 0, 1L)
          .otherwise(0L)).as("docs_clean"),
        sum($"c_ctrl").as("n_ctrl"), sum($"c_moji").as("n_moji"),
        sum($"c_repl").as("n_repl"))
      .withColumn("clean_ppm", expr("docs_clean * 1000000 div n_docs"))
      .orderBy($"source")
  }

  /** X126 — domain-blocklist filter: the policy gate downstream of X123's
    * provenance report — documents citing any blocklisted domain are
    * dropped, per-source survival is reported. The blocklist here is the
    * 8 domains whose planted id ≡ 3 (mod 10), spanning both the
    * `.example.org` and `.example.net` families, so the verdict for every
    * document is independently derivable from the q156 plant rule (both
    * of a document's planted domains share one id — blocked ⟺
    * (doc_id·2654435761) mod 40 ≡ 3 mod 10).
    *
    * The operator itself derives nothing from the rule: it re-extracts
    * domains and joins them against an explicit blocklist relation — the
    * real shape (blocklists arrive as data, not predicates).
    *
    * Scale: extraction is narrow; the blocklist is policy-sized →
    * broadcast semi-join (a 10⁶-row blocklist still broadcasts); hit doc
    * ids collapse by distinct BEFORE rejoining the corpus (left_anti
    * carries only the key column); per-source report is one combinable
    * shuffle. The corpus text payload never moves. */
  def q159BlocklistFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planted = withPlantedUrls(docs(s, dir))
    val blocklist = (0 until 40).filter(_ % 10 == 3)
      .flatMap(i => Seq(s"site$i.example.org", s"m$i.example.net"))
      .toDF("domain")
    val blockedDocs = planted
      .select($"doc_id",
        explode(expr("regexp_extract_all(t2, 'https?://([A-Za-z0-9.-]+)', 1)"))
          .as("domain"))
      .join(broadcast(blocklist), Seq("domain"), "left_semi")
      .select($"doc_id").distinct()
    val base = planted.select($"doc_id", $"source")
    val kept = base.join(blockedDocs, Seq("doc_id"), "left_anti")
      .groupBy($"source").agg(count(lit(1)).as("kept_raw"))
    // left join from the full source frame: a source whose every document
    // is blocked must still report (kept = 0), not vanish
    base.groupBy($"source").agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq("source"), "left")
      .withColumn("kept_docs", coalesce($"kept_raw", lit(0L)))
      .select($"source", $"n_docs", $"kept_docs",
        ($"n_docs" - $"kept_docs").as("blocked_docs"))
      .withColumn("blocked_ppm", expr("blocked_docs * 1000000 div n_docs"))
      .orderBy($"source")
  }

  /** X134 — robust length-outlier audit per language: exact lower median
    * and MAD of document length from a cumulative walk over the per-lang
    * LENGTH histogram (X97's discipline moved from event values to corpus
    * curation), flagging documents beyond 3 MADs — the trim gate that
    * does not move when the outliers themselves grow, unlike the
    * quantile band of q86.
    *
    * Scale: the only corpus-sized aggregation is the (lang, n_chars)
    * histogram (combinable); every window after it operates on the
    * histogram frame, and the deviation histogram re-keys the value
    * histogram — documents are scanned ONCE. No approx_percentile
    * sketch drift; pure integer rank math. */
  def q167MadLengthOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy($"lang")
    val cumV = byLang.orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumD = byLang.orderBy($"dev")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, dir)
      .groupBy($"lang", $"n_chars").agg(count(lit(1)).as("c"))
      .withColumn("cumc", sum($"c").over(cumV))
      .withColumn("n", sum($"c").over(byLang))
      .withColumn("median_chars",
        min(when($"cumc" * 2 >= $"n", $"n_chars")).over(byLang))
      .groupBy($"lang", abs($"n_chars" - $"median_chars").as("dev"))
      .agg(sum($"c").as("c"), max($"n").as("n"),
        max($"median_chars").as("median_chars"))
      .withColumn("cumd", sum($"c").over(cumD))
      .withColumn("mad_chars",
        min(when($"cumd" * 2 >= $"n", $"dev")).over(byLang))
      .groupBy($"lang")
      .agg(max($"n").as("n_docs"), max($"median_chars").as("median_chars"),
        max($"mad_chars").as("mad_chars"),
        sum(when($"dev" > $"mad_chars" * 3, $"c").otherwise(0L))
          .as("n_outliers"))
      .orderBy($"lang")
  }

  /** X154 — character-4-gram compressibility surrogate: the ratio of
    * DISTINCT overlapping 4-char grams to total grams, in integer ppm —
    * a dictionary-coder (LZ) proxy: heavily templated/repetitive text
    * compresses well and scores LOW, diverse prose scores HIGH. The
    * char-level cousin of q70's word-run signal and the per-document
    * form of the corpus-level q94 coverage; Gopher-class filters gate on
    * exactly this kind of compression heuristic.
    *
    * Scale: entirely narrow — the gram array is built and de-duplicated
    * inside one codegen'd HOF projection per row (never shuffled); the
    * per-source rollup is a combinable aggregate. Gram count is
    * length-3 per doc, so cost is O(chars)/row at scan throughput. */
  def q186Compressibility(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
      .filter(length(coalesce($"text", lit(""))) >= 4)
      .withColumn("n_grams", (length($"text") - 3).cast("long"))
      .withColumn("n_distinct", size(expr(
        """array_distinct(transform(sequence(1, CAST(length(text) AS INT) - 3),
          |  i -> substring(text, i, 4)))""".stripMargin)).cast("long"))
      .withColumn("distinct_ppm", expr("n_distinct * 1000000 div n_grams"))
    d.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_grams").as("n_grams"),
        sum($"n_distinct").as("n_distinct"),
        min($"distinct_ppm").as("min_ppm"),
        max($"distinct_ppm").as("max_ppm"),
        sum($"distinct_ppm").as("sum_ppm"))
      .withColumn("mean_ppm", expr("sum_ppm div n_docs"))
      .orderBy($"source")
  }

  /** X169 — per-source language purity: the share of each source's
    * documents whose PREDICTED language agrees with the metadata tag, in
    * integer ppm — q97's agreement matrix collapsed to the per-source
    * verdict a crawl triage reads first ("which feed's language labels
    * can we trust?"). CONSUMES [[withLangPrediction]] — the same
    * classifier the matrix audits, so the two reports cannot drift.
    *
    * Scale: narrow predictor pass + ONE combinable \|sources\| fold. */
  def q201LangPurity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withLangPrediction(docs(s, dir))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"pred_lang" === $"lang", 1L).otherwise(0L)).as("n_agree"))
      .withColumn("purity_ppm", expr("n_agree * 1000000 div n_docs"))
      .orderBy($"source")
  }

  /** The q252 non-ASCII plant dictionary, indexed by doc_id % 8. Class 0 is
    * the pure-ASCII control; the rest walk the UTF-8 encoder's ranges:
    * Latin-1 accents and the 2-byte min U+00A2 / max U+07FF, Greek, CJK
    * and the 3-byte min U+0800, astral-plane emoji (4-byte), a ZWJ emoji
    * sequence (multi-codepoint grapheme), and the 4-byte min U+10000.
    * Shared verbatim by the Spark plant, the DuckDB oracle literal, and
    * the spec's driver replay — one definition, three consumers. */
  private[graft] val Utf8Plant: IndexedSeq[String] = IndexedSeq(
    "",
    " café Ñandú",
    " λόγος",
    " 中文文本测试",
    " 🙂🚀",
    " 👩‍👩‍👧 family",
    " ¢߿ࠀ�",
    " 𐀀𝕏 end")

  /** q264 script ranges, ONE definition re-escaped per engine (q259's
    * discipline): `\x{...}` classes parse in both Java regex and RE2, but
    * Spark SQL string literals process backslashes while DuckDB's do
    * not — [[scriptSparkLit]] doubles them for the Spark leg. */
  private[graft] val LatinClass = """[A-Za-z]"""
  private[graft] val GreekClass = """[\x{0370}-\x{03FF}]"""
  private[graft] val CyrillicClass = """[\x{0400}-\x{04FF}]"""
  private[graft] val CjkClass = """[\x{4E00}-\x{9FFF}]"""
  private[graft] val ConfusableClass = """[\x{0370}-\x{03FF}\x{0400}-\x{04FF}]"""
  private[graft] def scriptSparkLit(p: String): String = p.replace("\\", "\\\\")

  /** q264 planted ground truth (disjoint negative-id range): a pure-Latin
    * control, a Cyrillic-а homoglyph spoof of a Latin word, legitimate
    * single-script Cyrillic and CJK documents (must NOT flag), a Greek-ρ
    * homoglyph, and a multilingual doc whose scripts mix only ACROSS
    * words (normal, must NOT flag); -507 is -504's pure-Latin twin so
    * q265's skeleton fold has a planted collision for BOTH confusable
    * scripts (-501 pairs with -502 the same way). */
  private[graft] val ScriptPlant: Seq[(Long, String)] = Seq(
    -501L -> "paypal account login today",
    -502L -> "p\u0430ypal account login today",
    -503L -> "\u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440 \u0442\u0435\u043a\u0441\u0442",
    -504L -> "\u03c1aypal verification notice",
    -507L -> "paypal verification notice",
    -505L -> "\u4e2d\u6587\u6587\u672c\u6d4b\u8bd5 \u5185\u5bb9",
    -506L -> "hello \u043f\u0440\u0438\u0432\u0435\u0442 bonjour \u4e16\u754c")

  /** q265's confusable→Latin skeleton map (a practical subset of the
    * UTS #39 confusables table: the Cyrillic and Greek letters that are
    * pixel-identical or near-identical to Latin in common fonts — NOT the
    * full table, which maps thousands of codepoints; the subset is the
    * curated-policy shape a real pipeline ships, and extending it is a
    * data change, not a code change). All BMP codepoints, so per-char
    * translate() maps identically in Spark and DuckDB. */
  private[graft] val ConfusablesFrom =
    "\u0430\u0435\u043e\u0440\u0441\u0445\u0443\u0456\u0455\u0458" + // lowercase Cyrillic
    "\u0410\u0412\u0415\u041a\u041c\u041d\u041e\u0420\u0421\u0422\u0425" + // uppercase Cyrillic
    "\u03bf\u03b1\u03c1\u03bd\u03c5\u03b9\u03ba" // Greek
  private[graft] val ConfusablesTo = "aeopcxyisj" + "ABEKMHOPCTX" + "oapvuik"

  /** X234 — confusable-skeleton dedup (q264's EXECUTION twin, the
    * detection→execution discipline): map each document through
    * NFC + the confusable→Latin skeleton and re-fingerprint — the
    * UTS #39 "skeleton" recipe that makes homoglyph-masked duplicates
    * collide. Reported clusters are skeleton-equal groups still DISTINCT
    * after NFC alone (n_nfc_variants ≥ 2), so the output isolates
    * exactly the mass only confusable folding recovers — q256 catches
    * same-codepoint encodings, this catches look-alike codepoints.
    * The q264 plant supplies ground truth: the Cyrillic and Greek
    * spoofed documents each collide with their pure-Latin twins.
    *
    * Scale: one narrow normalize+translate+fingerprint pass at scan
    * throughput, one hash aggregation on the skeleton fingerprint. */
  def q265SkeletonDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    graft.functions.NfcNormalize.register(s)
    val sk = s"translate(graft_nfc(coalesce(text, ''))," +
      s" '$ConfusablesFrom', '$ConfusablesTo')"
    docs(s, dir).select($"doc_id", $"text")
      .unionByName(ScriptPlant.toDF("doc_id", "text"))
      .select($"doc_id",
        expr("graft_fingerprint(graft_nfc(coalesce(text, '')))").as("fp_nfc"),
        expr(s"graft_fingerprint($sk)").as("fp_skeleton"))
      .groupBy($"fp_skeleton")
      .agg(min($"doc_id").as("min_doc_id"), count(lit(1)).as("n_docs"),
        countDistinct($"fp_nfc").as("n_nfc_variants"))
      .filter($"n_docs" >= 2 && $"n_nfc_variants" >= 2)
      .select($"min_doc_id", $"n_docs", $"n_nfc_variants", $"fp_skeleton")
      .orderBy($"min_doc_id")
  }

  /** X233 — script-mix / homoglyph-spoof audit: confusable-script
    * substitution (a Cyrillic а or Greek ρ inside a Latin word) is the
    * classic phishing/spoofing obfuscation AND a dedup evader — byte-keyed
    * stages see a brand-new document. Per document: codepoint counts by
    * script class (Latin/Greek/Cyrillic/CJK, each a codegen'd
    * length-difference over a single-codepoint regex class — no per-char
    * HOF), the count of WORDS mixing Latin with a confusable script (the
    * spoof signal — scripts mixing across words is just multilingual
    * text and does not flag), and the verdict. Composes with q256: NFC
    * normalizes encodings of the SAME codepoints; this catches different
    * codepoints that merely LOOK alike.
    *
    * Scale: narrow codegen'd regex passes plus one word-level HOF (words,
    * not chars) at scan throughput; zero shuffles before orderBy. */
  def q264ScriptMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def scriptCount(cls: String) =
      s"length(t) - length(regexp_replace(t, '${scriptSparkLit(cls)}', ''))"
    val spoofWords =
      s"""size(filter(split(t, ' '), w ->
         |  w rlike '${scriptSparkLit(LatinClass)}'
         |  AND w rlike '${scriptSparkLit(ConfusableClass)}'))""".stripMargin
    docs(s, dir).select($"doc_id", $"text")
      .unionByName(ScriptPlant.toDF("doc_id", "text"))
      .withColumn("t", coalesce($"text", lit("")))
      .select($"doc_id",
        expr(scriptCount(LatinClass)).cast("long").as("n_latin"),
        expr(scriptCount(GreekClass)).cast("long").as("n_greek"),
        expr(scriptCount(CyrillicClass)).cast("long").as("n_cyrillic"),
        expr(scriptCount(CjkClass)).cast("long").as("n_cjk"),
        expr(spoofWords).cast("long").as("n_spoof_words"))
      .withColumn("has_spoof", when($"n_spoof_words" > 0, 1L).otherwise(0L))
      .orderBy($"doc_id")
  }

  /** X223 — Unicode fingerprint gate: non-ASCII text (accents, Greek, CJK,
    * astral-plane emoji incl. a ZWJ sequence, and every UTF-8 encoder range
    * boundary) planted per document from doc_id, then pushed through the
    * SAME `graft_fingerprint` lane every dedup / provenance / sampling
    * operator uses. The DuckDB oracle replays the hash at BYTE level
    * (SparkEntry.FpByteFold expands each codepoint into its 1-4 UTF-8
    * bytes algebraically), so this query is the executable proof that the
    * fingerprint lane carries no ASCII precondition — on either engine.
    * n_chars (codepoints) and n_bytes pin the codepoint/byte split
    * independently of the hash.
    *
    * Scale: a narrow codegen'd map at scan throughput — plant, length,
    * octet_length and the fingerprint fold; zero shuffles before the
    * final orderBy. */
  def q252Utf8Fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    docs(s, dir)
      .withColumn("t2", concat($"text",
        element_at(array(Utf8Plant.map(lit): _*),
          pmod($"doc_id", lit(8)).cast("int") + 1),
        lit(" fin")))
      .select(
        $"doc_id",
        length($"t2").cast("long").as("n_chars"),
        expr("octet_length(t2)").cast("long").as("n_bytes"),
        expr("graft_fingerprint(t2)").as("fp"))
      .orderBy($"doc_id")
  }

  /** X238 — URL canonicalization + canonical-URL dedup: the crawl-dedup
    * step upstream of by-URL frequency caps — the SAME resource arrives
    * as `HTTPS://Site3.Example.ORG:443/p/1?utm_source=x&id=2#f` and
    * `https://site3.example.org/p/1?id=2`, and byte-keyed URL dedup sees
    * two origins. Canonical recipe (the practical subset of RFC 3986
    * normalization): lowercase scheme+host, strip the scheme's default
    * port (:443/https, :80/http — a NON-default port is a different
    * origin and stays), drop the fragment, drop tracking params
    * (utm_ prefix / fbclid / gclid — a curated policy table like q266's entities),
    * sort surviving params. Noise features are planted per doc_id
    * (case, default/odd port, param order, tracking params, fragment)
    * over a bounded canonical key space, so groups form at every SF and
    * every raw variant is derivable.
    *
    * Scale: extraction + parse + rebuild are narrow codegen'd passes
    * (the param rebuild LET-BINDS its filtered array — q235); ONE hash
    * aggregation on the canonical key; report is key-space-sized. */
  def q269UrlCanonical(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withCanonicalUrl(withUrlNoise(docs(s, dir)))
      .groupBy($"canonical_url")
      .agg(min($"doc_id").as("min_doc_id"), count(lit(1)).as("n_docs"),
        countDistinct($"u").as("n_raw_urls"))
      .filter($"n_docs" >= 2)
      .select($"canonical_url", $"min_doc_id", $"n_docs", $"n_raw_urls")
      .orderBy($"canonical_url")
  }

  /** q269's URL-noise plant: appends one planted URL (id-derived case /
    * port / param-order / tracking / fragment noise) to each document's
    * text as `t2`. Shared by the batch op, the oracle shape, and the
    * streaming-gate spec (which feeds the SAME planted stream). */
  private[graft] def withUrlNoise(df: DataFrame): DataFrame = {
    val k =
      ((pmod(col("doc_id"), lit(40L)) * 2654435761L) % 40L).cast("string")
    val m = pmod(col("doc_id"), lit(7L)).cast("string")
    val url = concat(
      when(col("doc_id") % 2 === 0, lit("HTTPS")).otherwise(lit("https")),
      lit("://"),
      when(col("doc_id") % 2 === 0,
        concat(lit("Site"), k, lit(".Example.ORG")))
        .otherwise(concat(lit("site"), k, lit(".example.org"))),
      when(col("doc_id") % 11 === 0, lit(":8443"))
        .when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit("")),
      lit("/p/"), m,
      when(col("doc_id") % 2 === 0, concat(lit("?id="), m, lit("&ref=a")))
        .otherwise(concat(lit("?ref=a&id="), m)),
      when(col("doc_id") % 2 === 1, lit("&utm_source=news"))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("&fbclid=xyz")).otherwise(lit("")),
      when(col("doc_id") % 4 === 0, lit("#sec")).otherwise(lit("")))
    df.withColumn("t2", concat(coalesce(col("text"), lit("")),
      lit(" see "), url, lit(" end")))
  }

  /** THE canonicalization: extract the first URL from `t2` as `u`, parse,
    * rebuild as `canonical_url`. ONE definition shared by the q269 batch
    * dedup and the streaming [[graft.streaming.EventStream.urlDedupGate]]
    * — gate and audit must agree on what "the same URL" means, or the
    * stream admits what the batch audit would collapse. */
  private[graft] def withCanonicalUrl(df: DataFrame): DataFrame = {
    val parse = "^([A-Za-z]+)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\\?[^#]*)?(#.*)?$"
    val canonParams =
      """element_at(transform(array(filter(split(substr(qraw, 2), '&'),
        |    p -> p <> '' AND substr(p, 1, 4) <> 'utm_'
        |      AND substr(p, 1, 7) <> 'fbclid=' AND substr(p, 1, 6) <> 'gclid=')),
        |  ps -> IF(size(ps) = 0, '',
        |           concat('?', array_join(array_sort(ps), '&')))), 1)""".stripMargin
    df.withColumn("u", regexp_extract(col("t2"), "(?i)(https?://[^ ]+)", 1))
      .withColumn("scheme", lower(regexp_extract(col("u"), parse, 1)))
      .withColumn("host", lower(regexp_extract(col("u"), parse, 2)))
      .withColumn("port", regexp_extract(col("u"), parse, 3))
      .withColumn("path", regexp_extract(col("u"), parse, 4))
      .withColumn("qraw", regexp_extract(col("u"), parse, 5))
      .withColumn("portk",
        when((col("scheme") === "https" && col("port") === ":443") ||
          (col("scheme") === "http" && col("port") === ":80"), lit(""))
          .otherwise(col("port")))
      .withColumn("canonical_url", concat(col("scheme"), lit("://"),
        col("host"), col("portk"), col("path"), expr(canonParams)))
      .drop("scheme", "host", "port", "path", "qraw", "portk")
  }

  /** q266's markup wrappers, indexed by pmod(doc_id, 6): (prefix, suffix)
    * pairs planted around each document's text. Class 0 is the no-markup
    * control; 1 = plain tags; 2 = attributed anchor (visible link text
    * survives); 3 = a script block whose BODY contains a bare `<` plus a
    * comment HIDING tags (both prove the strip ORDER matters — tag
    * removal first would shred them); 4 = the curated entity set incl.
    * a double-escape (`&amp;lt;` must surface as the literal text
    * `&lt;`), a non-ASCII numeric reference, and a near-miss `&bogus;`
    * that must survive untouched; 5 = nested tags + a style block.
    * Shared verbatim by the Spark leg, the DuckDB oracle, and the spec.
    * No piece contains a single quote, so both SQL interpolations are
    * escape-free. */
  private[graft] val MarkupWrap: IndexedSeq[(String, String)] = IndexedSeq(
    ("", ""),
    ("<p>", "</p><br/>"),
    ("<a href=\"https://x.example/p\">read</a> ", ""),
    ("<script type=\"t\">var x = 1<2;</script>",
      "<!-- <b>hidden</b> -->"),
    ("", " &amp; &lt;tag&gt; &quot;q&quot; &#39;a&#39; snow &#x2603;" +
      " literal &amp;lt; x &bogus; end"),
    ("<div class=\"m\"><span>", "</span></div><style>p{c:red}</style>"))

  /** q266's curated entity table (decode order is LOAD-BEARING: `&amp;`
    * must decode LAST so double-escapes like `&amp;lt;` surface as the
    * literal text `&lt;` instead of double-decoding to `<`). A curated
    * subset like the confusable map — extending it is a data change. */
  private[graft] val EntityMap: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&#x2603;" -> "☃", "&amp;" -> "&")

  /** X235 — markup strip / visible-text extraction: the FIRST transform of
    * any web-crawl pipeline — everything downstream (dedup, quality,
    * tokenization) operates on visible text, not raw HTML. The chain is
    * order-critical: (1) drop script bodies (a bare `<` inside code would
    * shred a naive tag regex), (2) drop style bodies, (3) drop comments
    * (they legally CONTAIN tags), (4) strip remaining tags to spaces,
    * (5) decode the curated entity set with `&amp;` LAST (double-escape
    * correctness), (6) collapse whitespace. Per document: raw/visible
    * lengths, tag and entity counts, and the visible-text fingerprint —
    * the downstream dedup key. Lazy quantifiers and `(?s)` behave
    * identically in Java regex and RE2, so one pattern set serves both
    * engines.
    *
    * Scale: six narrow codegen'd regexp/replace passes at scan
    * throughput; zero shuffles before the presentation orderBy. */
  def q266MarkupStrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    val pre = MarkupWrap.map { case (p, _) => lit(p) }
    val post = MarkupWrap.map { case (_, q) => lit(q) }
    val cls = pmod($"doc_id", lit(6L)).cast("int") + 1
    val stripped = docs(s, dir)
      .withColumn("t2", concat(element_at(array(pre: _*), cls),
        coalesce($"text", lit("")), element_at(array(post: _*), cls)))
      .withColumn("s3", regexp_replace(regexp_replace(regexp_replace($"t2",
        "(?s)<script[^>]*>.*?</script>", " "),
        "(?s)<style[^>]*>.*?</style>", " "),
        "(?s)<!--.*?-->", " "))
      .withColumn("s4", regexp_replace($"s3", "<[^>]*>", " "))
    val decoded = EntityMap.foldLeft(stripped) { case (df, (ent, ch)) =>
      df.withColumn("s4", replace(df("s4"), lit(ent), lit(ch)))
    }
    decoded
      .withColumn("s6", trim(regexp_replace($"s4", "[ \t\n\r]+", " ")))
      .select($"doc_id",
        length($"t2").cast("long").as("n_raw"),
        length($"s6").cast("long").as("n_text"),
        size(regexp_extract_all($"s3", lit("<[^>]*>"), lit(0)))
          .cast("long").as("n_tags"),
        size(regexp_extract_all($"t2",
          lit("&(amp|lt|gt|quot|#39|#x2603);"), lit(0)))
          .cast("long").as("n_entities"),
        expr("graft_fingerprint(s6)").as("fp_text"))
      .orderBy($"doc_id")
  }

  /** Character symbolization — the default initial alphabet for the BPE
    * trainer and encoder (q320/q325/q335). */
  private[graft] val CharSymsExpr = "filter(split(word, ''), x -> x <> '')"

  /** BYTE symbolization (GPT-2-style byte-level BPE, X344/q366): each
    * UTF-8 byte of the word renders as a 2-hex-digit symbol — a
    * representation both engines derive identically (`lower(hex(encode
    * (word)))` + fixed-width chunking) and in which merged symbols are
    * collision-free by construction (2 chars per byte). The hex string
    * is let-bound per the q235 collapse rule. */
  private[graft] val ByteSymsExpr =
    """element_at(transform(array(lower(hex(encode(word, 'UTF-8')))), h ->
      |  transform(sequence(1, length(h) div 2), i ->
      |    substring(h, CAST(i * 2 - 1 AS INT), 2))), 1)""".stripMargin

  /** Greedy left-to-right non-overlapping merge of the adjacent symbol
    * pair (a, b) → a||b, as ONE `aggregate` HOF with named_struct state
    * (the sanctioned fold shape — chained withColumns would collapse
    * into an exponentially-inlined projection). State = (out, carry):
    * carry is the last unmerged symbol; (carry=a, x=b) emits the merged
    * symbol and clears the carry, so a run "a a a a" merges at even run
    * offsets exactly like classic BPE's learn-time replacement. */
  private def bpeMergePair(a: String, b: String): org.apache.spark.sql.Column = {
    val init = struct(
      expr("CAST(array() AS array<string>)").as("o"),
      lit(null).cast("string").as("cr"))
    val step = (st: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) =>
      when(st("cr").isNull, struct(st("o").as("o"), x.as("cr")))
        .when(st("cr") === lit(a) && x === lit(b),
          struct(concat(st("o"), array(lit(a + b))).as("o"),
            lit(null).cast("string").as("cr")))
        .otherwise(struct(concat(st("o"), array(st("cr"))).as("o"), x.as("cr")))
    val fin = (st: org.apache.spark.sql.Column) =>
      when(st("cr").isNull, st("o")).otherwise(concat(st("o"), array(st("cr"))))
    aggregate(col("syms"), init, step, fin)
  }

  /** UTF-8-byte order (Spark's UTF8String / DuckDB binary collation) for
    * EVERY driver-side string comparison that must agree with the engines
    * (argmax tie-breaks, prefix-base sorts) — Java String.compareTo is
    * UTF-16 code-unit order and diverges on supplementary-plane symbols.
    * Shared across graft (CLAUDE.md's tie-break rule); [[utf8Ordering]]
    * is the Ordering view for `sortBy`. */
  private[graft] def utf8Lt(a: String, b: String): Boolean = {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** [[utf8Lt]] as an Ordering[String] for driver-side `sortBy` calls
    * whose order is load-bearing against an engine-sorted frame (q329's
    * exclusive prefix bases) or fixes output row order (q318/q324). */
  private[graft] val utf8Ordering: Ordering[String] =
    (a: String, b: String) =>
      if (utf8Lt(a, b)) -1 else if (utf8Lt(b, a)) 1 else 0

  /** Core BPE merge-learning loop over a (word, c) frequency frame:
    * per round ONE combinable fold over the word-TYPE table produces the
    * weighted adjacent-pair counts AND the symbol stats together (pair
    * structs and null-partner singleton structs share one explode, so a
    * round costs one aggregation job plus one checkpoint job, measured
    * 6.3 s → 1.6 s at sf0.1 versus the three-job form); the argmax
    * (count DESC, pair UTF-8 bytes ASC) is DISTRIBUTED — a one-row
    * min(struct(−n, a, b)) reduce riding the same fold, so the driver
    * collects O(1) rows per round instead of the pair table (which is
    * vocabulary-bounded here but vocabulary²-shaped in the worst case;
    * the binary struct order is exactly TextOps.utf8Lt, which remains
    * the documented driver-side replay of the same tie-break). The
    * merge applies as a broadcast-literal projection. Stops early when
    * no adjacent pair remains. Returns one report row per learned
    * merge. Exposed to the spec so the planted mini-corpus drives the
    * same loop as q320.
    *
    * localCheckpoint, not persist: persist leaves the full lineage in
    * the plan, and each round's InMemoryRelation RENDERING nests the
    * previous round's — the executed-plan string doubles per round and
    * AQE's explainString OOMs near round 25 (measured; execution itself
    * was fine). The checkpoint truncates to a LogicalRDD so every round
    * plans constant-size. coalesce(1) pins the bounded word-TYPE frame
    * to one task; a corpus whose vocabulary outgrows the dictionary
    * bound would drop the coalesce, nothing else changes. */
  private[graft] def bpeTrainRows(s: SparkSession, wordFreq: DataFrame,
                                  maxMerges: Int): Seq[org.apache.spark.sql.Row] =
    bpeTrain(s, wordFreq, maxMerges)._1

  /** [[bpeTrainRows]] plus the final (word, c, syms) vocabulary frame —
    * the learned tokenizer as data, consumed by q325's apply pass. The
    * frame is localCheckpointed, so it stays valid after return. */
  private[graft] def bpeTrain(s: SparkSession, wordFreq: DataFrame,
      maxMerges: Int,
      symsExpr: String = CharSymsExpr)
      : (Seq[org.apache.spark.sql.Row], DataFrame) = {
    import s.implicits._
    val out = scala.collection.mutable.ListBuffer.empty[org.apache.spark.sql.Row]
    // LAZY localCheckpoints throughout the merge loop: the very next
    // fold() is always the first action over the frame, so the
    // materialization rides the fold's own job instead of paying a
    // separate eager-checkpoint job per round — maxMerges rounds cost
    // maxMerges jobs, not 2·maxMerges (measured across the four
    // trainer consumers q320/q366/q372/q376; lineage still truncates
    // identically once the fold has run).
    var cur = wordFreq.select(col("word"), col("c"),
        expr(symsExpr).as("syms"))
      .coalesce(1).localCheckpoint(false)
    // one fold: pair rows (a, b, Σc) + singleton rows (sym, null, Σc),
    // reduced to a DISTRIBUTED argmax: each post-shuffle partition emits
    // its own top-1 pair (count DESC, pair UTF-8 bytes ASC — the same
    // order utf8Lt defines) plus its singleton subtotals via a fused
    // mapPartitions (NO extra stage or exchange — a second global agg
    // measured +~20 ms/round in scheduling), so the driver collects
    // ≤ |partitions| partial rows per round and combines them, never the
    // pair table (vocabulary²-shaped in the worst case, driver-fatal at
    // open-web vocabulary scale)
    def fold(df: DataFrame)
        : (Option[(String, String, Long)], Long, Long) = {
      val partials = df.select($"c", explode(expr(
        """concat(
          |  transform(slice(syms, 1, greatest(size(syms) - 1, 0)),
          |    (x, i) -> struct(x AS a, element_at(syms, i + 2) AS b)),
          |  transform(syms, x -> struct(x AS a, CAST(NULL AS STRING) AS b)))"""
          .stripMargin)).as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"c").as("n"))
        .as[(String, String, Long)]
        .mapPartitions { it =>
          var ba: String = null; var bb: String = null; var bn = 0L
          var toks = 0L; var ntyp = 0L
          it.foreach { case (a, b, n) =>
            if (b == null) { toks += n; ntyp += 1L }
            else if (ba == null || n > bn ||
              (n == bn && (utf8Lt(a, ba) || (a == ba && utf8Lt(b, bb))))) {
              ba = a; bb = b; bn = n
            }
          }
          if (ba == null && ntyp == 0L) Iterator.empty
          else Iterator((ba, bb, bn, toks, ntyp))
        }
        .collect()
      val best = partials.filter(_._1 != null).reduceOption { (x, y) =>
        if (y._3 > x._3 ||
          (y._3 == x._3 && (utf8Lt(y._1, x._1) ||
            (y._1 == x._1 && utf8Lt(y._2, x._2))))) y else x
      }.map(p => (p._1, p._2, p._3))
      (best, partials.map(_._4).sum, partials.map(_._5).sum)
    }
    var (bestPair, toksPrev, _) = fold(cur)
    var k = 0
    while (k < maxMerges && bestPair.nonEmpty) {
      val (a, b, pc) = bestPair.get
      val merged = cur
        .select($"word", $"c", bpeMergePair(a, b).as("syms"))
        .localCheckpoint(false) // materialized by the fold below
      val (nextBest, toks, ntyp) = fold(merged)
      cur = merged
      bestPair = nextBest
      k += 1
      out += org.apache.spark.sql.Row(
        k.toLong, a, b, a + b, pc, toksPrev - toks, toks, ntyp)
      toksPrev = toks
    }
    (out.toSeq, cur)
  }

  /** X293 — BPE vocabulary merge TRAINING (published byte-pair-encoding
    * learn loop), the DISTRIBUTED full-vocabulary trainer: q226 learns
    * merges too, but as a driver loop over a CAPPED 256-type `[a-z]+`
    * dictionary (8 merges — the bounded prototype whose cap is the
    * scalability escape hatch); here every round is a combinable fold
    * over the complete unfiltered word-TYPE table, 30 rounds, with the
    * per-round fertility ledger q226 doesn't produce. q75 tokenizes,
    * q255 audits application optimality GIVEN a vocabulary, q113/q157
    * measure coverage of a frequency vocab; this LEARNS the merges at
    * the corpus's own vocabulary scale.
    * Word-frequency table from the corpus, initial symbols = characters;
    * each of 30 bounded rounds counts adjacent symbol pairs weighted by
    * word frequency, picks the argmax under a deterministic tie-break
    * (count DESC, pair bytes ASC), and applies the merge greedily
    * left-to-right. Per merge the report carries the winning pair count,
    * the weighted number of merge sites actually rewritten (tokens
    * saved — the fertility drop; less than the pair count when the pair
    * is a run "a a a" where greedy merges ⌊k/2⌋ of k−1 overlapping
    * occurrences), the corpus token count after, and the live symbol-type
    * count.
    *
    * Scale: the ONLY corpus-sized pass is the word-frequency fold (one
    * combinable shuffle); the 30-round loop runs on the Zipf-bounded
    * word-TYPE table — per round one pair-count fold + a 1-row argmax
    * collect + a broadcast-literal merge projection, localCheckpointed
    * per round so lineage (and the exponential nested plan RENDERING
    * persist alone leaves behind) stays constant-size across rounds.
    * The DuckDB oracle replays the identical loop as 30
    * generated chained-CTE rounds (q294's discipline — list_reduce
    * struct state is banned), with greedy-run semantics expressed
    * state-free via run-parity window math. */
  def q320BpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val wordFreq = docs(s, dir)
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"word").agg(count(lit(1)).as("c"))
    val rows = bpeTrainRows(s, wordFreq, 30)
    graft.operators.LocalReport.frame(s, rows,
      "merge_idx" -> LongType, "sym_a" -> StringType, "sym_b" -> StringType,
      "merged" -> StringType, "pair_count" -> LongType,
      "n_merged" -> LongType, "tokens_after" -> LongType,
      "n_sym_types" -> LongType)
  }

  /** X299 — BPE tokenizer APPLICATION + fertility audit: closes the
    * tokenizer loop (q320 LEARNS the merges, q255 audits application
    * optimality, q113/q157 measure coverage — this APPLIES the learned
    * vocabulary at corpus scale). q227 applies q226's capped trainer via
    * a chain of `replace` calls (8 merges, `[a-z]+` words only); here
    * the FULL 30-merge vocabulary applies by dictionary join — the
    * replace-chain would inline 30 nested string passes per token, while
    * the dictionary is exactly the trainer's final symbolization. Training already symbolizes every word
    * TYPE, so application is exactly how production tokenizers run: the
    * word→token-count dictionary broadcasts and the corpus pass is one
    * join + combinable fold — per (lang, source) cell the word count,
    * BPE token count, codepoint count, fertility (tokens per 1e6 words)
    * and compression (chars per 1e6 tokens). Global Σ n_bpe_tokens
    * reconciles EXACTLY with q320's final tokens_after (the spec pins
    * it), and the planted fully-merged corpus pins fertility at exactly
    * 1e6.
    *
    * Scale: ONE persisted (lang, source, word) explode feeds both the
    * frequency fold (training input) and the apply join; the dictionary
    * is word-TYPE-sized and the broadcast decision is COUNTED, not
    * assumed — above [[bpeApplyReport]]'s threshold the apply join
    * escalates to a shuffle join (loud-logged; the spec pins both
    * branches row-identical); the |lang×source| report collects and the
    * cache releases before return. */
  def q325BpeApply(s: SparkSession, dir: String): DataFrame =
    bpeApplyReport(s, dir, broadcastTypeThreshold = 1000000L)

  /** [[q325BpeApply]]'s body with the broadcast decision COUNTED instead
    * of assumed (the q50 driver/distributed threshold pattern): the
    * word-TYPE dictionary is Zipf-bounded on this corpus, but an
    * open-web vocabulary is not — above the threshold the apply join
    * escalates to a plain shuffle join (same output, the spec pins both
    * branches row-identical) and says so loudly on stderr. The count is
    * one cheap job over the trainer's already-localCheckpointed vocab
    * frame. */
  private[graft] def bpeApplyReport(s: SparkSession, dir: String,
      broadcastTypeThreshold: Long): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val words = docs(s, dir)
      .select($"lang", $"source",
        explode(expr("filter(split(text, ' '), x -> x <> '')")).as("word"))
      .persist()
    try {
      val wordFreq = words.groupBy($"word").agg(count(lit(1)).as("c"))
      val (_, vocab) = bpeTrain(s, wordFreq, 30)
      val dict = vocab.select($"word", size($"syms").cast("long").as("n_tok"),
        length($"word").cast("long").as("n_chr"))
      val nTypes = dict.count()
      val applySide =
        if (nTypes <= broadcastTypeThreshold) broadcast(dict)
        else {
          Console.err.println(s"[graft] q325: $nTypes word types exceed " +
            s"the broadcast threshold $broadcastTypeThreshold — " +
            "escalating the apply join to a shuffle join")
          dict
        }
      val rep = words.join(applySide, Seq("word"))
        .groupBy($"lang", $"source")
        .agg(count(lit(1)).as("n_words"), sum($"n_tok").as("n_bpe_tokens"),
          sum($"n_chr").as("n_chars"))
        .withColumn("fertility_ppm",
          expr("n_bpe_tokens * 1000000 div n_words"))
        .withColumn("chars_per_token_ppm",
          expr("n_chars * 1000000 div n_bpe_tokens"))
        .orderBy($"lang", $"source")
        .collect()
      graft.operators.LocalReport.frame(s, rep.toSeq,
        "lang" -> StringType, "source" -> StringType,
        "n_words" -> LongType, "n_bpe_tokens" -> LongType,
        "n_chars" -> LongType, "fertility_ppm" -> LongType,
        "chars_per_token_ppm" -> LongType)
    } finally words.unpersist(blocking = false)
  }

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Open-vocabulary BPE ENCODE as one constant-size nested HOF over a
    * `word` column: the learned merge list (in RANK order) is an inlined
    * literal array of (a, b) structs; the outer aggregate folds the
    * merges over the word's character symbolization, the inner aggregate
    * is [[bpeMergePair]]'s greedy left-to-right carry pass with the pair
    * taken from the OUTER lambda variable. Rank-order application is
    * provably identical to the published lowest-rank-first encode loop:
    * a merge can only create adjacencies INVOLVING its new symbol, and
    * every earlier merge predates that symbol, so no lower-rank pair can
    * reappear once its pass completes. ONE expression regardless of
    * merge count (the q294 rule — 30 chained withColumn passes would
    * double the inlined projection per level). */
  private[graft] def bpeEncodeExpr(merges: Seq[(String, String)],
      initExpr: String = CharSymsExpr)
      : org.apache.spark.sql.Column =
    if (merges.isEmpty) expr(initExpr)
    else {
      val arr = merges.map { case (a, b) =>
        s"named_struct('a', ${sqlStr(a)}, 'b', ${sqlStr(b)})"
      }.mkString("array(", ", ", ")")
      expr(
        s"""aggregate($arr,
           |  $initExpr,
           |  (syms, m) -> aggregate(syms,
           |    named_struct('o', CAST(array() AS ARRAY<STRING>),
           |                 'cr', CAST(NULL AS STRING)),
           |    (st, x) -> CASE
           |      WHEN st.cr IS NULL THEN named_struct('o', st.o, 'cr', x)
           |      WHEN st.cr = m.a AND x = m.b THEN named_struct(
           |        'o', concat(st.o, array(concat(m.a, m.b))),
           |        'cr', CAST(NULL AS STRING))
           |      ELSE named_struct(
           |        'o', concat(st.o, array(st.cr)), 'cr', x) END,
           |    st -> CASE WHEN st.cr IS NULL THEN st.o
           |      ELSE concat(st.o, array(st.cr)) END))""".stripMargin)
    }

  /** Driver-side replay of [[bpeEncodeExpr]] for specs and argmax-free
    * verification — the same greedy carry pass per merge, in rank
    * order. */
  private[graft] def bpeEncode(word: String,
      merges: Seq[(String, String)]): Seq[String] =
    bpeEncodeSyms(word.split("").toSeq.filter(_.nonEmpty), merges)

  /** The same greedy carry pass over an ARBITRARY initial symbolization —
    * q366's byte-level spec replays hex-pair symbols through it. */
  private[graft] def bpeEncodeSyms(init: Seq[String],
      merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = init
    merges.foreach { case (a, b) =>
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var cr: String = null
      syms.foreach { x =>
        if (cr == null) cr = x
        else if (cr == a && x == b) { out += a + b; cr = null }
        else { out += cr; cr = x }
      }
      if (cr != null) out += cr
      syms = out.toSeq
    }
    syms
  }

  /** q335's planted UNSEEN-word documents (odd pmod-half ids, so they
    * land in the holdout split and never influence training): word
    * types absent from the corpus vocabulary that the open-vocabulary
    * encoder must still tokenize via the learned merges. ONE definition
    * shared by the Spark query, the generated DuckDB oracle and the
    * spec. */
  private[graft] val Q335Plant: Seq[(Long, String, String, String)] = Seq(
    (-335001L, "hashtable tableau zq zq hashtable", "xx", "planted"),
    (-335003L, "querying sorting the the zq", "xx", "planted"))

  /** X309 — OPEN-VOCABULARY BPE encode + held-out fertility audit: q325
    * applies the learned vocabulary by dictionary join, which by
    * construction cannot tokenize a word TYPE absent from training —
    * the open-vocabulary story every production tokenizer needs. Here
    * the merges train on the pmod(doc_id, 2) = 0 half only, and the
    * OTHER half (plus [[Q335Plant]]'s genuinely unseen word types)
    * encodes through [[bpeEncodeExpr]] — the published greedy BPE encode
    * applying the learned merge list by rank to ARBITRARY words. Per
    * (lang, source) cell of the holdout: word/OOV-word/BPE-token/char
    * counts, fertility and OOV share in ppm — the honest held-out
    * fertility a tokenizer paper reports, rather than q325's
    * train-set-fertility (its Σ reconciles with the trainer exactly
    * BECAUSE application is the training symbolization).
    *
    * Scale: ONE persisted (lang, source, half, word) explode feeds the
    * training fold, the holdout type frame and the report join; the
    * encode expression runs once per held-out word TYPE (Zipf-bounded),
    * not per occurrence, and is constant-size in the merge count; the
    * report is a |lang×source| fold. The holdout type-dictionary
    * broadcast is COUNTED, not assumed — [[bpeEncodeHoldoutReport]]
    * escalates to a shuffle join above the threshold (q325's 59239d9
    * pattern; the spec pins both branches row-identical). */
  def q335BpeEncodeHoldout(s: SparkSession, dir: String): DataFrame =
    bpeEncodeHoldoutReport(s, dir, broadcastTypeThreshold = 1000000L)

  /** [[q335BpeEncodeHoldout]]'s body with the holdout type-dictionary
    * broadcast decision COUNTED (same counted branch as
    * [[bpeApplyReport]]): the count is one cheap distinct-count job over
    * the already-persisted word explode BEFORE the per-type encode runs;
    * above the threshold the report join escalates to a shuffle join,
    * loudly. */
  private[graft] def bpeEncodeHoldoutReport(s: SparkSession, dir: String,
      broadcastTypeThreshold: Long): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val plant = Q335Plant.toDF("doc_id", "text", "lang", "source")
    val words = docs(s, dir).select($"doc_id", $"text", $"lang", $"source")
      .unionByName(plant)
      .select($"lang", $"source", pmod($"doc_id", lit(2L)).as("half"),
        explode(expr("filter(split(text, ' '), x -> x <> '')")).as("word"))
      .persist()
    try {
      val trainWf = words.filter($"half" === 0L)
        .groupBy($"word").agg(count(lit(1)).as("c"))
      val (trainRows, _) = bpeTrain(s, trainWf, 30)
      val merges = trainRows.map(r => (r.getString(1), r.getString(2)))
      val holdoutTypes = words.filter($"half" === 1L).select($"word").distinct()
      val enc = holdoutTypes
        .join(trainWf.select($"word", lit(1L).as("seen")), Seq("word"), "left")
        .select($"word",
          size(bpeEncodeExpr(merges)).cast("long").as("n_tok"),
          length($"word").cast("long").as("n_chr"),
          when($"seen".isNull, 1L).otherwise(0L).as("oov"))
      val nTypes = holdoutTypes.count()
      val encSide =
        if (nTypes <= broadcastTypeThreshold) broadcast(enc)
        else {
          Console.err.println(s"[graft] q335: $nTypes holdout word types " +
            s"exceed the broadcast threshold $broadcastTypeThreshold — " +
            "escalating the report join to a shuffle join")
          enc
        }
      val rep = words.filter($"half" === 1L).join(encSide, Seq("word"))
        .groupBy($"lang", $"source")
        .agg(count(lit(1)).as("n_words"), sum($"oov").as("n_oov_words"),
          sum($"n_tok").as("n_bpe_tokens"), sum($"n_chr").as("n_chars"))
        .withColumn("fertility_ppm",
          expr("n_bpe_tokens * 1000000 div n_words"))
        .withColumn("oov_ppm", expr("n_oov_words * 1000000 div n_words"))
        .withColumn("chars_per_token_ppm",
          expr("n_chars * 1000000 div n_bpe_tokens"))
        .orderBy($"lang", $"source")
        .collect()
      graft.operators.LocalReport.frame(s, rep.toSeq,
        "lang" -> StringType, "source" -> StringType,
        "n_words" -> LongType, "n_oov_words" -> LongType,
        "n_bpe_tokens" -> LongType, "n_chars" -> LongType,
        "fertility_ppm" -> LongType, "oov_ppm" -> LongType,
        "chars_per_token_ppm" -> LongType)
    } finally words.unpersist(blocking = false)
  }

  /** q366's planted UNSEEN word types: an in-vocab ASCII control, a
    * 2-byte-letter Latin word, a 3-byte Katakana word whose bytes never
    * occur in training, and a supplementary-plane mix (U+1D54F, U+1D11E —
    * 4-byte f0-9d-... sequences). ONE definition shared by the Spark
    * query, the generated oracle and the spec. */
  private[graft] val Q366Plant: Seq[(Long, String)] = Seq(
    1L -> "printer",
    2L -> "naïveté",
    3L -> "テスト",
    4L -> "𝕏ray𝄞")

  /** X344 — BYTE-LEVEL BPE (the GPT-2 byte fallback): q320/q335 operate
    * on character symbols, so a character absent from training has no
    * symbol at all; production tokenizers train and encode over UTF-8
    * BYTES, where the base alphabet is closed (≤256 values) and ANY
    * Unicode word type tokenizes by construction. Reuses the whole lane
    * unchanged — [[bpeTrain]]'s distributed trainer and
    * [[bpeEncodeExpr]]'s rank-order encode are symbol-generic; only the
    * initial symbolization swaps to [[ByteSymsExpr]] (each UTF-8 byte as
    * a 2-hex-digit symbol, derived identically on both engines and
    * collision-free under concatenation).
    *
    * Training corpus is q252's non-ASCII gate corpus (documents text +
    * the per-class [[Utf8Plant]] suffix + ' fin'), so multi-byte
    * sequences — accented Latin, Greek, CJK, emoji, supplementary-plane
    * — are all IN the pair statistics. The [[Q366Plant]] words are
    * unseen TYPES encoded through the learned merges: the ASCII control
    * "printer" rides the learned `in`/`er` merges (n_tokens < n_bytes,
    * spec-pinned), the Katakana word falls back to raw byte symbols
    * (every learned merge pairs ASCII bytes on this corpus — measured,
    * so ≥0x80 bytes stay single), and the supplementary-plane mix pins
    * the 4-byte f0-9d sequences' deterministic tokenization — the
    * FpByteFold discipline applied to tokenizer space. Output per group
    * (corpus langs + plant words): word/byte/token counts, bytes per
    * token in ppm, and for plant words the exact hex token string.
    *
    * Scale: identical to q320/q325 — ONE corpus word fold; the 30-round
    * loop runs on the word-TYPE table (per round one combinable fold +
    * 1-row argmax + broadcast-literal merge); the apply join is the
    * counted broadcast branch (q325's gate); byte symbolization adds a
    * constant ×~1.1 symbol count on mostly-ASCII text (measured: UTF-8
    * expansion only on non-ASCII), not a complexity change. */
  def q366ByteBpe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val words = docs(s, dir)
      .withColumn("t2", concat($"text",
        element_at(array(Utf8Plant.map(lit): _*),
          pmod($"doc_id", lit(8)).cast("int") + 1),
        lit(" fin")))
      .select($"lang",
        explode(expr("filter(split(t2, ' '), x -> x <> '')")).as("word"))
      .persist()
    try {
      val wf = words.groupBy($"word").agg(count(lit(1)).as("c"))
      val (trainRows, vocab) = bpeTrain(s, wf, 30, ByteSymsExpr)
      val merges = trainRows.map(r => (r.getString(1), r.getString(2)))
      val dict = vocab.select($"word", size($"syms").cast("long").as("n_tok"),
        expr("CAST(octet_length(word) AS BIGINT)").as("n_b"))
      val nTypes = dict.count()
      val dictSide =
        if (nTypes <= 1000000L) broadcast(dict)
        else {
          Console.err.println(s"[graft] q366: $nTypes word types exceed " +
            "the broadcast threshold — escalating to a shuffle join")
          dict
        }
      val corpusRows = words.join(dictSide, Seq("word"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_words"), sum($"n_b").as("n_bytes"),
          sum($"n_tok").as("n_tokens"))
        .select(concat(lit("lang:"), $"lang").as("grp"), $"n_words",
          $"n_bytes", $"n_tokens", lit("").as("toks"))
      val plantRows = Q366Plant.toDF("w_id", "word")
        .select($"w_id", $"word", bpeEncodeExpr(merges, ByteSymsExpr).as("tk"))
        .select(concat(lit("word:"), $"w_id").as("grp"), lit(1L).as("n_words"),
          expr("CAST(octet_length(word) AS BIGINT)").as("n_bytes"),
          size($"tk").cast("long").as("n_tokens"),
          array_join($"tk", " ").as("toks"))
      val rep = corpusRows.unionByName(plantRows)
        .withColumn("bytes_per_token_ppm",
          expr("n_bytes * 1000000 div n_tokens"))
        .select($"grp", $"n_words", $"n_bytes", $"n_tokens",
          $"bytes_per_token_ppm", $"toks")
        .orderBy($"grp")
        .collect()
      graft.operators.LocalReport.frame(s, rep.toSeq,
        "grp" -> StringType, "n_words" -> LongType, "n_bytes" -> LongType,
        "n_tokens" -> LongType, "bytes_per_token_ppm" -> LongType,
        "toks" -> StringType)
    } finally words.unpersist(blocking = false)
  }

  /** X351 — corpus-scale byte-BPE fertility + FALLBACK-BYTE rate,
    * closing r14's item #3: q366 proves the byte tokenizer's behaviors
    * on plants and reports per-language fertility, but the byte-level
    * TELL-TALE — how much of the token stream is raw unmerged single
    * bytes (the GPT-2 fallback path) — was never measured, and it is
    * the number a tokenizer owner actually watches: a language whose
    * fallback rate is high is paying ~1 token per BYTE (≈3 per CJK
    * character), the signal to train more merges or a bigger vocab.
    *
    * Same trained tokenizer as q366 (documents + [[Utf8Plant]] suffix +
    * ' fin', 30 byte-level merges — ONE training definition, so the two
    * audits can never disagree about the tokenizer), same counted-
    * broadcast apply join (q325's gate); the dictionary row just gains
    * n_fb = |single-byte symbols| per word type (a hex-pair symbol of
    * length 2 IS an unmerged byte — the symbolization makes the
    * fallback class syntactically visible). Per language and per
    * [[Q366Plant]] word: words, bytes, tokens, fallback tokens,
    * bytes/token ppm and fallback ppm. Measured reconciliation with
    * q366's plant behaviors at sf0.01: the Katakana word is 100%
    * fallback (fallback_ppm = 1000000, n_fallback = n_bytes = n_tokens),
    * 'printer' rides its merges to 60% (3 of 5 tokens raw), and every
    * corpus language sits at ~70% fallback — the honest reading of a
    * 30-merge vocabulary (most of the stream is still unmerged bytes;
    * fallback_ppm is exactly the dial a bigger merge budget turns down,
    * which is why production watches it).
    *
    * Scale: identical to q366 — the fallback count folds in the SAME
    * dictionary join and per-language aggregate; zero extra passes. */
  def q372ByteFallback(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val words = docs(s, dir)
      .withColumn("t2", concat($"text",
        element_at(array(Utf8Plant.map(lit): _*),
          pmod($"doc_id", lit(8)).cast("int") + 1),
        lit(" fin")))
      .select($"lang",
        explode(expr("filter(split(t2, ' '), x -> x <> '')")).as("word"))
      .persist()
    try {
      val wf = words.groupBy($"word").agg(count(lit(1)).as("c"))
      val (trainRows, vocab) = bpeTrain(s, wf, 30, ByteSymsExpr)
      val merges = trainRows.map(r => (r.getString(1), r.getString(2)))
      val dict = vocab.select($"word", size($"syms").cast("long").as("n_tok"),
        expr("CAST(octet_length(word) AS BIGINT)").as("n_b"),
        expr("CAST(size(filter(syms, x -> length(x) = 2)) AS BIGINT)")
          .as("n_fb"))
      val nTypes = dict.count()
      val dictSide =
        if (nTypes <= 1000000L) broadcast(dict)
        else {
          Console.err.println(s"[graft] q372: $nTypes word types exceed " +
            "the broadcast threshold — escalating to a shuffle join")
          dict
        }
      val corpusRows = words.join(dictSide, Seq("word"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_words"), sum($"n_b").as("n_bytes"),
          sum($"n_tok").as("n_tokens"), sum($"n_fb").as("n_fallback"))
        .select(concat(lit("lang:"), $"lang").as("grp"), $"n_words",
          $"n_bytes", $"n_tokens", $"n_fallback")
      val plantRows = Q366Plant.toDF("w_id", "word")
        .select($"w_id", $"word", bpeEncodeExpr(merges, ByteSymsExpr).as("tk"))
        .select(concat(lit("word:"), $"w_id").as("grp"), lit(1L).as("n_words"),
          expr("CAST(octet_length(word) AS BIGINT)").as("n_bytes"),
          size($"tk").cast("long").as("n_tokens"),
          expr("CAST(size(filter(tk, x -> length(x) = 2)) AS BIGINT)")
            .as("n_fallback"))
      val rep = corpusRows.unionByName(plantRows)
        .select($"grp", $"n_words", $"n_bytes", $"n_tokens", $"n_fallback",
          expr("n_bytes * 1000000 div n_tokens").as("bytes_per_token_ppm"),
          expr("n_fallback * 1000000 div n_tokens").as("fallback_ppm"))
        .orderBy($"grp")
        .collect()
      graft.operators.LocalReport.frame(s, rep.toSeq,
        "grp" -> StringType, "n_words" -> LongType, "n_bytes" -> LongType,
        "n_tokens" -> LongType, "n_fallback" -> LongType,
        "bytes_per_token_ppm" -> LongType, "fallback_ppm" -> LongType)
    } finally words.unpersist(blocking = false)
  }

  /** q376's budget checkpoints (merge counts at which the dial is
    * measured; the last one is the full q366/q372 tokenizer). */
  private[graft] val MergeBudgets: Seq[Int] = Seq(10, 20, 30)

  /** X356 — merge-budget sweep (the fertility/fallback DIAL measured):
    * q372 names fallback_ppm "the dial a bigger merge budget turns
    * down" — this operator turns it and measures. ONE 30-round training
    * run (greedy BPE is prefix-stable: the first b merges of a 30-merge
    * train ARE the b-merge tokenizer — spec-asserted by re-training at
    * 10), then for each budget in [[MergeBudgets]] the corpus word
    * stream and the [[Q366Plant]] words encode under merges[0..b) via
    * the rank-order encoder and report tokens / fallback tokens /
    * bytes-per-token / fallback ppm.
    *
    * The gate is a cross-ALGORITHM check at every budget: the Spark
    * side builds each budget's dictionary by ENCODING word types with
    * [[bpeEncodeExpr]] (merges applied in learned order), while the
    * oracle reads the TRAINER's own chain state s₁₀/s₂₀/s₃₀ — equality
    * is BPE's defining replay property (q255's consistency audit,
    * applied at three checkpoints), not a tautology.
    *
    * Measured at sf0.01: corpus fallback_ppm falls 796029 → 734624 →
    * 705732 and bytes/token rises 1.24 → 1.36 → 1.51 as merges go
    * 10 → 20 → 30 — the dial turns monotonically; 'printer' already
    * rides its merges fully at budget 10 (the in/er pairs are among the
    * first ten learned); the Katakana plant stays 100% fallback at
    * EVERY budget (all learned merges pair ASCII bytes on this corpus —
    * the budget can't help a script the training data lacks, which is
    * the operational point of watching the per-language rate).
    *
    * Scale: one trainer run (word-TYPE table rounds); per budget one
    * TYPE-table encode + the counted-broadcast corpus join q372 uses —
    * budgets × (types + one corpus pass), never corpus × merges. */
  def q376MergeBudget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val words = docs(s, dir)
      .withColumn("t2", concat($"text",
        element_at(array(Utf8Plant.map(lit): _*),
          pmod($"doc_id", lit(8)).cast("int") + 1),
        lit(" fin")))
      .select($"lang",
        explode(expr("filter(split(t2, ' '), x -> x <> '')")).as("word"))
      .persist()
    try {
      val wf = words.groupBy($"word").agg(count(lit(1)).as("c"))
        .persist() // one trainer run + one encode per budget read this
      try {
        val (trainRows, _) = bpeTrain(s, wf, MergeBudgets.max, ByteSymsExpr)
        val merges = trainRows.map(r => (r.getString(1), r.getString(2)))
        val perBudget = MergeBudgets.flatMap { b =>
          val dict = wf.select($"word",
              bpeEncodeExpr(merges.take(b), ByteSymsExpr).as("tk"))
            .select($"word", size($"tk").cast("long").as("n_tok"),
              expr("CAST(octet_length(word) AS BIGINT)").as("n_b"),
              expr("CAST(size(filter(tk, x -> length(x) = 2)) AS BIGINT)")
                .as("n_fb"))
          val nTypes = dict.count()
          val dictSide =
            if (nTypes <= 1000000L) broadcast(dict)
            else {
              Console.err.println(s"[graft] q376: $nTypes word types " +
                "exceed the broadcast threshold — escalating to a " +
                "shuffle join")
              dict
            }
          val corpusRow = words.join(dictSide, Seq("word"))
            .agg(count(lit(1)).as("n_words"), sum($"n_b").as("n_bytes"),
              sum($"n_tok").as("n_tokens"), sum($"n_fb").as("n_fallback"))
            .select(lit(b.toLong).as("budget"), lit("corpus").as("grp"),
              $"n_words", $"n_bytes", $"n_tokens", $"n_fallback")
          val plantRows = Q366Plant.toDF("w_id", "word")
            .select($"w_id", $"word",
              bpeEncodeExpr(merges.take(b), ByteSymsExpr).as("tk"))
            .select(lit(b.toLong).as("budget"),
              concat(lit("word:"), $"w_id").as("grp"), lit(1L).as("n_words"),
              expr("CAST(octet_length(word) AS BIGINT)").as("n_bytes"),
              size($"tk").cast("long").as("n_tokens"),
              expr("CAST(size(filter(tk, x -> length(x) = 2)) AS BIGINT)")
                .as("n_fallback"))
          corpusRow.unionByName(plantRows)
            .select($"budget", $"grp", $"n_words", $"n_bytes", $"n_tokens",
              $"n_fallback",
              expr("n_bytes * 1000000 div n_tokens").as("bytes_per_token_ppm"),
              expr("n_fallback * 1000000 div n_tokens").as("fallback_ppm"))
            .collect().toSeq
        }
        graft.operators.LocalReport.frame(s,
          perBudget.sortBy(r => (r.getLong(0), r.getString(1))),
          "budget" -> LongType, "grp" -> StringType, "n_words" -> LongType,
          "n_bytes" -> LongType, "n_tokens" -> LongType,
          "n_fallback" -> LongType, "bytes_per_token_ppm" -> LongType,
          "fallback_ppm" -> LongType)
      } finally wf.unpersist(blocking = false)
    } finally words.unpersist(blocking = false)
  }
}
