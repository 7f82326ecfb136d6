package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Fingerprint

/** Corpus-level training-data operators (SURVEY.md §2.7 X29-X33): the
  * quality/repetition/frequency layer a 100 TB pre-training pipeline runs
  * between raw ingest and dedup — repetition heuristics, corpus-frequency
  * scoring, vocabulary statistics, skew-proof aggregation, and the composite
  * cleaning pass that strings the gates together.
  *
  * Scale design notes per operator are on each method. The shared theme:
  * per-document metrics stay NARROW (higher-order functions over the split
  * array — zero shuffles, scan throughput); corpus-level statistics are one
  * partial-aggregable shuffle each; the only joins are broadcast joins
  * against vocabulary-sized dimensions.
  */
object CorpusOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")


  /** The 10-word chunk geometry shared by q77 (cross-doc chunk dedup) and
    * q145 (intra-doc repetition) — their docstrings promise the two
    * signals compose over the SAME chunks, which only holds with one
    * definition. Expects a `ws` array column in scope. */
  private val chunk10Expr: String =
    """transform(sequence(0, (size(ws) - 1) div 10),
      |  i -> concat_ws(' ', slice(ws, CAST(i * 10 + 1 AS INT), 10)))""".stripMargin

  /** The exact-dedup partition key shared by every md5 keep-id operator
    * (q74/q154/q166/q200/q204 all promise their duplicate counts
    * reconcile): md5 of the text, with a per-document sentinel for NULL
    * text so null docs are never duplicates of each other (q74's
    * invariant). ONE definition — five hand-typed copies of this
    * expression is how the reconciliation guarantee silently breaks. */
  private[ops] def dedupKey: org.apache.spark.sql.Column =
    coalesce(md5(col("text")), concat(lit("null:"), col("doc_id")))

  /** X29 — repetition metrics (the Gopher-style quality signals): per doc,
    * the most-repeated word and its count, duplicate-2-gram count, and the
    * top-word fraction.
    *
    * Entirely narrow: the top word is the LONGEST RUN in the sorted word
    * array, computed by one `aggregate()` HOF pass — no explode, no
    * (doc_id, word) shuffle, no window. At 100 TB this is the difference
    * between a scan-speed map and a corpus-wide word shuffle. Tie-break is
    * deterministic: first run reaching the max in sorted order ⇒ the
    * alphabetically smallest word among ties (the oracle's
    * `ORDER BY c DESC, w ASC LIMIT 1` picks the same).
    */
  def q70Repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .withColumn("ws", split($"text", " "))
      .filter(size($"ws") >= 2)
      .withColumn("sw", array_sort($"ws"))
      .withColumn("top", expr(
        """aggregate(
          |  sw,
          |  named_struct('prev', CAST('' AS STRING), 'run', 0L,
          |               'best', 0L, 'bestw', CAST('' AS STRING)),
          |  (s, x) -> named_struct(
          |    'prev', x,
          |    'run',  IF(x = s.prev, s.run + 1, 1L),
          |    'best', IF(IF(x = s.prev, s.run + 1, 1L) > s.best,
          |               IF(x = s.prev, s.run + 1, 1L), s.best),
          |    'bestw', IF(IF(x = s.prev, s.run + 1, 1L) > s.best, x, s.bestw)))
          |""".stripMargin))
      .withColumn("gs", expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
      .select(
        $"doc_id",
        size($"ws").cast("long").as("n_words"),
        $"top.bestw".as("top_word"),
        $"top.best".as("top_word_n"),
        (size($"gs") - size(array_distinct($"gs"))).cast("long").as("dup_2gram_n"),
        ($"top.best".cast("double") / size($"ws")).as("top_word_frac"))
      .orderBy($"doc_id")
  }

  /** X30 — corpus-frequency (document-frequency) quality score: per doc,
    * how "common" its vocabulary is across the corpus. The CCNet-style
    * quality gate shape: a corpus statistic joined back onto every doc.
    *
    * Scale: the DF table is vocabulary-sized (⋘ corpus) → `broadcast()`;
    * the per-doc re-aggregation is partial-agg combinable, so the whole op
    * is one explode-shuffle for DF plus one map-side-combined doc agg.
    * All-integer outputs (sum of DFs, rare-word count) — hash-exact.
    */
  def q71DfQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    val dw = d.select($"doc_id",
      explode(array_distinct(split($"text", " "))).as("w"))
    val dfTab = dw.groupBy($"w").agg(count(lit(1)).as("df"))
    // corpus size stays a lazy 1-row aggregate cross-joined in (broadcast
    // NLJ over one row) — constructing this DataFrame must not run a job
    val nDocs = d.agg(count(lit(1)).as("n_total"))
    dw.join(broadcast(dfTab), Seq("w"))
      .crossJoin(broadcast(nDocs))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_distinct_words"),
        sum($"df").as("sum_df"),
        sum(when($"df" * 5 < $"n_total", 1L).otherwise(0L)).as("rare_words"))
      .orderBy($"doc_id")
  }

  /** X31 — skew-proof two-phase aggregation (salting): the canonical fix
    * for a hot grouping key. lineitem's 3-value `l_returnflag` is exactly
    * the shape that melts a 1000-executor groupBy: every row routes to 3
    * reducers. Salting fans the partial aggregate across 32 sub-keys, then
    * a second k×32-row aggregate folds the salt back out. Results are
    * bit-identical to the direct groupBy (integer counts/sums commute), so
    * the oracle is the PLAIN group-by — proving the rewrite is free.
    * (Spark's map-side partial aggregation already does this implicitly
    * when upstream partitioning is uniform; explicit salting is the tool
    * when it is not — e.g. directly after a key-clustered scan.)
    */
  def q72SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // salt from the PRIMARY-KEY hash, not the aggregated value: a hot key
    // whose values are also concentrated (constant-price flag — the usual
    // skew shape) would collapse a value-derived salt into one bucket,
    // defeating the fan-out; the PK is unique by construction so its hash
    // spreads uniformly no matter how the measures are distributed
    val li = Tables.load(s, dir, "lineitem").select(
      $"l_returnflag",
      round($"l_extendedprice" * 100).cast("long").as("cents"),
      pmod(xxhash64($"l_orderkey", $"l_linenumber"), lit(32)).as("salt"))
    li.groupBy($"l_returnflag", $"salt")
      .agg(count(lit(1)).as("c"), sum($"cents").as("s"))
      .groupBy($"l_returnflag")
      .agg(sum($"c").as("n_rows"), sum($"s").as("sum_cents"))
      .orderBy($"l_returnflag")
  }

  /** X32 — corpus vocabulary statistics: top-20 words by total frequency
    * with their document frequency. One explode + one partial-aggregable
    * shuffle + a driver-k sort: the Zipf table every corpus audit starts
    * from. Deterministic under frequency ties via the word tiebreak.
    */
  def q73VocabTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"w")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct($"doc_id").as("n_docs"))
      .orderBy($"n_occurrences".desc, $"w")
      .limit(20)
  }

  /** X33 — composite corpus-cleaning pass: exact-dedup keep-first →
    * length-based quality gate → replayable hash sampling gate, reported as
    * a per-(lang, reason) audit table. The reasons are FIRST-MATCH
    * exclusive, so they partition the corpus and the report totals
    * reconcile exactly — the property a data-governance audit needs.
    *
    * Scale: one shuffle on md5(text) for the dedup window (hash keys
    * distribute uniformly — no skew), narrow gates, one final tiny agg.
    * The sampling gate reuses the portable rolling-hash fingerprint (q55),
    * so membership is replayable across engines and runs.
    */
  def q74CorpusClean(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    val flagged = docs(s, dir)
      .withColumn("n_words", size(split($"text", " ")))
      .withColumn("fp", expr("graft_fingerprint(text)"))
      .withColumn("keep_id",
        // null-text docs are NOT duplicates of each other: give each its
        // own partition key instead of letting md5(NULL)=NULL group them
        // (the invariant the streaming gate documents at docQualityGate)
        min($"doc_id").over(Window.partitionBy(
          dedupKey)))
      .withColumn("reason",
        when($"doc_id" =!= $"keep_id", "exact_dup")
          .when($"n_words" < 20 || $"n_words" > 500, "quality")
          .when($"fp" % 10 >= 8, "sampled_out")
          .otherwise("kept"))
    flagged.groupBy($"lang", $"reason")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"reason")
  }

  /** X34 — benchmark-contamination check: for every training document, how
    * many of its distinct word 5-grams appear anywhere in the held-out
    * eval set (docs with doc_id ≡ 0 mod 20 stand in for the benchmark).
    * This is the decontamination gate every pre-training pipeline runs
    * before training.
    *
    * Scale: the eval-set gram table is benchmark-sized (⋘ corpus) —
    * `broadcast()` it and the corpus side never shuffles: gram explosion
    * is narrow, the membership probe is a map-side hash lookup, and the
    * per-doc re-aggregation is partial-agg combinable. At 100 TB the only
    * wide op is the final tiny orderBy. */
  def q76Contamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
      .withColumn("ws", split($"text", " "))
      .filter(size($"ws") >= 5)
    val grams = d.select($"doc_id", explode(array_distinct(expr(
      "transform(sequence(1, size(ws) - 4), i -> concat_ws(' ', slice(ws, CAST(i AS INT), 5)))"))).as("g"))
    val evalGrams = grams.filter($"doc_id" % 20 === 0)
      .select($"g").distinct().withColumn("hit", lit(1L))
    grams.filter($"doc_id" % 20 =!= 0)
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce($"hit", lit(0L))).as("n_contaminated"))
      .withColumn("contam_permille", expr("n_contaminated * 1000 div n_grams"))
      .orderBy($"doc_id")
  }

  /** X35 — chunk-level (paragraph-granularity) dedup signal: documents are
    * chunked into fixed 10-word windows and each doc reports how many of
    * its chunks also occur in OTHER documents — the sub-document dedup
    * pass (boilerplate headers, repeated paragraphs) that document-level
    * dedup misses.
    *
    * Scale: unlike q76's benchmark probe, the chunk-frequency table here
    * is corpus-sized, so the join back is a genuine shuffle join on the
    * chunk key — hash keys distribute uniformly, and both sides shuffle
    * once on the same key so Catalyst reuses the exchange. This is the
    * honest 100 TB shape: one wide pass, no broadcast pretenses. */
  def q77ChunkDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = docs(s, dir)
      .withColumn("ws", split($"text", " "))
      .select($"doc_id", explode(expr(chunk10Expr)).as("chunk"))
    val freq = chunks.groupBy($"chunk")
      .agg(countDistinct($"doc_id").as("n_docs_with"))
    chunks.join(freq, Seq("chunk"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"n_docs_with" > 1, 1L).otherwise(0L)).as("n_shared_chunks"))
      .orderBy($"doc_id")
  }

  /** X38 — keep-best dedup resolution: the KEEP policy that turns near-dup
    * clusters (q50's MinHash connected components) into a concrete survivor
    * set — per cluster keep the highest-quality member (longest text,
    * doc_id tiebreak), the step between "these documents are duplicates"
    * and "train on these ones".
    *
    * Scale: cluster labels join back to a narrow (doc_id, length) frame —
    * the clustered subset is dedup-candidate-sized (⋘ corpus); the argmax
    * is one window over cluster ids. Everything upstream reuses q50's
    * machinery unchanged. */
  def q79KeepBest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val clusters = DedupOps.q50DedupClusters(s, dir)
    val quality = docs(s, dir)
      .select($"doc_id", length($"text").cast("long").as("n_chars"))
    val w = Window.partitionBy($"canonical_id")
      .orderBy($"n_chars".desc, $"doc_id")
    clusters.join(quality, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .groupBy($"canonical_id")
      .agg(
        min(when($"rk" === 1, $"doc_id")).as("kept_doc_id"),
        min(when($"rk" === 1, $"n_chars")).as("kept_chars"),
        count(lit(1)).as("cluster_size"))
      .withColumn("n_discarded", $"cluster_size" - 1)
      .orderBy($"canonical_id")
  }

  /** X39 — concatenate-and-chunk sequence packing: the pre-training step
    * that turns a document stream into fixed 2048-token contexts. Per
    * language stream, documents are laid end-to-end in doc_id order and
    * cut every 2048 tokens; each doc reports the context window(s) it
    * lands in and how many boundaries it straddles.
    *
    * Scale: ONE window shuffle per language stream (running token sum);
    * context assignment is integer arithmetic on the cumulative offsets —
    * no second pass, no driver loop. This is the exact shape of the
    * "pack then chunk" layout job a 100 TB tokenized corpus runs before
    * training. */
  /** X305 — needle-in-a-haystack insertion planning (long-context eval
    * construction): the NIAH protocol needs needles placed at CONTROLLED
    * depth fractions of long packed contexts; this plans the insertions
    * over X39's concat-and-chunk layout — documents pack into 2048-token
    * contexts in doc_id order (GlobalOrder running token sum, never a
    * global window), needles may only land on DOCUMENT boundaries
    * (mid-document splices corrupt the haystack), so for each (context,
    * target depth ∈ {0, ¼, ½, ¾, 1}) the plan picks the nearest
    * achievable boundary and reports the exact achieved depth and its
    * drift — the honest-accounting table an eval builder checks before
    * claiming "the needle was at 75% depth". The needle id fingerprint
    * is deterministic per (context, depth), so the downstream retrieval
    * grader can verify what it planted.
    *
    * Scale: ONE GlobalOrder running-sum pass over the (doc_id, tokens)
    * projection; boundary selection is a combinable min_by fold per
    * (context, depth) after a 5-row broadcast grid join; the plan frame
    * is |contexts|×5. */
  def q331NeedlePlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    val cap = 2048L
    val toks = docs(s, dir)
      .select($"doc_id",
        expr("CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)")
          .as("n_toks"))
      .filter($"n_toks" > 0L)
    val (summed, total) = graft.operators.GlobalOrder
      .withRunningSum(toks, Seq($"doc_id"), "n_toks", "end_off")
    val placed = summed
      .withColumn("start_off", $"end_off" - $"n_toks")
      .withColumn("ctx", expr(s"start_off div $cap"))
      .withColumn("boff", expr(s"start_off - ctx * $cap"))
    val grid = Seq(0L, 250000L, 500000L, 750000L, 1000000L)
      .toDF("depth_target_ppm")
    placed.crossJoin(broadcast(grid))
      .withColumn("ctx_tokens",
        least(lit(cap), lit(total) - $"ctx" * cap))
      .withColumn("target", expr("depth_target_ppm * ctx_tokens div 1000000"))
      .withColumn("drift", abs($"boff" - $"target"))
      .groupBy($"ctx".as("context_id"), $"depth_target_ppm")
      .agg(count(lit(1)).as("n_docs"),
        min($"ctx_tokens").as("ctx_tokens"),
        min(struct($"drift", $"boff", $"doc_id")).as("pick"))
      .select($"context_id", $"n_docs", $"ctx_tokens", $"depth_target_ppm",
        $"pick.doc_id".as("insert_before_doc"),
        $"pick.boff".as("insert_at_off"),
        expr("pick.boff * 1000000 div ctx_tokens").as("actual_depth_ppm"),
        $"pick.drift".as("drift_tokens"),
        expr("graft_fingerprint(concat('needle:', CAST(context_id AS STRING), " +
          "':', CAST(depth_target_ppm AS STRING)))").as("needle_fp"))
      .orderBy($"context_id", $"depth_target_ppm")
  }

  def q80SequencePack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ctx = 2048L
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, dir)
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n_tokens"))
      .withColumn("end_tok", sum($"n_tokens").over(w))
      .select($"doc_id", $"lang", $"n_tokens",
        expr(s"(end_tok - n_tokens) div $ctx").as("start_ctx"),
        expr(s"(end_tok - 1) div $ctx").as("end_ctx"))
      .withColumn("n_boundary_crossings", $"end_ctx" - $"start_ctx")
      .orderBy($"doc_id")
  }

  /** X62 — heavy-hitter vocabulary terms via sketch-then-recount: a
    * Misra–Gries pass (bounded buffer, [[graft.functions.MisraGries]])
    * proposes candidate words, then a second pass recounts ONLY the
    * candidates exactly and keeps those above 0.5% of all tokens.
    *
    * Why not q73's plain groupBy: that shuffles the ENTIRE vocabulary to
    * find a handful of frequent terms. Here pass 1 is partial-aggregable
    * with ≤k counters per map partition (no word-keyed shuffle at all) and
    * pass 2 shuffles only rows surviving a broadcast semi-join against the
    * ≤k candidates — at 100 TB, that's a vocabulary-sized shuffle replaced
    * by a constant-sized one. MG guarantees every word with true count
    * > N/(k+1) survives the sketch; with k=400 and a N/200 report
    * threshold, the recounted output is provably EXACT — which is why a
    * plain `HAVING count(*)*200 > total` oracle can hash-match a sketch.
    */
  /** X70 — bigram language-model predictability score: train corpus bigram
    * statistics, then score every document by how predictable its word
    * transitions are — the integer-exact surrogate of LM-perplexity
    * filtering (the quality gate LLM pipelines run with a real LM; counts
    * stand in for logits so the oracle can hash-match: `log`/`exp` differ
    * by ulps across libm implementations, integer ppm ratios never do).
    *
    * Shape: bigram extraction is NARROW (zip of the word array with its
    * own tail — no positional self-join); bigram counts are one combinable
    * shuffle; context counts derive from the bigram frame (vocabulary-
    * sized, never touching the corpus again); the corpus re-joins ONCE on
    * the uniform (w1,w2) key against the count-enriched bigram dictionary
    * (q77's exchange-reuse pattern). Per-doc aggregation rides the same
    * doc_id grouping every narrow metric uses. */
  def q107BigramLm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = docs(s, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 2)
      .select($"doc_id", explode(expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("p"))
      .select($"doc_id", $"p.w1".as("w1"), $"p.w2".as("w2"))
    val c2 = pairs.groupBy($"w1", $"w2").agg(count(lit(1)).as("n12"))
    val c1 = c2.groupBy($"w1").agg(sum($"n12").as("n1"))
    val dict = c2.join(c1, "w1")
      .select($"w1", $"w2", expr("n12 * 1000000 div n1").as("ppm"))
    pairs.join(dict, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        expr("CAST(sum(ppm) AS BIGINT) div count(1)").as("avg_predict_ppm"))
      .orderBy($"doc_id")
  }

  /** X314 — competence-based curriculum schedule (Platanios et al.): X99
    * (q133) interleaves domains by WEIGHT; this orders documents by
    * DIFFICULTY and unlocks them on the published sqrt competence
    * schedule — the construction step of curriculum pre-training.
    * Difficulty is q107's integer surrogate per document
    * (1e6 − avg bigram predictability ppm; docs need ≥ 2 words — the
    * universe every row of this report draws from), the total order is
    * (difficulty ASC, doc_id) via GlobalOrder's exact rank, and phase
    * t ∈ 1..10 admits the easiest floor(√(t/10)·1e6) ppm of ranks
    * (c_ppm = floor(sqrt(t·10¹¹)) — the sqrt argument is an exact
    * integer in double, IEEE sqrt is correctly rounded, and floor lands
    * both engines on the same BIGINT). Per phase: the competence, the
    * rank cut, eligible/new doc counts, new tokens (bigram transitions
    * + 1), the mean difficulty of the newly unlocked band and the
    * frontier difficulty at the cut. The q337 plant texts ride along:
    * the 4-word cycle (difficulty exactly 0) must unlock in phase 1 at
    * rank 1, the uniform-fanout walk is the corpus's hardest document
    * and must unlock in the LAST phase — the spec pins both.
    *
    * Scale: q107's pair/dict folds + ONE GlobalOrder rank pass over the
    * doc-difficulty frame; the 10 phase cuts broadcast as a literal and
    * phase assignment is arithmetic on the rank (no per-phase scans);
    * the report is a 10-row fold. */
  def q339CurriculumSchedule(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.LongType
    val plant = Seq((-339001L, "plantE"), (-339003L, "plantH"))
      .toDF("doc_id", "tag")
      .select($"doc_id",
        when($"tag" === "plantE", expr(PipelineOps.Q337EasySql))
          .otherwise(expr(PipelineOps.Q337HardSql)).as("text"))
    val d = docs(s, dir).select($"doc_id", $"text").unionByName(plant)
    val pairs = d.select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 2)
      .select($"doc_id", explode(expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("p"))
      .select($"doc_id", $"p.w1".as("w1"), $"p.w2".as("w2"))
    val c2 = pairs.groupBy($"w1", $"w2").agg(count(lit(1)).as("n12"))
    val c1 = c2.groupBy($"w1").agg(sum($"n12").as("n1"))
    val dict = c2.join(c1, "w1")
      .select($"w1", $"w2", expr("n12 * 1000000 div n1").as("ppm"))
    val diff = pairs.join(dict, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        expr("1000000 - CAST(sum(ppm) AS BIGINT) div count(1)")
          .as("difficulty_ppm"))
    val (ranked, n) = graft.operators.GlobalOrder.withRowNumberAndTotal(
      diff, Seq($"difficulty_ppm", $"doc_id"), "rn")
    val cuts = (1 to 10).map { t =>
      val c = math.floor(math.sqrt((t * 100000000000L).toDouble)).toLong
      (t.toLong, c, c * n / 1000000L)
    }
    // phase of a rank = 1 + #cuts strictly below it (cuts are monotone)
    val phaseExpr = cuts.map { case (_, _, cut) =>
      s"(CASE WHEN rn > ${cut}L THEN 1 ELSE 0 END)"
    }.mkString("1 + ", " + ", "")
    val perPhase = ranked
      .withColumn("phase", expr(phaseExpr).cast("long"))
      .groupBy($"phase")
      .agg(count(lit(1)).as("n_new"),
        sum($"n_pairs" + 1L).as("new_tokens"),
        sum($"difficulty_ppm").as("sum_diff"),
        max($"difficulty_ppm").as("max_diff"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val rows = cuts.map { case (t, cPpm, cut) =>
      val (nNew, toks, sumD, maxD) =
        perPhase.getOrElse(t, (0L, 0L, 0L, 0L))
      org.apache.spark.sql.Row(t, cPpm, cut, nNew, toks,
        if (nNew == 0L) 0L else sumD / nNew,
        maxD)
    }
    graft.operators.LocalReport.frame(s, rows,
      "phase" -> LongType, "competence_ppm" -> LongType,
      "cut_rank" -> LongType, "n_new" -> LongType,
      "new_tokens" -> LongType, "mean_new_difficulty_ppm" -> LongType,
      "frontier_difficulty_ppm" -> LongType)
  }

  /** The Misra-Gries counter budget, shared by the q100 batch sketch and
    * the streaming [[graft.streaming.EventStream.mgGate]] twin (the
    * sprtWalk one-definition rule). */
  private[graft] val MgK = 400

  def q100HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = docs(s, dir).select(explode(split($"text", " ")).as("w"))
    val mg = udaf(new graft.functions.MisraGries(MgK))
    // one job: (candidate words, exact total N); both tiny → driver-safe
    val (cands, total) = words.agg(mg($"w").as("r"))
      .select($"r._1".as("cands"), $"r._2".as("total"))
      .as[(Seq[String], Long)].head()
    words.join(broadcast(cands.toDF("w")), Seq("w"), "left_semi")
      .groupBy($"w")
      .agg(count(lit(1)).as("n_occurrences"))
      .filter($"n_occurrences" * 200L > total)
      .select($"w", $"n_occurrences",
        expr(s"n_occurrences * 1000000 div ${total}L").as("share_ppm"))
      .orderBy($"w")
  }

  /** X253 — Count-Min sketch frequency estimation + measured overestimate:
    * completes the portable-sketch suite (q279 Bloom membership, q282 HLL
    * cardinality, q100 Misra-Gries heavy hitters) with the point-frequency
    * sketch. d = 4 hash rows × w = 256 counters built over the order-line
    * stream keyed by part (2000 part types at sf0.01 → ~8 types per
    * counter, so collision mass is REAL and measured — the documents
    * corpus' 31-word vocabulary would make the audit degenerate); a query
    * reads min over the d counters at the key's buckets, which can only
    * OVERestimate (every counter holds the true count plus nonnegative
    * collision mass — the one-sided guarantee the spec pins per probe).
    * Buckets hash the key TYPE through q279's middle-square finalizer, so
    * the sketch builds from the per-key count frame — the stream is
    * scanned once and never rehashed per occurrence. Probes: the top-16
    * parts (count desc, key asc) where collisions hide inside big counts,
    * plus the 8 rarest (count asc, key asc) where the overestimate IS the
    * collision mass; reported against the stream size as over_ppm
    * (theory: E[over] ≈ N/w per row, min over d rows; guarantee
    * P[over > eN/w] ≤ e^-d).
    *
    * Scale: the per-key fold is the only corpus-sized shuffle; the sketch
    * is ≤1024 rows built by ONE combinable sum over the ×4 bucket explode
    * of the key frame; probes/estimates act on 24-row frames. The counter
    * frame is mergeable state (per-partition sketches union by +). The
    * key frame has four consumers, so it persists around the bounded
    * report and releases (q117's idiom). */
  def q283CmsAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    val keys = Tables.load(s, dir, "lineitem")
      .select($"l_partkey".cast("long").as("k"))
      .groupBy($"k").agg(count(lit(1)).as("n"))
      .persist()
    try {
      keys.count()
      val kb = keys.select($"k", $"n",
          explode(array((0 until 4).map(lit): _*)).as("i"))
        .withColumn("fp", expr(
          "graft_fingerprint(concat(CAST(k AS STRING), ':', CAST(i AS STRING)))"))
        .withColumn("b", expr("(fp * fp div 65536) % 256"))
        .select($"k", $"n", $"i", $"b")
      val sketch = kb.groupBy($"i", $"b").agg(sum($"n").as("cnt"))
      val probes = keys.orderBy($"n".desc, $"k").limit(16)
        .unionByName(keys.orderBy($"n".asc, $"k").limit(8))
        .distinct()
      val nt = keys.agg(sum($"n").cast("long").as("n_stream"))
      val rows = kb.join(broadcast(probes.select($"k")), Seq("k"), "left_semi")
        .join(broadcast(sketch), Seq("i", "b"))
        .groupBy($"k", $"n").agg(min($"cnt").as("cms_est"))
        .crossJoin(broadcast(nt))
        .select($"k".as("partkey"), $"n".as("exact_n"), $"cms_est",
          ($"cms_est" - $"n").as("overcount"),
          expr("(cms_est - n) * 1000000 div n_stream").as("over_ppm"))
        .orderBy($"exact_n".desc, $"partkey")
        .collect().toSeq
      import org.apache.spark.sql.types._
      graft.operators.LocalReport.frame(s, rows,
        ("partkey", LongType), ("exact_n", LongType), ("cms_est", LongType),
        ("overcount", LongType), ("over_ppm", LongType))
    } finally keys.unpersist(blocking = false)
  }

  /** X269 — positional phrase search: X43 builds the docs-only inverted
    * index; exact phrase queries need POSITIONS — the classic IR
    * mechanic where "new york times" must not match documents containing
    * the three words scattered. The index leg runs here: a positional
    * posting list (word → (doc, pos)), phrase matching as two co-keyed
    * adjacency joins ((doc, pos+1), (doc, pos+2)), per phrase the doc
    * count, occurrence count and a doc-id checksum. The three query
    * phrases are the corpus' top trigrams (count desc, phrase asc — a
    * total order), so the gate is non-vacuous at any SF. The ORACLE
    * never touches an index — it counts the same phrases by direct
    * trigram scan — so the two engines answer by INDEPENDENT algorithms
    * and the hash compare proves the index faithful.
    *
    * Scale: postings shuffle once on the uniform word key; each phrase's
    * adjacency joins touch only its words' postings (the selectivity
    * argument positional indexes exist for); phrase selection is a
    * vocabulary-sized count + driver-3 TakeOrdered. */
  def q298PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val postings = docs(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .persist()
    try {
      val phrases = docs(s, dir)
        .select(split($"text", " ").as("ws"))
        .filter(size($"ws") >= 3) // sequence(1, n-2) descends below 3
        .select(explode(expr(
          """transform(sequence(1, size(ws) - 2),
            |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
            |                 element_at(ws, i + 2)))""".stripMargin)).as("t"))
        .groupBy($"t").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"t").limit(3)
        .collect().map(_.getString(0))
      val rows = phrases.toSeq.map { ph =>
        val ws = ph.split(" ")
        val m = postings.filter($"w" === ws(0))
          .select($"doc_id", $"pos")
          .join(postings.filter($"w" === ws(1))
            .select($"doc_id", ($"pos" - 1).as("pos")), Seq("doc_id", "pos"))
          .join(postings.filter($"w" === ws(2))
            .select($"doc_id", ($"pos" - 2).as("pos")), Seq("doc_id", "pos"))
        m.agg(countDistinct($"doc_id").as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          sum_distinct($"doc_id").as("sum_doc_ids"))
          .select(lit(ph).as("phrase"), $"n_docs", $"n_occurrences",
            $"sum_doc_ids")
          .collect().head
      }
      import org.apache.spark.sql.types._
      graft.operators.LocalReport.frame(s, rows.sortBy(_.getString(0)),
        ("phrase", StringType), ("n_docs", LongType),
        ("n_occurrences", LongType), ("sum_doc_ids", LongType))
    } finally postings.unpersist(blocking = false)
  }

  /** X79 — out-of-vocabulary rate against a frequency-built tokenizer
    * vocabulary: take the top-V corpus words (count desc, word asc — a
    * total order, so the vocabulary is deterministic), then score every
    * document by the ppm share of its tokens that fall outside it. This is
    * the go/no-go metric for shipping a fixed vocab/tokenizer over a new
    * corpus.
    *
    * Scale: the vocabulary build is one combinable word count + a driver-k
    * TakeOrdered (vocabulary-sized, not corpus-sized); scoring broadcasts
    * the V-row vocab back onto the exploded token stream — tokens are
    * never shuffled, the only data-sized exchange is the per-doc fold. */
  def q113OovRate(s: SparkSession, dir: String, vocabSize: Int = 16): DataFrame = {
    import s.implicits._
    val words = docs(s, dir).select($"doc_id", explode(split($"text", " ")).as("w"))
    val vocab = words.groupBy($"w").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"w").limit(vocabSize)
      .select($"w", lit(1).as("in_vocab"))
    words.join(broadcast(vocab), Seq("w"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("n_oov"))
      .select($"doc_id", $"n_tokens", $"n_oov",
        expr("n_oov * 1000000 div n_tokens").as("oov_ppm"))
      .orderBy($"doc_id")
  }

  /** X104 — contamination SPAN coverage: q76 counts matching 5-grams; this
    * reports how much of each contaminated document the matches actually
    * cover — each hit occupies token positions [p, p+4], overlapping hits
    * are merged into maximal spans (the interval-union problem), and the
    * document reports span count, covered tokens, and covered ppm. The
    * distinction matters for decontamination policy: 40 overlapping hits in
    * one 50-token block is one boilerplate quote to excise; 40 scattered
    * hits is a document to drop.
    *
    * Scale: hits are benchmark-overlap-sized (≪ corpus); the interval
    * merge is the classic two-window pass — running max(end) over
    * preceding rows flags span starts, a running sum assigns span ids —
    * and BOTH windows share one (doc_id, start) partitioning, so the
    * merge costs a single hit-sized shuffle. No per-document loops. */
  def q138ContamSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
      .withColumn("ws", split($"text", " "))
      .filter(size($"ws") >= 5)
      .select($"doc_id", $"ws", size($"ws").cast("long").as("n_tokens"))
    val g = d.select($"doc_id", $"n_tokens", explode(expr(
        """transform(sequence(1, size(ws) - 4), i -> struct(
          |  CAST(i AS BIGINT) AS pos,
          |  concat_ws(' ', slice(ws, CAST(i AS INT), 5)) AS gram))""".stripMargin))
        .as("pg"))
      .select($"doc_id", $"n_tokens", $"pg.pos".as("pos"), $"pg.gram".as("gram"))
    val ev = g.filter($"doc_id" % 20 === 0).select($"gram").distinct()
    val hits = g.filter($"doc_id" % 20 =!= 0)
      .join(broadcast(ev), Seq("gram"))
      .select($"doc_id", $"n_tokens", $"pos".as("s"), ($"pos" + 4L).as("e"))
    val byStart = Window.partitionBy($"doc_id").orderBy($"s")
    val wPrev = byStart.rowsBetween(Window.unboundedPreceding, -1)
    val wCum  = byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits
      .withColumn("prev_end", max($"e").over(wPrev))
      .withColumn("new_span",
        when($"prev_end".isNull || $"s" > $"prev_end", 1L).otherwise(0L))
      .withColumn("span_id", sum($"new_span").over(wCum))
      .groupBy($"doc_id", $"span_id")
      .agg(max($"n_tokens").as("n_tokens"),
        min($"s").as("ss"), max($"e").as("ee"))
      .groupBy($"doc_id")
      .agg(max($"n_tokens").as("n_tokens"),
        count(lit(1)).as("n_spans"),
        sum($"ee" - $"ss" + 1L).as("covered_tokens"))
      .withColumn("covered_ppm",
        expr("covered_tokens * 1000000 div n_tokens"))
      .orderBy($"doc_id")
  }

  /** X105 — skip-gram pair extraction (word2vec-style training pairs):
    * co-occurring word pairs at distance 1 and 2 within each document,
    * counted over the corpus — the expansion step that feeds embedding
    * training and co-occurrence-matrix builds.
    *
    * Scale: the expansion is a NARROW flatten-of-transform HOF over token
    * positions (≤2 pairs per token, no positional self-join, no (doc,pos)
    * shuffle); `try_element_at` keeps the i+2 probe in ANSI-safe codegen.
    * The pair count is ONE combinable shuffle on the (w1, w2) key, and
    * the top-k skim is a driver-sized TakeOrdered over the total order
    * (count desc, w1, w2). */
  def q139Skipgrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = docs(s, dir)
      .withColumn("ws", split($"text", " "))
      .filter(size($"ws") >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ws) - 1), i -> filter(array(
          |  struct(element_at(ws, CAST(i AS INT)) AS w1,
          |         element_at(ws, CAST(i + 1 AS INT)) AS w2),
          |  struct(element_at(ws, CAST(i AS INT)) AS w1,
          |         try_element_at(ws, CAST(i + 2 AS INT)) AS w2)),
          |  x -> x.w2 IS NOT NULL)))""".stripMargin)).as("p"))
      .select($"p.w1".as("w1"), $"p.w2".as("w2"))
    pairs.groupBy($"w1", $"w2")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"n_pairs".desc, $"w1", $"w2")
      .limit(50)
  }

  /** X112 — INTRA-document repetition: per document, how many of its own
    * 10-word chunks are repeats of earlier chunks in the SAME document —
    * the within-doc complement of q77's cross-doc chunk dedup, and the
    * signal that catches looping generations / copy-pasted boilerplate
    * inside one document (a Gopher-style quality gate that X29's
    * longest-run metric misses when the repeated unit is a phrase, not a
    * word).
    *
    * Scale: ZERO shuffles — chunking and the distinct count are
    * higher-order functions over the split array, so the whole operator
    * runs at scan throughput (only the presentation orderBy is wide).
    * Chunk geometry is exactly q77's, so the two signals compose. */
  def q145IntraDocRepetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .withColumn("ws", split($"text", " "))
      .select($"doc_id", expr(chunk10Expr).as("cs"))
      .select($"doc_id",
        size($"cs").cast("long").as("n_chunks"),
        size(array_distinct($"cs")).cast("long").as("n_unique"))
      .withColumn("rep_ppm",
        expr("(n_chunks - n_unique) * 1000000 div n_chunks"))
      .orderBy($"doc_id")
  }

  /** X113 — integer BM25-surrogate relevance ranking: score every document
    * against a fixed query-term set with the BM25 shape — saturating term
    * frequency times a rarity weight — in pure integer arithmetic:
    * idf_ppm(t) = N·10⁶ div (df(t)+1) and tf_sat_ppm = tf·2·10⁶ div (tf+1)
    * (the k₁=1 saturation curve), score = Σ idf·sat div 10⁶. Both factors
    * are monotone in their BM25 counterparts, so the RANKING matches what
    * log-based BM25 would produce for a fixed query while staying
    * engine-exact (no libm). The data-curation use: quality-biased
    * retrieval of documents relevant to a probe topic.
    *
    * Scale: per-term tf is a narrow `filter` HOF (the query is 3 literal
    * terms — no explode, no inverted index needed for a fixed probe); the
    * df/N statistics are ONE 1-row aggregate broadcast back; the top-k is
    * a driver-sized TakeOrdered. The corpus never shuffles. */
  def q146Bm25Probe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val terms = Seq("spark", "merge", "hash")
    val d = docs(s, dir).select($"doc_id", split($"text", " ").as("ws"))
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains($"ws", t), 1L).otherwise(0L)).as(s"df$i")
    }
    val stats = d.agg(count(lit(1)).as("n"), dfCols: _*)
    val withTf = terms.zipWithIndex.foldLeft(d) { case (df, (t, i)) =>
      df.withColumn(s"tf$i",
        expr(s"size(filter(ws, w -> w = '$t'))").cast("long"))
    }
    val scored = withTf.crossJoin(broadcast(stats))
      .withColumn("score", terms.indices.map { i =>
        expr(s"""CASE WHEN tf$i > 0
                |  THEN (n * 1000000 div (df$i + 1))
                |       * (tf$i * 2000000 div (tf$i + 1)) div 1000000
                |  ELSE 0 END""".stripMargin)
      }.reduce(_ + _))
    scored.select(($"doc_id" +: $"score" +:
        terms.indices.map(i => col(s"tf$i").as(s"tf_${terms(i)}"))): _*)
      .orderBy($"score".desc, $"doc_id")
      .limit(20)
  }

  /** X121 — curation funnel report: the stage-by-stage survival counts of
    * the cleaning pipeline (raw → exact-dedup → quality gate → sampling),
    * with X33's exact gate definitions so the funnel reconciles against
    * q74's per-reason breakdown — the one-page answer to "where did my
    * tokens go?" that every corpus rebuild publishes.
    *
    * Scale: ONE corpus scan computes every flag (dedup keep-id is the
    * only wide step — q74's md5-key min window); the four stages are
    * conditional sums in ONE combinable aggregate, and the report is a
    * 4-row frame exploded from that single aggregate row — stages never
    * rescan. */
  def q154CurationFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    val flagged = docs(s, dir)
      .withColumn("n_words", size(split($"text", " ")).cast("long"))
      .withColumn("fp", expr("graft_fingerprint(text)"))
      .withColumn("keep_id",
        min($"doc_id").over(Window.partitionBy(
          dedupKey)))
      .withColumn("s1", $"doc_id" === $"keep_id")
      .withColumn("s2", $"s1" && $"n_words" >= 20 && $"n_words" <= 500)
      .withColumn("s3", $"s2" && $"fp" % 10 < 8)
    val one = flagged.agg(
      count(lit(1)).as("d0"), sum($"n_words").as("t0"),
      sum(when($"s1", 1L).otherwise(0L)).as("d1"),
      sum(when($"s1", $"n_words").otherwise(0L)).as("t1"),
      sum(when($"s2", 1L).otherwise(0L)).as("d2"),
      sum(when($"s2", $"n_words").otherwise(0L)).as("t2"),
      sum(when($"s3", 1L).otherwise(0L)).as("d3"),
      sum(when($"s3", $"n_words").otherwise(0L)).as("t3"))
    one.select(explode(expr(
        """array(
          |  struct(0L AS stage, 'raw' AS stage_name, d0 AS n_docs, t0 AS n_tokens),
          |  struct(1L AS stage, 'exact_dedup' AS stage_name, d1 AS n_docs, t1 AS n_tokens),
          |  struct(2L AS stage, 'quality' AS stage_name, d2 AS n_docs, t2 AS n_tokens),
          |  struct(3L AS stage, 'sampled' AS stage_name, d3 AS n_docs, t3 AS n_tokens))"""
          .stripMargin)).as("r"))
      .select($"r.stage", $"r.stage_name", $"r.n_docs", $"r.n_tokens")
      .orderBy($"stage")
  }

  /** X125 — vocabulary coverage curve: what fraction of corpus TOKENS do
    * the top-k vocabulary TYPES cover, for k ∈ {10, 100, 1000, 10000}?
    * The sizing curve behind every tokenizer-vocabulary decision (q113
    * scores documents against one fixed vocab; this reports the corpus-
    * level tradeoff that picks the vocab size in the first place).
    *
    * Scale: the word-count shuffle is combinable; ranking the vocabulary
    * frame by (count desc, word) runs through [[graft.operators
    * .GlobalOrder]]'s two-phase range shuffle — the vocabulary NEVER
    * lands on the driver and there is no single-task unpartitioned
    * window; all four cuts are conditional sums in ONE combinable pass
    * over the ranked frame (not four scans); the report is 4 rows. */
  def q157VocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = docs(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
    val ranked = graft.operators.GlobalOrder.withRowNumber(
      vocab, Seq($"n".desc, $"w".asc), "rk")
    val cuts = Seq(10L, 100L, 1000L, 10000L)
    val aggCols =
      Seq(count(lit(1)).as("n_types"), sum($"n").as("n_tokens")) ++
        cuts.map(k => sum(when(col("rk") <= k, col("n")).otherwise(0L)).as(s"c$k"))
    val one = ranked.agg(aggCols.head, aggCols.tail: _*)
    one.select(explode(expr(
        cuts.map(k => s"struct(${k}L AS k, c$k AS covered_tokens)")
          .mkString("array(", ", ", ")"))).as("r"),
        $"n_types", $"n_tokens")
      .select($"r.k".as("k"), $"n_types", $"n_tokens", $"r.covered_tokens",
        expr("r.covered_tokens * 1000000 div n_tokens").as("coverage_ppm"))
      .orderBy($"k")
  }

  /** X133 — dataset-card report: the per-(source, language) release
    * dashboard — document/token mass, exact-duplicate share (q154's md5
    * keep-id rule, so the card reconciles with the funnel), mean
    * distinct-word quality (q31's integer millis), and the short/long
    * tails. One artifact a consumer reads before training on a corpus
    * drop.
    *
    * Scale: every signal rides ONE scan; the md5 keep-id window is the
    * only wide step (uniform content-hash keys — no skew); the card fold
    * is a combinable aggregate into a (sources × langs) frame. */
  def q166DatasetCard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keepW = Window.partitionBy(
      dedupKey)
    docs(s, dir)
      .withColumn("n_words", size(split($"text", " ")).cast("long"))
      .withColumn("uniq_words",
        size(array_distinct(split($"text", " "))).cast("long"))
      .withColumn("keep_id", min($"doc_id").over(keepW))
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_words").as("n_tokens"),
        sum(when($"doc_id" =!= $"keep_id", 1L).otherwise(0L)).as("dup_docs"),
        sum(expr("uniq_words * 1000 div n_words")).as("sum_quality_millis"),
        sum(when($"n_words" < 20, 1L).otherwise(0L)).as("short_docs"),
        sum(when($"n_words" > 500, 1L).otherwise(0L)).as("long_docs"))
      .withColumn("mean_quality_millis",
        expr("sum_quality_millis div n_docs"))
      .orderBy($"source", $"lang")
  }

  /** X159 — vocabulary drift between corpus snapshots: split the corpus
    * into two deterministic halves (doc_id parity — the stand-in for
    * consecutive ingest batches) and measure, per language, how much of
    * the second half's vocabulary and token mass is NEW relative to the
    * first — the growth signal that decides when a tokenizer vocabulary
    * needs rebuilding (q113 scores against a FIXED vocab; this measures
    * the drift that invalidates it).
    *
    * Scale: each half folds to a (lang, word) distinct (combinable);
    * the novelty probe is a left anti-join on the uniform (lang, word)
    * key — vocabulary-sized, never corpus-sized; token counts ride the
    * same folds; the report is \|langs\| rows. */
  def q191VocabDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = docs(s, dir)
      .select($"lang", ($"doc_id" % 2 === 1).as("second"),
        explode(split($"text", " ")).as("w"))
    val vocabA = words.filter(!$"second").select($"lang", $"w").distinct()
    val bTypes = words.filter($"second")
      .groupBy($"lang", $"w").agg(count(lit(1)).as("n"))
    val novel = bTypes.join(vocabA, Seq("lang", "w"), "left_anti")
      .groupBy($"lang")
      .agg(count(lit(1)).as("new_types"), sum($"n").as("new_tokens"))
    val bTotals = bTypes.groupBy($"lang")
      .agg(count(lit(1)).as("b_types"), sum($"n").as("b_tokens"))
    bTotals.join(novel, Seq("lang"), "left")
      .select($"lang", $"b_types", $"b_tokens",
        coalesce($"new_types", lit(0L)).as("new_types"),
        coalesce($"new_tokens", lit(0L)).as("new_tokens"))
      .withColumn("new_type_ppm", expr("new_types * 1000000 div b_types"))
      .withColumn("new_token_ppm", expr("new_tokens * 1000000 div b_tokens"))
      .orderBy($"lang")
  }

  /** X164 — Zipf rank-frequency audit: per log10 rank band (1-9, 10-99,
    * 100-999, ...), the Σ rank·freq mass and the band's token share in
    * integer ppm — under Zipf's law rank·freq is roughly constant, so a
    * corpus whose bands diverge wildly from flat is synthetic, templated
    * or truncated (exactly what a pretraining-data pipeline wants to
    * notice BEFORE training). Purely integer — no log-log regression,
    * no floats.
    *
    * Scale: the word fold is combinable; ranking runs through
    * GlobalOrder's two-phase range shuffle (vocabulary never on the
    * driver); the band fold is combinable into ≤ ~7 rows; total via
    * broadcast 1-row aggregate. */
  /** int64 headroom note: a band's Σ rank·freq is bounded by
    * N·(types in band) for Zipf-shaped counts (n ≈ N/rank), so at
    * ~10¹³ tokens × 10⁹ types the top bands approach 2^63 — past that,
    * compute rank_freq_mass in DECIMAL(38,0) (q212's rule). At any SF
    * this suite runs, the sum is far inside int64. */
  def q196ZipfAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = docs(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
    val ranked = graft.operators.GlobalOrder.withRowNumber(
      vocab, Seq($"n".desc, $"w".asc), "rk")
    val banded = ranked
      .withColumn("band", (length($"rk".cast("string")) - 1).cast("long"))
      .groupBy($"band")
      .agg(count(lit(1)).as("n_types"), sum($"n").as("band_tokens"),
        sum($"rk" * $"n").as("rank_freq_mass"),
        min($"n").as("min_freq"), max($"n").as("max_freq"))
    val total = banded.agg(sum($"band_tokens").as("total_tokens"))
    banded.crossJoin(broadcast(total))
      .withColumn("token_share_ppm",
        expr("band_tokens * 1000000 div total_tokens"))
      .select($"band", $"n_types", $"band_tokens", $"token_share_ppm",
        $"rank_freq_mass", $"min_freq", $"max_freq")
      .orderBy($"band")
  }

  /** X168 — corpus release scorecard: the one-look gate — every headline
    * number a release review asks for, from ONE scan plus the md5
    * keep-id window: document/token mass, exact-duplicate count (q154's
    * rule), short-document tail (q154's quality gate), the replayable
    * eval-band size (X127's split), standing deletion requests (X128's
    * rule), blocklisted provenance (X126's planted rule) and planted
    * template copies (X151's rule). Every metric reconciles with the
    * operator that owns it — this row set is the index, not a fork.
    *
    * Scale: ONE scan, one content-hash window, one 1-row aggregate
    * exploded to the metric rows. */
  def q200Scorecard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    val one = docs(s, dir)
      .withColumn("n_words", size(split($"text", " ")).cast("long"))
      .withColumn("fp",
        expr("graft_fingerprint(concat(coalesce(text, ''), CAST(doc_id AS STRING)))"))
      .withColumn("keep_id", min($"doc_id").over(Window.partitionBy(
        dedupKey)))
      .agg(
        count(lit(1)).as("m_docs"),
        sum($"n_words").as("m_tokens"),
        sum(when($"doc_id" =!= $"keep_id", 1L).otherwise(0L)).as("m_dups"),
        sum(when($"n_words" < 20, 1L).otherwise(0L)).as("m_short"),
        sum(when($"fp" % 10 === 9, 1L).otherwise(0L)).as("m_eval"),
        sum(when($"doc_id" % 19 === 0, 1L).otherwise(0L)).as("m_forget"),
        sum(when((pmod($"doc_id", lit(40L)) * 2654435761L % 40L) % 10L === 3L, 1L)
          .otherwise(0L)).as("m_blocked"),
        sum(when($"doc_id" % 23 === 0, 1L).otherwise(0L)).as("m_template"))
    one.select(explode(expr(
        """array(
          |  struct('n_docs' AS metric, m_docs AS value),
          |  struct('n_tokens' AS metric, m_tokens AS value),
          |  struct('exact_dup_docs' AS metric, m_dups AS value),
          |  struct('short_docs' AS metric, m_short AS value),
          |  struct('eval_band_docs' AS metric, m_eval AS value),
          |  struct('deletion_requests' AS metric, m_forget AS value),
          |  struct('blocklisted_docs' AS metric, m_blocked AS value),
          |  struct('template_docs' AS metric, m_template AS value))""".stripMargin))
        .as("r"))
      .select($"r.metric", $"r.value")
      .orderBy($"metric")
  }

  /** X171 — distinctive terms per source: the top-5 words whose share of
    * a source's token stream most exceeds their corpus-wide share
    * (integer-ppm lift, n ≥ 20 floor against one-off flukes) — the
    * "source signature" a crawl triage reads to spot a feed gone
    * boilerplate or off-topic. Lift, not raw tf-idf: q49 ranks terms
    * WITHIN a document; this contrasts a source AGAINST the corpus.
    *
    * Scale: one combinable (source, word) fold; corpus-wide word totals
    * are vocabulary-sized and join on the uniform word key; the top-k
    * is one window over the per-source candidate frame. Lift in ppm:
    * cnt·T·10⁶ div (tot_w·S) — int64-safe to ~10⁹-token sources per
    * word (document larger with a pre-scaled share). */
  def q203SourceTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = docs(s, dir)
      .select($"source", explode(split($"text", " ")).as("w"))
    val bySrc = words.groupBy($"source", $"w").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= 20)
    val byWord = words.groupBy($"w").agg(count(lit(1)).as("tot_w"))
    val srcTotals = words.groupBy($"source").agg(count(lit(1)).as("src_total"))
    val grand = words.agg(count(lit(1)).as("grand_total"))
    val win = Window.partitionBy($"source")
      .orderBy($"lift_ppm".desc, $"w".asc)
    bySrc
      .join(byWord, Seq("w"))
      .join(broadcast(srcTotals), Seq("source"))
      .crossJoin(broadcast(grand))
      .withColumn("lift_ppm",
        expr("cnt * grand_total * 1000000 div (tot_w * src_total)"))
      .withColumn("rk", row_number().over(win).cast("long"))
      .filter($"rk" <= 5)
      .select($"source", $"rk", $"w", $"cnt", $"lift_ppm")
      .orderBy($"source", $"rk")
  }

  /** X172 — duplicate rate by length band: exact-dup share (q154's md5
    * keep-id rule) per 100-char length band — the "are duplicates
    * short?" bias diagnostic that decides whether dedup will skew the
    * length distribution (if dup_ppm concentrates in one band, removal
    * reshapes the corpus there). Reuses [[TextOps.lengthBand]], so the
    * bands line up with q114's histogram and q129's drift monitor.
    *
    * Scale: ONE scan + the md5 window + a combinable ~20-row band fold. */
  def q204DupByLength(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .withColumn("keep_id", min($"doc_id").over(Window.partitionBy(
        dedupKey)))
      .withColumn("band", TextOps.lengthBand("n_chars"))
      .groupBy($"band")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"doc_id" =!= $"keep_id", 1L).otherwise(0L)).as("dup_docs"))
      .withColumn("dup_ppm", expr("dup_docs * 1000000 div n_docs"))
      .orderBy($"band")
  }

  /** X173 — word-length distribution: token count and corpus share per
    * exact word length (chars) — the subword-tokenizer sizing diagnostic
    * (the longer the tail, the more a fixed BPE merges pay off; a spike
    * at one length flags templated ids). Word lengths are naturally
    * bounded, so the exact distribution IS small — no banding needed.
    *
    * Scale: one narrow explode + ONE combinable \|lengths\| fold with a
    * broadcast 1-row total. */
  def q205WordLengths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = docs(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .select(length($"w").cast("long").as("len"))
    val hist = w.groupBy($"len").agg(count(lit(1)).as("n_words"))
    val total = hist.agg(sum($"n_words").as("total"))
    hist.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("n_words * 1000000 div total"))
      .select($"len", $"n_words", $"share_ppm")
      .orderBy($"len")
  }

  /** X182 — normalization-sensitivity of exact dedup: how many duplicate
    * docs appear only after case-folding + whitespace collapse — the
    * number that says whether X1's byte-exact pass is leaving trivial
    * formatting twins behind (the classic gap between "md5 dedup" and
    * "what a human calls identical"). The corpus carries no natural
    * formatting twins, so the detector is proven on PLANTED ones (q81's
    * rule: planted ground truth makes every verdict checkable): every
    * 25th doc gains an uppercased, double-spaced copy that byte-exact
    * dedup must miss and normalized dedup must catch; planted copies take
    * id = -doc_id - 1, disjoint from real (non-negative) ids at any
    * corpus size. The whitespace class is the explicit [ \t\n\r] so Java
    * regex and RE2 agree (\s differs on \x0B).
    *
    * Scale: entirely narrow until ONE combinable source fold — both
    * hashes ride the same scan projection; the two count-distincts
    * partial-aggregate in one Expand pass (X68's pattern). */
  def q214NormDedupDelta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.load(s, dir, "documents")
      .select($"doc_id", $"source", $"text")
    // planted ids live in the NEGATIVE range (-doc_id - 1), which cannot
    // collide with real ids at any corpus size (real doc_id >= 0); a fixed
    // positive offset would silently collide once the corpus passes it
    val planted = d.filter($"doc_id" % 25 === 0)
      .select((-$"doc_id" - 1L).as("doc_id"), $"source",
        expr("replace(upper(text), ' ', '  ')").as("text"))
    d.unionByName(planted)
      .select($"doc_id", $"source",
        // q74's null invariant on BOTH hashes: md5(NULL) is NULL, which
        // countDistinct skips — every null-text doc would silently count
        // as an exact duplicate; the per-doc sentinel keeps them unique
        coalesce(md5($"text"), concat(lit("null:"), $"doc_id"))
          .as("h_exact"),
        coalesce(md5(trim(regexp_replace(lower($"text"), "[ \\t\\n\\r]+", " "))),
          concat(lit("null:"), $"doc_id")).as("h_norm"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"h_exact").as("exact_unique"),
        countDistinct($"h_norm").as("norm_unique"),
        sum(when($"doc_id" < 0L, 1L).otherwise(0L)).as("n_planted"))
      .withColumn("exact_dup_docs", $"n_docs" - $"exact_unique")
      .withColumn("extra_norm_dups", $"exact_unique" - $"norm_unique")
      .orderBy($"source")
  }

  /** X194 — BPE merge learning (the subword-tokenizer trainer): the
    * classic byte-pair-encoding loop over the word-TYPE dictionary —
    * count adjacent symbol pairs weighted by type frequency, merge the
    * most frequent pair (ties: count desc, left asc, right asc — a total
    * order, so the merge table is deterministic), apply left-to-right
    * non-overlapping, repeat. This is how real tokenizer vocabularies
    * are built; the output is the ranked merge table itself.
    *
    * Scale: the ONLY corpus-sized work is the distributed word-type fold;
    * the trainer then runs on the top-V type dictionary (count desc, word
    * asc — deterministic cap), exactly how production BPE trainers bound
    * their input (HF tokenizers trains on word counts, not the corpus).
    * V×8 driver work is microseconds; nothing corpus-sized ever reaches
    * the driver.
    *
    * Engine portability: merge application is expressed over a
    * bracketed-symbol string `(a)(b)(c)` where replacing `(l)(r)` with
    * `(lr)` under plain left-to-right non-overlapping `replace` is
    * EXACTLY the BPE merge rule (delimiters are balanced per symbol, so
    * no match shares characters with the next and no symbol-prefix can
    * false-match) — the same arithmetic DuckDB's unrolled CTE chain
    * replays with its own `replace`. Words are restricted to `[a-z]+` so
    * the brackets can never collide with symbol bytes. */
  /** The pure trainer core: greedy BPE over a (word, count) type
    * dictionary — pair counts weighted by type frequency, arg-max under
    * the (count desc, left asc, right asc) total order, left-to-right
    * non-overlapping application. Factored out so the algorithm is
    * property-testable without a SparkSession (PropertySpec fuzzes
    * random dictionaries for prefix stability and count monotonicity). */
  private[graft] def learnMerges(types: Seq[(String, Long)],
      nMerges: Int): Seq[(Long, String, String, Long)] = {
    var seqs: Seq[(Array[String], Long)] =
      types.map { case (w, n) => (w.split("").filter(_.nonEmpty), n) }
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (sl, n) =>
        var i = 0
        while (i < sl.length - 1) {
          counts((sl(i), sl(i + 1))) =
            counts.getOrElse((sl(i), sl(i + 1)), 0L) + n
          i += 1
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l0, r0), c0) => (-c0, l0, r0) }.head
        merges += ((rank.toLong, l, r, c))
        seqs = seqs.map { case (sl, n) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < sl.length) {
            if (i < sl.length - 1 && sl(i) == l && sl(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += sl(i); i += 1 }
          }
          (out.result().toArray, n)
        }
      }
    }
    merges.result()
  }

  def q226BpeMerges(s: SparkSession, dir: String, vocabCap: Int = 256,
      nMerges: Int = 8): DataFrame = {
    import s.implicits._
    val types = docs(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w".rlike("\\A[a-z]+\\z"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"w").limit(vocabCap)
      .as[(String, Long)].collect()
    // driver trainer over the bounded type dict (V rows, 8 rounds)
    learnMerges(types.toSeq, nMerges)
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .orderBy($"merge_rank")
  }

  /** X195 — BPE tokenization fertility: apply q226's learned merge table
    * to EVERY corpus token and report, per language, whitespace words vs
    * BPE subtokens and the compression in ppm — the standing "how many
    * tokens is this corpus" audit behind every training-budget estimate,
    * and the reconciliation proof that the trainer's output actually
    * drives tokenization (subtokens ≤ chars, ≥ words, by construction).
    *
    * Scale: the trainer cost is q226's (one distributed type fold + a
    * bounded driver loop); application is a NARROW chain of 8 `replace`
    * calls over the bracketed-symbol rendering of each token — pure
    * codegen string work at scan throughput, no join against a
    * vocabulary, no shuffle before the \|langs\| fold. Subtoken counts
    * derive arithmetically from separator counts — the symbol array is
    * never materialized. */
  def q227BpeFertility(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merges = q226BpeMerges(s, dir).collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
    val bracketed = "concat('(', array_join(filter(split(w, ''), " +
      "c -> c <> ''), ')('), ')')"
    val applied = merges.foldLeft(bracketed) { case (e, (l, r)) =>
      s"replace($e, '($l)($r)', '($l$r)')"
    }
    docs(s, dir)
      .select($"lang", explode(split($"text", " ")).as("w"))
      .filter($"w".rlike("\\A[a-z]+\\z"))
      .select($"lang", length($"w").cast("long").as("n_chars"),
        expr(applied).as("bs"))
      .select($"lang", $"n_chars",
        expr("(length(bs) - length(replace(bs, ')(', ''))) div 2 + 1")
          .as("n_sub"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_words"),
        sum($"n_chars").as("n_chars"),
        sum($"n_sub").as("n_subtokens"))
      .withColumn("compression_ppm",
        expr("n_subtokens * 1000000 div n_chars"))
      .orderBy($"lang")
  }

  /** The q227 oracle composes [[bpeLearnWith]]'s chain: after the rounds
    * re-learn b1..bN, the token stream is bracketed and run through the
    * same N scalar-subquery `replace` steps, then folded per lang. Each
    * step's pattern is COALESCEd to an unmatchable chr(1) sentinel so a
    * round that learned nothing (empty b_r → NULL subquery) is a no-op
    * instead of NULL-poisoning every token — mirroring the Spark side,
    * which simply applies fewer merges. */
  def bpeFertilityOracleSql(vocabCap: Int = 256, nMerges: Int = 8): String = {
    val applied = (1 to nMerges).foldLeft("bs") { (e, r) =>
      s"replace($e, coalesce('(' || (SELECT lsym FROM b$r) || ')(' || " +
        s"(SELECT rsym FROM b$r) || ')', chr(1)), " +
        s"coalesce('(' || (SELECT lsym FROM b$r) || " +
        s"(SELECT rsym FROM b$r) || ')', ''))"
    }
    s"""${bpeLearnWith(vocabCap, nMerges)},
       |toks AS (SELECT lang, w,
       |    '(' || array_to_string(list_filter(string_split(w, ''),
       |      c -> c <> ''), ')(') || ')' AS bs
       |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
       |        FROM documents)
       |  WHERE regexp_full_match(w, '[a-z]+')),
       |app AS (SELECT lang, CAST(len(w) AS BIGINT) AS n_chars,
       |    (len($applied) - len(replace($applied, ')(', ''))) // 2 + 1 AS n_sub
       |  FROM toks)
       |SELECT lang, count(*) AS n_words,
       |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |  CAST(sum(n_sub) AS BIGINT) AS n_subtokens,
       |  CAST(sum(n_sub) * 1000000 // sum(n_chars) AS BIGINT)
       |    AS compression_ppm
       |FROM app GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** X202 — perplexity-bucketed corpus composition (the CCNet recipe,
    * deciles instead of head/middle/tail thirds): score every document
    * with X70's integer bigram-LM predictability surrogate, rank the
    * corpus by (score, doc_id) — a TOTAL order, so buckets are
    * deterministic — and report per (decile, source) document counts,
    * pair mass, and score bounds. This is the table a curation run reads
    * to decide which perplexity band to keep and how each source is
    * distributed across bands (a source concentrated in the
    * least-predictable decile is the classic junk signal).
    *
    * Scale: X70's shapes end in a doc-sized scored frame; the global
    * rank is [[graft.operators.GlobalOrder]]'s two-phase range shuffle
    * (never a single-task window); the total-count divisor comes back
    * FREE from withRowNumberAndTotal's per-partition count job — a
    * separate `scored.agg(count)` would re-derive the whole q107 chain
    * (corpus scan, two corpus-wide aggregations, dict join) a second
    * time; the report frame is ≤ 10×\|sources\|. */
  def q234PerplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = q107BigramLm(s, dir)
      .select($"doc_id", $"n_pairs", $"avg_predict_ppm".as("score"))
      .join(docs(s, dir).select($"doc_id", $"source"), Seq("doc_id"))
    val (ranked, nTotal) = graft.operators.GlobalOrder.withRowNumberAndTotal(
      scored, Seq($"score", $"doc_id"), "rk")
    ranked
      .withColumn("decile", expr(s"(rk - 1) * 10 div ${nTotal}L"))
      .groupBy($"decile", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_pairs").as("n_pairs"),
        min($"score").as("min_score_ppm"),
        max($"score").as("max_score_ppm"))
      .orderBy($"decile", $"source")
  }

  /** X214 — next-fit-decreasing sequence packing: the bin-packing
    * QUALITY step the packing family lacked — X39 concat-and-chunks in
    * arrival order (splitting documents across context boundaries) and
    * X199 only sweeps capacities; NFD actually assigns documents to
    * bins: sort a bounded batch by token cost descending, walk once,
    * close the bin when the next document no longer fits. Per batch:
    * bins opened, tokens placed, waste (padding) and the oversize count
    * (docs longer than the context, truncated to it).
    *
    * Scale: batches are BOUNDED BY CONSTRUCTION (doc_id div 64 — the
    * per-worker packing granularity), so the per-batch collect_list
    * array is ≤64 entries at ANY corpus size and the NFD walk is one
    * codegen'd aggregate() fold over it. ONE batch-key shuffle, report
    * is |corpus|/64 rows. The fold state is a 2-long array
    * [bins, fill]; fill starts AT capacity so the first document always
    * opens a bin. */
  def q247NfdPacking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cap = 512L
    docs(s, dir)
      .select($"doc_id", expr("doc_id div 64").as("batch_id"),
        least(size(split($"text", " ")).cast("long"), lit(cap)).as("cost"),
        (size(split($"text", " ")).cast("long") > cap).cast("long")
          .as("oversize"))
      .groupBy($"batch_id")
      .agg(count(lit(1)).as("n_docs"),
        sum($"cost").as("total_tokens"),
        sum($"oversize").as("n_oversize"),
        // (-cost, doc_id) sorts cost DESC with doc_id ASC ties — the
        // deterministic NFD input order
        sort_array(collect_list(array(-$"cost", $"doc_id"))).as("q"))
      .withColumn("n_bins", expr(
        s"""element_at(aggregate(q, array(0L, ${cap}L),
           |  (acc, x) -> IF(element_at(acc, 2) - element_at(x, 1) <= ${cap}L,
           |    array(element_at(acc, 1),
           |          element_at(acc, 2) - element_at(x, 1)),
           |    array(element_at(acc, 1) + 1, -element_at(x, 1)))), 1)""".stripMargin))
      .withColumn("waste_tokens", $"n_bins" * cap - $"total_tokens")
      .withColumn("waste_ppm",
        expr(s"waste_tokens * 1000000 div (n_bins * ${cap}L)"))
      .select($"batch_id", $"n_docs", $"total_tokens", $"n_oversize",
        $"n_bins", $"waste_tokens", $"waste_ppm")
      .orderBy($"batch_id")
  }

  /** X212 — decontamination EXECUTION (the apply twin of X34, the
    * pattern q144 set for q89's compaction plan and q189 for q151's
    * rebalance weights): drop every train document whose q76
    * contamination verdict reaches 10% (contam_permille >= 100), keep
    * the rest — including the sub-5-word docs q76 has no gram evidence
    * for — and emit the per-source survival report with the kept-set
    * doc_id checksum that pins the EXACT membership of the cleaned
    * corpus, not just its size. Eval docs (doc_id % 20 = 0) are the
    * benchmark itself and are excluded from the output corpus.
    *
    * Scale: rides q76's frame (one gram fold + broadcast eval probe),
    * one uniform doc_id join onto the train scan, one combinable
    * per-source fold — nothing new shuffles at corpus width. */
  def q245DecontamApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val verdict = q76Contamination(s, dir)
      .select($"doc_id", $"contam_permille")
    docs(s, dir).filter($"doc_id" % 20 =!= 0)
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_words"))
      .join(verdict, Seq("doc_id"), "left")
      .withColumn("flagged",
        (coalesce($"contam_permille", lit(0L)) >= 100L).cast("long"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"flagged").as("n_dropped"),
        coalesce(sum(when($"flagged" === 0L, $"doc_id")), lit(0L))
          .as("kept_id_sum"),
        sum(when($"flagged" === 0L, $"n_words").otherwise(0L))
          .as("kept_words"))
      .withColumn("n_kept", $"n_docs" - $"n_dropped")
      .withColumn("dropped_ppm", expr("n_dropped * 1000000 div n_docs"))
      .select($"source", $"n_docs", $"n_dropped", $"n_kept",
        $"kept_id_sum", $"kept_words", $"dropped_ppm")
      .orderBy($"source")
  }

  /** X210 — corpus novelty curve (diversity-growth / saturation audit):
    * in doc_id ingestion order, the fraction of each decile's distinct
    * 5-grams that are FIRST occurrences (no earlier doc contains them) —
    * the curve collection decisions read: a collapsing tail means new
    * data re-treads the corpus (the saturation signal scaling-law
    * ablations watch), a flat curve means the source still adds
    * diversity. Shares q76's 5-gram spelling so the two audits agree on
    * the gram space.
    *
    * Scale: per-doc distinct grams explode once (narrow); first-seen is
    * ONE combinable min(doc_id) fold on the gram key — raw gram strings,
    * exact in both engines with no collision caveat (the deliberate
    * tradeoff vs q224's packed key: ~40-byte shuffle keys, zero
    * false-merges); novel-per-doc re-aggregates that fold's OUTPUT
    * (gram-vocabulary-sized), never the occurrence frame; deciles via
    * GlobalOrder's two-phase rank on the doc-cardinality stats frame
    * (q234's pattern — no unpartitioned window anywhere). */
  def q243NoveltyCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
      .withColumn("ws", split($"text", " "))
      .filter(size($"ws") >= 5)
    val grams = d.select($"doc_id", explode(array_distinct(expr(
      "transform(sequence(1, size(ws) - 4), i -> concat_ws(' ', slice(ws, CAST(i AS INT), 5)))"))).as("g"))
    val perDoc = grams.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
    val novel = grams.groupBy($"g").agg(min($"doc_id").as("doc_id"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_novel"))
    val stats = perDoc.join(novel, Seq("doc_id"), "left")
      .select($"doc_id", $"n_grams",
        coalesce($"n_novel", lit(0L)).as("n_novel"))
    val (ranked, nTotal) = graft.operators.GlobalOrder.withRowNumberAndTotal(
      stats, Seq($"doc_id"), "rk")
    ranked
      .withColumn("decile", expr(s"(rk - 1) * 10 div ${nTotal}L"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_grams").as("n_grams"),
        sum($"n_novel").as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_grams"))
      .orderBy($"decile")
  }

  /** The shared WITH-clause prefix both generated oracles build on: the
    * type dictionary, the bracketed v0 rendering, and one (pair-count,
    * arg-max, replace-apply) CTE triple per merge round. Every round CTE
    * is MATERIALIZED: each references its predecessor several times, and
    * default CTE inlining would expand the chain exponentially (4^rounds
    * re-scans of the source). Exposed as a builder — NOT recovered by
    * string surgery on a finished query — so the two consumers cannot
    * drift apart. */
  private def bpeLearnWith(vocabCap: Int, nMerges: Int): String = {
    val rounds = (1 to nMerges).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT n, unnest(list_transform(generate_series(1, len(sl) - 1),
         |    i -> {'l': sl[i], 'r': sl[i + 1]})) AS pr
         |  FROM (SELECT n, string_split(trim(s, '()'), ')(') AS sl FROM v${r - 1})),
         |b$r AS MATERIALIZED (
         |  SELECT pr.l AS lsym, pr.r AS rsym, CAST(sum(n) AS BIGINT) AS c
         |  FROM p$r GROUP BY 1, 2 ORDER BY c DESC, lsym, rsym LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT n, replace(s,
         |    '(' || (SELECT lsym FROM b$r) || ')(' || (SELECT rsym FROM b$r) || ')',
         |    '(' || (SELECT lsym FROM b$r) || (SELECT rsym FROM b$r) || ')') AS s
         |  FROM v${r - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH types AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE regexp_full_match(w, '[a-z]+')
       |  GROUP BY w ORDER BY n DESC, w LIMIT $vocabCap),
       |v0 AS MATERIALIZED (SELECT n, '(' || array_to_string(list_filter(
       |    string_split(w, ''), c -> c <> ''), ')(') || ')' AS s FROM types),
       |$rounds""".stripMargin
  }

  /** q227's greedy merge application over the bracketed rendering,
    * reduced to a subtoken COUNT — factored so the q255 spec can apply it
    * to a rigged merge table. `w` is the word column in scope. */
  private[graft] def greedySubExpr(merges: Seq[(String, String)]): String = {
    val bracketed = "concat('(', array_join(filter(split(w, ''), " +
      "c -> c <> ''), ')('), ')')"
    val applied = merges.foldLeft(bracketed) { case (e, (l, r)) =>
      s"replace($e, '($l)($r)', '($l$r)')"
    }
    s"(length($applied) - length(replace($applied, ')(', ''))) div 2 + 1"
  }

  /** Exact minimum-token segmentation (Viterbi) of `w` over the vocabulary
    * {all single chars} ∪ `syms`: dp[i] = min over symbols v ending at i
    * of dp[i−|v|]+1, as ONE aggregate() fold whose accumulator is the dp
    * list (the 1000000 sentinel disables non-matching candidates; the
    * single-char candidate keeps dp feasible, so the sentinel never
    * survives a least()). Integer costs only — both engines replay the
    * identical DP. */
  private[graft] def viterbiExpr(syms: Seq[String]): String = {
    val cands = syms.distinct.map { sym =>
      val k = sym.length
      s"IF(i >= ${k}L AND substring(w, CAST(i AS INT) - ${k - 1}, $k) = '$sym', " +
        s"element_at(acc, CAST(i AS INT) - ${k - 1}) + 1L, 1000000L)"
    }
    val step = (Seq("element_at(acc, CAST(i AS INT)) + 1L") ++ cands)
      .mkString("least(", ", ", ")")
    s"aggregate(sequence(1L, CAST(length(w) AS BIGINT)), array(0L), " +
      s"(acc, i) -> concat(acc, array($step)), " +
      s"acc -> element_at(acc, length(w) + 1))"
  }

  /** X222 — Viterbi BPE-encode consistency audit: q226 learns the merge
    * table and q227 measures fertility under GREEDY rank-order
    * application — but greedy is not optimal over the final vocabulary
    * (an early merge can consume a char that two later symbols would
    * have tiled better: vocab {bc, ab, cd} segments "abcd" greedily as
    * a|bc|d but optimally as ab|cd). This query computes the exact
    * integer-cost Viterbi segmentation over {base chars} ∪ {merged
    * symbols} per word TYPE and reports, per language, greedy vs optimal
    * token mass, the word mass where they disagree, and the excess in
    * ppm — the tokenizer-consistency number real pipelines track when
    * choosing between BPE-greedy and unigram-style encoders.
    *
    * Scale: the DP runs per word TYPE, not per token — the type fold is
    * the only corpus-sized work (q226's rule), and each DP is
    * O(len·|syms|) on a bounded-length word. No join against a
    * vocabulary table: the ≤8 learned symbols inline into the fold as
    * literals on the Spark side and as one broadcast 1-row frame in the
    * oracle. Viterbi ≤ greedy by construction (greedy's output is itself
    * a valid segmentation over the same vocabulary), so excess_ppm ≥ 0. */
  def q255ViterbiAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merges = q226BpeMerges(s, dir).collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
      .toSeq
    docs(s, dir)
      .select($"lang", explode(split($"text", " ")).as("w"))
      .filter($"w".rlike("\\A[a-z]+\\z"))
      .groupBy($"lang", $"w").agg(count(lit(1)).as("n"))
      .select($"lang", $"n",
        expr(greedySubExpr(merges)).as("greedy"),
        expr(viterbiExpr(merges.map { case (l, r) => l + r })).as("vit"))
      .groupBy($"lang")
      .agg(sum($"n").as("n_words"),
        sum($"n" * $"greedy").as("greedy_tokens"),
        sum($"n" * $"vit").as("viterbi_tokens"),
        sum(when($"greedy" > $"vit", $"n").otherwise(0L)).as("n_suboptimal_words"))
      .withColumn("excess_ppm",
        expr("(greedy_tokens - viterbi_tokens) * 1000000 div viterbi_tokens"))
      .orderBy($"lang")
  }

  /** The q255 oracle: [[bpeLearnWith]] re-learns the merges, one 1-row
    * frame carries the merged symbols + lengths, and the SAME dp fold
    * runs as a list_reduce with the prepended [0] init (q247's idiom). */
  def viterbiOracleSql(vocabCap: Int = 256, nMerges: Int = 8): String = {
    val applied = (1 to nMerges).foldLeft("bs") { (e, r) =>
      s"replace($e, coalesce('(' || (SELECT lsym FROM b$r) || ')(' || " +
        s"(SELECT rsym FROM b$r) || ')', chr(1)), " +
        s"coalesce('(' || (SELECT lsym FROM b$r) || " +
        s"(SELECT rsym FROM b$r) || ')', ''))"
    }
    val syCols = (1 to nMerges).map { r =>
      s"(SELECT lsym || rsym FROM b$r) AS s$r, " +
        s"(SELECT CAST(len(lsym || rsym) AS BIGINT) FROM b$r) AS g$r"
    }.mkString(",\n       |    ")
    val cands = (1 to nMerges).map { r =>
      s"CASE WHEN s$r IS NOT NULL AND e[1] >= g$r " +
        s"AND substr(w, CAST(e[1] - g$r + 1 AS INTEGER), CAST(g$r AS INTEGER)) = s$r " +
        s"THEN acc[CAST(e[1] - g$r + 1 AS INTEGER)] + 1 ELSE 1000000 END"
    }.mkString(",\n       |        ")
    s"""${bpeLearnWith(vocabCap, nMerges)},
       |sy AS (SELECT $syCols),
       |tt AS MATERIALIZED (SELECT lang, w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE regexp_full_match(w, '[a-z]+') GROUP BY lang, w),
       |gb AS (SELECT lang, n, w,
       |    '(' || array_to_string(list_filter(string_split(w, ''),
       |      c -> c <> ''), ')(') || ')' AS bs
       |  FROM tt),
       |sc AS (SELECT lang, n,
       |    (len($applied) - len(replace($applied, ')(', ''))) // 2 + 1 AS greedy,
       |    (list_reduce(
       |      list_prepend([CAST(0 AS BIGINT)],
       |        list_transform(generate_series(1, CAST(length(w) AS BIGINT)), i -> [i])),
       |      (acc, e) -> list_append(acc, least(
       |        acc[CAST(e[1] AS INTEGER)] + 1,
       |        $cands))))[CAST(length(w) + 1 AS INTEGER)] AS vit
       |  FROM gb CROSS JOIN sy)
       |SELECT lang, CAST(sum(n) AS BIGINT) AS n_words,
       |  CAST(sum(n * greedy) AS BIGINT) AS greedy_tokens,
       |  CAST(sum(n * vit) AS BIGINT) AS viterbi_tokens,
       |  CAST(sum(CASE WHEN greedy > vit THEN n ELSE 0 END) AS BIGINT)
       |    AS n_suboptimal_words,
       |  (CAST(sum(n * greedy) AS BIGINT) - CAST(sum(n * vit) AS BIGINT))
       |    * 1000000 // CAST(sum(n * vit) AS BIGINT) AS excess_ppm
       |FROM sc GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** The q226 oracle: [[bpeLearnWith]]'s chain + the ranked merge-table
    * projection, so DuckDB independently re-learns the same table. */
  def bpeOracleSql(vocabCap: Int = 256, nMerges: Int = 8): String = {
    val out = (1 to nMerges).map { r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, lsym AS left_sym, " +
        s"rsym AS right_sym, c AS pair_count FROM b$r"
    }.mkString("\nUNION ALL\n")
    s"""${bpeLearnWith(vocabCap, nMerges)}
       |SELECT * FROM ($out) ORDER BY merge_rank""".stripMargin
  }

  /** q343's batch size, shared with the generated oracle. */
  private[graft] val PadBatch = 16L

  /** q350's order-statistic count, shared with the generated oracle. */
  private[graft] val HillK = 200

  /** X327 — Good-Turing missing-mass audit (count-of-counts): the
    * classical estimate of how much probability mass belongs to types
    * NEVER SEEN — P(next token is a new type) ≈ N₁/N — plus the
    * Good-Turing discounted rate r* = (r+1)·N_{r+1}/N_r for the rare
    * rows. This is the number coverage and dedup planning actually
    * need: a corpus whose unseen mass is 36% (this one, at the
    * trigram level) is nowhere near saturated, and q243's novelty
    * curve and q157's coverage curve both read against it. Universe =
    * word trigrams per language (the 31-word lexicon keeps unigrams
    * and bigrams saturated; trigrams give 16k types with 9.4k
    * singletons — a live tail).
    *
    * Output per lang: token/type totals, N₁..N₃ counts-of-counts, the
    * unseen mass in ppm, and r₁* in milli (Good-Turing's discounted
    * expected count for singletons, (2·N₂/N₁) — under ~1000 means
    * singletons are over-counted, the classic smoothing signal). The
    * identity Σ r·N_r = N is exact on both engines and spec-pinned.
    *
    * Scale: one trigram explode + (lang, gram) count — combinable —
    * then a |langs×freqs|-bounded count-of-counts fold; nothing
    * corpus-sized leaves the aggregations. */
  /** q360's planted lang: trigram multiplicities 10×1 + 4×2 + 6×3 by
    * construction (each doc is one 3-word line = one trigram), so
    * D = 20, N1 = 10, N2 = 4 and Chao1 = 20 + 10·9/(2·(4+1)) = 29
    * exactly. Ids −1001.. (disjoint from every other plant range). */
  private[graft] val ChaoPlant: Seq[(Long, String, String)] = {
    val reps = (1 to 10).map(j => (j, 1)) ++ (11 to 14).map(j => (j, 2)) ++
      (15 to 20).map(j => (j, 3))
    reps.flatMap { case (j, k) => (1 to k).map(c => (j, c)) }
      .zipWithIndex.map { case ((j, _), i) =>
        (-1001L - i, "xq", s"xqa$j xqb$j xqc$j")
      }
  }

  /** X337 — Chao1 species-richness estimation (Chao 1984, the standard
    * nonparametric "how many types exist that I haven't seen"): q351's
    * Good-Turing estimates the unseen MASS; corpus planning also needs
    * the unseen TYPE COUNT — how much bigger the trigram vocabulary
    * gets if the crawl doubles (sizing BPE vocabularies, dedup
    * structures, coverage targets). The bias-corrected estimator
    * Ŝ = D + N₁(N₁−1)/(2(N₂+1)) is pure integer; this audit computes
    * it on a deterministic HALF of the corpus (squared-tail fingerprint
    * parity — the q332-hardened key) and scores it against the ground
    * truth the other half provides: the FULL corpus's observed distinct
    * count. Per lang: sampled distinct/singletons/doubletons, Chao1,
    * full-corpus distinct, and the signed error ppm. The planted 'xq'
    * lang has hand-constructed multiplicities, pinning Chao1 = 29 from
    * D = 20 exactly.
    *
    * The corpus reading is the q350-family honest negative: this
    * synthetic corpus's trigrams are near-uniform random (96% of
    * sampled types are singletons), so Chao1 extrapolates 6–9× past
    * the doubled-corpus truth — the estimator assumes a FIXED
    * community being sampled, and singleton-dominated machine text
    * violates it loudly (en, with real doubleton mass, lands at
    * 1.7×). Reading N₁/D next to the estimate is the operator's
    * usage contract, and both ship as columns.
    *
    * Scale: ONE combinable (lang, gram) fold carries BOTH legs (full
    * count + sampled count in the same aggregate — the sample flag
    * rides the projection, no second scan), then one |langs|-bounded
    * fold; N₁² stays in int64 up to ~3·10⁹ types (past that the
    * count-of-counts collect is bounded and the driver goes BigInt,
    * the q351 shape). */
  def q360ChaoRichness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Fingerprint.register(s)
    val corpus = docs(s, dir).select($"doc_id", $"lang", $"text")
      .unionByName(ChaoPlant.toDF("doc_id", "lang", "text"))
    val grams = corpus
      .withColumn("in_samp", expr(
        """CASE WHEN doc_id < 0 THEN 1L
          |  WHEN pmod(graft_fingerprint(concat('ch:',
          |    CAST(doc_id AS STRING), ':',
          |    CAST((doc_id % 1000003) * (doc_id % 1000003) AS STRING))),
          |    2) = 0 THEN 1L ELSE 0L END""".stripMargin))
      .select($"lang", $"in_samp", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 3)
      .select($"lang", $"in_samp", explode(expr(
        "transform(sequence(1, size(ws) - 2), i -> concat(" +
          "element_at(ws, i), ' ', element_at(ws, i + 1), ' ', " +
          "element_at(ws, i + 2)))")).as("g"))
      .groupBy($"lang", $"g")
      .agg(sum($"in_samp").as("n_samp"))
    grams.groupBy($"lang").agg(
      count(lit(1)).as("d_full"),
      sum(when($"n_samp" > 0L, 1L).otherwise(0L)).as("d_samp"),
      sum(when($"n_samp" === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when($"n_samp" === 2L, 1L).otherwise(0L)).as("n2"))
      .select($"lang", $"d_samp", $"n1", $"n2",
        expr("d_samp + n1 * (n1 - 1) div (2 * (n2 + 1))").as("chao1"),
        $"d_full")
      .withColumn("err_ppm", expr("(chao1 - d_full) * 1000000 div d_full"))
      .orderBy($"lang")
  }

  def q351GoodTuring(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = docs(s, dir)
      .select($"lang", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 3)
      .select($"lang", explode(expr(
        "transform(sequence(1, size(ws) - 2), i -> concat(" +
          "element_at(ws, i), ' ', element_at(ws, i + 1), ' ', " +
          "element_at(ws, i + 2)))")).as("g"))
      .groupBy($"lang", $"g").agg(count(lit(1)).as("n"))
    types.groupBy($"lang").agg(
      sum($"n").as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when($"n" === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when($"n" === 2L, 1L).otherwise(0L)).as("n2"),
      sum(when($"n" === 3L, 1L).otherwise(0L)).as("n3"))
      .select($"lang", $"n_tokens", $"n_types", $"n1", $"n2", $"n3",
        expr("n1 * 1000000L div n_tokens").as("unseen_ppm"),
        expr("CASE WHEN n1 = 0 THEN 0L ELSE 2L * n2 * 1000L div n1 END")
          .as("r1_star_milli"))
      .orderBy($"lang")
  }

  /** X326 — Hill tail-index estimator (the classic extreme-value
    * estimator of a power-law exponent, Hill 1975): q196 audits WHERE
    * the rank-frequency curve deviates from Zipf by decade band; this
    * estimates the tail exponent itself — α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎)
    * over the top-k order statistics — the number that decides how
    * heavy-tailed a vocabulary really is (dedup and mixture planning
    * both care: α near 1 means the head dominates any sample).
    * Integer-exact via the q321 half-bit idiom: hb(x) = length(bin(x²))
    * − 1 = ⌊2·log₂x⌋, so Σ ln-ratios = (ln2/2)·Σ(hbᵢ − hb_cut) and
    * α̂_ppm = 2k·10¹² div (693147·Σdelta) with ln2 entering as the
    * INTEGER constant 693147 — no libm call anywhere. Boundary ties
    * cost nothing: the (k+1)-th term's delta is 0, so the fold runs
    * over the whole k+1 frame. Quantization is the stated ±half-bit
    * per term (a few percent on α).
    *
    * Two scopes: `corpus` — the word-BIGRAM frequency table's top k+1
    * (the 31-type word lexicon is too short for k = 200 order
    * statistics; bigrams give 916 types, q107's gram universe) — and
    * `plant` — an in-query exact harmonic tail x_i = 10⁹ div i (α = 1
    * by construction, pure arithmetic both engines), which the
    * estimator recovers within the quantization band (measured
    * 1.021e6 ppm). The corpus finding is the honest one: random draws
    * from a tiny lexicon make bigram frequencies near-UNIFORM
    * (sum_delta_hb = 2 → α̂ ≈ 289) — "no heavy tail" is exactly what
    * the estimator should scream about machine-generated text, the
    * q301-Benford-style negative reading; sum_delta = 0 reports the 0
    * sentinel rather than dividing.
    *
    * Scale: ONE explode+count vocabulary fold (combinable) and a
    * k+1-row TakeOrdered — k is a CONSTANT, so the top-k is a bounded
    * driver structure (the q113 driver-k precedent), never a rank pass
    * over the vocabulary. */
  def q350HillTail(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val k = HillK
    def hill(top: DataFrame): (Long, Long, Long, Long) = {
      // top = EXACTLY k+1 rows (n, hb); ties at the cut contribute 0
      val r = top.agg(count(lit(1)), sum($"hb"), min($"n"),
        min(expr("CAST(length(bin(n * n)) - 1 AS BIGINT)"))).head()
      require(r.getLong(0) == k + 1L, s"tail needs ${k + 1} types")
      val hbCut = r.getLong(3)
      val sumDelta = r.getLong(1) - (k + 1L) * hbCut
      // sum_delta = 0 means the top-k is FLAT to half-bit resolution —
      // no tail at all; 0 is the sentinel (not +inf)
      val alpha =
        if (sumDelta == 0L) 0L
        else 2L * k * 1000000000000L / (693147L * sumDelta)
      (r.getLong(2), hbCut, sumDelta, alpha)
    }
    // the synthetic lexicon has only 31 word TYPES — the word-frequency
    // tail is too short for k = 200 order statistics; the BIGRAM table
    // (916 types, q107's gram universe) is the corpus tail this audits
    val vocab = docs(s, dir)
      .select(split($"text", " ").as("ws"))
      .filter(size($"ws") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
        .as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
    val corpusTop = vocab.orderBy($"n".desc, $"w".asc).limit(k + 1)
      .select($"n", expr("CAST(length(bin(n * n)) - 1 AS BIGINT)").as("hb"))
    val nTypes = vocab.count()
    val (cCut, _, cDelta, cAlpha) = hill(corpusTop)
    val plantTop = s.range(1, 1001)
      .select(expr("1000000000L div id").as("n"))
      .orderBy($"n".desc).limit(k + 1)
      .select($"n", expr("CAST(length(bin(n * n)) - 1 AS BIGINT)").as("hb"))
    val (pCut, _, pDelta, pAlpha) = hill(plantTop)
    graft.operators.LocalReport.frame(s, Seq(
      org.apache.spark.sql.Row("corpus", k.toLong, nTypes, cCut, cDelta, cAlpha),
      org.apache.spark.sql.Row("plant", k.toLong, 1000L, pCut, pDelta, pAlpha)),
      ("scope", StringType), ("k", LongType), ("n_types", LongType),
      ("cut_freq", LongType), ("sum_delta_hb", LongType),
      ("alpha_ppm", LongType))
  }

  /** X318 — padding-waste batch planner (length bucketing): a training
    * batch pads every sequence to the batch maximum, so batch COMPOSITION
    * decides how many pad tokens the accelerator burns — the published
    * fix (fairseq/tensor2tensor dynamic batching) is to sort by length
    * before chunking. This operator measures the exact stake: whitespace
    * token counts per document, two total orders — `arrival` (the X42
    * deterministic shuffle under the q332-hardened avalanche key, i.e.
    * the order a shuffled corpus actually arrives in) and `sorted_desc`
    * (n_tok DESC, doc_id) — each chunked into batches of [[PadBatch]]
    * docs by GlobalOrder rank, and per strategy the real vs padded token
    * totals and waste ppm.
    *
    * Sorted chunking is the EXACT argmin of Σ batch-maxima over all
    * partitions into the same size multiset (after removing any i−1
    * groups, at most (i−1)·B elements are gone, so the max of what
    * remains is ≥ the element at sorted rank (i−1)·B+1 — summing gives
    * the chunked value); the spec pins sorted ≤ arrival as that
    * theorem's observable.
    *
    * Scale: token counting is one narrow projection; each order is ONE
    * GlobalOrder range pass (no unpartitioned window); the per-batch
    * fold and the 1-row roll-up are combinable aggregations. The input
    * frame is persisted once around the two rank passes (GlobalOrder
    * borrows the cache). */
  def q343BatchPadding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    Fingerprint.register(s)
    val b = PadBatch
    val base = docs(s, dir).select($"doc_id",
      expr("CAST(size(split(text, ' ', -1)) AS BIGINT)").as("n_tok"),
      expr("graft_fingerprint(concat('bat:', CAST(doc_id AS STRING), ':', " +
        "CAST(pmod(doc_id, 1000003) * pmod(doc_id, 1000003) AS STRING)))")
        .as("sk")).persist()
    try {
      def plan(name: String, orderCols: Seq[org.apache.spark.sql.Column])
          : DataFrame = {
        val ranked = graft.operators.GlobalOrder
          .withRowNumber(base, orderCols, "rk")
        ranked.withColumn("batch", expr(s"(rk - 1L) div ${b}L"))
          .groupBy($"batch").agg(count(lit(1)).as("nd"),
            max($"n_tok").as("mx"), sum($"n_tok").as("sm"))
          .agg(count(lit(1)).as("n_batches"),
            sum($"sm").as("real_tokens"),
            sum($"mx" * $"nd").as("padded_tokens"))
          .select(lit(name).as("strategy"), $"n_batches", $"real_tokens",
            $"padded_tokens",
            expr("(padded_tokens - real_tokens) * 1000000L div padded_tokens")
              .as("waste_ppm"))
      }
      val out = plan("arrival", Seq($"sk", $"doc_id"))
        .unionByName(plan("sorted_desc", Seq($"n_tok".desc, $"doc_id")))
        .orderBy($"strategy")
      // both plans fold to 1 row each; materialize before the shared
      // input cache is released
      val rows = out.collect()
      graft.operators.LocalReport.frame(s, rows.toSeq, ("strategy", StringType),
        ("n_batches", LongType), ("real_tokens", LongType),
        ("padded_tokens", LongType), ("waste_ppm", LongType))
    } finally base.unpersist(blocking = false)
  }

  /** q396's vocabulary-size sweep and the max candidate-token length. */
  private[graft] val SeedVocabSweep: Seq[Int] = Seq(64, 128, 256, 512)
  private[graft] val SeedMaxLen = 4

  /** X379 — seed-vocabulary capacity frontier (the SentencePiece SEED
    * stage, Kudo 2018 §3: the unigram trainer initializes from the most
    * frequent substrings and prunes — this operator measures what that
    * initialization family can express at each budget): candidate
    * tokens = all substrings of length ≤ [[SeedMaxLen]] of the [a-z]+
    * word types, ranked by occurrence-weighted frequency (ties UTF-8
    * lex — ASCII here); vocab_V = top-V ∪ all single chars (totality —
    * the standard rule); per budget in [[SeedVocabSweep]], the corpus
    * fertility under the EXACT Viterbi-optimal segmentation (q255's DP,
    * the one the tokenizer lane already trusts, with candidates tested
    * by LENGTH-GROUPED membership against the ≤512-token array — 4
    * candidate terms per position, not 512). Because top-V vocabularies
    * are NESTED and the char floor is shared, the optimal token count
    * is monotone non-increasing in V — a theorem the spec pins — and
    * the report is the measured diminishing-returns curve a tokenizer
    * budget decision actually reads (q376 measured the same dial for
    * the BPE-merge family; this is the unigram-seed family). Measured
    * at sf0.01: per-word fertility 4.509 (chars) → 3.127 (V=64) →
    * 2.512 (128) → 1.501 (256), and the curve SATURATES there because
    * this corpus's ≤4-gram substring universe is only 228 candidates —
    * v256 ≡ v512, reported as-is (the saturation point IS the budget
    * answer for this corpus).
    *
    * Scale: the substring rank is ONE (sub → Σn) combinable fold over
    * word TYPES (q226's rule — never per token); the top-512+chars
    * vocabulary collects under the bounded-dictionary rule and inlines
    * into the DP as length-grouped array literals; all four budget
    * legs ride ONE pass over the type table (4 DP columns). */
  def q396SeedVocabFrontier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val tt = docs(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w".rlike("\\A[a-z]+\\z"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .persist()
    try {
      // q34's ANSI trap: sequence(1, 0) runs DESCENDING — guard each
      // length class instead of clamping the upper bound
      val subExpr = (1 to SeedMaxLen).map { g =>
        s"""IF(length(w) >= $g,
           |  transform(sequence(1, length(w) - ${g - 1}),
           |    i -> substring(w, i, $g)), array_repeat('', 0))""".stripMargin
      }.mkString("concat(", ", ", ")")
      val ranked = tt
        .select(explode(expr(subExpr)).as("sub"), $"n")
        .groupBy($"sub").agg(sum($"n").as("weight"))
        .orderBy($"weight".desc, $"sub")
        .limit(SeedVocabSweep.max)
        .collect().map(_.getString(0))
      val chars = tt.select(explode(expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
          .as("c")).distinct().collect().map(_.getString(0)).sorted
      def dpExpr(vocab: Set[String]): String = {
        val byLen = (2 to SeedMaxLen).map(g =>
          g -> vocab.filter(_.length == g).toSeq.sorted)
        val cands = byLen.collect { case (g, toks) if toks.nonEmpty =>
          val arr = toks.map(t => s"'$t'").mkString("array(", ", ", ")")
          s"""IF(i >= ${g}L AND array_contains($arr,
             |  substring(w, CAST(i AS INT) - ${g - 1}, $g)),
             |  element_at(acc, CAST(i AS INT) - ${g - 1}) + 1L,
             |  1000000L)""".stripMargin
        }
        val step = (Seq("element_at(acc, CAST(i AS INT)) + 1L") ++ cands)
          .mkString("least(", ", ", ")")
        s"aggregate(sequence(1L, CAST(length(w) AS BIGINT)), array(0L), " +
          s"(acc, i) -> concat(acc, array($step)), " +
          s"acc -> element_at(acc, length(w) + 1))"
      }
      val legs = SeedVocabSweep.map { v =>
        v -> (ranked.take(v).toSet ++ chars)
      }
      val aggCols = Seq(sum($"n").as("nw"), sum($"charToks").as("ct")) ++
        legs.map { case (v, _) => sum(col(s"t$v")).as(s"s$v") }
      val agged = tt.select((
        Seq($"n", expr("n * length(w)").as("charToks")) ++
          legs.map { case (v, voc) =>
            ($"n" * expr(dpExpr(voc))).as(s"t$v")
          }): _*)
        .agg(aggCols.head, aggCols.tail: _*)
        .head()
      val (nw, ct) = (agged.getLong(0), agged.getLong(1))
      val rows = org.apache.spark.sql.Row("v000_chars",
        chars.length.toLong, ct, ct * 1000L / nw, 1000000L) +:
        legs.zipWithIndex.map { case ((v, voc), i) =>
          val t = agged.getLong(2 + i)
          org.apache.spark.sql.Row(f"v$v%03d", voc.size.toLong, t,
            t * 1000L / nw, t * 1000000L / ct)
        }
      graft.operators.LocalReport.frame(s, rows,
        "scope" -> StringType, "vocab_size" -> LongType,
        "tokens" -> LongType, "fert_milli" -> LongType,
        "comp_ppm" -> LongType)
    } finally tt.unpersist(blocking = false)
  }

  /** q391's selection budget (greedy rounds) — 8 picks over the mod-200
    * candidate pool. */
  private[graft] val CoverK = 8

  /** X373 — greedy maximum-coverage data selection (the submodular
    * data-selection recipe — Kirchhoff & Bilmes 2014's facility-location
    * family, Nemhauser et al. 1978's (1−1/e) greedy): "pick K documents
    * that jointly cover the most distinct content" — the selection rule
    * behind diverse fine-tuning subsets and eval-set construction, and
    * a DIFFERENT objective from the lane's existing selectors (DSIR
    * q321 weights by domain likelihood ratios, coreset q244 balances
    * clusters in embedding space; coverage is a set function and greedy
    * on it is provably near-optimal BECAUSE it is submodular). Over the
    * q213/q385 mod-200 candidate pool with 3-gram-fingerprint type sets:
    * [[CoverK]] greedy rounds, each picking the document with the
    * largest count of NOT-yet-covered grams (ties to the smallest
    * doc_id), reported as (pick, marginal gain, cumulative coverage,
    * ppm of the pool's gram universe). Two baselines selected at the
    * same budget make the submodularity story measurable: the
    * q332-hardened hash shuffle's first K (random) and the K longest
    * documents (the naive "more tokens = more coverage" heuristic,
    * which double-pays for overlap); greedy ≥ both is spec-pinned.
    * Measured at sf0.01 (pool universe 9964 grams): greedy covers 753
    * in 8 docs vs 751 (longest) and 380 (random) — the longest-K
    * heuristic nearly ties BECAUSE this corpus's long documents barely
    * overlap (overlap is exactly what greedy exists to discount, and
    * there is little to discount here — stated, not hidden), while
    * random pays 2×.
    *
    * Scale: per round ONE anti-join of the pool's entries against the
    * covered-gram set + ONE per-doc count — the covered set is a gram
    * FRAME (distributed, localCheckpointed per round — q77's honest-set
    * rule: coverage state is corpus-sized, never a driver structure);
    * only the 1-row argmax collects. Rounds are the budget K — the
    * serial dimension is the SELECTION SIZE, not the corpus, and lazy
    * evaluation (the classic accelerated greedy) drops in unchanged
    * when K grows. */
  def q391CoverageSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    Fingerprint.register(s)
    val k = docs(s, dir).agg(greatest(lit(1L),
      expr("count(1) div 200")).as("k"))
    val ent = docs(s, dir).crossJoin(broadcast(k))
      .selectExpr("doc_id", "k", "split(text, ' ') AS ws")
      .where("size(ws) >= 3 AND doc_id % k = 0")
      .selectExpr("doc_id", s"explode(array_distinct(${TextGrams.fpArrayExpr(3)})) AS g")
      .persist()
    try {
      val universe = ent.select($"g").distinct().count()
      var covered = ent.select($"g").filter(lit(false)).localCheckpoint()
      var picks = Seq.empty[(Long, Long)] // (doc_id, gain)
      (1 to CoverK).foreach { _ =>
        val top = ent.join(covered, Seq("g"), "left_anti")
          .filter(!$"doc_id".isInCollection(
            if (picks.isEmpty) Seq(-1L) else picks.map(_._1)))
          .groupBy($"doc_id").agg(count(lit(1)).as("gain"))
          .orderBy($"gain".desc, $"doc_id").limit(1)
          .collect().head
        picks = picks :+ (top.getLong(0), top.getLong(1))
        covered = ent
          .filter($"doc_id".isInCollection(picks.map(_._1)))
          .select($"g").distinct().localCheckpoint()
      }
      val greedyCov = covered.count()
      def coverageOf(ids: Seq[Long]): Long = ent
        .filter($"doc_id".isInCollection(ids)).select($"g").distinct().count()
      val docSizes = ent.groupBy($"doc_id").agg(count(lit(1)).as("n"))
        .withColumn("sk", expr(
          "graft_fingerprint(concat('cov:', CAST(doc_id AS STRING), ':', " +
            "CAST(pmod(doc_id, 1000003) * pmod(doc_id, 1000003) AS STRING)))"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val randomK = docSizes.sortBy(d => (d._3, d._1)).take(CoverK).map(_._1)
      val longestK = docSizes.sortBy(d => (-d._2, d._1)).take(CoverK).map(_._1)
      val (rc, lc) = (coverageOf(randomK), coverageOf(longestK))
      var cum = 0L
      val greedyRows = picks.zipWithIndex.map { case ((d, g), i) =>
        cum += g
        org.apache.spark.sql.Row(s"g${i + 1}", d, g, cum,
          cum * 1000000L / universe)
      }
      val rows = greedyRows ++ Seq(
        org.apache.spark.sql.Row("z_greedy", 0L, 0L, greedyCov,
          greedyCov * 1000000L / universe),
        org.apache.spark.sql.Row("z_longest", 0L, 0L, lc,
          lc * 1000000L / universe),
        org.apache.spark.sql.Row("z_random", 0L, 0L, rc,
          rc * 1000000L / universe),
        org.apache.spark.sql.Row("z_universe", 0L, 0L, universe, 1000000L))
      graft.operators.LocalReport.frame(s, rows,
        "scope" -> StringType, "doc_id" -> LongType, "gain" -> LongType,
        "covered" -> LongType, "covered_ppm" -> LongType)
    } finally ent.unpersist(blocking = false)
  }
}
