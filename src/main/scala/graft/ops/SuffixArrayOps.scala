package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.operators.GlobalOrder
import graft.sources.Tables

/** X342 — EXACT distributed suffix array + LCP over the document corpus:
  * the structure the published suffix-dedup pipeline (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better") actually
  * builds, closing the completeness gap the sampled-anchor lane (X220/
  * q253, X324/q349) states in its own scaladoc — an adversarial repeat
  * that dodges every content-defined anchor is invisible there, and
  * [[DodgePlant]] is exactly such a repeat (searched offline against the
  * q253 anchor hash so that NO position in its first m−SfxKey+1 chars
  * fires; the spec re-derives that emptiness with
  * [[graft.functions.SuffixText.anchorPositions]], demonstrates the q253
  * miss, and pins this operator finding it at exactly span 51).
  *
  * Algorithm (all exact, no sampling, no caps):
  *   1. suffixes = every (doc_id, off) of the whitespace-normalized text
  *      (q253's normalization); the initial rank dense-ranks the first
  *      [[RadixLen]]=32 chars in ONE text-keyed range shuffle — identical
  *      by definition to five 1→32 doubling rounds, for one shuffle of
  *      ~40-byte keys instead of five of long pairs (the radix-start
  *      trade every published SA construction makes; measured it halves
  *      the round count on this corpus, 10 → 5);
  *   2. prefix doubling: each round pairs rank(off) with rank(off + len)
  *      via a doc-partitioned `lead` (suffixes never cross documents, so
  *      the pairing window is doc-bounded — never an unpartitioned
  *      window) and re-ranks the pairs with
  *      [[GlobalOrder.withDenseRank]] — ONE range shuffle per round,
  *      rounds = ceil(log2(max doc length / RadixLen)), with early stop
  *      the round all ranks go distinct; every round localCheckpoints
  *      (q320's lineage rule);
  *   3. the suffix ARRAY is the final total order (rank, doc_id, off);
  *      adjacency is read directly off the range partitioning by a
  *      sliding mapPartitions stitched with the driver-collected first
  *      row of each partition (≤ numShufflePartitions rows) — ZERO extra
  *      shuffle for the n−1 adjacent pairs;
  *   4. survivors = adjacent CROSS-doc pairs whose radix ranks agree
  *      (first 32 chars equal — a NECESSARY condition for any span ≥
  *      L=40, carried as a column through the doubling so the prefilter
  *      is a narrow comparison, never a join);
  *   5. exact LCP per survivor from the RANK HISTORY: walk levels t =
  *      T..0, advancing both offsets by RadixLen·2^t whenever the
  *      level-t ranks at (off + lcp) agree — the classic O(log n)
  *      suffix-comparison walk — then the sub-RadixLen residual closes
  *      with one compiled [[graft.functions.SuffixText]] compare of the
  *      next RadixLen−1 chars, and the result clamps to the shorter
  *      suffix (two equal-to-end-of-doc suffixes compare equal at every
  *      level; the clamp restores the true length). Each level's lookups
  *      ride ONE join against the level's checkpointed rank frame with
  *      the survivor requests as the broadcast side — ENFORCED by the
  *      counted branch ([[SaWalkBroadcastPairCap]]): past the cap the
  *      level joins escalate loudly to shuffle joins (same rows, the
  *      q325/q335 rule) instead of leaving the pick to AQE;
  *   6. report, per doc with any cross-doc repeat ≥ L: the doc's suffix
  *      count and its max cross-doc span — for a span held by exactly
  *      two docs the SA-interval argument guarantees an adjacent pair
  *      realizes it (any suffix sorting between two occurrences of S
  *      itself starts with S), and for ≥3-doc spans the per-doc max is
  *      still exact (the nearest other-doc neighbor inside the S-interval
  *      is adjacent to a run boundary), so per-doc max over ADJACENT
  *      pairs equals the true longest cross-doc substring — without ever
  *      enumerating the quadratic all-pairs of a boilerplate interval.
  *
  * The DuckDB oracle is a DIFFERENT exact algorithm (aligned L-gram run
  * reduction: a common substring of length m ≥ L is exactly a run of
  * m−L+1 consecutive equal L-grams on one (doc_a, doc_b, offset-delta)
  * diagonal — gaps-and-islands over the gram join), so the gate
  * cross-checks two independent exact formulations, not a replay.
  *
  * Scale: every doubling round shuffles O(n) 4-long rows (never text);
  * rank frames are the only checkpointed state (T ≈ log2(max doc len)
  * frames). The LCP walk touches only the survivor mass (positions
  * inside ≥32-char repeated regions — repeat-bounded, not corpus-
  * bounded) with the level tables streamed map-side past the broadcast
  * requests (the counted [[SaWalkBroadcastPairCap]] branch — loud
  * shuffle escalation past the cap); levels whose step exceeds the
  * longest document are skipped
  * (exact — see step 5). The oracle's gram join is NOT the Spark path
  * precisely because a hot gram explodes quadratically; the SA costs
  * log-rounds of linear shuffles instead — the published trade.
  * Measured quiet at sf0.1 (1.49M suffixes, 32 threads): ~21 s total =
  * radix rank ~5 s + 5 doubling rounds ~7.5 s + adjacency ~1.3 s +
  * 5-level walk ~5 s + refine/report — the log-linear price of an EXACT
  * structure where the whole q253 anchor lane costs ~2 s and provably
  * misses [[DodgePlant]]; both tools stay in the box, this one is the
  * completeness certificate. The 100 TB form keeps doc-bounded suffixes
  * (this engine's data model) so no suffix ever exceeds a row; Lee et
  * al.'s corpus-concatenated variant swaps the doc-window pairing for a
  * global-offset range join, same round structure. */
object SuffixArrayOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Report threshold, shared with the q253 lane for comparability. */
  private[graft] val SaMinSpan: Int = DedupOps.SfxMinSpan

  /** Initial radix width: the first-RadixLen-char prefix is dense-ranked
    * in one text-keyed shuffle instead of log2(RadixLen) doubling rounds,
    * and doubles as the survivor prefilter width (RadixLen <= SaMinSpan
    * keeps prefix equality a NECESSARY condition for any reported
    * span). */
  private[graft] val RadixLen: Int = 32

  /** The anchor-dodging span (51 chars, leading/trailing space included):
    * found by deterministic backtracking search over a word list against
    * the exact q253 anchor predicate (fp31 of the 8-char context mod
    * 1000000007 mod 4 == 0) so that NO position in 1..m−SfxKey+1 = 1..28
    * is an anchor — q253's own scaladoc states detection is decidable
    * from the span text alone, and this span decides to "miss". The spec
    * re-derives the emptiness instead of trusting this comment. */
  private[graft] val DodgeSpan =
    " granite zenith copper harbor timber meadow cinder "

  /** Dodge plant (disjoint -364xx id range): hosts share ONLY the span —
    * the flanking characters differ on both sides ('l'/'e' before,
    * 'm'/'h' after), so the true longest common substring is exactly
    * len(DodgeSpan) = 51 and the zero shared anchor keys make the pair
    * provably invisible to q253. */
  private[graft] val DodgePlant: Seq[(Long, String)] = Seq(
    -36401L -> ("kestrel" + DodgeSpan + "moonlit"),
    -36402L -> ("bramble" + DodgeSpan + "harvest"))

  /** Everything the spec needs to certify the build: the gate report,
    * every survivor pair with its FINAL walked+refined+clamped span (the
    * spec re-derives each one from the raw suffix texts — the exactness
    * certificate), the normalized base, and the measured round count. */
  private[graft] final case class SaBuild(report: DataFrame,
      pairs: DataFrame, normalized: DataFrame, rounds: Int,
      nSuffixes: Long, nDistinctFinal: Long)

  def q364SuffixArray(s: SparkSession, dir: String): DataFrame =
    build(s, dir).report

  /** Survivor-pair cap under which each LCP-walk level join broadcasts
    * the request side (2 pairs rows of 5 longs ≈ 80 MB at the cap); a
    * boilerplate-heavy corpus whose survivor mass exceeds it escalates
    * LOUDLY to shuffle joins — same rows either way (the q325/q335
    * counted-branch rule), and the spec pins both branches
    * row-identical. */
  private[graft] val SaWalkBroadcastPairCap: Long = 1000000L

  /** ONE walk level: look up both sides' level-t ranks at (off + lcp)
    * and return the (da, oa, step) advance rows for pairs whose ranks
    * agree. Factored out of [[build]] so the spec can pin the plan of
    * both broadcast branches directly. */
  private[graft] def walkLevelHits(pairs: DataFrame, lt: DataFrame,
      step: Long, broadcastReqs: Boolean): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val reqs = pairs.select($"da", $"oa", lit(1L).as("side"),
        $"da".as("doc_id"), ($"oa" + $"lcp").as("off"))
      .unionByName(pairs.select($"da", $"oa", lit(2L).as("side"),
        $"db".as("doc_id"), ($"ob" + $"lcp").as("off")))
    val reqSide = if (broadcastReqs) broadcast(reqs) else reqs
    reqSide.join(lt, Seq("doc_id", "off"))
      .groupBy($"da", $"oa")
      .agg(max(when($"side" === 1L, $"rank")).as("rka"),
           max(when($"side" === 2L, $"rank")).as("rkb"))
      .filter($"rka".isNotNull && $"rkb" === $"rka")
      .select($"da", $"oa", lit(step).as("add"))
  }

  /** The SA lane's corpus: documents plus BOTH plant families (q253's
    * anchor-visible spans and the anchor-dodging pair), whitespace-
    * normalized — shared by the q364 build and the q370 strip so the
    * two ends of the lane can never diverge on their input. */
  private[graft] def saBase(s: SparkSession, dir: String,
      extraPlant: Seq[(Long, String)] = Nil): DataFrame = {
    import s.implicits._
    val plant = (DedupOps.SuffixPlant ++ DodgePlant ++ extraPlant)
      .toDF("doc_id", "text")
    docs(s, dir).select($"doc_id", $"text")
      .unionByName(plant)
      .select($"doc_id",
        regexp_replace(coalesce($"text", lit("")), " {2,}", " ").as("na"))
      .filter(length($"na") > 0)
  }

  private[graft] def build(s: SparkSession, dir: String,
      walkBroadcastPairCap: Long = SaWalkBroadcastPairCap): SaBuild = {
    import s.implicits._
    def mkBase(): DataFrame = saBase(s, dir)
    // base feeds five jobs (maxLen, the suffix explode, both residual
    // text joins, the report) — persist once, release after the report
    // and pair frames materialize (the GlobalOrder discipline)
    val base = mkBase()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val maxLen = base.agg(max(length($"na"))).head().getInt(0).toLong

    // 1. radix-32 initialization: dense-rank the 32-char prefix of every
    // suffix in ONE text-keyed range shuffle — identical by definition to
    // the rank five 1→32 doubling rounds would produce, for one shuffle
    // of ~40-byte keys instead of five of long pairs (the DC3/radix-start
    // trade every published SA construction makes). RadixLen = 32 is also
    // the L-prefilter width: equal initial ranks ⟺ equal first-32 chars,
    // a NECESSARY condition for any span >= L=40, carried for free.
    val pre = base
      .select($"doc_id", $"na", length($"na").cast("long").as("dlen"))
      .withColumn("off", explode(expr("sequence(1L, dlen, 1L)")))
      .select($"doc_id", $"dlen", $"off",
        expr(s"substring(na, CAST(off AS INT), $RadixLen)").as("k"))
    val (pre1, nDist0) = GlobalOrder.withDenseRank(pre, Seq("k"), "rank")

    // 2. prefix doubling; levels(i) holds the rank of
    // substring(off, RadixLen * 2^i). Checkpoints are LAZY throughout
    // the doubling and the walk (the q378/q384 fusion): each frame's
    // materialization rides the next round's first job (window shuffle,
    // summary collect, or broadcast build) instead of paying a separate
    // eager-checkpoint job per round; lineage still cuts identically.
    var cur = pre1.drop("k").withColumn("r32", $"rank")
      .localCheckpoint(false)
    val nSuffixes = cur.count()
    var levels = Vector[DataFrame](cur)
    var len = RadixLen.toLong
    var rounds = 0
    var nDist = nDist0
    val docW = Window.partitionBy($"doc_id").orderBy($"off")
    while (len < maxLen && nDist < nSuffixes) {
      val paired = cur.withColumn("r2",
        lead($"rank", len.toInt, -1L).over(docW))
      val (ranked, d) = GlobalOrder.withDenseRank(paired, Seq("rank", "r2"), "nrank")
      val next = ranked.drop("rank", "r2").withColumnRenamed("nrank", "rank")
      len *= 2
      rounds += 1
      nDist = d
      cur = next.localCheckpoint(false)
      levels = levels :+ cur
    }

    // 3. the suffix array + zero-shuffle adjacency off the range partitions
    val (saDf, _) = GlobalOrder.withRowNumberAndTotal(
      cur, Seq($"rank", $"doc_id", $"off"), "rn")
    val saRdd = saDf.rdd
    val iDoc = saDf.schema.fieldIndex("doc_id")
    val iLen = saDf.schema.fieldIndex("dlen")
    val iOff = saDf.schema.fieldIndex("off")
    val iR32 = saDf.schema.fieldIndex("r32")
    val firsts = saRdd.mapPartitionsWithIndex((i, it) =>
        if (it.hasNext) Iterator((i, it.next())) else Iterator.empty)
      .collect().toMap
    val nParts = saRdd.getNumPartitions
    val successor: Map[Int, Row] = (0 until nParts).flatMap { i =>
      ((i + 1) until nParts).find(firsts.contains).map(j => i -> firsts(j))
    }.toMap
    val pairSchema = StructType(Seq(
      StructField("da", LongType, nullable = false),
      StructField("oa", LongType, nullable = false),
      StructField("la", LongType, nullable = false),
      StructField("r32a", LongType, nullable = false),
      StructField("db", LongType, nullable = false),
      StructField("ob", LongType, nullable = false),
      StructField("lb", LongType, nullable = false),
      StructField("r32b", LongType, nullable = false)))
    val adjRdd = saRdd.mapPartitionsWithIndex { (i, it) =>
      val extended = successor.get(i) match {
        case Some(next) => it ++ Iterator(next)
        case None       => it
      }
      extended.sliding(2).withPartial(false).map { w =>
        val a = w.head; val b = w(1)
        Row(a.getLong(iDoc), a.getLong(iOff), a.getLong(iLen), a.getLong(iR32),
            b.getLong(iDoc), b.getLong(iOff), b.getLong(iLen), b.getLong(iR32))
      }
    }
    val adj = s.createDataFrame(adjRdd, pairSchema)

    // 4. survivors: cross-doc adjacent pairs that MIGHT reach L (narrow)
    var pairs = adj.filter($"da" =!= $"db" && $"r32a" === $"r32b")
      .select($"da", $"oa", $"la", $"db", $"ob", $"lb", lit(0L).as("lcp"))
      .localCheckpoint(false) // materialized by the count below
    // counted branch for the walk's request side: the checkpointed pair
    // count is free, and the claim "level tables stream past the
    // BROADCAST requests" is now enforced, not left to AQE
    val nPairs = pairs.count()
    val broadcastWalk = nPairs <= walkBroadcastPairCap
    if (!broadcastWalk)
      Console.err.println(s"[graft] q364: $nPairs survivor pairs exceed " +
        s"the walk broadcast cap $walkBroadcastPairCap — escalating the " +
        "level joins to shuffle joins")

    // 5. exact LCP via the rank-history walk, top level down; each level
    // resolves RadixLen * 2^t chars, the sub-RadixLen residual closes
    // with one bounded text compare in step 5b. Levels whose step exceeds
    // the longest document are skipped — equality there can only be the
    // both-truncated (equal-to-end) case, which the remaining levels
    // accumulate past the suffix end and the step-6 clamp restores, so
    // the skip is exact (one fewer full-table scan per skipped level).
    val walkTop = (rounds to 0 by -1)
      .find(t => (RadixLen.toLong << t) <= maxLen).getOrElse(0)
    for (t <- walkTop to 0 by -1) {
      val step = RadixLen.toLong << t
      val lt = levels(t).select($"doc_id", $"off", $"rank")
      val hits = walkLevelHits(pairs, lt, step, broadcastWalk)
      pairs = pairs.join(hits, Seq("da", "oa"), "left")
        .withColumn("lcp", $"lcp" + coalesce($"add", lit(0L)))
        .drop("add")
        .localCheckpoint(false) // rides the next level's request build
    }

    // 5b. residual: after the walk the remaining common run is
    // < RadixLen chars; ONE compiled-kernel compare of the next
    // RadixLen-1 chars (windows fetched by joining the bounded doc
    // frame, survivors broadcast) closes it exactly
    graft.functions.SuffixText.register(s)
    val naA = base.select($"doc_id".as("da"), $"na".as("naa"))
    val naB = base.select($"doc_id".as("db"), $"na".as("nab"))
    val refined = pairs.join(naA, Seq("da")).join(naB, Seq("db"))
      .withColumn("lcp", $"lcp" + expr(
        s"""graft_lcp(
           |  substring(naa, CAST(oa + lcp AS INT), ${RadixLen - 1}),
           |  substring(nab, CAST(ob + lcp AS INT), ${RadixLen - 1}))"""
          .stripMargin))
      .drop("naa", "nab")

    // 6. clamp equal-to-end overshoot, threshold, fold per doc; the
    // report materializes eagerly (localCheckpoint) so base's cache can
    // release before return — `spansAll` and `normalized` return as
    // lazy plans whose heavy state is already cut at the checkpointed
    // `pairs` (re-deriving base for the spec's replays is one cheap
    // scan; checkpointing spansAll too would materialize the survivor
    // frame for nothing the production path reads)
    val spansAll = refined.select($"da", $"oa", $"db", $"ob",
        least($"lcp", $"la" - $"oa" + 1L, $"lb" - $"ob" + 1L).as("span"))
    val spans = spansAll.filter($"span" >= SaMinSpan.toLong)
    val perDoc = spans.select($"da".as("doc_id"), $"span")
      .unionByName(spans.select($"db".as("doc_id"), $"span"))
      .groupBy($"doc_id").agg(max($"span").as("max_xdoc_span"))
    val report = base
      .select($"doc_id", length($"na").cast("long").as("n_sfx"))
      .join(perDoc, Seq("doc_id"))
      .orderBy($"doc_id")
      .select($"doc_id", $"n_sfx", $"max_xdoc_span")
      .localCheckpoint()
    base.unpersist(blocking = false)
    SaBuild(report, spansAll, mkBase(), rounds, nSuffixes, nDist)
  }

  /** X349 — repeated-span removal EXECUTION driven by the exact
    * suffix-array lane, closing r14's top finding: q364 FINDS the
    * dodge-class repeats (the [[DodgePlant]] span q253's anchors
    * provably miss) but q349 strips only anchor-derived spans — the
    * lane could detect what it could not remove, and removal is the
    * published point of the structure (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better": ExactSubstr exists to
    * DRIVE the strip).
    *
    * Keep rule (keep-first at doc granularity, q349's rule generalized
    * from pairs to the corpus): a position of doc d is stripped iff it
    * lies inside a substring of length ≥ [[SaMinSpan]] = L that also
    * occurs in some doc with a SMALLER id; the smallest sharing doc
    * keeps every occurrence. Same-doc-only repeats are NOT stripped
    * (the intra-doc lane, q145, owns those).
    *
    * Exactness — the width-L run-membership collapse: a position p of
    * doc d is covered by a shared-with-smaller span of length ≥ L
    * ⟺ some offset o ∈ [p−L+1, p] starts an L-gram of d that also
    * occurs in a smaller doc (⇒: a maximal shared interval [st, en) ∋ p
    * with en−st ≥ L has every offset in [st, en−L] shared, and one of
    * them lands within L of p; ⇐: the L-gram itself is the witness).
    * In suffix-array terms, "the L-gram at o occurs in a smaller doc" is
    * exactly "suffix (d, o) shares an L-run with a smaller-doc suffix" —
    * and because the strip needs run membership at the FIXED width L
    * (never the maximal span q364 reports), the SA's doubling tower
    * collapses to its width-L rank = the gram itself, and adjacency
    * collapses to min-doc-per-gram: ONE window min over the gram-keyed
    * partitioning marks every strippable offset, with no doubling
    * rounds and no adjacency stitch. The union of [o, o+L) over marked
    * offsets then EQUALS the union of the maximal shared spans (the ⇒
    * direction applied at every covered position), which the q364 spec
    * cross-checks against the survivor pairs: every q364 span ≥ L is
    * flagged in full on its larger doc.
    *
    * Report (affected docs only, q349's shape + the conservation
    * witness): islands, flagged/total/kept chars, keep_ppm, and the md5
    * of the re-assembled stripped text; kept_chars is computed from the
    * re-assembly itself so the oracle's hash compare enforces
    * kept_chars = n_chars − chars_flagged on both engines (q161's
    * mass-conservation discipline).
    *
    * Scale: the gram frame is n rows of (8B id, 8B off, L chars) — ONE
    * hash-partitioned window shuffle (~56 B/row at L = 40, the same
    * inflation class as q364's 40-byte radix-rank shuffle, paid once
    * instead of once-plus-five-long-rounds); min-doc-per-gram is a
    * partition-local fold (hot boilerplate grams cost one wide window
    * partition, never a pair join — the quadratic hot-gram explosion
    * stays in the DuckDB oracle, where the fixture is bounded); the
    * island union and re-assembly are doc-partitioned windows over
    * flagged-position-sized frames (repeat-bounded, not corpus-
    * bounded), and only AFFECTED docs reach the text join. Measured
    * min-of-3 at sf0.1 (1.49M positions, 249 affected docs): 6.1 s —
    * the fixed-width collapse is why the STRIP costs a third of the
    * q364 REPORT (~19.5 s), whose maximal spans genuinely need the
    * doubling tower. */
  def q370SaStrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // base feeds the gram explode AND the affected-doc re-assembly;
    // persist once, release after the bounded report materializes
    val base = saBase(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      DedupOps.stripReport(base, gramMarks(base)).localCheckpoint()
    } finally base.unpersist(blocking = false)
  }

  /** q370's marker: every offset whose width-L gram also occurs in a
    * SMALLER doc, as [off, off+L) spans — ONE gram-keyed window min
    * (the run-membership collapse; see [[q370SaStrip]]'s proof). Shared
    * by the strip and the q375 residual re-detection. */
  private[ops] def gramMarks(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    val l = SaMinSpan
    base.filter(length($"na") >= l)
      .withColumn("off",
        explode(expr(s"sequence(1L, CAST(length(na) - ${l - 1} AS BIGINT), 1L)")))
      .select($"doc_id", $"off",
        expr(s"substring(na, CAST(off AS INT), $l)").as("g"))
      .withColumn("dmin", min($"doc_id").over(Window.partitionBy($"g")))
      .filter($"dmin" < $"doc_id")
      .select($"doc_id", $"off".as("st"), ($"off" + lit(l.toLong)).as("en"))
  }

  /** The seam plant (disjoint -375xx ids): stripping doc C's shared
    * span S1 (kept by the smaller A) concatenates C's flanks, and the
    * 40-char seam string T = tail₂₀(X)+head₂₀(Y) — absent from C
    * BEFORE the strip (S1 sits between the halves, each half < L) — is
    * planted verbatim in the smaller D. So pass 1 CREATES a cross-doc
    * repeat between stripped-C and D that pass 1 could not see: the
    * measured demonstration of why production iterates the strip
    * (q375's residual audit is the second pass's work list). Flank
    * characters are chosen so A's copy of S1 abuts letters while C's
    * abuts a space/'t' — the shared interval is EXACTLY S1 (the spec
    * re-derives all of this from the raw texts). */
  private[graft] val SeamT = "sqseam alpha bridge token relay junction"
  private[graft] val SeamS1 = "sqspan granite vessel ember lantern quartz"
  private[graft] val SeamPlant: Seq[(Long, String)] = Seq(
    -37504L -> ("sqaflank" + SeamS1 + "sqzflank"),
    -37503L -> ("sqdhost " + SeamT + " zzdtail"),
    -37501L -> ("sqxhead marker " + SeamT.substring(0, 20) + SeamS1 +
      SeamT.substring(20) + " sqytail marker"))

  /** X355 — post-strip RESIDUAL audit (the strip's completeness
    * certificate, and the demonstration that one pass is NOT a
    * fixpoint): re-run q370's exact detector on the STRIPPED corpus
    * (affected docs re-assembled, unaffected verbatim, fully-stripped
    * docs dropped) and report what a SECOND pass would strip. Stripping
    * is not idempotent in general — removing an interval concatenates
    * its flanks, and the seam can form a NEW ≥L-char string shared with
    * another doc; [[SeamPlant]] plants exactly that (T invisible before
    * pass 1, a (D, stripped-C) repeat after it), so the audit provably
    * detects the class. Everything a second pass would remove is in the
    * report; production iterates strip→audit until this frame is empty
    * (Lee et al. run the same loop to fixpoint).
    *
    * Scale: two passes of q370's machinery — each ONE gram-keyed window
    * shuffle plus doc-partitioned island/segment windows; pass 2's scan
    * is the pass-1 OUTPUT corpus (never bigger), and the intermediate
    * stripped-text frame for affected docs is repeat-bounded. */
  def q375StripResidual(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = saBase(s, dir, SeamPlant)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val asm = DedupOps.stripAssemble(base, gramMarks(base))
        .select($"doc_id", $"stripped".as("na"))
        .localCheckpoint() // pass-1 output materializes once; pass 2
                           // re-reads it for the gram scan + re-assembly
      val base2 = base
        .join(asm.select($"doc_id"), Seq("doc_id"), "left_anti")
        .unionByName(asm)
        .filter(length($"na") > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        DedupOps.stripReport(base2, gramMarks(base2)).localCheckpoint()
      } finally base2.unpersist(blocking = false)
    } finally base.unpersist(blocking = false)
  }
}
