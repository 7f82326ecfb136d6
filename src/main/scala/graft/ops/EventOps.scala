package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Time-series operators over `events` that the reference (a batch
  * migration engine) has no analogue for, but that any large-scale event/
  * training-data pipeline needs: as-of joins and gap sessionization.
  *
  * Both are implemented with the single-shuffle pattern: union/partition by
  * the entity key, one sort per partition, windowed scan — no range cross
  * products, no per-row subqueries. At 100 TB the only shuffle is the one
  * repartition by user_id; everything downstream is a linear pass.
  */
object EventOps {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** As-of join: for every 'click' event, the most recent 'error' event of
    * the same user at or before it. Instead of a range join (quadratic per
    * user), the two streams are UNIONed and sorted once per user; a
    * last_value-ignore-nulls window carries the latest error forward — one
    * shuffle + one sort, O(n log n) regardless of match fan-out. DuckDB
    * replays it with a native ASOF JOIN, which is exactly the semantics.
    * Errors are deduped to one per (user, ts) (max event_id) so the as-of
    * pick is unique on ties. */
  def q51AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id", lit(1).as("is_click"))
    val errors = e.filter($"event_type" === "error")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("event_id"))
      .select($"user_id", $"ts", $"event_id", lit(0).as("is_click"))
    // at equal ts the error sorts first (is_click asc), so "at or before"
    // includes same-instant errors — matching ASOF's >= semantics.
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"is_click", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(errors)
      .withColumn("err_id",
        last(when($"is_click" === 0, $"event_id"), ignoreNulls = true).over(w))
      .withColumn("err_ts",
        last(when($"is_click" === 0, $"ts"), ignoreNulls = true).over(w))
      .filter($"is_click" === 1)
      .select($"user_id", $"event_id".as("click_id"), $"err_id",
        (unix_micros($"ts".cast("timestamp")) -
          unix_micros($"err_ts".cast("timestamp"))).as("gap_us"))
      .orderBy($"user_id", $"click_id")
  }

  /** RANGE-frame sliding window: per event, count and value-sum of the
    * same user's events in the trailing 5 minutes — the time-based frame
    * (RANGE over microseconds) complementing the ROWS frames elsewhere in
    * the suite. Same single (user_id) partitioning as the other event
    * windows; peers at equal timestamps are included by both engines per
    * standard RANGE semantics, so the oracle is exact. */
  def q62RangeWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-300000000L, 0L) // 5 minutes in microseconds
    ev(s, dir)
      .select($"user_id", $"event_id",
        unix_micros($"ts".cast("timestamp")).as("us"),
        graft.functions.Exact.cents($"value").as("c"))
      .withColumn("n_5min", count(lit(1)).over(w).cast("long"))
      .withColumn("cents_5min", sum($"c").over(w))
      .select($"user_id", $"event_id", $"us", $"n_5min", $"cents_5min")
      .orderBy($"user_id", $"event_id")
  }

  /** Gap-filled hourly resample: the time-series regularization step every
    * monitoring/feature pipeline needs — hours with no events appear with
    * zero counts. The hour spine is generated from the observed bounds
    * (sequence + explode: a generator, not a driver loop) and left-joined
    * to the hourly aggregate; at scale the spine is tiny (hours, not
    * events) and broadcasts. */
  def q63Resample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
      .select(date_trunc("hour", $"ts").as("hour"),
        graft.functions.Exact.cents($"value").as("c"))
    val hourly = e.groupBy($"hour")
      .agg(count(lit(1)).as("n"), sum($"c").as("cents"))
    // horizon from the tiny hourly aggregate, not a second corpus scan
    // (the q101 idiom)
    val spine = hourly.agg(min($"hour").as("lo"), max($"hour").as("hi"))
      .selectExpr("explode(sequence(lo, hi, interval 1 hour)) AS hour")
    spine.join(hourly, Seq("hour"), "left")
      .select($"hour",
        coalesce($"n", lit(0L)).as("n_events"),
        coalesce($"cents", lit(0L)).as("value_cents"))
      .orderBy($"hour")
  }

  /** Shared 30-minute gap-sessionization: lag → boundary flag → running
    * sum, all three windows on ONE user_id partitioning. Factored so X17's
    * session aggregates and X84's journey paths segment the stream with
    * the SAME rule — the two reports must not drift. Emits the input
    * columns plus (us, sess_idx). */
  private def sessionized(df: DataFrame): DataFrame = {
    val gapUs = 1800L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("new_sess",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sess_idx", sum(col("new_sess")).over(run))
      .drop("new_sess")
  }

  /** Gap sessionization (30-minute inactivity threshold): the batch form of
    * streaming session windows. lag → boundary flag → running sum = session
    * index; then one aggregate per session. All three windows share one
    * partitioning (user_id), so Catalyst plans a single Exchange+Sort. */
  def q54Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sessionized(ev(s, dir)
      .select($"user_id", $"event_id", $"ts",
        graft.functions.Exact.cents($"value").as("cents")))
      .groupBy($"user_id", $"sess_idx")
      .agg(count(lit(1)).as("n_events"),
        min($"us").as("start_us"),
        max($"us").as("end_us"),
        sum($"cents").as("value_cents"))
      .withColumn("duration_us", $"end_us" - $"start_us")
      .select($"user_id", $"sess_idx", $"n_events", $"start_us",
        $"duration_us", $"value_cents")
      .orderBy($"user_id", $"sess_idx")
  }

  /** X37 — ordered funnel (view → click → purchase): per user, the first view,
    * the first click AT OR AFTER that view, and the first purchase at or
    * after that click — sequential pattern matching, the event-analytics
    * op MATCH_RECOGNIZE engines special-case.
    *
    * Implemented as three cascaded min-aggregates rather than a per-user
    * sort: each stage is a partial-aggregable groupBy on user_id, and all
    * three share the same key so the stage joins are co-partitioned (one
    * exchange reused; at 100 TB the user dimension also broadcasts under
    * AQE once aggregated). No window over the full event stream needed. */
  def q78Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir).select($"user_id", $"event_type",
      unix_micros($"ts".cast("timestamp")).as("us"))
    val views = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("view_us"))
    val clicks = e.filter($"event_type" === "click")
      .join(views, Seq("user_id"))
      .filter($"us" >= $"view_us")
      .groupBy($"user_id").agg(min($"us").as("click_us"))
    val purchases = e.filter($"event_type" === "purchase")
      .join(clicks, Seq("user_id"))
      .filter($"us" >= $"click_us")
      .groupBy($"user_id").agg(min($"us").as("purchase_us"))
    e.select($"user_id").distinct()
      .join(views, Seq("user_id"), "left")
      .join(clicks, Seq("user_id"), "left")
      .join(purchases, Seq("user_id"), "left")
      .select($"user_id",
        (when($"view_us".isNotNull, 1L).otherwise(0L) +
          when($"click_us".isNotNull, 1L).otherwise(0L) +
          when($"purchase_us".isNotNull, 1L).otherwise(0L)).as("stage"),
        $"view_us", $"click_us", $"purchase_us")
      .orderBy($"user_id")
  }

  /** X63 — cohort retention matrix: users are cohorted by their first
    * active epoch-week; each later active week counts toward that cohort's
    * retention at offset (week − cohort_week), reported in integer ppm of
    * the cohort size.
    *
    * Scale: ONE shuffle, on user_id — `collect_set(week)` is partial-agg
    * combinable and bounded by the calendar (weeks, not events), the
    * cohort is `array_min` of that set, and offsets explode narrowly from
    * it. The usual two-step (first-seen agg + join back onto the event
    * stream) re-shuffles the full stream; this never touches events again
    * after the per-user fold. The final ppm window runs over the
    * weeks×weeks aggregate — a calendar-sized frame, irrelevant at any
    * data scale. */
  def q99RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val act = ev(s, dir).select($"user_id",
      expr("unix_micros(cast(ts as timestamp)) div 604800000000").as("week"))
    val counts = act.groupBy($"user_id")
      .agg(collect_set($"week").as("weeks"))
      .select(array_min($"weeks").as("cohort_week"), explode($"weeks").as("week"))
      .select($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
      .groupBy($"cohort_week", $"week_offset")
      .agg(count(lit(1)).as("n_users"))
    val wC = Window.partitionBy($"cohort_week")
    counts
      .withColumn("cohort_size",
        max(when($"week_offset" === 0L, $"n_users")).over(wC))
      .select($"cohort_week", $"week_offset", $"n_users",
        expr("n_users * 1000000 div cohort_size").as("retention_ppm"))
      .orderBy($"cohort_week", $"week_offset")
  }

  /** X64 — trailing-7-day distinct actives per day WITHOUT a range join:
    * each distinct (user, day) pair is exploded to the ≤7 future days it
    * keeps the user "active" for, then a plain count-distinct per day.
    * The range join this replaces (`days d JOIN events e ON e.day BETWEEN
    * d.day-6 AND d.day`) is quadratic per skewed day and unplannable as an
    * equi-join; the contribution explode is a ×7 narrow map into ONE
    * hash-aggregable shuffle — the standard sliding-window-distinct shape
    * at stream scale. Days past the corpus horizon are cut by a broadcast
    * 1-row max. */
  def q101ActiveWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = ev(s, dir).select($"user_id",
      expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .distinct()
    val daily = pairs.groupBy($"day").agg(count(lit(1)).as("n_active_1d"))
    // horizon from the tiny per-day aggregate, not a third pass over pairs
    val maxDay = daily.agg(max($"day").as("max_day"))
    val trailing = pairs
      .select($"user_id", explode(sequence($"day", $"day" + 6L)).as("day"))
      .crossJoin(broadcast(maxDay))
      .filter($"day" <= $"max_day")
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("n_active_7d"))
    trailing.join(daily, Seq("day"), "left")
      .select($"day", coalesce($"n_active_1d", lit(0L)).as("n_active_1d"),
        $"n_active_7d")
      .orderBy($"day")
  }

  /** X77 — first-seen growth curve: new distinct users per HOUR and the
    * running cumulative user count — the acquisition chart behind every
    * "signups over time" dashboard, and the one metric a trailing window
    * (X64) cannot express. Hourly because this corpus front-loads user
    * first-contact into the opening days — daily buckets would collapse
    * the curve to two rows and verify nothing.
    *
    * Scale: the per-user min(ts) fold is ONE combinable user_id shuffle
    * (events never move again); the running sum then operates on a frame
    * whose cardinality is the number of HOURS in the corpus horizon, so
    * the unpartitioned window — normally a scale bug — is over thousands
    * of rows regardless of corpus size. */
  def q112FirstSeen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val firstHour = ev(s, dir)
      .select($"user_id",
        expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("hour"))
      .groupBy($"user_id").agg(min($"hour").as("hour"))
    val hourly = firstHour.groupBy($"hour").agg(count(lit(1)).as("n_new_users"))
    val w = Window.orderBy($"hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .withColumn("cum_users", sum($"n_new_users").over(w))
      .orderBy($"hour")
  }

  /** X78 — Markov transition matrix of event types: for every ordered pair
    * (previous event, next event) within a user's (ts, event_id)-ordered
    * stream, the transition count and probability in integer ppm — the
    * behavioral fingerprint used for session-model features and bot
    * detection.
    *
    * Scale: lag() shares ONE user_id partitioning with the per-user sort;
    * the pair aggregation is combinable and its result frame is
    * |event_types|² (25 rows here) — so after the single event shuffle
    * everything is effectively driver-sized. Probabilities are integer
    * ratios of the pair count to its row's prev-type total, computed with
    * a window over the tiny pair frame. */
  def q115Transitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = ev(s, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val byPrev = Window.partitionBy($"prev_type")
    pairs
      .withColumn("tot", sum($"n_transitions").over(byPrev))
      .selectExpr("prev_type", "next_type", "n_transitions",
        "n_transitions * 1000000 div tot AS p_ppm")
      .orderBy($"prev_type", $"next_type")
  }

  /** X83 — exact-P99 anomaly audit: per event type, flag the top 1% of
    * purchase/interaction values and report count + threshold — the alert
    * feed behind fraud/outlier monitoring. EXACT rank banding (top
    * n div 100 rows by value with an event_id tiebreak), not an
    * approximate percentile: an alerting gate that drifts with sketch
    * error pages someone at 3am.
    *
    * Scale: the rank window and the per-type count window share ONE
    * event_type partitioning (one exchange); the output frame is
    * |event_types| rows. A type with fewer than 100 events flags nothing
    * (n div 100 = 0) and reports a NULL threshold. */
  def q119AnomalyP99(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"cents".desc, $"event_id")
    val cw = Window.partitionBy($"event_type")
    ev(s, dir)
      .select($"event_type", $"event_id",
        graft.functions.Exact.cents($"value").as("cents"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cw))
      .withColumn("is_anom",
        when($"rk" <= expr("n div 100"), 1L).otherwise(0L))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"is_anom").as("n_anomalies"),
        min(when($"is_anom" === 1L, $"cents")).as("threshold_cents"),
        max($"cents").as("max_cents"))
      .orderBy($"event_type")
  }

  /** X84 — session journey paths: the first three event types of every
    * gap-defined session (X17's 30-minute sessionization, unchanged),
    * ranked by how many sessions follow each path — the entry-funnel
    * report product teams read daily.
    *
    * Scale: session assignment rides the SAME single user_id partitioning
    * as X17; the per-session fold is a combinable groupBy whose in-group
    * state is capped by the sort_array+slice(3) (the collected struct is
    * sorted then cut — order-insensitive to collect_list's arrival order);
    * the path frame is ≤|types|³ rows. */
  def q120SessionPaths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sessionized(ev(s, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type"))
      .groupBy($"user_id", $"sess_idx")
      .agg(collect_list(struct($"us", $"event_id", $"event_type")).as("evs"))
      .select(expr(
        """array_join(transform(slice(sort_array(evs), 1, 3),
          |  x -> x.event_type), '>')""".stripMargin).as("path"))
      .groupBy($"path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy($"n_sessions".desc, $"path")
  }

  /** X86 — tumbling-window OHLC bars: per event type and hour, the opening
    * value (first by time), high, low, closing value (last by time), event
    * count and volume — the arg-first/arg-last aggregation family, time-
    * series compaction every metrics store performs at ingest.
    *
    * Scale: ascending and descending row_number windows SHARE one
    * (event_type, hour) hash partitioning (one exchange, two in-partition
    * sorts), and the bar fold is combinable on the same key — so the whole
    * operator is one shuffle of (type, hour, cents) triples, never a
    * self-join of the stream against window boundaries. Open/close ties
    * are impossible: event_id is the total-order tiebreak. */
  def q122OhlcBars(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = ev(s, dir)
      .select($"event_type", $"event_id",
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        graft.functions.Exact.cents($"value").as("cents"))
      .withColumn("hour", expr("us div 3600000000"))
    val asc = Window.partitionBy($"event_type", $"hour").orderBy($"us", $"event_id")
    val desc = Window.partitionBy($"event_type", $"hour")
      .orderBy($"us".desc, $"event_id".desc)
    base
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy($"event_type", $"hour")
      .agg(count(lit(1)).as("n_events"),
        max(when($"rn_a" === 1, $"cents")).as("open_cents"),
        max($"cents").as("high_cents"),
        min($"cents").as("low_cents"),
        max(when($"rn_d" === 1, $"cents")).as("close_cents"),
        sum($"cents").as("volume_cents"))
      .orderBy($"event_type", $"hour")
  }

  /** X92 — time-decayed engagement score: per user, event value summed
    * with an exponential half-life of one week — but decayed by integer
    * BIT-SHIFT (cents >> age_weeks), not a float exp(): the decay is then
    * bit-exact in every engine, monotone in age, and the oracle replays
    * it with `>>`. The float version is the one scoring function every
    * recommender uses and no two engines agree on to the last ulp.
    *
    * Two explicit guards keep the shift honest where raw `>>` is not:
    * age_weeks >= 63 decays to exactly 0 (Java/Spark mask the shift count
    * to 6 bits, so an unguarded `cents >> 64` would return cents — scoring
    * an ancient event at FULL value — while DuckDB returns 0), and
    * negative cents decay symmetrically toward zero via -((-cents) >> w)
    * (arithmetic shift floors a negative at -1 forever and makes the
    * "decayed" value EXCEED the raw one).
    *
    * Scale: the horizon comes from a broadcast 1-row aggregate; decay is
    * narrow scan math; the per-user fold is ONE combinable shuffle. */
  private[graft] val decayExpr: org.apache.spark.sql.Column = expr(
    """CASE WHEN age_weeks >= 63 THEN 0L
      |     WHEN cents >= 0 THEN shiftright(cents, cast(age_weeks as int))
      |     ELSE -shiftright(-cents, cast(age_weeks as int)) END""".stripMargin)

  def q127TimeDecay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = ev(s, dir)
      .select($"user_id",
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"),
        graft.functions.Exact.cents($"value").as("cents"))
    val horizon = base.agg(max($"day").as("max_day")) // 1-row broadcast
    base.crossJoin(broadcast(horizon))
      .withColumn("age_weeks", expr("(max_day - day) div 7"))
      .withColumn("decayed", decayExpr)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"cents").as("raw_cents"),
        sum($"decayed").as("decayed_cents"))
      .orderBy($"user_id")
  }

  /** X96 — inter-arrival gap histogram: per event type, the distribution
    * of microsecond gaps between a user's consecutive events, in log2
    * bands — the latency-shape profile behind bot detection (suspiciously
    * tight bands) and session-gap threshold selection (X17 hardcodes 30
    * min; this measures what the corpus actually does).
    *
    * The band is `length(bin(gap_us)) - 1` = floor(log2) — string-length
    * integer math both engines compute identically, where a libm log2()
    * would hash-differ in the last ulp. The gap is attributed to the
    * LATER event's type.
    *
    * Scale: lag() rides the SAME user_id partitioning as every other
    * sequence operator (X16/X37/X78); the band aggregation is combinable
    * into a |types| × ~40 frame. One event shuffle, nothing else. */
  def q130InterArrival(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    ev(s, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .withColumn("gap_us", $"us" - lag($"us", 1).over(w))
      .filter($"gap_us".isNotNull)
      .withColumn("band", (length(bin($"gap_us")) - 1).cast("long"))
      .groupBy($"event_type", $"band")
      .agg(count(lit(1)).as("n_gaps"),
        min($"gap_us").as("min_gap_us"),
        max($"gap_us").as("max_gap_us"))
      .orderBy($"event_type", $"band")
  }

  /** X97 — exact-MAD outlier audit: per event type, the (lower) median
    * value, the median absolute deviation from it, and how many events
    * sit more than 3 MADs out — the robust-statistics alternative to
    * X83's P99 band (a median/MAD gate doesn't move when the outliers
    * themselves grow).
    *
    * Exactness: lower median = smallest value whose cumulative count
    * reaches ceil(n/2) — pure integer rank math, no interpolation, no
    * approx_percentile sketch drift.
    *
    * Scale: THE design point — medians come from a cumulative walk over
    * the per-type VALUE HISTOGRAM (one combinable (type, cents) shuffle;
    * the histogram frame is value-domain-sized, not corpus-sized), never
    * from sorting events inside a 5-partition window. The deviation
    * histogram derives from the value histogram by re-keying — the raw
    * events are scanned ONCE. */
  def q131MadOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byType = Window.partitionBy($"event_type")
    val cumV = byType.orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumD = byType.orderBy($"dev")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, dir)
      // value histogram: the only corpus-sized aggregation
      .select($"event_type", graft.functions.Exact.cents($"value").as("cents"))
      .groupBy($"event_type", $"cents").agg(count(lit(1)).as("c"))
      // lower median: smallest cents with 2·cum >= n, attached per row by
      // a full-partition window (no join, no second pass over events)
      .withColumn("cumc", sum($"c").over(cumV))
      .withColumn("n", sum($"c").over(byType))
      .withColumn("median_cents",
        min(when($"cumc" * 2 >= $"n", $"cents")).over(byType))
      // deviation histogram derives from the VALUE histogram by re-keying
      .groupBy($"event_type", abs($"cents" - $"median_cents").as("dev"))
      .agg(sum($"c").as("c"), max($"n").as("n"), // constants per type
        max($"median_cents").as("median_cents"))
      .withColumn("cumd", sum($"c").over(cumD))
      .withColumn("mad_cents",
        min(when($"cumd" * 2 >= $"n", $"dev")).over(byType))
      .groupBy($"event_type")
      .agg(max($"n").as("n"), max($"median_cents").as("median_cents"),
        max($"mad_cents").as("mad_cents"),
        sum(when($"dev" > $"mad_cents" * 3, $"c").otherwise(0L))
          .as("n_outliers"))
      .orderBy($"event_type")
  }

  /** X107 — last-touch attribution: each purchase is credited to the most
    * recent PRIOR click by the same user within a 7-day lookback — the
    * marketing-attribution primitive, and the in-stream cousin of the X16
    * as-of join (here both sides live in one event stream, so there is no
    * union to build: one last-ignore-nulls window over the user's
    * timeline does the whole lookup). Purchases with no qualifying click
    * attribute to NULL.
    *
    * Scale: ONE user_id partitioning carries everything; the click payload
    * (timestamp + event id) rides a struct through the window, so no
    * self-join of the stream against its own clicks and no second
    * shuffle. The (us, event_id) total order pins tie-breaks
    * deterministically. The 7-day cut is integer-microsecond math applied
    * AFTER the pick — a window-frame range bound would change which click
    * wins under ties, not just filter it. */
  def q141Attribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val Lookback = 7L * 86400L * 1000000L
    val e = Tables.load(s, dir, "events")
      .select($"event_id", $"user_id", $"event_type",
        unix_micros($"ts".cast("timestamp")).as("us"))
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("lastc",
        last(when($"event_type" === "click",
          struct($"us".as("cus"), $"event_id".as("cid"))),
          ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .withColumn("hit",
        $"lastc".isNotNull && $"us" - $"lastc.cus" <= Lookback)
      .select($"event_id", $"user_id",
        when($"hit", $"lastc.cid").as("click_id"),
        when($"hit", expr("(us - lastc.cus) div 60000000")).as("gap_minutes"))
      .orderBy($"event_id")
  }

  /** X240 — linear multi-touch attribution: X107's single-winner model
    * credits ONLY the last click; marketing mix analysis wants every
    * touch (view or click) in the 7-day lookback to share the purchase
    * value equally — integer cents split as `v div n` per touch with the
    * remainder going to the LATEST touch, so credit reconciles to
    * revenue EXACTLY (sum of credits + unattributed = total purchase
    * cents, no rounding leak).
    *
    * The lookback window runs over a composite key k = us·1024 +
    * (event_id mod 1024): RANGE frames take ONE numeric sort key on both
    * engines, and bare microseconds collide — the id term makes every
    * frame boundary a VALUE decision instead of a row-order accident
    * (same-microsecond ties resolve by id, never nondeterministically).
    * The latest-touch pick is likewise by value: max over k·2 + is_view
    * — no last_value row-order dependence anywhere.
    *
    * Scale: ONE user_id partitioning carries all three window folds (two
    * conditional counts + the arg-max pack) — no self-join of the stream
    * against its own touches (q141's rule); the report collapses to a
    * 1-row aggregate then stacks to 3 rows. */
  def q271LinearAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lookbackK = 7L * 86400L * 1000000L * 1024L
    val e = Tables.load(s, dir, "events")
      .select($"event_id", $"user_id", $"event_type",
        coalesce($"value", lit(0.0)).as("value"),
        unix_micros($"ts".cast("timestamp")).as("us"))
      .withColumn("k", $"us" * 1024L + pmod($"event_id", lit(1024L)))
    val w = Window.partitionBy($"user_id").orderBy($"k")
      .rangeBetween(-lookbackK, -1L)
    val p = e
      .withColumn("nv", coalesce(
        sum(when($"event_type" === "view", 1L).otherwise(0L)).over(w), lit(0L)))
      .withColumn("nc", coalesce(
        sum(when($"event_type" === "click", 1L).otherwise(0L)).over(w), lit(0L)))
      .withColumn("mlast", max(when(
        $"event_type" === "view" || $"event_type" === "click",
        $"k" * 2L + when($"event_type" === "view", 1L).otherwise(0L)))
        .over(w))
      .filter($"event_type" === "purchase")
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .withColumn("n", $"nv" + $"nc")
      .withColumn("base", when($"n" > 0, expr("v div n")).otherwise(0L))
      .withColumn("rem", when($"n" > 0, $"v" - $"base" * $"n").otherwise(0L))
      .withColumn("lview",
        when($"n" > 0, pmod($"mlast", lit(2L))).otherwise(0L))
    p.agg(
        sum(when($"n" > 0, $"base" * $"nv" + $"rem" * $"lview")
          .otherwise(0L)).as("credit_view"),
        sum(when($"n" > 0, $"base" * $"nc" + $"rem" * (lit(1L) - $"lview"))
          .otherwise(0L)).as("credit_click"),
        sum(when($"n" === 0, $"v").otherwise(0L)).as("credit_un"),
        sum(when($"n" > 0, $"nv").otherwise(0L)).as("t_view"),
        sum(when($"n" > 0, $"nc").otherwise(0L)).as("t_click"),
        sum(when($"nv" > 0, 1L).otherwise(0L)).as("p_view"),
        sum(when($"nc" > 0, 1L).otherwise(0L)).as("p_click"),
        sum(when($"n" === 0, 1L).otherwise(0L)).as("p_un"))
      .select(expr(
        """stack(3,
          |  'click', t_click, p_click, credit_click,
          |  'unattributed', 0L, p_un, credit_un,
          |  'view', t_view, p_view, credit_view)
          |  AS (touch_type, n_touches, n_purchases, credit_cents)"""
          .stripMargin))
      .orderBy($"touch_type")
  }

  /** X120 — change-log net-effect compaction: collapse each entity's event
    * history to its NET state — op counts, first/last operation in the
    * (time, event_id) total order, and whether the entity survives (last
    * op ≠ delete) — the log-compaction step a CDC consumer runs before
    * merging a day's stream into the warehouse (a key whose history nets
    * to absent never needs to touch the target table). Ops derive from
    * event types: signup=I, error=D, everything else=U.
    *
    * Scale: ONE combinable user fold and NO window — first/last ride
    * `min_by`/`max_by` over the (us, event_id) struct order, which
    * partial-aggregates map-side like any min/max. The compacted frame is
    * entity-cardinality-sized. */
  def q153NetEffect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select($"user_id", $"event_id",
        unix_micros($"ts".cast("timestamp")).as("us"),
        when($"event_type" === "signup", "I")
          .when($"event_type" === "error", "D")
          .otherwise("U").as("op"))
      .groupBy($"user_id")
      .agg(
        sum(when($"op" === "I", 1L).otherwise(0L)).as("n_i"),
        sum(when($"op" === "U", 1L).otherwise(0L)).as("n_u"),
        sum(when($"op" === "D", 1L).otherwise(0L)).as("n_d"),
        min_by($"op", struct($"us", $"event_id")).as("first_op"),
        max_by($"op", struct($"us", $"event_id")).as("last_op"))
      .withColumn("net_state",
        when($"last_op" === "D", "absent").otherwise("present"))
      .orderBy($"user_id")
  }

  /** X132 — hourly burstiness audit: per event type, the Fano factor
    * (variance/mean of hourly counts, 10⁶ = Poisson) over the hours the
    * type was observed — the dispersion monitor that separates steady
    * traffic from bursty traffic where a mean-based alert threshold lies.
    *
    * Exactness: Fano = var/mean = (n·Σc² − S²) / (n·S) over the hourly
    * count vector (S = Σc) — every term an exact integer, no float
    * variance accumulation, so the ppm rendering is engine-identical.
    * Headroom: per-(type, hour) counts enter squared; c < ~3·10⁹ keeps
    * n·Σc² inside int64 at a 720-hour horizon — beyond that, band the
    * hours first.
    *
    * Scale: TWO combinable aggregates — (type, hour) then type; the
    * first reduces the stream to a horizon-sized frame, the second to
    * \|types\| rows. Observed-hours only (a type absent all hour
    * contributes no row) — documented, deterministic. */
  def q165Burstiness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourly = ev(s, dir)
      .select($"event_type",
        expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("hour"))
      .groupBy($"event_type", $"hour").agg(count(lit(1)).as("c"))
    hourly.groupBy($"event_type")
      .agg(count(lit(1)).as("n_hours"), sum($"c").as("n_events"),
        sum($"c" * $"c").as("sum_sq"))
      .select($"event_type", $"n_hours", $"n_events",
        expr("(n_hours * sum_sq - n_events * n_events) * 1000000" +
          " div (n_hours * n_events)").as("fano_ppm"))
      .orderBy($"event_type")
  }

  /** X135 — weekly churn rate: per calendar week, how many active users
    * do NOT return the following week — the flow complement to X63's
    * retention stock (the cohort matrix says who is still here; churn
    * says who just left). A user churns at week w when their next active
    * week is > w+1 (or never); the horizon week is excluded — its
    * successor is unobservable, and counting it would report phantom
    * churn that disappears when the next batch lands.
    *
    * Scale: ONE (user, week) distinct (combinable) collapses the event
    * stream to user-weeks; the successor lookup is a lead() on the
    * user partitioning; the horizon is a broadcast 1-row max; the report
    * fold is a combinable \|weeks\| aggregate. Events shuffle once. */
  def q168WeeklyChurn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val uw = ev(s, dir)
      .select($"user_id",
        expr("unix_micros(cast(ts as timestamp)) div 604800000000")
          .as("week"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"week")
    val horizon = uw.agg(max($"week").as("max_week"))
    uw.withColumn("next_week", lead($"week", 1).over(w))
      .crossJoin(broadcast(horizon))
      .withColumn("churned", when($"week" < $"max_week" &&
          ($"next_week".isNull || $"next_week" > $"week" + 1), 1L)
        .otherwise(0L))
      .groupBy($"week")
      .agg(count(lit(1)).as("n_active"), sum($"churned").as("n_churned"))
      .withColumn("churn_ppm", expr("n_churned * 1000000 div n_active"))
      .orderBy($"week")
  }

  /** X144 — temporal-split cold-start audit: split the stream at a cut
    * timestamp (train before, test after) and measure, per event type,
    * how much test traffic comes from users with NO train history — the
    * leakage/coverage check run before any time-split evaluation
    * (a recommender eval where 40% of test users are cold measures
    * onboarding, not ranking).
    *
    * Scale: the train-user frame projects to its key column (user-
    * dimension-sized) before the membership join; both the event fold
    * and the distinct-user counts are combinable into a \|types\| frame.
    * The cut predicate pushes to the scan on both legs. */
  def q176TemporalSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cut = lit("2024-01-24").cast("timestamp")
    val ev0 = ev(s, dir)
    val trainUsers = ev0.filter($"ts" < cut).select($"user_id").distinct()
      .withColumn("seen", lit(1L))
    ev0.filter($"ts" >= cut)
      .join(trainUsers, Seq("user_id"), "left")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_test_events"),
        sum(when($"seen".isNull, 1L).otherwise(0L)).as("cold_events"),
        countDistinct($"user_id").as("n_test_users"),
        countDistinct(when($"seen".isNull, $"user_id")).as("cold_users"))
      .withColumn("cold_ppm", expr("cold_events * 1000000 div n_test_events"))
      .orderBy($"event_type")
  }

  /** X155 — funnel conversion-rate report: the stage-to-stage rates the
    * X37 funnel's per-user frame implies — users reaching each stage,
    * step conversion (stage k → k+1) and cumulative conversion from the
    * top, all in integer ppm. One aggregate over the funnel frame;
    * reconciles with q78 row-for-row because it CONSUMES q78's operator
    * (the same ordered-min cascade) rather than re-deriving it.
    *
    * Scale: q78's cascade is the corpus-touching part; this report adds
    * one conditional-sum fold to a 1-row frame exploded to 3 stage rows. */
  def q187FunnelRates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val one = q78Funnel(s, dir).agg(
      count(lit(1)).as("u0"),
      sum(when($"stage" >= 1, 1L).otherwise(0L)).as("u1"),
      sum(when($"stage" >= 2, 1L).otherwise(0L)).as("u2"),
      sum(when($"stage" >= 3, 1L).otherwise(0L)).as("u3"))
    one.select(explode(expr(
        """array(
          |  struct(1L AS stage, 'view' AS step, u1 AS n_users,
          |         u1 * 1000000 div u0 AS step_ppm,
          |         u1 * 1000000 div u0 AS cum_ppm),
          |  struct(2L AS stage, 'click' AS step, u2 AS n_users,
          |         CASE WHEN u1 = 0 THEN 0L ELSE u2 * 1000000 div u1 END AS step_ppm,
          |         u2 * 1000000 div u0 AS cum_ppm),
          |  struct(3L AS stage, 'purchase' AS step, u3 AS n_users,
          |         CASE WHEN u2 = 0 THEN 0L ELSE u3 * 1000000 div u2 END AS step_ppm,
          |         u3 * 1000000 div u0 AS cum_ppm))""".stripMargin)).as("r"))
      .select($"r.stage", $"r.step", $"r.n_users", $"r.step_ppm", $"r.cum_ppm")
      .orderBy($"stage")
  }

  /** X160 — event-type audience overlap: for every pair of event types,
    * the distinct-user intersection and Jaccard in integer ppm — the
    * co-engagement matrix behind "do purchasers also browse?" questions
    * and segment-targeting decisions.
    *
    * Scale: the (type, user) incidence is ONE combinable distinct; the
    * pair expansion self-joins on user_id and is bounded by
    * C(\|types\|, 2) rows PER USER (X151's bounded-incidence shape);
    * per-type audience sizes are a \|types\| frame broadcast back. */
  def q192AudienceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the (type, user) incidence feeds THREE consumers (sizes + both
    // sides of the pair join): persist once instead of re-running the
    // events-wide distinct per consumer, materialize the ≤C(|types|,2)
    // report, release (q118's collect-then-unpersist idiom)
    val inc = ev(s, dir).select($"event_type", $"user_id").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = inc.groupBy($"event_type").agg(count(lit(1)).as("n"))
      val pairs = inc.select($"user_id", $"event_type".as("type_a"))
        .join(inc.select($"user_id", $"event_type".as("type_b")), Seq("user_id"))
        .filter($"type_a" < $"type_b")
        .groupBy($"type_a", $"type_b")
        .agg(count(lit(1)).as("n_shared"))
      val out = pairs
        .join(broadcast(sizes.select($"event_type".as("type_a"), $"n".as("n_a"))),
          Seq("type_a"))
        .join(broadcast(sizes.select($"event_type".as("type_b"), $"n".as("n_b"))),
          Seq("type_b"))
        .select($"type_a", $"type_b", $"n_a", $"n_b", $"n_shared",
          expr("n_shared * 1000000 div (n_a + n_b - n_shared)")
            .as("jaccard_ppm"))
        .orderBy($"type_a", $"type_b")
      val rows = out.collect().toSeq
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), out.schema)
    } finally inc.unpersist(blocking = false)
  }

  /** X161 — view→purchase latency histogram: for users who completed the
    * X37 funnel, the time from first view to first qualifying purchase,
    * banded in log2 microseconds — the time-to-convert distribution that
    * prices remarketing windows. CONSUMES q78's frame (the latencies are
    * its columns), adding one narrow band projection and a combinable
    * ~40-row fold.
    *
    * Scale: q78's cascade touches the corpus; everything here operates
    * on the user-sized funnel frame. */
  def q193ConversionLatency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    q78Funnel(s, dir)
      .filter($"purchase_us".isNotNull)
      .select(($"purchase_us" - $"view_us").as("latency_us"))
      // same-instant conversions land in band 0 (bin(0) has length 1)
      .withColumn("band", (length(bin($"latency_us")) - 1).cast("long"))
      .groupBy($"band")
      .agg(count(lit(1)).as("n_users"),
        min($"latency_us").as("min_us"), max($"latency_us").as("max_us"))
      .orderBy($"band")
  }

  /** X162 — JSON-extraction robustness audit: per event type, extract the
    * numeric `k` from the props JSON and report value mass plus parse
    * failures. Corruption is PLANTED (event_id ≡ 0 mod 31 carries a
    * non-numeric k) so the failure counts are ground-truth
    * checkable — the audit shape for semi-structured columns whose
    * producers drift: count the nulls, never throw.
    *
    * Scale: get_json_object is a narrow codegen'd pass; ONE combinable
    * \|types\| fold. */
  def q195JsonAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .withColumn("p2", when($"event_id" % 31 === 0,
        lit("{\"k\": \"corrupt\"}")).otherwise($"props"))
      .withColumn("k", expr("try_cast(get_json_object(p2, '$.k') AS BIGINT)"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"k".isNull, 1L).otherwise(0L)).as("parse_failures"),
        sum(coalesce($"k", lit(0L))).as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .withColumn("fail_ppm", expr("parse_failures * 1000000 div n_events"))
      .orderBy($"event_type")
  }

  /** X170 — weekday seasonality: events per ISO weekday × type with the
    * within-type share in integer ppm — the calendar-shape audit behind
    * anomaly thresholds (a Monday spike is seasonality, not an
    * incident). ISO numbering (1 = Monday) via weekday()+1, which both
    * engines express exactly — Spark's dayofweek() and DuckDB's dow
    * disagree on the week start, so neither is used.
    *
    * Scale: narrow calendar projection + ONE combinable \|types\|×7
    * fold; per-type totals ride the same fold via a window over the
    * 7-row-per-type frame. */
  def q202WeekdaySeasonality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byType = Window.partitionBy($"event_type")
    ev(s, dir)
      .select($"event_type",
        (weekday($"ts".cast("timestamp")) + 1).cast("long").as("iso_dow"))
      .groupBy($"event_type", $"iso_dow")
      .agg(count(lit(1)).as("n_events"))
      .withColumn("type_total", sum($"n_events").over(byType))
      .withColumn("share_ppm", expr("n_events * 1000000 div type_total"))
      .select($"event_type", $"iso_dow", $"n_events", $"share_ppm")
      .orderBy($"event_type", $"iso_dow")
  }

  /** X183 — ROWS-frame navigation functions (first/last/nth_value +
    * trailing sum): the frame-semantics surface q48 (ranks) and q62
    * (RANGE frames) don't touch. Frames are spelled EXPLICITLY — Spark's
    * default window frame for last_value is RANGE..CURRENT ROW, which
    * silently returns the current row's value; the unbounded-both-ends
    * frame is what "last in partition" actually means, and the (us,
    * event_id) total order pins every pick deterministically.
    *
    * Scale: all four windows share ONE user_id partitioning — a single
    * shuffle, then narrow frame walks per partition. */
  def q215WindowFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val wTo = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wTrail = w.rowsBetween(-2, Window.currentRow)
    Tables.load(s, dir, "events")
      .select($"user_id", $"event_id",
        unix_micros($"ts".cast("timestamp")).as("us"),
        $"event_type", graft.functions.Exact.cents($"value").as("cents"))
      .withColumn("first_us", first($"us").over(wTo))
      .withColumn("last_type", last($"event_type").over(wFull))
      .withColumn("third_type", nth_value($"event_type", 3).over(wFull))
      .withColumn("trail3_cents", sum($"cents").over(wTrail))
      .select($"user_id", $"event_id", $"us", $"first_us", $"last_type",
        $"third_type", $"trail3_cents")
      .orderBy($"user_id", $"us", $"event_id")
  }

  /** X227 — EWMA forecast backtest: per event type, smooth the daily
    * event-count series with an integer-permille EWMA (α = 300‰, state in
    * milli-units so the recurrence `s ← (300·c·1000 + 700·s) div 1000` is
    * exact integer arithmetic both engines replay bit-for-bit) and score
    * the ONE-STEP-AHEAD forecast against the naive persistence baseline
    * (forecast = yesterday) — the MASE-style skill ratio every capacity/
    * anomaly forecast is judged by before anyone trusts it. Both error
    * sums accumulate in milli-units; skill_ppm = ewma_err·1e6 div
    * naive_err (-1 when the naive error is zero, i.e. a constant series).
    * The series is the OBSERVED-day sequence in day order; gap-filled
    * resampling is q63's separate operator and composes upstream.
    *
    * Scale: one (type, day) count aggregate (map-side partial) collapses
    * the corpus to calendar-bounded series; collect_list is per TYPE and
    * |days|-sized — never corpus-sized — and the sequential fold is the
    * point (EWMA is order-dependent; a parallel reduction would change
    * the arithmetic), so it runs on the bounded series, one fold per
    * type, all types in parallel. */
  def q258EwmaBacktest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = ev(s, dir)
      .select($"event_type",
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("c"))
    // state = [s_milli, c_prev, err_ewma_milli, err_naive_milli, n_seen]
    val fold =
      """aggregate(
        |  transform(sort_array(collect_days), d -> d.c),
        |  array(0L, 0L, 0L, 0L, 0L),
        |  (acc, c) -> CASE WHEN element_at(acc, 5) = 0L
        |    THEN array(c * 1000L, c, 0L, 0L, 1L)
        |    ELSE array(
        |      (300L * c * 1000L + 700L * element_at(acc, 1)) div 1000L,
        |      c,
        |      element_at(acc, 3) + abs(c * 1000L - element_at(acc, 1)),
        |      element_at(acc, 4) + abs(c - element_at(acc, 2)) * 1000L,
        |      element_at(acc, 5) + 1L) END)""".stripMargin
    daily.groupBy($"event_type")
      .agg(collect_list(struct($"day", $"c")).as("collect_days"),
        sum($"c").as("total_events"))
      .select($"event_type", $"total_events", expr(fold).as("st"))
      .select($"event_type",
        expr("element_at(st, 5)").as("n_days"),
        $"total_events",
        expr("element_at(st, 3)").as("ewma_abs_err_milli"),
        expr("element_at(st, 4)").as("naive_abs_err_milli"),
        expr("""CASE WHEN element_at(st, 4) = 0L THEN -1L
               |ELSE element_at(st, 3) * 1000000L div element_at(st, 4)
               |END""".stripMargin).as("skill_ppm"))
      .orderBy($"event_type")
  }

  /** X255 — CUSUM changepoint detection on the daily event series: the
    * monitoring twin of q258's EWMA forecast — EWMA tracks a drifting
    * level, CUSUM DETECTS a level shift with bounded detection delay (the
    * Page 1954 sequential test every pipeline-volume monitor ships). All
    * integer: the per-step score is scaled by the 7-day baseline window
    * (S⁺ ← max(0, S⁺ + 7·x − T0 − K), mirrored for S⁻), so no division
    * ever happens — T0 = baseline total plays the role of 7·μ0, allowance
    * K = T0/10 (10% of the mean) absorbs daily noise, threshold H = T0/2.
    * The series plants a +25% volume shift from day 16 (x + x div 4 — a
    * feed doubling-up or a duplicate-ingest incident); measured first
    * alarm lands at day 17-19 across all SFs with ZERO baseline false
    * alarms, and the one-sided plant leaves S⁻ silent — both pinned by
    * the spec.
    *
    * Scale: the corpus collapses in ONE (day) count aggregate; the CUSUM
    * fold is order-dependent BY DEFINITION (like q258) so it runs as a
    * list-accumulator aggregate() over the calendar-bounded series —
    * 31 rows here, never corpus-sized; per-day states then re-explode
    * relationally. The oracle replays the identical fold via DuckDB
    * list_reduce with a prepended init state. */
  def q285CusumDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = ev(s, dir)
      .select(expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("n"))
    val fold =
      """aggregate(xs, array(array(0L, 0L)), (acc, x) -> concat(acc, array(array(
        |  greatest(0L, element_at(element_at(acc, size(acc)), 1)
        |    + 7L * x - t0 - t0 div 10L),
        |  greatest(0L, element_at(element_at(acc, size(acc)), 2)
        |    - 7L * x + t0 - t0 div 10L)))))""".stripMargin
    daily.agg(collect_list(struct($"day", $"n")).as("dn"))
      .select(expr("transform(sort_array(dn), e -> e.day)").as("ds"),
        expr("""transform(sort_array(dn), (e, i) ->
          |  CASE WHEN i + 1 >= 16 THEN e.n + e.n div 4L ELSE e.n END)"""
          .stripMargin).as("xs"))
      .withColumn("t0", expr("aggregate(slice(xs, 1, 7), 0L, (a, x) -> a + x)"))
      .withColumn("st", expr(fold))
      .select($"ds", $"xs", $"t0", $"st",
        explode(expr("sequence(1, size(xs))")).as("i"))
      .select(expr("element_at(ds, i)").as("day"),
        $"i".cast("long").as("idx"),
        expr("element_at(xs, i)").as("x"),
        expr("element_at(element_at(st, i + 1), 1)").as("s_pos"),
        expr("element_at(element_at(st, i + 1), 2)").as("s_neg"),
        expr("""CASE WHEN element_at(element_at(st, i + 1), 1) > t0 div 2L
          |  OR element_at(element_at(st, i + 1), 2) > t0 div 2L
          |  THEN 1L ELSE 0L END""".stripMargin).as("alarm"))
      .orderBy($"day")
  }

  /** X271 — integer autocorrelation / seasonality detection: X170 counts
    * by weekday label; this DETECTS the period without being told it —
    * the lag-k autocorrelation of the daily volume series, exact in
    * integers via the N-scaled form r_k = Σ(N·x_i−S)(N·x_{i+k}−S) · 10⁶
    * div Σ(N·x_i−S)² (N·x_i−S = N(x_i−μ) with no division, so no
    * rounding enters before the final ppm). The series plants a weekly
    * spike (doubled volume every day ≡ 3 mod 7 — a batch-job load
    * pattern sized to clear the sf0.001 noise floor, where a +50%
    * spike measured BELOW an off-phase noise lag), and
    * the audit reads the signature a monitor alarms on: r₇ high positive,
    * the off-phase lags depressed. Signed division truncates toward zero
    * identically on both engines. Integer envelope: N·x ≈ 2^17 here;
    * pre-scale counts to thousands when N·x approaches 2^31 so the
    * squared terms stay inside int64.
    *
    * Scale: ONE daily count fold collapses the corpus; the lag products
    * act on the calendar-bounded series (|days|·7 pairs). Per-stream
    * seasonality partitions the same fold by stream key. */
  def q300Autocorrelation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = ev(s, dir)
      .select(expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val xs = daily.map { case (d, n) => if (d % 7 == 3) 2 * n else n }
    val nD = xs.length.toLong
    val sSum = xs.sum
    val dev = xs.map(x => nD * x - sSum)
    val den = dev.map(d => d * d).sum
    import org.apache.spark.sql.types._
    graft.operators.LocalReport.frame(s, (1 to 7).map { k =>
      val num = dev.dropRight(k).zip(dev.drop(k)).map { case (a, b) => a * b }.sum
      org.apache.spark.sql.Row(k.toLong, nD - k,
        num * 1000000L / den)
    },
      ("lag", LongType), ("n_pairs", LongType), ("autocorr_ppm", LongType))
  }

  /** X273 — Theil-Sen robust trend vs OLS under corruption: the last
    * member of the monitoring lane (EWMA forecasts, CUSUM detects level
    * shifts, autocorrelation finds the period, MAD flags outliers — this
    * estimates the TREND, robustly). Theil-Sen = the median of all
    * pairwise slopes (dy/dx over C(|days|,2) pairs); the audit runs it
    * and ordinary least squares on the same planted-drift series
    * (x = n + 4·idx) twice — clean, and with ONE corrupted day (idx 10
    * ×10, a collector double-count burst) — and shows the division of
    * labor: Theil-Sen barely moves (median of pair slopes tolerates up
    * to ~29 corrupted pairs of 435) while OLS is dragged far off, which
    * is WHY monitors fit trends robustly. Exactness: pair slopes order
    * by the IEEE quotient (identical doubles both engines) with a
    * (dy, dx) tiebreak; the reported milli-slope is integer dy·1000
    * div dx of the LOWER-median pair; OLS is the exact integer rational
    * (NΣix−ΣiΣx)·1000 div (NΣi²−(Σi)²).
    *
    * Scale: ONE daily count fold collapses the corpus; the C(|days|,2)
    * pair set is calendar-bounded (435 pairs here) — at longer horizons
    * the published remedy is Theil-Sen on a sliding window or a random
    * pair sample, both of which keep the pair set bounded. */
  def q302TheilSen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = ev(s, dir)
      .select(expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val base = daily.zipWithIndex.map { case ((_, n), i) => n + 4L * (i + 1) }
    def slopes(xs: Array[Long]): Long = {
      val pairs = for {
        i <- xs.indices; j <- (i + 1) until xs.length
      } yield (xs(j) - xs(i), (j - i).toLong)
      val sorted = pairs.sortBy { case (dy, dx) =>
        (dy.toDouble / dx, dy, dx)
      }
      val (dy, dx) = sorted((sorted.size - 1) / 2)
      dy * 1000L / dx
    }
    def ols(xs: Array[Long]): Long = {
      val nD = xs.length.toLong
      val si = (1L to nD).sum
      val si2 = (1L to nD).map(i => i * i).sum
      val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      (nD * six - si * sx) * 1000L / (nD * si2 - si * si)
    }
    val corrupted = base.clone()
    corrupted(9) = corrupted(9) * 10L
    import org.apache.spark.sql.types._
    graft.operators.LocalReport.frame(s, Seq(
      org.apache.spark.sql.Row("1_clean", "ols", ols(base)),
      org.apache.spark.sql.Row("1_clean", "theil_sen", slopes(base)),
      org.apache.spark.sql.Row("2_corrupted", "ols", ols(corrupted)),
      org.apache.spark.sql.Row("2_corrupted", "theil_sen", slopes(corrupted))),
      ("series", StringType), ("estimator", StringType),
      ("slope_milli", LongType))
  }

  /** X217 — watermark-lateness audit: per event type, how far events
    * arrive BEHIND the global event-time frontier (the maximum event
    * time already seen in ARRIVAL order) — the exact distribution a
    * streaming deployment needs to size `withWatermark` (X21's gates
    * all carry "2 hours"; this measures what the data actually does —
    * a watermark below max_late_us DROPS rows). The events table is
    * stored in perfect event_id/ts order, so arrival is modeled as the
    * sharded-collector reality that creates lateness in the first
    * place: four collector shards (user_id mod 4) flush in 64-event
    * batches — per-shard order is preserved, shards interleave per
    * batch, exactly how multi-partition ingest reorders a stream.
    *
    * Scale: the frontier is a GLOBAL running max — the naive window is
    * one reducer for the whole corpus. [[graft.operators.GlobalOrder
    * .withRunningMax]] computes the EXCLUSIVE prefix max with the
    * two-phase range-shuffle shape (per-partition maxima → broadcast
    * prefix → narrow carry pass); the per-type report fold is
    * combinable. The DuckDB oracle replays the plain global window;
    * the two forms agree exactly. */
  def q249WatermarkLateness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir).select($"event_type", $"event_id",
      unix_micros($"ts".cast("timestamp")).as("us"),
      expr("event_id div 64").as("batch"),
      pmod($"user_id", lit(4L)).as("shard"))
    val carried = graft.operators.GlobalOrder.withRunningMax(
      e, Seq($"batch", $"shard", $"event_id"), "us", "frontier")
    carried
      // MinValue = no frontier yet (first arrival): never late
      .withColumn("late_us",
        when($"frontier" === Long.MinValue, 0L)
          .otherwise(greatest($"frontier" - $"us", lit(0L))))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"late_us" > 0, 1L).otherwise(0L)).as("n_late"),
        max($"late_us").as("max_late_us"),
        sum($"late_us").as("sum_late_us"))
      .withColumn("late_ppm", expr("n_late * 1000000 div n_events"))
      .orderBy($"event_type")
  }

  /** X292 — Kaplan-Meier survival analysis with right-censoring: the
    * published product-limit estimator on signup→purchase conversion
    * time — the analytics question naive "average days to purchase"
    * answers WRONGLY because users who have not converted yet are not
    * failures, they are CENSORED observations. Per user: first signup,
    * first purchase at-or-after it; users without one are censored at
    * the corpus horizon. At every day with ≥ 1 conversion the estimator
    * steps S ← S·(n_at_risk − d)/n_at_risk, computed as an integer
    * multiply-truncate fold in 1e6 scale (q314's lane — no IEEE
    * products; the DuckDB oracle replays the identical fold over a
    * packed n·1e6+d list so both engines walk the same fixpoint path).
    *
    * Scale: two user-keyed combinable folds (first signup; first
    * qualifying purchase — q78's cascade shape) collapse the stream to
    * one row per user; those rows fold again into the CALENDAR-BOUNDED
    * (day, endings) frame, and the KM walk runs driver-side on that
    * bounded series (q285's discipline). Nothing user- or event-sized
    * ever reaches the driver. */
  def q319SurvivalKm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400000000L
    // persist-once: the narrow projection feeds THREE folds (horizon
    // max, first-signup, first-qualifying-purchase) — uncached each
    // fold re-scanned events (r11 VERDICT task 7); released right
    // after the calendar-bounded `ends` frame collects
    val e = ev(s, dir).select($"user_id", $"event_type",
      unix_micros($"ts".cast("timestamp")).as("us")).persist()
    val ends = try {
      val hz = e.agg(max($"us").as("h"))
      val s0 = e.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"us").as("t0"))
      val p0 = e.filter($"event_type" === "purchase")
        .join(s0, Seq("user_id"))
        .filter($"us" >= $"t0")
        .groupBy($"user_id").agg(min($"us").as("tp"))
      s0.join(p0, Seq("user_id"), "left")
        .crossJoin(broadcast(hz))
        .select(
          when($"tp".isNotNull, expr(s"(tp - t0) div $dayUs"))
            .otherwise(expr(s"(h - t0) div $dayUs")).as("day"),
          when($"tp".isNotNull, 1L).otherwise(0L).as("is_event"))
        .groupBy($"day")
        .agg(sum($"is_event").as("d_i"),
          sum(lit(1L) - $"is_event").as("c_i"))
        .as[(Long, Long, Long)].collect().sortBy(_._1)
    } finally e.unpersist()
    // suffix sums give at-risk; the KM walk is the 1e6-scale truncating
    // product over conversion days, in day order
    var risk = ends.map(r => r._2 + r._3).sum
    var surv = 1000000L
    val rows = ends.flatMap { case (day, d, c) =>
      val out = if (d > 0) {
        surv = surv * (risk - d) / risk
        Some(org.apache.spark.sql.Row(day, risk, d, c, surv))
      } else None
      risk -= d + c
      out
    }
    import org.apache.spark.sql.types._
    graft.operators.LocalReport.frame(s, rows.toSeq,
      ("day", LongType), ("n_at_risk", LongType), ("n_events", LongType),
      ("n_censored", LongType), ("survival_ppm", LongType))
  }

  /** q311 planted ground truth (disjoint -701..-706 user range; event ids
    * -70101..-70603; us anchored at epoch so the plants sit 54 years from
    * the real 2024 stream but user-disjointness is what isolates them).
    * One conversation per violation class:
    *  -701 clean alternation (user/assistant/user/assistant) — ok;
    *  -702 consecutive same-role pair (user,user,assistant);
    *  -703 empty assistant turn;
    *  -704 assistant opener (orphaned response);
    *  -705 dangling user tail + an email turn (PII gate);
    *  -706 credential-assignment turn (secret gate) + a SECOND
    *       conversation after a >30-min gap whose single user turn is a
    *       dangling tail — exercises the per-conversation split. */
  private[graft] val ChatPlant: Seq[(Long, Long, Long, String, String)] = Seq(
    (-70101L, -701L, 1000000L, "view", "{\"q\": 1}"),
    (-70102L, -701L, 2000000L, "purchase", "{\"a\": 1}"),
    (-70103L, -701L, 3000000L, "click", "{\"q\": 2}"),
    (-70104L, -701L, 4000000L, "purchase", "{\"a\": 2}"),
    (-70201L, -702L, 1000000L, "view", "hello"),
    (-70202L, -702L, 2000000L, "click", "are you there"),
    (-70203L, -702L, 3000000L, "purchase", "reply"),
    (-70301L, -703L, 1000000L, "view", "hi"),
    (-70302L, -703L, 2000000L, "purchase", ""),
    (-70401L, -704L, 1000000L, "purchase", "unprompted greeting"),
    (-70402L, -704L, 2000000L, "view", "question"),
    (-70403L, -704L, 3000000L, "purchase", "answer"),
    (-70501L, -705L, 1000000L, "view", "contact me at alice@example.com"),
    (-70502L, -705L, 2000000L, "purchase", "ok will do"),
    (-70503L, -705L, 3000000L, "click", "still there"),
    (-70601L, -706L, 1000000L, "view", "use token=abcdefghijklmnop1234"),
    (-70602L, -706L, 2000000L, "purchase", "done"),
    (-70603L, -706L, 2002000000L, "view", "new chat"))

  /** X282 — conversation/chat-turn assembly + contract audit: the flat-
    * document assumption's blind spot closed. Events become ordered turns
    * (role from event_type: purchase→assistant, error→system, else user;
    * turn text from props), conversations are the 30-minute gap sessions
    * — the IDENTICAL rule as [[q54Sessionize]], asserted by the
    * reconciliation spec — and every conversation is audited against the
    * role-alternation contracts a multi-turn training example must hold:
    * consecutive same-role turns, an assistant opener (orphaned
    * response), a dangling user tail (question with no reply), empty
    * turns, and per-turn content gated through the SHARED
    * [[PiiPatterns]]/[[SecretPatterns]] detectors (q81/q246's
    * one-definition rule — the audit can never silently diverge from the
    * scrubbers). `transcript_fp` fingerprints the ORDERED role-tagged
    * transcript, proving the assembly end to end: any turn reorder, drop,
    * or role remap breaks the hash against the oracle's ORDER BY
    * string_agg replay.
    *
    * Scale: ONE user_id partitioning carries the session boundary, the
    * lag/lead contract flags, AND (by the subset-clustering rule) the per-
    * conversation aggregate — the q54 discipline; detector regexes run
    * codegen'd per turn at scan throughput; transcripts are session-
    * bounded (watermark-bounded in the streaming twin's terms), never
    * corpus-sized. */
  def q311ChatContracts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Fingerprint.register(s)
    val gapUs = 1800L * 1000000L
    val plant = s.createDataset(ChatPlant).toDF(
      "event_id", "user_id", "us", "event_type", "props")
    val e = ev(s, dir)
      .select($"event_id", $"user_id",
        unix_micros($"ts".cast("timestamp")).as("us"),
        $"event_type", $"props")
      .unionByName(plant)
      .withColumn("role",
        when($"event_type" === "purchase", "assistant")
          .when($"event_type" === "error", "system")
          .otherwise("user"))
      .withColumn("t", coalesce($"props", lit("")))
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevUs = lag($"us", 1).over(w)
    val nextUs = lead($"us", 1).over(w)
    val turns = e
      .withColumn("new_sess",
        when(prevUs.isNull || $"us" - prevUs > gapUs, 1L).otherwise(0L))
      .withColumn("is_tail",
        when(nextUs.isNull || nextUs - $"us" > gapUs, 1L).otherwise(0L))
      .withColumn("same_role",
        when($"new_sess" === 0L && lag($"role", 1).over(w) === $"role", 1L)
          .otherwise(0L))
      .withColumn("conv_idx", sum($"new_sess").over(run))
    val pii = $"t".rlike(PiiPatterns.Email) || $"t".rlike(PiiPatterns.Ipv4) ||
      $"t".rlike(PiiPatterns.LongNumber)
    val secret = $"t".rlike(SecretPatterns.HexRun) ||
      $"t".rlike(SecretPatterns.AwsKeyId) || $"t".rlike(SecretPatterns.CredAssign)
    turns.groupBy($"user_id", $"conv_idx")
      .agg(count(lit(1)).as("n_turns"),
        sum(when($"role" === "user", 1L).otherwise(0L)).as("n_user_turns"),
        sum(when($"role" === "assistant", 1L).otherwise(0L)).as("n_assistant_turns"),
        sum(when($"role" === "system", 1L).otherwise(0L)).as("n_system_turns"),
        sum($"same_role").as("n_same_role_pairs"),
        max(when($"new_sess" === 1L && $"role" === "assistant", 1L)
          .otherwise(0L)).as("opener_bad"),
        max(when($"is_tail" === 1L && $"role" === "user", 1L)
          .otherwise(0L)).as("dangling_tail"),
        sum(when(length(trim($"t")) === 0, 1L).otherwise(0L)).as("n_empty_turns"),
        sum(when(pii, 1L).otherwise(0L)).as("n_pii_turns"),
        sum(when(secret, 1L).otherwise(0L)).as("n_secret_turns"),
        expr("""graft_fingerprint(concat_ws(char(10),
          |  transform(array_sort(collect_list(struct(us, event_id, role, t))),
          |            x -> concat(x.role, ':', x.t))))""".stripMargin)
          .as("transcript_fp"))
      .withColumn("contract_ok",
        when($"n_same_role_pairs" + $"opener_bad" + $"dangling_tail" +
          $"n_empty_turns" + $"n_pii_turns" + $"n_secret_turns" === 0L, 1L)
          .otherwise(0L))
      .select($"user_id", $"conv_idx", $"n_turns", $"n_user_turns",
        $"n_assistant_turns", $"n_system_turns", $"n_same_role_pairs",
        $"opener_bad", $"dangling_tail", $"n_empty_turns", $"n_pii_turns",
        $"n_secret_turns", $"contract_ok", $"transcript_fp")
      .orderBy($"user_id", $"conv_idx")
  }

  /** q327 planted ground truth (disjoint -801..-806 user range, epoch-
    * anchored like [[ChatPlant]]): one conversation per selection rule —
    *  -801 clean 3-candidate pair (900¢ chosen, 500¢ rejected);
    *  -802 tie at max → ambiguous chosen, dropped;
    *  -803 single candidate → dropped;
    *  -804 identical candidate texts → degenerate preference, dropped;
    *  -805 PII prompt + valid pair → emitted with pii_prompt = 1;
    *  -806 assistant opener (no user prompt) → dropped. */
  private[graft] val PrefPlant: Seq[(Long, Long, Long, String, Double, String)] = Seq(
    (-80101L, -801L, 1000000L, "view", 0.0, "recommend a database"),
    (-80102L, -801L, 2000000L, "purchase", 5.0, "use flatfiles"),
    (-80103L, -801L, 3000000L, "purchase", 7.0, "use a kv store"),
    (-80104L, -801L, 4000000L, "purchase", 9.0, "use a columnar warehouse"),
    (-80201L, -802L, 1000000L, "view", 0.0, "pick a color"),
    (-80202L, -802L, 2000000L, "purchase", 7.0, "blue"),
    (-80203L, -802L, 3000000L, "purchase", 7.0, "green"),
    (-80301L, -803L, 1000000L, "view", 0.0, "lonely prompt"),
    (-80302L, -803L, 2000000L, "purchase", 3.0, "only answer"),
    (-80401L, -804L, 1000000L, "view", 0.0, "same answers"),
    (-80402L, -804L, 2000000L, "purchase", 2.0, "identical reply"),
    (-80403L, -804L, 3000000L, "purchase", 8.0, "identical reply"),
    (-80501L, -805L, 1000000L, "view", 0.0, "email me at bob@example.com"),
    (-80502L, -805L, 2000000L, "purchase", 1.0, "will do"),
    (-80503L, -805L, 3000000L, "purchase", 6.0, "sent to your inbox"),
    (-80601L, -806L, 1000000L, "purchase", 4.0, "unprompted a"),
    (-80602L, -806L, 2000000L, "purchase", 8.0, "unprompted b"))

  /** X301 — preference-pair assembly (RLHF/DPO training-data prep): turn
    * the interaction stream into (prompt, chosen, rejected) pairs with
    * the integrity contracts preference optimization needs. Conversations
    * are q54's 30-minute gap sessions over ONE user_id partitioning
    * (q311's discipline, same role map: purchase→assistant response,
    * value→reward cents); a conversation yields a pair iff its FIRST
    * turn is a non-empty user prompt, it has ≥ 2 assistant candidates,
    * the reward argmax and argmin are UNIQUE (a tie is an ambiguous
    * preference, not a coin flip), the margin is strictly positive, and
    * chosen/rejected texts differ (identical responses carry no
    * preference). The prompt is PII-gated through the SHARED
    * [[PiiPatterns]] (flagged, not dropped — the caller decides).
    * Candidate analysis binds the sorted candidate array ONCE via the
    * transform-array let-bind idiom (the q235 collapse rule).
    *
    * Scale: one user_id window shuffle + one conversation fold; the
    * candidate list per conversation is session-bounded; output is
    * pair-sized. The [[PrefPlant]] rows ride the query (q311's
    * discipline) and the generated oracle replays them via VALUES. */
  def q327PreferencePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Fingerprint.register(s)
    val gapUs = 1800L * 1000000L
    val plant = s.createDataset(PrefPlant).toDF(
      "event_id", "user_id", "us", "event_type", "value", "props")
    val e = ev(s, dir)
      .select($"event_id", $"user_id",
        unix_micros($"ts".cast("timestamp")).as("us"),
        $"event_type", $"value".cast("double").as("value"), $"props")
      .unionByName(plant)
      .withColumn("role", when($"event_type" === "purchase", "assistant")
        .when($"event_type" === "error", "system").otherwise("user"))
      .withColumn("t", coalesce($"props", lit("")))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val turns = e
      .withColumn("new_sess", when(lag($"us", 1).over(w).isNull ||
        $"us" - lag($"us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("conv_idx", sum($"new_sess").over(run))
    val conv = turns.groupBy($"user_id", $"conv_idx")
      .agg(
        min_by(struct($"role", $"t"), struct($"us", $"event_id")).as("first"),
        collect_list(when($"role" === "assistant",
          struct($"cents", $"event_id",
            expr("graft_fingerprint(t)").as("fp")))).as("cands"))
    val piiPrompt = $"first.t".rlike(PiiPatterns.Email) ||
      $"first.t".rlike(PiiPatterns.Ipv4) ||
      $"first.t".rlike(PiiPatterns.LongNumber)
    conv
      .filter(size($"cands") >= 2 &&
        $"first.role" === "user" && length(trim($"first.t")) > 0)
      // the size guard ALSO lives inside the expression: filter fusion
      // may evaluate the candidate analysis before the row filter, and
      // ANSI element_at throws on an empty array
      .withColumn("a", expr(
        """element_at(transform(
          |  array(CASE WHEN size(cands) >= 2 THEN array_sort(cands) END),
          |  s -> CASE WHEN s IS NULL THEN NULL ELSE named_struct(
          |    'n', size(s),
          |    'ch', element_at(s, -1),
          |    'rj', element_at(s, 1),
          |    'nmax', size(filter(s, x -> x.cents = element_at(s, -1).cents)),
          |    'nmin', size(filter(s, x -> x.cents = element_at(s, 1).cents)))
          |  END), 1)""".stripMargin))
      .filter($"a.ch.cents" > $"a.rj.cents" && $"a.nmax" === 1 &&
        $"a.nmin" === 1 && $"a.ch.fp" =!= $"a.rj.fp")
      .select($"user_id", $"conv_idx",
        expr("graft_fingerprint(first.t)").as("prompt_fp"),
        $"a.n".cast("long").as("n_candidates"),
        $"a.ch.event_id".as("chosen_id"), $"a.rj.event_id".as("rejected_id"),
        $"a.ch.cents".as("chosen_cents"), $"a.rj.cents".as("rejected_cents"),
        ($"a.ch.cents" - $"a.rj.cents").as("margin_cents"),
        when(piiPrompt, 1L).otherwise(0L).as("pii_prompt"))
      .orderBy($"user_id", $"conv_idx")
  }

  /** X328 — Mann-Kendall trend test, the significance HALF of the
    * robust-trend lane (X273's Theil-Sen estimates the slope; the
    * published pairing is Mann-Kendall for "is there a monotone trend
    * at all"): S = Σ_{i<j} sgn(x_j − x_i) over the daily series,
    * Var(S)·18 = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5), and the
    * continuity-corrected z² = 18·(|S|−1)² / denom — ALL integers
    * (z²_milli via one exact div; chi²₁ 95% = 3.841 as the milli
    * constant 3841, the q291 verdict convention). Three scopes on the
    * SAME daily frame q302 uses: `1_null` (raw daily counts — no
    * planted trend, must read NOT significant), `2_trend` (q302's
    * +4/day injection — must read significant), and `3_trend_spiked`
    * (the trend series with q302's 10× day-10 spike — rank-based S
    * barely moves, the verdict HOLDS; the same spike that doubles
    * q302's OLS slope, which is the point of the pairing).
    *
    * Scale: the daily fold is one combinable aggregation to a
    * horizon-bounded frame (q302's precedent); the O(days²) sign sum
    * runs on the driver over that bounded series; output is 3 rows. */
  def q352MannKendall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val daily = ev(s, dir)
      .select(expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      .map(_._2)
    val nullS = daily
    val trend = daily.zipWithIndex.map { case (n, i) => n + 4L * (i + 1) }
    val spiked = trend.clone()
    // mirror the oracle's CASE WHEN i = 10, which matches nothing on a
    // series shorter than 10 days (no crash on tiny fixtures)
    if (spiked.length > 9) spiked(9) = spiked(9) * 10L
    def mk(xs: Array[Long]): (Long, Long, Long, Long, Long) = {
      val n = xs.length.toLong
      var sStat = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.length)
        sStat += java.lang.Long.signum(xs(j) - xs(i))
      val ties = xs.groupBy(identity).values.map(_.length.toLong)
        .filter(_ > 1L).map(t => t * (t - 1L) * (2L * t + 5L)).sum
      val denom = n * (n - 1L) * (2L * n + 5L) - ties
      val z2m =
        if (sStat == 0L || denom == 0L) 0L
        else 18000L * (math.abs(sStat) - 1L) * (math.abs(sStat) - 1L) / denom
      (n, sStat, denom, z2m, if (z2m > 3841L) 1L else 0L)
    }
    val rows = Seq(("1_null", nullS), ("2_trend", trend),
      ("3_trend_spiked", spiked)).map { case (name, xs) =>
      val (n, sStat, denom, z2m, sig) = mk(xs)
      org.apache.spark.sql.Row(name, n, sStat, denom, z2m, sig)
    }
    graft.operators.LocalReport.frame(s, rows,
      ("series", StringType), ("n_days", LongType), ("s_stat", LongType),
      ("var_denom18", LongType), ("z2_milli", LongType),
      ("significant", LongType))
  }

  /** X368 — timestamp compression audit (delta / delta-of-delta +
    * zigzag-varint; the Gorilla recipe, Pelkonen et al. VLDB 2015, and
    * what parquet DELTA_BINARY_PACKED exploits): a timestamp column
    * stored raw costs 8 bytes/row forever; per-stream deltas are small
    * and SECOND deltas of near-periodic streams are ~0, so
    * zigzag(varint(Δ)) and zigzag(varint(ΔΔ)) compress to 1–3 bytes.
    * This operator measures all three encodings' exact byte bills over
    * (a) the real event streams — random arrivals, where the win lives
    * at the DELTA level — and (b) a planted exactly-periodic 64-event
    * stream (generated in-query from pure arithmetic), where ΔΔ = 0 on
    * 62 of 64 rows and the bill collapses to 73 bytes vs 512 raw — the
    * regime split that tells a storage layer WHICH encoding to pick,
    * as numbers (the q296 encoding advisor's time-series column).
    * Measured at sf0.01: corpus delta 709050 ppm vs ΔΔ 708150 ppm
    * (random arrivals — second differencing buys ~nothing, as theory
    * says) while the plant pays 384765 ppm at the delta level and
    * 142578 under ΔΔ.
    *
    * Integer discipline: zigzag zz(x) = 2x / −2x−1 (exact int64 —
    * event deltas ≪ 2⁶²), varint bytes by the 7-bit band CASE ladder,
    * per-stream first row billed 8 bytes under every scheme (stated),
    * ratio_ppm = bytes·1e6 div raw_bytes (nonneg).
    *
    * Scale: both lag columns ride ONE (user_id) partition / (us,
    * event_id) order window — a single exchange; the aggregate is one
    * combinable per-segment fold; the report is 6 rows. At 100 TB this
    * audit is the one-scan pre-flight that decides the lake's
    * timestamp encoding, and the encodings it prices are exactly the
    * ones the writer would emit. */
  def q387TsCompression(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    def zz(c: String) = s"(CASE WHEN $c >= 0L THEN 2L * $c ELSE -2L * $c - 1L END)"
    def vb(c: String) =
      s"""(CASE WHEN $c < 128L THEN 1L WHEN $c < 16384L THEN 2L
         | WHEN $c < 2097152L THEN 3L WHEN $c < 268435456L THEN 4L
         | WHEN $c < 34359738368L THEN 5L WHEN $c < 4398046511104L THEN 6L
         | WHEN $c < 562949953421312L THEN 7L
         | WHEN $c < 72057594037927936L THEN 8L ELSE 9L END)""".stripMargin
    val corpus = ev(s, dir).select($"user_id".cast("long").as("user_id"),
      expr("unix_micros(cast(ts as timestamp))").as("us"),
      $"event_id".cast("long").as("event_id"), lit("corpus").as("segment"))
    val plant = s.range(0, 64, 1, 1).selectExpr(
      "CAST(-387 AS BIGINT) AS user_id",
      "1700000000000000L + id * 1000000L AS us",
      "-38700L - id AS event_id", "'plant' AS segment")
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val d = corpus.unionByName(plant)
      .withColumn("d1", $"us" - lag($"us", 1).over(w))
      .withColumn("d2", $"d1" - lag($"d1", 1).over(w))
      .selectExpr("segment",
        s"CASE WHEN d1 IS NULL THEN 8L ELSE ${vb(zz("d1"))} END AS b_delta",
        s"""CASE WHEN d1 IS NULL THEN 8L
           | WHEN d2 IS NULL THEN ${vb(zz("d1"))}
           | ELSE ${vb(zz("d2"))} END AS b_dd""".stripMargin,
        "CASE WHEN d1 = 0L THEN 1L ELSE 0L END AS z1",
        "CASE WHEN d2 = 0L THEN 1L ELSE 0L END AS z2")
    val ag = d.groupBy($"segment").agg(count(lit(1)).as("n"),
        sum($"b_delta").as("bd"), sum($"b_dd").as("bdd"),
        sum($"z1").as("nz1"), sum($"z2").as("nz2"),
        sum(when($"b_delta" === 1L, 1L).otherwise(0L)).as("ob1"),
        sum(when($"b_dd" === 1L, 1L).otherwise(0L)).as("ob2"))
      .collect().map(r => r.getString(0) -> r).toMap
    val rows = ag.keys.toSeq.sorted.flatMap { seg =>
      val r = ag(seg)
      val (n, bd, bdd) = (r.getAs[Long]("n"), r.getAs[Long]("bd"),
        r.getAs[Long]("bdd"))
      Seq(
        org.apache.spark.sql.Row(s"1_raw:$seg", n, 8L * n, 1000000L, 0L, 0L),
        org.apache.spark.sql.Row(s"2_delta_zigzag:$seg", n, bd,
          bd * 1000000L / (8L * n), r.getAs[Long]("nz1"),
          r.getAs[Long]("ob1")),
        org.apache.spark.sql.Row(s"3_delta_of_delta:$seg", n, bdd,
          bdd * 1000000L / (8L * n), r.getAs[Long]("nz2"),
          r.getAs[Long]("ob2")))
    }
    graft.operators.LocalReport.frame(s, rows,
      "scope" -> StringType, "n_rows" -> LongType,
      "total_bytes" -> LongType, "ratio_ppm" -> LongType,
      "n_zero" -> LongType, "n_one_byte" -> LongType)
  }
}
