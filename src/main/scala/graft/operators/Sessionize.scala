package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators: gap-based sessionization and tumbling-window
  * rollups (the batch forms; streaming variants live in graft.streaming).
  *
  * Scale: both are one shuffle on the grouping key (user / window start);
  * sessionization is two window functions over the same (user, ts)
  * partitioning so Catalyst plans a single sort+shuffle, reused.
  */
object Sessionize {

  /** Assign gap-based sessions: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Adds
    * `session_seq` (1-based per user). ST-3/ST-5 batch analogue. */
  def withSessions(events: DataFrame, userCol: String, tsCol: String,
                   gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc)
    val prevTs = lag(col(tsCol), 1).over(byUser)
    val isNew = prevTs.isNull ||
      (unix_timestamp(col(tsCol)) - unix_timestamp(prevTs)) > gapMinutes * 60L
    events
      .withColumn("__new", isNew.cast("int"))
      .withColumn("session_seq",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** Per-session summary: start/end, events, total value. */
  def sessionSummary(events: DataFrame, userCol: String, tsCol: String,
                     valueCol: String, gapMinutes: Int = 30): DataFrame =
    withSessions(events, userCol, tsCol, gapMinutes)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total_value"))

  /** Behavioral event-sequence corpus: per (user, session), the ordered
    * event-type sequence as a training document — the sessionize→encode
    * composition that turns an event log into pretraining data for
    * behavioral/recommendation models (each session is one "sentence" of
    * event tokens). Ordering inside a session is (ts, event id) — total
    * and engine-portable, so the assembled sequence replays exactly;
    * assembly is sort_array over per-session collect_list (sessions are
    * gap-bounded, so the per-group array is session-sized, never
    * user-history-sized... the gap parameter IS the memory bound).
    * Output: (userCol, session_seq, n_events, event_seq, duration_sec). */
  def sessionSequences(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, idCol: String,
                       gapMinutes: Int = 30): DataFrame =
    withSessions(events, userCol, tsCol, gapMinutes)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("__start"), max(col(tsCol)).as("__end"),
        sort_array(collect_list(struct(col(tsCol).as("t"),
          col(idCol).as("i"), col(typeCol).as("e")))).as("__evs"))
      .select(col(userCol), col("session_seq").cast("long").as("session_seq"),
        col("n_events"),
        array_join(transform(col("__evs"), s => s.getField("e")), " ")
          .as("event_seq"),
        (unix_timestamp(col("__end")) - unix_timestamp(col("__start")))
          .as("duration_sec"))

  /** Tumbling-window rollup (batch form of ST-5): events per window, with
    * distinct users and sum of value. `widthMinutes` must divide evenly into
    * the day for DuckDB time_bucket parity. */
  def tumbling(events: DataFrame, tsCol: String, userCol: String,
               valueCol: String, widthMinutes: Int): DataFrame =
    events
      .groupBy(window(col(tsCol), s"$widthMinutes minutes").getField("start").as("window_start"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col(userCol)).as("n_users"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total_value"))

  /** A-9's literal count-based buffer: the last `n` events per key by event
    * time (the reference's 1000-event rolling window, streaming.py:72-75).
    * One row_number window — at scale prefer the time-based forms, which
    * bound state by clock rather than by count. */
  def lastN(events: DataFrame, keyCol: String, tsCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).desc)
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Sliding-window rollup (ST-5's "active users in the last W minutes",
    * batch form): width W sliding every S minutes. Each event lands in W/S
    * windows — Spark's `window()` does that expansion natively; the shuffle
    * key is the window start, and distinct users are counted exactly here
    * (the streaming twin uses approx_count_distinct to bound state). */
  def sliding(events: DataFrame, tsCol: String, userCol: String,
              widthMinutes: Int, slideMinutes: Int): DataFrame =
    events
      .groupBy(window(col(tsCol), s"$widthMinutes minutes", s"$slideMinutes minutes")
        .getField("start").as("window_start"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col(userCol)).as("active_users"))

  /** Per-key rolling N-day aggregates at day granularity: daily partial
    * aggregation FIRST (the corpus-sized shuffle is (key, day) — tiny
    * rows), then a RANGE window over day ordinals sums the last N days.
    * The rolling sums run over day-level partials, so the window state is
    * N rows per key, not N days of raw events; value sums go through
    * exact DECIMAL(18,2) (a rolling double sum would be frame-order
    * sensitive). Output: (keyCol, day, n_events_Nd, value_Nd). */
  def rollingDaily(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, days: Int,
                   epochDate: String = "2024-01-01"): DataFrame = {
    require(days >= 1, "rollingDaily: days >= 1")
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__v"))
      .withColumn("__ord", datediff(col("day"), to_date(lit(epochDate))))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ord"))
      .rangeBetween(-(days - 1), 0)
    daily
      .withColumn(s"n_events_${days}d", sum(col("__n")).over(w))
      .withColumn(s"value_${days}d",
        round(sum(col("__v")).over(w).cast("double"), 2))
      .select(col(keyCol), col("day"), col(s"n_events_${days}d"),
        col(s"value_${days}d"))
  }

  /** SFT chat-template assembly with loss-mask offsets: turn each
    * gap-based session into a training conversation — every event
    * becomes a turn `<|role|>text<|end|>`, roles split by whether the
    * event type is in `userTypes`, and each turn carries its exact
    * [t_start, t_end) CHARACTER span within the assembled session text
    * plus `loss = (role == assistant)` — the span list a supervised
    * fine-tuning pipeline feeds the collator so the loss lands only on
    * assistant tokens. The offsets are what make this an operator
    * rather than a concat: they must agree exactly with the assembled
    * string under any engine, so turn text is built only from values
    * with engine-stable string forms (the type label and the BIGINT
    * event id — never floats, whose formatting differs per engine).
    *
    * Exactness: turn order inside a session is (ts, event id) — total;
    * t_start = running sum of prior turn lengths (exact integers);
    * `assembled_digest` = md5 of the ordered concatenation, repeated on
    * every turn row, pins the assembly itself, not just the spans.
    *
    * Scale shape: sessionization's (user, ts) window, then ONE
    * (user, session) window for offsets — same partitioning, one
    * shuffle; the digest agg joins back on the (user, session) key.
    * Output: (userCol, session_seq, turn_idx, role, t_start, t_end,
    * loss, assembled_digest). */
  def sftAssemble(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, idCol: String, userTypes: Seq[String],
                  gapMinutes: Int = 30): DataFrame = {
    require(userTypes.nonEmpty, "sftAssemble: userTypes non-empty")
    val turns = withSessions(events, userCol, tsCol, gapMinutes)
      .withColumn("role",
        when(col(typeCol).isin(userTypes: _*), "user").otherwise("assistant"))
      .withColumn("__turn", concat(lit("<|"), col("role"), lit("|>"),
        col(typeCol), lit("#"), col(idCol).cast("string"), lit("<|end|>")))
    val w = Window.partitionBy(col(userCol), col("session_seq"))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val spanned = turns
      .withColumn("turn_idx", row_number().over(w))
      .withColumn("t_start", coalesce(
        sum(length(col("__turn")).cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("t_end", col("t_start") + length(col("__turn")).cast("long"))
    val digests = spanned
      .groupBy(col(userCol), col("session_seq"))
      .agg(md5(array_join(transform(
        sort_array(collect_list(struct(col(tsCol).as("t"),
          col(idCol).as("i"), col("__turn").as("s")))),
        s => s.getField("s")), "")).as("assembled_digest"))
    spanned.join(digests, Seq(userCol, "session_seq"))
      .select(col(userCol), col("session_seq").cast("long").as("session_seq"),
        col("turn_idx"), col("role"), col("t_start"), col("t_end"),
        (col("role") === "assistant").as("loss"), col("assembled_digest"))
  }
}
