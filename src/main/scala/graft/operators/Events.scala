package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Ckpt.CkptOps

/** Event-stream analytics: type routing, gap-based sessionization, and
  * tumbling-window aggregation.
  *
  * Batch re-expression of the reference's broker flow (etl/broker/producer.py
  * routes each entity to its own queue; consumer.py drains queues to the raw
  * zone) — routing becomes a keyed aggregation / partitioned write, and the
  * natural Spark upgrade is sessionization + windowed aggregation over the
  * event stream. The streaming path (readStream/watermark) lives in
  * graft.streaming.EventStreaming.
  *
  * Scale design: both sessionization windows and groupBys key on
  * `user_id`/`event_type` — high-cardinality partition keys, no global
  * windows, single shuffle each.
  */
object Events {

  /** Per-type routing stats (producer.py's queue fan-out as an aggregation). */
  def routeStats(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        // decimal-exact sum, surfaced as double (deterministic across engines)
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))

  /** Gap-based sessionization: a new session starts after `gapSec` of
    * inactivity. lag + running sum over (user, time) — the standard
    * distributed sessionization; one shuffle on user_id. */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(byUser)
    val isNew = prevTs.isNull ||
      (col("ts").cast("double") - prevTs.cast("double") > gapSec.toDouble)
    events
      .withColumn("_new_session", isNew.cast("int"))
      .withColumn("session_id",
        sum(col("_new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("session_value"))
  }

  /** Tumbling-window aggregation (batch analog of the streaming windowed
    * aggs): per (hour, event_type) counts/sums. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))

  /** First-order Markov transition matrix of the event stream: for every
    * ordered (from_type -> to_type) step inside a user's timeline, the
    * count and the row-normalized transition probability — the path-
    * discovery complement of the fixed-step [[funnel]] (which steps did
    * users actually take next?).
    *
    * Scale: one `lag` over the (user_id)-partitioned, (ts, event_id)-
    * ordered window — the same single exchange sessionize uses — then one
    * tiny (from, to) aggregation (|types|² rows). The probability
    * denominator is a second window over the dimension-sized count table
    * partitioned by from_type, so nothing re-scans the stream. Rounded to
    * 6dp (count ratios — engine-exact). */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = events
      .select(col("user_id"), col("event_type").as("to_type"),
        lag(col("event_type"), 1).over(byUser).as("from_type"))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    counts.withColumn("p",
      round(col("n").cast("double") / sum(col("n")).over(byFrom), 6))
  }

  /** Random-surfer centrality (PageRank, damping 0.85) over the
    * [[transitions]] graph — which states of the event stream attract the
    * traffic, weighting edges by observed transition counts. The power
    * iteration runs in INTEGER FIXED-POINT: rank mass is `scale` units,
    * edge probabilities are parts-per-million integers, every step is a
    * truncating integer division — bit-exact on any engine and any fold
    * order, no float accumulation to drift cross-engine. Mass arriving at
    * a dangling state (one with no observed outgoing step) leaks, the
    * classic simplification; ranks still order by attracted traffic.
    *
    * Scale: ONE corpus pass builds the edge counts (the same user-window
    * exchange sessionize uses); everything after is |types|²-sized —
    * per-round joins and sums over the dimension-sized graph, each round
    * `localCheckpoint`ed (the iterative-graph discipline of
    * [[graft.operators.Dedup.nearDupClusters]]: no unbounded lineage).
    * The edge-probability step widens the raw transition count through
    * DECIMAL(38,0) before the ×10^6 (a LONG product would overflow — and
    * under ANSI, throw — once one (from,to) pair exceeds ~9.2e12
    * occurrences); after that, p6 ≤ 10^6 and rank ≤ `scale` ≤ 10^12 bound
    * every iteration product below 10^18 < 2^63 at ANY corpus size.
    * Output: (event_type, pagerank) in `scale` units. */
  def pageRank(events: DataFrame, iters: Int = 8,
               scale: Long = 1000000000000L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = events
      .select(col("user_id"), col("event_type").as("to_type"),
        lag(col("event_type"), 1).over(byUser).as("from_type"))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val out = counts.groupBy(col("from_type")).agg(sum(col("n")).as("out_n"))
    val edges = counts.join(out, "from_type")
      .select(col("from_type"), col("to_type"),
        expr("(cast(n as decimal(38,0)) * 1000000) div out_n").as("p6"))
      .ckptLocal()
    val nodes = events.select(col("event_type").as("node")).distinct()
      .ckptLocal()
    val nn = broadcast(nodes.agg(count(lit(1)).as("nn")))
    var pr = nodes.crossJoin(nn)
      .select(col("node"), expr(s"${scale}L div nn").as("pr"))
      .ckptLocal()
    for (_ <- 1 to iters) {
      val contrib = pr.join(edges, pr("node") === edges("from_type"))
        .select(col("to_type").as("node"),
          expr("(pr * p6) div 1000000L").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cs"))
      pr = nodes.crossJoin(nn)
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (expr(s"((${scale}L div nn) * 15L) div 100L") +
            expr("(85L * coalesce(cs, 0L)) div 100L")).as("pr"))
        .ckptLocal()
    }
    pr.select(col("node").as("event_type"), col("pr").as("pagerank"))
  }

  /** Sequential funnel: for each user, the earliest time they completed each
    * step IN ORDER (step k counts only at a timestamp strictly after the
    * user's step k-1 completion). Returns one row per step with the count of
    * users who reached it.
    *
    * Scale: one shuffle on user_id; each step is an unordered per-user window
    * aggregate over the SAME partitioning, so Spark plans a single exchange
    * + sort and the k window passes pipeline over it (no per-step join
    * against a per-user milestone table, which would re-shuffle k times).
    * The final count is a tiny global aggregate of per-user booleans. */
  def funnel(events: DataFrame, typeCol: Column, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col("user_id"))
    // _t0, _t1, ... : earliest qualifying ts per step, each from the prior
    val withTs = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) typeCol === step
        else typeCol === step && col("ts") > col(s"_t${i - 1}")
      df.withColumn(s"_t$i", min(when(cond, col("ts"))).over(w))
    }
    val perUser = withTs.groupBy(col("user_id"))
      .agg(steps.indices.map(i => max(col(s"_t$i")).as(s"_t$i")).head,
        steps.indices.map(i => max(col(s"_t$i")).as(s"_t$i")).tail: _*)
    val counts = perUser.agg(
      steps.indices.map(i => count(col(s"_t$i")).as(s"_n$i")).head,
      steps.indices.map(i => count(col(s"_t$i")).as(s"_n$i")).tail: _*)
    // unpivot the single counts row to (step_index, step, n_users)
    // step names land inside single-quoted SQL literals — SqlLit escapes
    // quotes AND backslashes so a step like "add'l\info" can't break or
    // mangle the stack() parse
    val stackExpr = steps.zipWithIndex
      .map { case (s, i) => s"${i + 1}, ${SqlLit.lit(s)}, _n$i" }
      .mkString(s"stack(${steps.size}, ", ", ", ")")
    counts.select(expr(stackExpr).as(Seq("step_index", "step", "n_users")))
      .select(col("step_index").cast("int").as("step_index"), col("step"),
        col("n_users").cast("long").as("n_users"))
  }

  /** Weekly cohort retention: users are cohorted by the week of their first
    * event; each (cohort_week, weeks-since-cohort) cell counts the distinct
    * users from that cohort active that week.
    *
    * Scale: first-event time is an unordered per-user window (one shuffle on
    * user_id), offsets are pure arithmetic, and the final distinct-count
    * shuffles on the (cohort, offset) grid — tiny. Week arithmetic uses
    * epoch seconds (not engine week-diff builtins) so every engine agrees. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val cohortWeek = date_trunc("week", min(col("ts")).over(w))
    events
      .withColumn("cohort_week", cohortWeek)
      .withColumn("week_offset",
        // datediff on the truncated DATES, not epoch-seconds/604800: under a
        // DST session timezone a spring-forward week is 601200s and the
        // epoch formulation is off by one. Both operands are week-truncated
        // midnights, so the day difference is an exact multiple of 7.
        floor(datediff(date_trunc("week", col("ts")).cast("date"),
          col("cohort_week").cast("date")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }
}
