package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{EventTime, Tables}
import graft.ops.{Fuzzy, Joins}

/** Temporal join operators over the events stream table ([[graft.ops.Joins]]):
  * as-of (point-in-time lookup) and bucketized range join — the two join
  * shapes a training-data pipeline needs that no built-in join type covers
  * directly, each expressed so the planner never sees a raw inequality
  * predicate (which would plan as BroadcastNestedLoop).
  *
  * `ts` is normalized to BIGINT epoch-micros through
  * [[graft.core.EventTime.toMicros]] (schema-dispatched — the fixture has
  * shipped both INT64-nanos and TIMESTAMP_NTZ vintages); DuckDB reads the
  * same column as a true timestamp, so the oracles work in timestamps and
  * the outputs stick to id/aggregate columns both engines agree on.
  */
object Temporal extends QueryPack {

  def queries: Seq[Q] = Seq(

    // AS-OF: for every click, the same user's latest purchase at-or-before
    // the click (the feature-store join). One shuffle on user_id — union +
    // running last_value, never a range-predicate join.
    Q("q_join_asof",
      (s, dir) => {
        val ev = EventTime.toMicros(Tables(s, dir, "events"))
        Joins.asOf(
            left = ev.filter(col("event_type") === "click")
              .select("event_id", "user_id", "ts"),
            leftKey = "user_id", leftTime = "ts",
            right = ev.filter(col("event_type") === "purchase"),
            rightKey = "user_id", rightTime = "ts",
            rightTiebreak = "event_id",
            attach = Seq("event_id", "value"))
          .select(col("event_id"), col("user_id"),
            col("asof_event_id"),
            round(col("asof_value"), 4).as("asof_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (
                SELECT user_id, ts,
                  arg_max(event_id, event_id) AS pe_id,
                  arg_max(value, event_id) AS pe_value
                FROM events WHERE event_type = 'purchase'
                GROUP BY user_id, ts),
              c AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click')
              SELECT c.event_id, c.user_id,
                p.pe_id AS asof_event_id,
                round(p.pe_value, 4) AS asof_value
              FROM c ASOF LEFT JOIN p
                ON c.user_id = p.user_id AND c.ts >= p.ts
              ORDER BY c.event_id""")),

    // AS-OF with TOLERANCE (pandas merge_asof tolerance; feature-store
    // freshness): same single-shuffle union+window as q_join_asof, but a
    // match older than 1 hour is nulled — stale features are training-
    // serving skew, not features. DuckDB emulates with ASOF JOIN + a
    // staleness CASE on the matched row's own time.
    Q("q_join_asof_tol",
      (s, dir) => {
        val ev = EventTime.toMicros(Tables(s, dir, "events"))
        Joins.asOfWithin(
            left = ev.filter(col("event_type") === "click")
              .select("event_id", "user_id", "ts"),
            leftKey = "user_id", leftTime = "ts",
            right = ev.filter(col("event_type") === "purchase"),
            rightKey = "user_id", rightTime = "ts",
            rightTiebreak = "event_id",
            attach = Seq("event_id", "value"),
            tolerance = 3600L * 1000 * 1000)
          .select(col("event_id"), col("user_id"),
            col("asof_event_id"),
            round(col("asof_value"), 4).as("asof_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (
                SELECT user_id, ts,
                  arg_max(event_id, event_id) AS pe_id,
                  arg_max(value, event_id) AS pe_value
                FROM events WHERE event_type = 'purchase'
                GROUP BY user_id, ts),
              c AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click')
              SELECT c.event_id, c.user_id,
                CASE WHEN c.ts - p.ts <= INTERVAL 1 HOUR THEN p.pe_id END
                  AS asof_event_id,
                CASE WHEN c.ts - p.ts <= INTERVAL 1 HOUR
                     THEN round(p.pe_value, 4) END AS asof_value
              FROM c ASOF LEFT JOIN p
                ON c.user_id = p.user_id AND c.ts >= p.ts
              ORDER BY c.event_id""")),

    // RANGE: purchases landing in the hour after each signup (interval
    // containment, no key). Buckets of one hour → equi-join + residual;
    // aggregates are order-independent (count/max) so hashes are stable.
    Q("q_join_range",
      (s, dir) => {
        val ev = EventTime.toMicros(Tables(s, dir, "events"))
        val hourUs = 3600L * 1000 * 1000
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"),
            col("ts").as("lo"), (col("ts") + hourUs).as("hi"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("ts"), col("value"))
        Joins.rangeJoin(signups, "lo", "hi", purchases, "ts", hourUs)
          .groupBy("signup_id")
          .agg(count(lit(1)).as("n_purchases"),
            round(max(col("value")), 4).as("max_value"))
          .orderBy("signup_id")
      },
      Some("""SELECT s.event_id AS signup_id, count(*) AS n_purchases,
                round(max(p.value), 4) AS max_value
              FROM (SELECT * FROM events WHERE event_type = 'signup') s
              JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
                ON p.ts >= s.ts AND p.ts < s.ts + INTERVAL 1 HOUR
              GROUP BY s.event_id ORDER BY signup_id""")),

    // FUZZY: all part-name pairs within edit distance 1 via deletion-
    // neighborhood (FastSS) blocking — equi-join on the variant key,
    // exact recall, levenshtein verify on candidates only. The oracle is
    // the brute-force all-pairs distance join.
    Q("q_join_fuzzy",
      (s, dir) => Fuzzy.fuzzyJoin1(Tables(s, dir, "part"), "p_partkey", "p_name")
        .select("aid", "bid", "dist")
        .orderBy("aid", "bid"),
      Some("""SELECT a.p_partkey AS aid, b.p_partkey AS bid,
                levenshtein(a.p_name, b.p_name) AS dist
              FROM part a JOIN part b ON a.p_partkey < b.p_partkey
              WHERE levenshtein(a.p_name, b.p_name) <= 1
              ORDER BY aid, bid""")),

    // FUZZY at k=2: depth-2 deletion neighborhoods with length banding —
    // the entity-resolution workhorse setting. Same exact contract as
    // q_join_fuzzy (recall 1.0 by the deletion argument, precision 1.0 by
    // the candidates-only levenshtein verify) against the brute-force
    // all-pairs oracle.
    Q("q_join_fuzzy2",
      (s, dir) => Fuzzy.fuzzyJoinK(Tables(s, dir, "part"), "p_partkey", "p_name", 2)
        .select("aid", "bid", "dist")
        .orderBy("aid", "bid"),
      Some("""SELECT a.p_partkey AS aid, b.p_partkey AS bid,
                levenshtein(a.p_name, b.p_name) AS dist
              FROM part a JOIN part b ON a.p_partkey < b.p_partkey
              WHERE levenshtein(a.p_name, b.p_name) <= 2
              ORDER BY aid, bid""")),

    // FUNNEL: ordered event-sequence matching (first view → first
    // subsequent click → first subsequent purchase, per user). Each stage
    // is an equi-join on user_id with the time ordering as a RESIDUAL
    // filter (the planner keys on user_id; no inequality ever becomes a
    // BNLJ), and every aggregation shares the user_id shuffle key, so AQE
    // reuses one exchange layout through the chain. Counts only in the
    // output — both engines agree on counts, while raw nanos vs timestamp
    // rendering would not hash-match.
    Q("q_funnel",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t_view"))
        val c = ev.filter(col("event_type") === "click").join(v, "user_id")
          .filter(col("ts") > col("t_view"))
          .groupBy("user_id").agg(min(col("ts")).as("t_click"))
        val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
          .filter(col("ts") > col("t_click"))
          .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
          .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t FROM events
                         WHERE event_type = 'view' GROUP BY user_id),
              c AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                    JOIN v ON e.user_id = v.user_id AND e.ts > v.t
                    WHERE e.event_type = 'click' GROUP BY e.user_id),
              p AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                    JOIN c ON e.user_id = c.user_id AND e.ts > c.t
                    WHERE e.event_type = 'purchase' GROUP BY e.user_id)
              SELECT (SELECT count(*) FROM v) AS n_view,
                     (SELECT count(*) FROM c) AS n_view_click,
                     (SELECT count(*) FROM p) AS n_view_click_purchase""")),

    // Event-time TUMBLING windows in BATCH (the same `window()` function
    // the streaming path uses — §2.10's windowing semantics minus the
    // incremental state): hourly per-type counts + value sums. One
    // aggregation, window start rendered as text so both engines hash the
    // same bytes.
    Q("q_window_tumbling_batch",
      (s, dir) => {
        val ev = EventTime.toTimestamp(Tables(s, dir, "events"))
        ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            col("event_type"), col("n"), col("sv"))
          .orderBy("ws", "event_type")
      },
      Some("""SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts),
                       '%Y-%m-%d %H:%M:%S') AS ws,
                event_type, count(*) AS n, round(sum(value), 2) AS sv
              FROM events GROUP BY 1, 2 ORDER BY ws, event_type""")),

    // SLIDING event-time windows (`window(ts, size, slide)` with
    // overlap): every event lands in size/slide windows — Spark expands
    // via the same Expand operator grouping sets ride. 2-hour windows
    // sliding hourly ⇒ each event contributes to exactly two buckets;
    // the oracle unnests the two window starts per event.
    Q("q_window_sliding_batch",
      (s, dir) => {
        val ev = EventTime.toTimestamp(Tables(s, dir, "events"))
        ev.groupBy(window(col("ts"), "2 hours", "1 hour"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            col("n"), col("sv"))
          .orderBy("ws")
      },
      Some("""WITH x AS (SELECT value,
                unnest([time_bucket(INTERVAL 1 HOUR, ts),
                        time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR]) AS w
              FROM events)
              SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS ws,
                count(*) AS n, round(sum(value), 2) AS sv
              FROM x GROUP BY 1 ORDER BY ws""")),

    // SESSION windows in BATCH (`session_window(ts, gap)`): a session
    // extends while consecutive events per user arrive within the gap.
    // The oracle replays the identical semantics with a lag() break
    // flag + running session id — per-user session counts must agree
    // exactly.
    // DYNAMIC-GAP session windows (SPARK-36465): the gap is an expression
    // over the row — purchases keep a session alive 30 min, everything
    // else 5 — so sessions are the UNION of per-event intervals
    // [ts, ts+gap(event)), not a fixed-lag chain. The oracle replays
    // interval-union semantics with a running MAX of interval ends (the
    // lag-based fixed-gap formulation is wrong here: a long-gap event can
    // bridge over a short-gap successor).
    Q("q_session_dynamic",
      (s, dir) => {
        val ev = EventTime.toTimestamp(Tables(s, dir, "events"))
        ev.groupBy(session_window(col("ts"),
            when(col("event_type") === "purchase", "30 minutes")
              .otherwise("5 minutes")),
          col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_events")).as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (SELECT user_id, event_id, ts,
                epoch(ts) + CASE WHEN event_type = 'purchase'
                                 THEN 1800 ELSE 300 END AS fin
              FROM events),
              d AS (SELECT user_id, ts,
                CASE WHEN max(fin) OVER w IS NULL
                       OR epoch(ts) >= max(fin) OVER w
                     THEN 1 ELSE 0 END AS brk
              FROM g
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
              s AS (SELECT user_id,
                      sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
                    FROM d)
              SELECT user_id, count(DISTINCT sid) AS n_sessions,
                count(*) AS n_events
              FROM s GROUP BY user_id ORDER BY user_id""")),

    // TIME-SERIES GAP FILL + forward fill (resample().ffill() / InfluxDB
    // FILL(previous)): hourly per-user value sums on a REGULAR grid from
    // each user's first to last hour, empty hours carrying the last seen
    // value with a `filled` audit flag. Keyed window + keyed equi-join —
    // no global sort; the grid is span-bounded, independent of event
    // volume. Oracle replays generate_series + IGNORE NULLS last_value.
    Q("q_temporal_gapfill",
      (s, dir) => {
        val ev = EventTime.toTimestamp(Tables(s, dir, "events"))
          .filter(col("user_id") < 10)
        graft.ops.GapFill.fillForward(ev, "user_id", "ts",
            round(sum(col("value")), 2), unit = "hour")
          .select(col("user_id"),
            date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            col("value"), col("filled"))
          .orderBy("user_id", "ws")
      },
      Some("""WITH e AS (SELECT user_id, date_trunc('hour', ts) AS b,
                  round(sum(value), 2) AS v
                FROM events WHERE user_id < 10 GROUP BY 1, 2),
              s AS (SELECT user_id, min(b) AS lo, max(b) AS hi
                    FROM e GROUP BY 1),
              grid AS (SELECT user_id,
                         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
                       FROM s),
              j AS (SELECT g.user_id, g.b, e.v FROM grid g
                    LEFT JOIN e ON g.user_id = e.user_id AND g.b = e.b)
              SELECT user_id, strftime(b, '%Y-%m-%d %H:%M:%S') AS ws,
                last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
                  ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS value,
                v IS NULL AS filled
              FROM j ORDER BY user_id, ws""")),

    // LINEAR-INTERPOLATION gap fill (pandas interpolate() / InfluxDB
    // FILL(linear) — the numeric dual of q_temporal_gapfill's LOCF): a
    // gap bucket takes the line between its anchors; interior gaps only
    // (the grid spans first-to-last observation), fraction arithmetic on
    // exact epoch-second longs, value rounded for replay. Same keyed
    // shape as LOCF plus one backward window — still no global sort.
    Q("q_temporal_interpolate",
      (s, dir) => {
        val ev = EventTime.toTimestamp(Tables(s, dir, "events"))
          .filter(col("user_id") < 10)
        graft.ops.GapFill.fillLinear(ev, "user_id", "ts",
            round(sum(col("value")), 2), unit = "hour")
          .select(col("user_id"),
            date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            col("value"), col("filled"))
          .orderBy("user_id", "ws")
      },
      Some("""WITH e AS (SELECT user_id, date_trunc('hour', ts) AS b,
                  round(sum(value), 2) AS v
                FROM events WHERE user_id < 10 GROUP BY 1, 2),
              s AS (SELECT user_id, min(b) AS lo, max(b) AS hi
                    FROM e GROUP BY 1),
              grid AS (SELECT user_id,
                         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
                       FROM s),
              j AS (SELECT g.user_id, g.b, e.v,
                      epoch_us(g.b) // 1000000 AS ts_s
                    FROM grid g
                    LEFT JOIN e ON g.user_id = e.user_id AND g.b = e.b),
              a AS (SELECT *,
                  last_value(v IGNORE NULLS) OVER wf AS pv,
                  last_value(CASE WHEN v IS NOT NULL THEN ts_s END
                             IGNORE NULLS) OVER wf AS pt,
                  first_value(v IGNORE NULLS) OVER wb AS nv,
                  first_value(CASE WHEN v IS NOT NULL THEN ts_s END
                              IGNORE NULLS) OVER wb AS nt
                FROM j
                WINDOW wf AS (PARTITION BY user_id ORDER BY b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                wb AS (PARTITION BY user_id ORDER BY b
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
              SELECT user_id, strftime(b, '%Y-%m-%d %H:%M:%S') AS ws,
                -- floor-form rounding: same IEEE ops as the engine, so a
                -- boundary value (half-gap => true digit 5) can't flip
                floor((CASE WHEN v IS NOT NULL THEN v
                  ELSE pv + (nv - pv) *
                    ((ts_s - pt)::DOUBLE / (nt - pt)::DOUBLE) END)
                  * 10000.0 + 0.5) / 10000.0 AS value,
                v IS NULL AS filled
              FROM a ORDER BY user_id, ws""")),

    Q("q_session_batch",
      (s, dir) => {
        val ev = EventTime.toTimestamp(Tables(s, dir, "events"))
        ev.groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_events")).as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH d AS (SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       -- Spark sessions are [start, last+gap): an event
                       -- exactly gap after the last does NOT merge
                       OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                     THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              s AS (SELECT user_id,
                      sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
                    FROM d)
              SELECT user_id, count(DISTINCT sid) AS n_sessions,
                count(*) AS n_events
              FROM s GROUP BY user_id ORDER BY user_id""")),

    // COHORT RETENTION matrix (the product-analytics staple beside
    // q_funnel): users cohorted by first-event epoch-week; each
    // (cohort_week, offset) cell counts the distinct cohort members still
    // active offset weeks later. Two aggregations + one broadcast join of
    // the |users|-sized cohort frame — the events side is never
    // re-shuffled per offset. Epoch-week arithmetic is exact integer
    // division on epoch micros in both engines.
    Q("q_temporal_cohort",
      (s, dir) => {
        val weekUs = 7L * 86400 * 1000000
        val ev = EventTime.toMicros(Tables(s, dir, "events"))
          .select(col("user_id"), expr(s"ts DIV $weekUs").as("week"))
        val cohort = ev.groupBy("user_id")
          .agg(min(col("week")).as("cohort_week"))
        ev.join(broadcast(cohort), "user_id")
          .groupBy(col("cohort_week"),
            (col("week") - col("cohort_week")).as("offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_week", "offset")
      },
      Some("""WITH e AS (SELECT user_id,
                  epoch_us(ts) // 604800000000 AS week FROM events),
              c AS (SELECT user_id, min(week) AS cohort_week
                    FROM e GROUP BY user_id)
              SELECT c.cohort_week, e.week - c.cohort_week AS offset,
                count(DISTINCT e.user_id) AS n_users
              FROM e JOIN c USING (user_id)
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // MARKETING ATTRIBUTION (first-touch vs last-touch — the canonical
    // events-analytics credit assignment): each 'purchase' credits the
    // user's FIRST preceding non-purchase event (first-touch model) and
    // the NEAREST preceding one (last-touch). One user-partitioned window
    // pass with ignore-nulls first/last over the strict-past frame — no
    // self-join, linear in events, skew bounded by per-user activity.
    // (ts, event_id) is the total per-user order both engines replay.
    Q("q_temporal_attribution",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val touch = when(col("event_type") =!= "purchase", col("event_type"))
        val conv = Tables(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
          .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase" &&
            col("last_touch").isNotNull)
        val f = conv.groupBy(col("first_touch").as("event_type"))
          .agg(count(lit(1)).as("first_touch_n"))
        val l = conv.groupBy(col("last_touch").as("event_type"))
          .agg(count(lit(1)).as("last_touch_n"))
        f.join(l, Seq("event_type"), "full_outer")
          .na.fill(0L, Seq("first_touch_n", "last_touch_n"))
          .orderBy("event_type")
      },
      Some("""WITH t AS (SELECT user_id, event_type,
                  first_value(CASE WHEN event_type <> 'purchase'
                                   THEN event_type END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS first_touch,
                  last_value(CASE WHEN event_type <> 'purchase'
                                  THEN event_type END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS last_touch
                FROM events),
              conv AS (SELECT first_touch, last_touch FROM t
                       WHERE event_type = 'purchase'
                         AND last_touch IS NOT NULL),
              f AS (SELECT first_touch AS event_type,
                      count(*) AS first_touch_n FROM conv GROUP BY 1),
              l AS (SELECT last_touch AS event_type,
                      count(*) AS last_touch_n FROM conv GROUP BY 1)
              SELECT coalesce(f.event_type, l.event_type) AS event_type,
                coalesce(first_touch_n, 0) AS first_touch_n,
                coalesce(last_touch_n, 0) AS last_touch_n
              FROM f FULL OUTER JOIN l ON f.event_type = l.event_type
              ORDER BY event_type""")),

    // ROLLING Z-SCORE ANOMALY DETECTION (the ops-monitoring staple over
    // an event stream): hourly counts per event type, each scored against
    // the mean/stddev of its 6 PRECEDING observed buckets (rows-frame, so
    // gaps don't stall the window); |z| ≥ 3 flags. One aggregation + one
    // partitioned window pass — linear, no self-join; partitions are
    // per-event-type time series so corpus growth adds rows, not width.
    // z and sd are sqrt-derived (irrational) → plain round; the anomaly
    // flag compares the ROUNDED z so both engines flip identically.
    Q("q_temporal_anomaly",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val hourUs = 3600L * 1000000
        val hourly = EventTime.toMicros(Tables(s, dir, "events"))
          .select(col("event_type"), expr(s"ts DIV $hourUs").as("hour"))
          .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(-6, -1)
        hourly
          .withColumn("mu", avg(col("n")).over(w))
          .withColumn("sd", stddev_samp(col("n")).over(w))
          .withColumn("n_prev", count(col("n")).over(w))
          .filter(col("n_prev") === 6 && col("sd") > 0)
          .withColumn("z",
            round((col("n") - col("mu")) / col("sd"), 4))
          .select(col("event_type"), col("hour"), col("n"),
            graft.core.Num.roundHalfUp(col("mu"), 4).as("mean_prev"),
            round(col("sd"), 4).as("sd_prev"), col("z"),
            (abs(col("z")) >= 3.0).as("is_anomaly"))
          .orderBy("event_type", "hour")
      },
      Some("""WITH hourly AS (SELECT event_type,
                  epoch_us(ts) // 3600000000 AS hour, count(*) AS n
                FROM events GROUP BY 1, 2),
              win AS (SELECT event_type, hour, n,
                  avg(n) OVER w AS mu,
                  stddev_samp(n) OVER w AS sd,
                  count(n) OVER w AS n_prev
                FROM hourly
                WINDOW w AS (PARTITION BY event_type ORDER BY hour
                             ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
              SELECT event_type, hour, n,
                floor(mu * 10000 + 0.5) / 10000 AS mean_prev,
                round(sd, 4) AS sd_prev,
                round((n - mu) / sd, 4) AS z,
                abs(round((n - mu) / sd, 4)) >= 3.0 AS is_anomaly
              FROM win WHERE n_prev = 6 AND sd > 0
              ORDER BY event_type, hour""")),

    // MARKOV TRANSITION MATRIX over per-user event sequences (the
    // behavioral-model fit a clickstream pipeline publishes): next-event
    // via lead() under the (ts, event_id) total per-user order, counts →
    // row-normalized probabilities. One window pass + one aggregation;
    // probabilities are integer ratios → floor-form rounding.
    Q("q_temporal_markov",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val tr = Tables(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("dst", lead(col("event_type"), 1).over(w))
          .filter(col("dst").isNotNull)
          .groupBy(col("event_type").as("src"), col("dst"))
          .agg(count(lit(1)).as("n"))
        val tot = tr.groupBy("src").agg(sum(col("n")).as("src_n"))
        tr.join(broadcast(tot), "src")
          .select(col("src"), col("dst"), col("n"),
            graft.core.Num.roundHalfUp(
              col("n").cast("double") / col("src_n").cast("double"), 4)
              .as("prob"))
          .orderBy("src", "dst")
      },
      Some("""WITH tr AS (SELECT event_type AS src,
                  lead(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS dst
                FROM events),
              cnt AS (SELECT src, dst, count(*) AS n FROM tr
                      WHERE dst IS NOT NULL GROUP BY 1, 2),
              tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS src_n
                      FROM cnt GROUP BY 1)
              SELECT c.src, c.dst, c.n,
                floor(c.n::DOUBLE / t.src_n::DOUBLE * 10000 + 0.5) / 10000
                  AS prob
              FROM cnt c JOIN tot t USING (src)
              ORDER BY c.src, c.dst""")),

    // EWMA SMOOTHING / FORECAST RESIDUAL (the monitoring baseline next to
    // q_temporal_anomaly's z-score): per event type, each hourly count
    // against the exponentially-weighted mean of its 12 preceding
    // observed buckets (weights 0.7^(k−1), normalized over available
    // lags — the bounded-window EWMA a relational engine can express
    // without a sequential recurrence). Plan: a rank-windowed series
    // self-joined on (type, rank distance ≤ 12) — per-row fan-out is a
    // constant 12, the join key is the series id, never all-pairs.
    Q("q_temporal_ewma",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val hourUs = 3600L * 1000000
        val hourly = EventTime.toMicros(Tables(s, dir, "events"))
          .select(col("event_type"), expr(s"ts DIV $hourUs").as("hour"))
          .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy("hour")))
        val t = hourly.as("t")
        val p = hourly.select(col("event_type"), col("n").as("pn"),
          col("rn").as("prn")).as("p")
        val w = pow(lit(0.7),
          (col("t.rn") - col("p.prn") - 1).cast("double"))
        t.join(p, col("t.event_type") === col("p.event_type") &&
            col("p.prn") >= col("t.rn") - 12 &&
            col("p.prn") <= col("t.rn") - 1)
          .groupBy(col("t.event_type").as("event_type"), col("t.hour").as("hour"),
            col("t.n").as("n"))
          .agg((sum(w * col("p.pn")) / sum(w)).as("e"))
          .select(col("event_type"), col("hour"), col("n"),
            round(col("e"), 4).as("ewma"),
            round(col("n") - col("e"), 4).as("deviation"))
          .orderBy("event_type", "hour")
      },
      Some("""WITH hourly AS (SELECT event_type,
                  epoch_us(ts) // 3600000000 AS hour, count(*) AS n
                FROM events GROUP BY 1, 2),
              rn AS (SELECT event_type, hour, n, row_number() OVER
                  (PARTITION BY event_type ORDER BY hour) AS rn
                FROM hourly),
              j AS (SELECT t.event_type, t.hour, t.n,
                  sum(pow(0.7, t.rn - p.rn - 1) * p.n)
                    / sum(pow(0.7, t.rn - p.rn - 1)) AS e
                FROM rn t JOIN rn p ON t.event_type = p.event_type
                  AND p.rn BETWEEN t.rn - 12 AND t.rn - 1
                GROUP BY 1, 2, 3)
              SELECT event_type, hour, n, round(e, 4) AS ewma,
                round(n - e, 4) AS deviation
              FROM j ORDER BY event_type, hour""")),

    // PERCENTILE BANDS (the P50/P95/P99 dashboard row every metrics
    // pipeline publishes): exact interpolated percentiles of the event
    // value per (type, day). Spark `percentile` ≡ DuckDB `quantile_cont`
    // (lower + frac·(upper−lower) at (n−1)·p — the q_pipeline_kfold /
    // winsorize parity); interpolants are rationals of 2-dp inputs →
    // floor-form rounding. State is one value→count map per group
    // (bounded domain); approx_percentile is the same-plan swap when it
    // is not.
    Q("q_temporal_percentiles",
      (s, dir) => {
        val dayUs = 86400L * 1000000
        EventTime.toMicros(Tables(s, dir, "events"))
          .select(col("event_type"), expr(s"ts DIV $dayUs").as("day"),
            col("value"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"),
            graft.core.Num.roundHalfUp(expr("percentile(value, 0.5)"), 4)
              .as("p50"),
            graft.core.Num.roundHalfUp(expr("percentile(value, 0.95)"), 4)
              .as("p95"),
            graft.core.Num.roundHalfUp(expr("percentile(value, 0.99)"), 4)
              .as("p99"))
          .orderBy("event_type", "day")
      },
      Some("""SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                count(*) AS n,
                floor(quantile_cont(value, 0.5) * 10000 + 0.5) / 10000
                  AS p50,
                floor(quantile_cont(value, 0.95) * 10000 + 0.5) / 10000
                  AS p95,
                floor(quantile_cont(value, 0.99) * 10000 + 0.5) / 10000
                  AS p99
              FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ROC AUC (Mann-Whitney form with tie-averaged ranks — the exact
    // metric, not a trapezoid approximation): does spend predict
    // conversion? AUC = (2·Σ avgrank⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻), computed
    // ENTIRELY in integer space: per distinct score the tie-averaged
    // rank doubles to (2·cum_before + n + 1), so Σ over positives is an
    // exact BIGINT and one final division floor-form-rounds. The only
    // window is a cumsum over the SCORE HISTOGRAM (bounded 2-dp domain)
    // — no per-row corpus rank, the q_pipeline_woe lesson applied from
    // the start.
    Q("q_eval_auc",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables(s, dir, "events").select(col("value"),
          (col("event_type") === "purchase").cast("long").as("pos"))
        val hist = ev.groupBy("value")
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
        val cum = hist.withColumn("cum_before",
          coalesce(sum(col("n")).over(Window.orderBy("value")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        cum.agg(
            sum(col("np") * (col("cum_before") * 2 + col("n") + 1)).as("s2"),
            sum(col("np")).as("npos"),
            sum(col("n") - col("np")).as("nneg"))
          .select(col("npos"), col("nneg"),
            graft.core.Num.roundHalfUp(
              (col("s2") - col("npos") * (col("npos") + 1)).cast("double") /
                (col("npos") * col("nneg") * 2).cast("double"), 6).as("auc"))
      },
      Some("""WITH ev AS (SELECT value,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
                FROM events),
              hist AS (SELECT value, count(*) AS n,
                         CAST(sum(pos) AS BIGINT) AS np
                       FROM ev GROUP BY 1),
              cum AS (SELECT n, np, coalesce(sum(n) OVER
                  (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS cum_before
                FROM hist)
              SELECT CAST(sum(np) AS BIGINT) AS npos,
                CAST(sum(n - np) AS BIGINT) AS nneg,
                floor((sum(np * (cum_before * 2 + n + 1))
                       - sum(np) * (sum(np) + 1))::DOUBLE
                      / (sum(np) * sum(n - np) * 2)::DOUBLE
                      * 1000000 + 0.5) / 1000000 AS auc
              FROM cum""")),

    // WEEK-OVER-WEEK GROWTH (the trend row on every analytics dashboard):
    // weekly counts per event type, each week against its predecessor
    // via lag() — growth is a ratio of exact integers → floor-form.
    // OBSERVED-week lag (a silent gap compares against the last seen
    // week, like the z-score row); one aggregation + one keyed window.
    Q("q_temporal_wow",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val weekUs = 7L * 86400 * 1000000
        EventTime.toMicros(Tables(s, dir, "events"))
          .select(col("event_type"), expr(s"ts DIV $weekUs").as("week"))
          .groupBy("event_type", "week").agg(count(lit(1)).as("n"))
          .withColumn("prev_n", lag(col("n"), 1).over(
            Window.partitionBy("event_type").orderBy("week")))
          .filter(col("prev_n").isNotNull)
          .select(col("event_type"), col("week"), col("n"), col("prev_n"),
            graft.core.Num.roundHalfUp(
              (col("n") - col("prev_n")).cast("double") /
                col("prev_n").cast("double"), 4).as("wow_growth"))
          .orderBy("event_type", "week")
      },
      Some("""WITH w AS (SELECT event_type,
                  epoch_us(ts) // 604800000000 AS week, count(*) AS n
                FROM events GROUP BY 1, 2),
              l AS (SELECT event_type, week, n, lag(n) OVER
                  (PARTITION BY event_type ORDER BY week) AS prev_n
                FROM w)
              SELECT event_type, week, n, prev_n,
                floor((n - prev_n)::DOUBLE / prev_n::DOUBLE * 10000 + 0.5)
                  / 10000 AS wow_growth
              FROM l WHERE prev_n IS NOT NULL
              ORDER BY event_type, week""")),

    // CEP PATTERN WITH NEGATION (the complex-event-processing shape
    // beyond q_funnel's ordered sequence: A followed by B within T with
    // NO C between — Flink CEP's notFollowedBy): purchases preceded by
    // the same user's click within 1 h with no error event in between.
    // ONE user-partitioned window pass carries the running last-click
    // and last-error timestamps over the strict past (ignore-nulls last
    // under the (ts, event_id) total order) — no self-join, linear in
    // events, the negation is just a timestamp comparison between the
    // two running columns.
    Q("q_temporal_cep",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ev = EventTime.toMicros(Tables(s, dir, "events"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts"))
        ev
          .withColumn("last_click", last(
            when(col("event_type") === "click", col("ts")),
            ignoreNulls = true).over(w))
          .withColumn("last_error", last(
            when(col("event_type") === "error", col("ts")),
            ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase" &&
            col("last_click").isNotNull &&
            col("ts") - col("last_click") <= 3600L * 1000000 &&
            (col("last_error").isNull ||
              col("last_error") < col("last_click")))
          .select(col("event_id"), col("user_id"),
            ((col("ts") - col("last_click")) / 1000000L).cast("long")
              .as("gap_sec"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type,
                  epoch_us(ts) AS ts FROM events),
              t AS (SELECT event_id, user_id, event_type, ts,
                  last_value(CASE WHEN event_type = 'click' THEN ts END
                             IGNORE NULLS) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS last_click,
                  last_value(CASE WHEN event_type = 'error' THEN ts END
                             IGNORE NULLS) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS last_error
                FROM ev)
              SELECT event_id, user_id,
                CAST((ts - last_click) // 1000000 AS BIGINT) AS gap_sec
              FROM t
              WHERE event_type = 'purchase' AND last_click IS NOT NULL
                AND ts - last_click <= 3600000000
                AND (last_error IS NULL OR last_error < last_click)
              ORDER BY event_id"""))
  )
}
