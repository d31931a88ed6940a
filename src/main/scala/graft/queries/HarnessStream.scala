package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Harness keys for the streaming operators (SURVEY.md §2.9), run in
  * batch mode over `events` so the driver's DuckDB compare applies;
  * the streaming execution path of the same transforms is exercised by
  * MemoryStream tests (StreamingSpec).
  */
object HarnessStream {

  private def ev(s: SparkSession, dir: String): DataFrame =
    HarnessCore.events(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> ((s, dir) => {
      import s.implicits._
      Streams.tumblingCounts(ev(s, dir))
        .orderBy($"window_start", $"event_type")
    }),
    "stream_sliding" -> ((s, dir) => {
      import s.implicits._
      Streams.slidingCounts(ev(s, dir))
        .orderBy($"window_start", $"event_type")
    }),
    "stream_session" -> ((s, dir) => {
      import s.implicits._
      Streams.sessionAgg(ev(s, dir))
        .orderBy($"user_id", $"session_start")
    }),
    "stream_late_data" -> ((s, dir) => {
      import s.implicits._
      // The driver's events are generated arrival==event-time ordered,
      // so a straight event_id arrival order has zero late rows (a
      // vacuous check). Scramble arrival deterministically
      // (event_id % 97, event_id) to exercise the late-drop semantics.
      Streams.lateCounts(ev(s, dir),
        arrivalOrder = Seq($"event_id" % 97, $"event_id"))
        .orderBy($"event_type")
    }),
    "stream_late_data_keyed" -> ((s, dir) => {
      import s.implicits._
      // The scale form of stream_late_data: the running high-water mark
      // is tracked per event_type (keyed shuffle + per-partition sort),
      // not through one global ordered window.
      Streams.lateCountsPerKey(ev(s, dir), $"event_type",
        arrivalOrder = Seq($"event_id" % 97, $"event_id"))
        .orderBy($"event_type")
    }),
    "stream_join_attrib" -> ((s, dir) => {
      import s.implicits._
      // Watermarked stream-stream join, batch analog: views joined to
      // purchases of the same user within the 1-hour horizon before the
      // purchase. The streaming execution path (bounded join state via
      // watermark + time-range condition) runs in StreamingSpec.
      val e = ev(s, dir)
      Streams.attributionJoin(
        e.filter($"event_type" === "view"),
        e.filter($"event_type" === "purchase"))
        .select($"purchase_id", $"view_id", $"user_id")
        .orderBy($"purchase_id", $"view_id")
    }),
    "stream_join_attrib_outer" -> ((s, dir) => {
      import s.implicits._
      // Left-outer form: unattributed purchases survive with a null
      // view (coalesced to -1 so the row is null-free for the
      // engine-agnostic sorted compare). In streaming the null row
      // emits once the watermark closes the purchase's horizon.
      val e = ev(s, dir)
      Streams.attributionJoin(
        e.filter($"event_type" === "view"),
        e.filter($"event_type" === "purchase"),
        joinType = "left_outer")
        .select($"purchase_id", coalesce($"view_id", lit(-1L)).as("view_id"),
          $"user_id")
        .orderBy($"purchase_id", $"view_id")
    }),
    "stream_funnel" -> ((s, dir) => {
      import s.implicits._
      // First-touch conversion funnel over the event log: each step
      // counts users whose first qualifying event strictly follows
      // their first qualifying event of the previous step.
      Streams.funnelSteps(ev(s, dir), $"user_id", $"ts", $"event_type",
        Seq("signup", "view", "click", "purchase"))
        .orderBy($"step_idx")
    }),
    "stream_stateful_dedup" -> ((s, dir) => {
      import s.implicits._
      Streams.dedupFirst(ev(s, dir), Seq("user_id", "event_type"))
        .select($"user_id", $"event_type", $"ts".as("first_ts"))
        .orderBy($"user_id", $"event_type")
    }),
    "stream_custom_state" -> ((s, dir) => {
      import s.implicits._
      Streams.lastStatePerUser(ev(s, dir).as[Streams.Event])
        .toDF()
        .orderBy($"user_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        | event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // 1h window sliding by 30m: each event belongs to the windows
    // starting at floor30(ts) and floor30(ts)-30m. Naive-timestamp
    // arithmetic only (no to_timestamp: it returns TIMESTAMPTZ and
    // would couple the oracle to the session timezone).
    "stream_sliding" ->
      """SELECT TIMESTAMP '1970-01-01 00:00:00'
        |   + to_seconds(CAST(floor(epoch(ts) / 1800) * 1800 - o * 1800 AS BIGINT)) AS window_start,
        | event_type, count(*) AS n
        |FROM events, (SELECT unnest([0, 1]) AS o) AS off
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    //

    // Gaps-and-islands sessionization: a session breaks when the gap
    // to the previous event of the same user exceeds 30 minutes;
    // session_end is last-event + gap (Spark session_window semantics).
    "stream_session" ->
      """WITH marked AS (
        | SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_session
        | FROM events),
        |numbered AS (
        | SELECT user_id, ts,
        |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        | FROM marked)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
        | CAST(max(ts) AS TIMESTAMP) + INTERVAL 30 MINUTE AS session_end,
        | count(*) AS n_events
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "stream_late_data" ->
      """SELECT event_type, count(*) AS n_late FROM (
        | SELECT event_type, ts,
        |  max(ts) OVER (ORDER BY event_id % 97, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_seen
        | FROM events) AS x
        |WHERE ts < max_seen - INTERVAL 10 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_late_data_keyed" ->
      """SELECT event_type, count(*) AS n_late FROM (
        | SELECT event_type, ts,
        |  max(ts) OVER (PARTITION BY event_type ORDER BY event_id % 97, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_seen
        | FROM events) AS x
        |WHERE ts < max_seen - INTERVAL 10 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_join_attrib" ->
      """SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
        |FROM events p JOIN events v ON p.user_id = v.user_id
        |WHERE p.event_type = 'purchase' AND v.event_type = 'view'
        |  AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        |ORDER BY 1, 2""".stripMargin,
    "stream_join_attrib_outer" ->
      """SELECT p.event_id AS purchase_id,
        | coalesce(v.event_id, -1) AS view_id, p.user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        | AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        |ORDER BY 1, 2""".stripMargin,
    // Greedy min-chain funnel: step k's time per user is the earliest
    // qualifying event strictly after the user's step k-1 time.
    "stream_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id AS u, min(ts) AS t FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.u
        |  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.u
        |  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
        |s4 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS t FROM events e
        |  JOIN s3 ON e.user_id = s3.u
        |  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS step_idx, 'signup' AS step,
        |    (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
        |  UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)
        |) ORDER BY step_idx""".stripMargin,
    "stream_stateful_dedup" ->
      """SELECT user_id, event_type, CAST(min(ts) AS TIMESTAMP) AS first_ts
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_custom_state" ->
      """SELECT user_id, event_type AS last_event, n_events FROM (
        | SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_type DESC) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n_events
        | FROM events) AS x
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
  )
}
