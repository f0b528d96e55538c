package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Indexing, Mining, Multimodal, Sessionize, Similarity, TextStats, Upsert}
import graft.queries.ExtQueries._
import graft.queries.Registry.{events, table}

/** Event-stream operators split out of [[ExtQueries]]: sessionization,
  * funnels, transitions, retention. */
object ExtEventsQueries {

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------- events
    "events_sessionize" -> Q(
      (s, dir) => Sessionize.sessionize(events(s, dir)),
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
             |flagged AS (
             |  SELECT user_id, event_id, us, value,
             |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
             |              > 1800000000 THEN 1 ELSE 0 END AS new_sess
             |  FROM e),
             |sess AS (
             |  SELECT user_id, us, value,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
             |  FROM flagged)
             |SELECT user_id, sess_idx, count(*) AS n_events,
             |  (max(us) - min(us)) / 1000000.0 AS duration_s,
             |  round(sum(value), 2) AS total_value
             |FROM sess GROUP BY user_id, sess_idx
             |ORDER BY user_id, sess_idx""".stripMargin),
      "gap-based sessionization (30-min gap) with per-session stats"),

    "events_tumbling" -> Q(
      (s, dir) => Sessionize.tumbling(events(s, dir)),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |  count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin),
      "tumbling 1-hour windowed aggregation"),

    // Batch twin of StreamingOps.enrichedSegmentCounts (stream-static
    // join): the SAME function body runs under both planners — here the
    // batch one, oracle-gated; StreamingSpec drives the multi-batch
    // streaming leg against this result.
    "events_enriched" -> Q(
      (s, dir) => graft.streaming.StreamingOps.enrichedSegmentCounts(
          events(s, dir), table(s, dir, "customer"))
        .orderBy("window_start", "c_mktsegment"),
      Some("""SELECT date_trunc('hour', e.ts) AS window_start, c.c_mktsegment,
             |  count(*) AS n, round(sum(e.value), 2) AS total_value
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      "stream-static enrichment twin: events ⋈ broadcast dimension, per-segment window rollup"),

    "events_sliding" -> Q(
      (s, dir) => Sessionize.sliding(events(s, dir)),
      Some("""SELECT make_timestamp(((epoch_us(ts) // 900000000) - k) * 900000000) AS window_start,
             |  event_type, count(*) AS n
             |FROM events CROSS JOIN (SELECT unnest(range(4)) AS k)
             |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin),
      "sliding 1-hour/15-min windowed aggregation (4 windows per event)"),

    // Sequence mining: per-user event-type transition counts (the Markov
    // edges of the user journey — funnel discovery's raw material). ONE
    // user_id shuffle for the ordered lead, one (from, to) aggregation
    // over a domain bounded by |event_types|² — at any corpus size the
    // output is tiny and the work is the keyed sort.
    "events_transitions" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        events(s, dir)
          .withColumn("to_type", lead("event_type", 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("from_type"), col("to_type"))
      },
      Some("""WITH seq AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS to_type
             |  FROM events)
             |SELECT from_type, to_type, count(*) AS n
             |FROM seq WHERE to_type IS NOT NULL
             |GROUP BY 1, 2 ORDER BY n DESC, from_type, to_type""".stripMargin),
      "user-journey transition mining: event-type bigram counts (Markov edges)"),

    // Trigram extension of the transition mining: top user journeys of
    // length 3. Same single user-keyed window pass as the bigram query —
    // lead() twice instead of once — so the plan cost is identical; only
    // the group-key arity grows.
    "events_paths" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        events(s, dir)
          .withColumn("t2", lead("event_type", 1).over(w))
          .withColumn("t3", lead("event_type", 2).over(w))
          .filter(col("t3").isNotNull)
          .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
            col("t3").as("step3"))
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("step1"), col("step2"), col("step3"))
          .limit(20)
      },
      Some("""WITH seq AS (
             |  SELECT event_type AS step1,
             |    lead(event_type, 1) OVER w AS step2,
             |    lead(event_type, 2) OVER w AS step3
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
             |SELECT step1, step2, step3, count(*) AS n
             |FROM seq WHERE step3 IS NOT NULL
             |GROUP BY 1, 2, 3 ORDER BY n DESC, step1, step2, step3
             |LIMIT 20""".stripMargin),
      "top length-3 user journeys: one window pass, double lead"),

    "events_props" -> Q(
      (s, dir) => Sessionize.propsStats(events(s, dir)),
      Some("""SELECT event_type, count(*) AS n, round(avg(k), 4) AS avg_k,
             |  min(k) AS min_k, max(k) AS max_k
             |FROM (SELECT event_type,
             |        TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      "semi-structured props field extraction + aggregation"),

    // Batch twin of the streaming ingest dedup: re-delivered events (input
    // unioned with itself) collapse back to one row per event_id.
    "events_dedup_batch" -> Q(
      (s, dir) => {
        val ev = events(s, dir).select("event_id", "event_type")
        ev.unionByName(ev)
          .dropDuplicates("event_id")
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n FROM (
             |  SELECT DISTINCT ON (event_id) event_id, event_type FROM (
             |    SELECT event_id, event_type FROM events
             |    UNION ALL SELECT event_id, event_type FROM events))
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      "batch exact dedup of re-delivered events (at-least-once ingest)")
  )
}
