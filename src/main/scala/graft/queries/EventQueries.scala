package graft.queries

import graft.{GateQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond the time-bucket aggregation of q33:
  * gap-based sessionization and funnel-ish sequence analysis — the
  * shapes a training-data pipeline runs over interaction logs.
  *
  * Scale notes: both queries window by user_id (high-cardinality
  * partition key → even shuffle), and all timestamp math happens on
  * exact integer microseconds (epoch micros on both engines truncate ns
  * identically, so the oracle hash-matches).
  */
object EventQueries {

  private def q(name: String, oracle: String)(
      f: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, (s, dir) => { Tables.register(s, dir); f(s, dir) }, Some(oracle))

  val all: Seq[GateQuery] = Seq(

    // gap-based sessionization: a new session starts after > 1h idle
    q("q36_sessionization",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |flags AS (
        |  SELECT user_id,
        |    CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
        |           OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY event_id)
        |              > 3600000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e)
        |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM flags GROUP BY user_id""".stripMargin) { (s, _) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val tus = unix_micros(col("ts"))
      s.table("events")
        .select(col("user_id"), col("event_id"), tus.as("tus"))
        .select(col("user_id"),
          when(lag("tus", 1).over(w).isNull ||
            col("tus") - lag("tus", 1).over(w) > 3600000000L, 1)
            .otherwise(0).as("new_sess"))
        .groupBy("user_id")
        .agg(sum("new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
    },

    // as-of (point-in-time) join: each purchase matched with the latest
    // preceding (or same-instant) view by the same user — composed as a
    // tagged union + one window pass (graft.ops.AsOfJoin), the
    // single-shuffle shape that replaces a per-key range join
    q("q38_asof_join",
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events),
        |u AS (
        |  SELECT user_id AS k, tus AS t, 0 AS kind, event_id AS ord,
        |         event_id AS v_id, NULL::BIGINT AS p_id
        |  FROM e WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, tus, 1, NULL, NULL, event_id
        |  FROM e WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT *, last_value(v_id IGNORE NULLS) OVER (
        |      PARTITION BY k ORDER BY t, kind, ord ASC NULLS LAST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched
        |  FROM u)
        |SELECT p_id AS purchase_id, k AS user_id, matched AS matched_view
        |FROM m WHERE kind = 1""".stripMargin) { (s, _) =>
      val e = s.table("events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
      val views = e.filter(col("event_type") === "view")
      val purchases = e.filter(col("event_type") === "purchase")
      graft.ops.AsOfJoin.asofJoin(
        purchases, views,
        keyCol = "user_id", leftTs = "tus", rightTs = "tus",
        rightOrder = "event_id", payload = Seq("event_id"))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("asof_event_id").as("matched_view"))
    },

    // sequence analysis: per user, how often does 'view' directly precede
    // 'purchase' (the conversion step of a funnel)
    q("q37_event_sequence",
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'view' AND next_type = 'purchase'
        |           THEN 1 ELSE 0 END) AS BIGINT) AS view_to_purchase,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views
        |FROM seq GROUP BY user_id
        |HAVING sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) > 0""".stripMargin) {
      (s, _) =>
        val w = Window.partitionBy("user_id").orderBy("event_id")
        s.table("events")
          .select(col("user_id"), col("event_type"),
            lead("event_type", 1).over(w).as("next_type"))
          .groupBy("user_id")
          .agg(
            sum(when(col("event_type") === "view" && col("next_type") === "purchase", 1)
              .otherwise(0)).as("view_to_purchase"),
            sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_views"))
          .filter(col("n_views") > 0)
    },

    // running DISTINCT count over a window — Spark has no DISTINCT
    // aggregates in window frames, so the engine composes it as
    // size(collect_set() OVER w): same semantics, one shuffle on the
    // high-cardinality user_id. Per-frame state is bounded by the
    // DISTINCT domain (event types), not the frame length, so memory
    // stays O(1) per user at any event volume. Ordering carries the
    // unique event_id tie-break for determinism.
    q("q53_window_distinct",
      """SELECT user_id, event_id,
        |  CAST(count(DISTINCT event_type) OVER (
        |       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_types_so_far
        |FROM events""".stripMargin) { (s, _) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("tus"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      s.table("events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
        .select(col("user_id"), col("event_id"),
          size(collect_set(col("event_type")).over(w)).cast("long").as("n_types_so_far"))
    }
  )
}
