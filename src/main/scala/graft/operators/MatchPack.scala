package graft.operators

import graft.{QueryPack, Tables => T}
import graft.streaming.{Cep, MatchRecognize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch MATCH_RECOGNIZE with a DuckDB oracle (SURVEY §2.12; reference
  * EN/stream/StreamExecMatch.java:59 + flink-cep nfa/NFA.java — the
  * CEP engine behind the SQL clause). CepSpec ports the NFAITCase
  * semantics; this pack adds the missing ORACLE row: DuckDB has no
  * MATCH_RECOGNIZE, so the oracle is hand-derived with window
  * functions — sound here because the chosen pattern's predicates are
  * MUTUALLY EXCLUSIVE, which makes matches provably non-overlapping:
  *
  *   PARTITION BY user_id ORDER BY ts
  *   PATTERN (down{2} up)        -- strict contiguity, SQL default
  *   DEFINE down AS cents < 2000, up AS cents >= 6000
  *   AFTER MATCH SKIP PAST LAST EVENT
  *
  * Proof the lag-formula oracle is exact: a match is three CONSECUTIVE
  * per-user events (d, d, u). Two matches at positions i < i' overlap
  * only if i' - i < 3; i' = i+1 needs the up event at i to also be a
  * down, i' = i+2 needs the same of i's last down — both impossible
  * with exclusive predicates (< 2000 vs >= 6000). So every position
  * triple satisfying (down, down, up) is a match and vice versa, which
  * is precisely the triple-lag WHERE clause. The mid-band events
  * (2000..5999 cents) still break contiguity on both sides, so the
  * strictness itself is exercised, not vacuous.
  */
object MatchPack extends QueryPack {

  case class Ev(event_id: Long, user_id: Long, ts_us: Long, cents: Long)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_match_recognize" -> ((s, d) => {
      import s.implicits._
      val evs = T.events(s, d).select(
        $"event_id", $"user_id",
        // (user_id, ts) is unique in the driver data; event_id is the
        // formal tiebreak anyway. UTC session: the ntz->micros map is
        // deterministic
        unix_micros($"ts".cast("timestamp")).as("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents")).as[Ev]
      val pat = MatchRecognize.compile[Ev]("down{2} up", Map(
        "down" -> ((e: Ev) => e.cents < 2000L),
        "up" -> ((e: Ev) => e.cents >= 6000L)))
      Cep.runBatch(evs, pat)(_.user_id, _.ts_us, _.event_id)
        .map { m =>
          val dn = m.steps("down"); val up = m.steps("up").head
          (m.key, dn(0).event_id, dn(1).event_id, up.event_id,
            dn(0).cents, dn(1).cents, up.cents)
        }
        .toDF("user_id", "d1_id", "d2_id", "up_id",
          "d1_cents", "d2_cents", "up_cents")
    }))

  def oracle: Map[String, String] = Map(
    "q_match_recognize" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         seq AS (
           SELECT user_id, event_id, cents,
                  lag(cents, 1) OVER w AS c1,
                  lag(cents, 2) OVER w AS c2,
                  lag(event_id, 1) OVER w AS id1,
                  lag(event_id, 2) OVER w AS id2
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts))
         SELECT user_id, id2 AS d1_id, id1 AS d2_id, event_id AS up_id,
                c2 AS d1_cents, c1 AS d2_cents, cents AS up_cents
         FROM seq
         WHERE cents >= 6000 AND c1 < 2000 AND c2 < 2000""")
}
