package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 48: in-engine baseline-model evaluation.
  *
  * q280 trains a first-order Markov next-event model on the first
  * time-half of the corpus and scores its argmax predictions on the
  * second half — the train/test evaluation loop (temporal split, fit,
  * predict, accuracy) expressed entirely as relational operators,
  * integer-exact.
  */
object Wave48Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q280: Markov next-event accuracy under a temporal split --------
    // The split point is (min+max) div 2 of event time — deterministic
    // from two scalar aggregates, broadcast once. Transitions come
    // from ONE user-keyed lead window over the whole timeline; a
    // transition belongs to train/test by the time of its FIRST
    // event, so the sets partition exactly. The model is the per-prior
    // argmax over the tiny (type × type) train matrix (ties broken
    // (count desc, type asc) — engine-deterministic); scoring is a
    // broadcast join of that ≤|types| model onto the test transitions
    // and one rollup. Output per prior type: test size, hits, and
    // accuracy ppm — plus the model's predicted type for the audit.
    "q280_markov_eval" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      val bounds = ev.agg(min("ts").as("tmin"), max("ts").as("tmax"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trans = ev
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .crossJoin(broadcast(bounds))
        .withColumn("is_train",
          col("ts") < expr("tmin + (tmax - tmin) div 2"))
        .select(col("event_type").as("from_type"), col("to_type"),
          col("is_train"))
      val train = trans.filter(col("is_train"))
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      val model = train
        .withColumn("rn", row_number().over(Window
          .partitionBy("from_type")
          .orderBy(col("n").desc, col("to_type"))))
        .filter(col("rn") === 1)
        .select(col("from_type"), col("to_type").as("predicted"))
      trans.filter(!col("is_train"))
        .join(broadcast(model), "from_type")
        .groupBy("from_type", "predicted")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("to_type") === col("predicted"), 1L).otherwise(0L))
            .as("n_hit"))
        .withColumn("acc_ppm", expr("n_hit * 1000000 div n_test"))
    }))

  val oracle: Map[String, String] = Map(
    "q280_markov_eval" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) AS t, event_id, event_type
           FROM events),
         b AS (SELECT min(t) AS tmin, max(t) AS tmax FROM ev),
         trans AS (
           SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY t, event_id) AS to_type,
             t < tmin + (tmax - tmin) // 2 AS is_train
           FROM ev CROSS JOIN b),
         tr AS (SELECT * FROM trans WHERE to_type IS NOT NULL),
         train AS (
           SELECT from_type, to_type, count(*) AS n
           FROM tr WHERE is_train GROUP BY 1, 2),
         model AS (
           SELECT from_type, to_type AS predicted FROM (
             SELECT *, row_number() OVER (PARTITION BY from_type
               ORDER BY n DESC, to_type) AS rn
             FROM train) WHERE rn = 1)
         SELECT t.from_type, m.predicted, count(*) AS n_test,
           CAST(sum(CASE WHEN t.to_type = m.predicted THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN t.to_type = m.predicted THEN 1 ELSE 0 END)
             * 1000000 // count(*) AS BIGINT) AS acc_ppm
         FROM tr t JOIN model m USING (from_type)
         WHERE NOT t.is_train
         GROUP BY 1, 2""")
}
