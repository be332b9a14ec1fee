package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 41: cross-distribution quantile matching.
  *
  * q267 maps every per-type value onto the GLOBAL distribution's value
  * at the same quantile (rank transform → global inverse-CDF lookup) —
  * the distribution-alignment step used to make quality scores
  * comparable across heterogeneous sources before mixing. Exact
  * integer semantics: rank r of n_type maps to global position
  * j = (r−1)·n_glob div n_type + 1, and v(j) is the j-th smallest
  * global value.
  */
object Wave41Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Slab width for the inverse-CDF lookup join. */
  private val B = 512L

  val queries: Map[String, Q] = Map(
    // ---- q267: per-type → global quantile matching ---------------------
    // The global inverse CDF is the (cents → position interval)
    // histogram: row covers positions [cum−c+1, cum]. Position lookup
    // runs as a SLAB equi-join (q204's technique): each histogram row
    // replicates to the ⌈width/B⌉ slabs it overlaps (total expansion
    // ≤ H + n_glob/B rows), each target position joins its single
    // slab, and interval containment filters to the UNIQUE match —
    // positions partition into intervals, so no dedup is needed and
    // the join never goes quadratic. The per-type rank window matches
    // q134's per-group rank shape; at corpus scale it swaps for the
    // two-phase distributed rank (q93's machinery) without touching
    // the lookup. The cumulative window runs over the domain-bounded
    // histogram, never the corpus.
    "q267_quantile_match" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("event_type"), col("event_id"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      val nT = ev.groupBy("event_type").agg(count(lit(1)).as("n_type"))
      val nG = ev.agg(count(lit(1)).as("n_glob"))
      val wT = Window.partitionBy("event_type")
        .orderBy(col("cents"), col("event_id"))
      val ranked = ev.withColumn("r", row_number().over(wT))
        .join(broadcast(nT), "event_type")
        .crossJoin(broadcast(nG))
        .select(col("event_type"), col("cents").as("orig_cents"),
          expr("(CAST(r - 1 AS BIGINT) * n_glob) div n_type + 1").as("j"))
      val wCum = Window.orderBy("gcents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val hist = ev.groupBy(col("cents").as("gcents"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("lo", col("cum") - col("c") + 1)
      val slabs = hist.select(col("gcents"), col("lo"), col("cum"),
        explode(expr(s"sequence(lo div ${B}L, cum div ${B}L)")).as("slab"))
      ranked.withColumn("slab", expr(s"j div ${B}L"))
        .join(slabs, "slab")
        .filter(col("j") >= col("lo") && col("j") <= col("cum"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("orig_cents").as("sum_orig_cents"),
          sum("gcents").as("sum_matched_cents"),
          min("gcents").as("min_matched"),
          max("gcents").as("max_matched"))
    }))

  val oracle: Map[String, String] = Map(
    "q267_quantile_match" ->
      """WITH ev AS (
           SELECT event_type, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
         g AS (SELECT cents AS gcents,
                 row_number() OVER (ORDER BY cents) AS pos
               FROM ev),
         nt AS (SELECT event_type, count(*) AS n_type
                FROM ev GROUP BY 1),
         ng AS (SELECT count(*) AS n_glob FROM ev),
         r AS (SELECT event_type, cents,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY cents, event_id) AS r
               FROM ev),
         j AS (SELECT r.event_type, r.cents AS orig_cents,
                 ((r.r - 1) * ng.n_glob) // nt.n_type + 1 AS j
               FROM r JOIN nt USING (event_type) CROSS JOIN ng)
         SELECT j.event_type, count(*) AS n,
           CAST(sum(j.orig_cents) AS BIGINT) AS sum_orig_cents,
           CAST(sum(g.gcents) AS BIGINT) AS sum_matched_cents,
           CAST(min(g.gcents) AS BIGINT) AS min_matched,
           CAST(max(g.gcents) AS BIGINT) AS max_matched
         FROM j JOIN g ON g.pos = j.j
         GROUP BY j.event_type""")
}
