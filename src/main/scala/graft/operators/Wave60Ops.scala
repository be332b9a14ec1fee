package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 60: the k-selection sweep — the decision step ABOVE
  * the IVF/k-means machinery (q85/q86 build and search a fixed k=10
  * index; this picks k).
  *
  * For k ∈ {2,4,6,8,10}: deterministic seed centroids (per-(label
  * mod k) cell means — the same seeded-init family the IVF build
  * uses), one assignment pass, and the total within-cluster squared
  * distance (inertia) in exact micro units. The knee is found with
  * the chord rule (Kneedle's discrete form): the k maximizing the
  * |cross product| distance from the line joining the curve's
  * endpoints — pure integer arithmetic, so both engines agree on the
  * chosen k exactly.
  */
object Wave60Ops {

  type Q = (SparkSession, String) => DataFrame

  private val Ks = Seq(2, 4, 6, 8, 10)

  private def dotD(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> x * y),
        CAST(0 AS DOUBLE), (acc, t) -> acc + t)""")

  val queries: Map[String, Q] = Map(
    // ---- q308: elbow sweep over k --------------------------------------
    // Each k costs one broadcast-centroid scoring pass over the
    // embeddings (the q282/q85 map-only shape: P·n scored rows never
    // shuffle; argmin is a combinable min-of-struct) plus a scalar
    // inertia sum — 5 linear passes total, no quadratic stage.
    // d² = round(v·v − 2v·c + c·c, 6) is the established
    // sequential-double recipe; the ·1e6 + 0.5 floor turns the
    // 6-dp-rounded value into an exact integer in both engines, so
    // inertia sums are order-independent i64 arithmetic.
    "q308_kselect_sweep" -> ((s, d) => {
      val e = table(s, d, "embeddings").select(col("vec_id"),
        col("label").cast("long").as("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // r11: the sweep is STACKED on k instead of 5 separate branches —
      // one exploded pass computes every k's centroid cells (each
      // (row, dim) lands in 5 (k, label % k, pos) groups; the per-group
      // value multiset, and so round(avg, 6), is identical to the
      // per-k formulation's) and ONE broadcast-scored pass over e does
      // all 5 assignments with (vec_id, k)-keyed argmin. Total scored
      // rows are unchanged (n·Σk either way); what drops is 10 passes
      // over the cached embeddings and ~15 exchanges down to 2 scans +
      // 4 exchanges — the same plan a production sweep over dozens of
      // candidate k's needs, where per-k branches would mean a
      // planning/scheduling blowup.
      val kArr = array(Ks.map(lit): _*)
      val cents = e
        .select(explode(kArr).as("k"), col("label"), col("v"))
        .select(col("k"), (col("label") % col("k")).as("cid"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("k", "cid", "pos").agg(round(avg("x"), 6).as("c"))
        .groupBy("k", "cid")
        .agg(expr(
          "transform(sort_array(collect_list(struct(pos, c))), p -> p.c)")
          .as("cvec"))
      val perK = e.crossJoin(broadcast(cents))
        .withColumn("d2", round(
          dotD("v", "v") - lit(2) * dotD("v", "cvec")
            + dotD("cvec", "cvec"), 6))
        .groupBy("vec_id", "k")
        .agg(min(struct(col("d2"), col("cid"))).as("m"))
        .select(col("k"),
          expr("CAST(floor(m.d2 * 1000000 + 0.5) AS BIGINT)").as("dm"))
        .groupBy("k").agg(sum("dm").as("inertia_micro"))
        .select(col("k").cast("long").as("k"), col("inertia_micro"))
      // Chord rule on the 5-point curve: score(k) ∝ |ΔI_total·(k−k0)
      // − Δk_total·(I−I0)| — integers end to end; ties pick smaller k.
      val ends = perK.agg(
        min(struct(col("k"), col("inertia_micro"))).as("lo"),
        max(struct(col("k"), col("inertia_micro"))).as("hi"))
        .select(col("lo.k").as("k0"),
          col("lo.inertia_micro").as("i0"),
          col("hi.k").as("k1"), col("hi.inertia_micro").as("i1"))
      val scored = perK.crossJoin(broadcast(ends))
        .withColumn("knee_score", abs(
          (col("i1") - col("i0")) * (col("k") - col("k0")) -
            (col("k1") - col("k0")) * (col("inertia_micro") - col("i0"))))
      val best = scored
        .agg(max(struct(col("knee_score").as("ks"),
          (-col("k")).as("nk"))).as("b"))
        .select((-col("b.nk")).as("bk"))
      scored.crossJoin(broadcast(best))
        .select(col("k"), col("inertia_micro"), col("knee_score"),
          (col("k") === col("bk")).as("is_knee"))
    }))

  private def kBranch(k: Int): String =
    s"""SELECT CAST($k AS BIGINT) AS k,
          sum(CAST(floor(dm * 1000000 + 0.5) AS BIGINT)) AS inertia_micro
        FROM (
          SELECT e.vec_id, min(round(
              list_dot_product(e.v, e.v)
              - 2 * list_dot_product(e.v, c.cvec)
              + list_dot_product(c.cvec, c.cvec), 6)) AS dm
          FROM ev e CROSS JOIN (
            SELECT cid, list(c ORDER BY pos) AS cvec FROM (
              SELECT CAST(label AS BIGINT) % $k AS cid, i AS pos,
                     round(avg(x), 6) AS c
              FROM (SELECT label,
                      unnest(range(1, len(embedding) + 1)) AS i,
                      unnest(CAST(embedding AS DOUBLE[])) AS x
                    FROM embeddings)
              GROUP BY 1, 2)
            GROUP BY cid) c
          GROUP BY e.vec_id)"""

  val oracle: Map[String, String] = Map(
    "q308_kselect_sweep" ->
      (s"""WITH ev AS (
            SELECT vec_id, CAST(label AS BIGINT) AS label,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
          curve AS (
            ${Ks.map(kBranch).mkString("\n UNION ALL \n")}),
          ends AS (
            SELECT min(k) AS k0, max(k) AS k1,
              (SELECT inertia_micro FROM curve
               WHERE k = (SELECT min(k) FROM curve)) AS i0,
              (SELECT inertia_micro FROM curve
               WHERE k = (SELECT max(k) FROM curve)) AS i1
            FROM curve),
          scored AS (
            SELECT c.k, c.inertia_micro,
              abs((e.i1 - e.i0) * (c.k - e.k0)
                  - (e.k1 - e.k0) * (c.inertia_micro - e.i0))
                AS knee_score
            FROM curve c, ends e),
          best AS (
            SELECT k AS bk FROM scored
            ORDER BY knee_score DESC, k ASC LIMIT 1)
          SELECT s.k, CAST(s.inertia_micro AS BIGINT) AS inertia_micro,
            CAST(s.knee_score AS BIGINT) AS knee_score,
            s.k = b.bk AS is_knee
          FROM scored s, best b"""))

}
