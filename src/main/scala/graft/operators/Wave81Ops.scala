package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 81: engagement + serving-layer text shapes — the
  * DAU/WAU stickiness series (sliding-window distinct users WITHOUT a
  * per-window distinct scan: each user-day expands to the ≤7 report
  * days it supports, then ONE distinct fold) and KWIC
  * (keyword-in-context) extraction around the corpus's top phrase.
  */
object Wave81Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q349: DAU / WAU / stickiness per day ---------------------------
    // The trailing-7-day distinct-user count per day is the classic
    // "can't window a DISTINCT" problem; the scalable form expands
    // each (user, active-day) to the 7 report days that activity
    // supports (bounded ×7 blowup), distinct-folds once, and counts —
    // total work O(7·|user-days|) regardless of window placement.
    // Stickiness = DAU·1e6 div WAU.
    "q349_dau_wau_stickiness" -> ((s, d) => {
      val ud = table(s, d, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .distinct()
      val maxD = ud.agg(max("day").as("max_day"))
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"), explode(expr(
          "sequence(day, day + 6)")).as("rd"))
        .distinct()
        .crossJoin(broadcast(maxD))
        .filter(col("rd") <= col("max_day"))
        .groupBy(col("rd").as("day"))
        .agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          expr("dau * 1000000 div wau").as("stickiness_ppm"))
    }),

    // ---- q350: KWIC contexts for the corpus's top phrase ----------------
    // The q327 postings pick the top trigram; every occurrence emits
    // its ±3-token context window (pure array slicing on the already-
    // tokenized row — no re-scan, no per-occurrence string search).
    // The "show me the hits" serving shape of a concordance/search UI.
    "q350_kwic_contexts" -> ((s, d) => {
      // Pass 1 (argmax phrase) explodes shingles over an eagerly
      // persisted tokenized corpus — and no longer drags each doc's
      // FULL token array through the explode (the old sh carried `t`
      // on every shingle row just so the join survivors could build
      // contexts). Pass 2 is MAP-ONLY: each doc's hit positions fall
      // out of one array filter over its cached tokens, replacing the
      // re-tokenize + re-explode + broadcast join (guide §2.3: don't
      // ship payloads through stages that only need keys). Rows
      // identical: filter preserves the ascending position order and
      // the context expression is unchanged.
      val toks = table(s, d, "documents")
        .withColumn("t", TextOps.words(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), col("t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      toks.count()
      val sh = toks.select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, size(t) - 3),
           i -> concat_ws(' ', slice(t, i + 1, 3)))"""))
        .as(Seq("pos", "shingle")))
      val top = sh.groupBy("shingle").agg(count(lit(1)).as("n_total"))
        .orderBy(col("n_total").desc, col("shingle")).limit(1)
        .select(col("shingle").as("phrase"))
      toks.crossJoin(broadcast(top))
        .select(col("doc_id"), col("t"), col("phrase"), explode(expr(
          """filter(sequence(0, size(t) - 3),
             i -> concat_ws(' ', slice(t, i + 1, 3)) = phrase)"""))
          .as("pos"))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("phrase"),
          expr("""array_join(slice(t, greatest(1, pos - 2),
              least(size(t) - 1, pos + 5) - greatest(0, pos - 3) + 1),
              ' ')""").as("context"))
    }))

  val oracle: Map[String, String] = Map(
    "q349_dau_wau_stickiness" ->
      """WITH ud AS (
           SELECT DISTINCT user_id,
             epoch_ns(ts) // 86400000000000 AS day
           FROM events),
         mx AS (SELECT max(day) AS max_day FROM ud),
         dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
         expanded AS (
           SELECT DISTINCT user_id, day + o AS rd
           FROM ud, (SELECT unnest(range(0, 7)) AS o)),
         wau AS (
           SELECT rd AS day, count(*) AS wau
           FROM expanded, mx WHERE rd <= max_day GROUP BY 1)
         SELECT dau.day, CAST(dau AS BIGINT) AS dau,
           CAST(wau AS BIGINT) AS wau,
           CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_ppm
         FROM dau JOIN wau ON dau.day = wau.day""",

    "q350_kwic_contexts" ->
      """WITH toks AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '')
               AS t
           FROM documents),
         sh AS (
           SELECT doc_id, t, i AS pos,
             t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS shingle
           FROM (SELECT doc_id, t, unnest(range(0, len(t) - 2)) AS i
                 FROM toks WHERE len(t) >= 3)),
         top AS (
           SELECT shingle AS phrase FROM sh GROUP BY 1
           ORDER BY count(*) DESC, shingle LIMIT 1)
         SELECT doc_id, CAST(pos AS BIGINT) AS pos, phrase,
           array_to_string(list_slice(t, greatest(1, pos - 2),
             greatest(1, pos - 2) + least(len(t) - 1, pos + 5)
               - greatest(0, pos - 3)), ' ') AS context
         FROM sh JOIN top ON sh.shingle = top.phrase""")
}
