package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 39: corpus keyword extraction + embedding drift.
  *
  *   - q263 TextRank keywords: graph centrality over the token
  *     adjacency graph (Mihalcea & Tarau 2004) — the unsupervised
  *     keyword extractor a corpus card/topic report runs, as two
  *     bounded relational rounds with q119's integer-rank discipline.
  *   - q264 embedding drift: per-label centroid direction agreement
  *     between the two vec_id-parity halves of the corpus — the
  *     "did my embedding distribution move" monitor between two
  *     snapshots, exact integer sums with one rounded-double cosine.
  */
object Wave39Ops {

  type Q = (SparkSession, String) => DataFrame

  private def words(c: Column): Column =
    filter(split(lower(c), " "), w => w =!= "")

  /** Tokens below this corpus frequency stay out of the graph
    * (TextRank's usual stopword/min-count gate — keeps |V| the
    * frequent vocabulary, bounded by content not corpus size). */
  private val MinCnt = 20

  val queries: Map[String, Q] = Map(
    // ---- q263: TextRank keyword extraction -----------------------------
    // Undirected co-occurrence graph: adjacent token pairs where both
    // endpoints clear the frequency gate, weight = adjacency count.
    // Rank runs q119's integer loop with WEIGHTED shares
    // ((r·w) div wdeg): two unrolled iterations (the oracle stays
    // expressible; TextRank converges fast and the top set stabilizes
    // by round 2). Everything shuffles on token keys; the per-round
    // rank frame is vocabulary-sized, broadcast onto the edge list.
    "q263_textrank_keywords" -> ((s, d) => {
      // Tokenized corpus feeds TWO consumers (bigram adjacency + vocab
      // counts) with no shared exchange to reuse — eager persist so
      // the scan+tokenize pass runs once, not once per consumer (guide
      // §1.2 step 1). Released at the harness boundary per the
      // GraftSession.releaseQueryCaches cache-lifetime contract.
      val toks = table(s, d, "documents")
        .withColumn("tokens", words(col("text")))
        .filter(size(col("tokens")) >= 2)
        .select(col("tokens"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      toks.count()
      val adj = toks.select(explode(expr(
          """transform(sequence(0, size(tokens) - 2),
             i -> struct(element_at(tokens, i + 1) AS a,
                         element_at(tokens, i + 2) AS b))""")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(col("a") =!= col("b"))
      val vocab = toks.select(explode(col("tokens")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .filter(col("c") >= MinCnt).select("w")
      val e0 = adj
        .join(vocab.select(col("w").as("a")), "a")
        .join(vocab.select(col("w").as("b")), "b")
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("wt"))
      val edges = e0.select(col("u").as("src"), col("v").as("dst"),
          col("wt"))
        .unionByName(e0.select(col("v").as("src"), col("u").as("dst"),
          col("wt")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val wdeg = edges.groupBy("src").agg(sum("wt").as("wdeg"))
      var rank = wdeg.select(col("src").as("id"), lit(1000000L).as("r"))
      (1 to 2).foreach { _ =>
        val div = rank.join(wdeg, rank("id") === wdeg("src"))
          .select(col("src"), col("r"), col("wdeg"))
        rank = edges.join(broadcast(div), "src")
          .select(col("dst"), expr("(r * wt) div wdeg").as("share"))
          .groupBy("dst").agg(sum("share").as("m"))
          .select(col("dst").as("id"),
            (lit(150000L) + expr("(m * 85) div 100")).as("r"))
      }
      rank.orderBy(col("r").desc, col("id").asc).limit(25)
        .select(col("id").as("keyword"), col("r").as("rank_score"))
    }),

    // ---- q264: embedding centroid drift between snapshot halves --------
    // q209's per-dimension integer-sum idiom, split by vec_id parity
    // instead of across labels: per (label, half, dim) milli-unit
    // sums, one dim-keyed self-join, and the centroid direction
    // agreement cos = dot/√(n0²·n1²) as the single rounded double
    // (identical IEEE ops both engines — the norms-product sqrt runs
    // in DOUBLE because its integer value can exceed 2^63). A healthy
    // pipeline shows cos ≈ 1 per label; a drop flags drift in that
    // label's embedding distribution.
    "q264_embedding_drift" -> ((s, d) => {
      val e = table(s, d, "embeddings")
        .select(col("label").cast("long").as("label"),
          (col("vec_id") % 2).cast("long").as("half"),
          posexplode(col("embedding")))
        .select(col("label"), col("half"), col("pos").as("i"),
          floor(col("col").cast("double") * 1000).cast("long").as("v"))
      val cent = e.groupBy("label", "half", "i")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      val h0 = cent.filter(col("half") === 0)
        .select(col("label"), col("i"), col("sv").as("s0"),
          col("n").as("n0"))
      val h1 = cent.filter(col("half") === 1)
        .select(col("label"), col("i"), col("sv").as("s1"),
          col("n").as("n1"))
      h0.join(h1, Seq("label", "i"))
        .groupBy("label")
        .agg(min("n0").as("n0"), min("n1").as("n1"),
          sum(expr("s0 * s1")).as("dot_milli2"),
          sum(expr("s0 * s0")).as("norm2_0"),
          sum(expr("s1 * s1")).as("norm2_1"))
        .select(col("label"), col("n0"), col("n1"), col("dot_milli2"),
          round(col("dot_milli2").cast("double") /
            sqrt(col("norm2_0").cast("double") *
              col("norm2_1").cast("double")), 6).as("cos_r"))
    }))

  val oracle: Map[String, String] = Map(
    "q263_textrank_keywords" ->
      s"""WITH toks AS (
           SELECT list_filter(string_split(lower(text), ' '),
             w -> w <> '') AS tokens
           FROM documents),
         adj AS (
           SELECT string_split(pr, chr(1))[1] AS a,
                  string_split(pr, chr(1))[2] AS b
           FROM (
             SELECT unnest(list_transform(range(0, len(tokens) - 1),
               i -> array_to_string(list_slice(tokens, i + 1, i + 2),
                 chr(1)))) AS pr
             FROM toks WHERE len(tokens) >= 2)
           WHERE string_split(pr, chr(1))[1] <> string_split(pr, chr(1))[2]),
         vocab AS (
           SELECT w FROM (
             SELECT unnest(tokens) AS w FROM toks)
           GROUP BY w HAVING count(*) >= $MinCnt),
         e0 AS (
           SELECT least(a, b) AS u, greatest(a, b) AS v,
             count(*) AS wt
           FROM adj
           WHERE a IN (SELECT w FROM vocab) AND b IN (SELECT w FROM vocab)
           GROUP BY 1, 2),
         edges AS (SELECT u AS src, v AS dst, wt FROM e0
                   UNION ALL SELECT v, u, wt FROM e0),
         wdeg AS (SELECT src, CAST(sum(wt) AS BIGINT) AS wdeg
                  FROM edges GROUP BY src),
         r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS r FROM wdeg),
         c1 AS (SELECT e.dst, (r.r * e.wt) // d.wdeg AS share
                FROM edges e JOIN r0 r ON r.id = e.src
                JOIN wdeg d ON d.src = e.src),
         r1 AS (SELECT dst AS id,
                  CAST(150000 + (sum(share) * 85) // 100 AS BIGINT) AS r
                FROM c1 GROUP BY dst),
         c2 AS (SELECT e.dst, (r.r * e.wt) // d.wdeg AS share
                FROM edges e JOIN r1 r ON r.id = e.src
                JOIN wdeg d ON d.src = e.src),
         r2 AS (SELECT dst AS id,
                  CAST(150000 + (sum(share) * 85) // 100 AS BIGINT) AS r
                FROM c2 GROUP BY dst)
         SELECT id AS keyword, r AS rank_score
         FROM r2 ORDER BY r DESC, id ASC LIMIT 25""",

    "q264_embedding_drift" ->
      """WITH e AS (
           SELECT label, half, i - 1 AS i,
                  CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000)
                    AS BIGINT) AS v
           FROM (SELECT label, vec_id % 2 AS half, embedding,
                        unnest(range(1, len(embedding) + 1)) AS i
                 FROM embeddings)),
         cent AS (
           SELECT label, half, i, CAST(sum(v) AS BIGINT) AS sv,
             count(*) AS n
           FROM e GROUP BY label, half, i),
         j AS (
           SELECT a.label AS label, min(a.n) AS n0, min(b.n) AS n1,
             CAST(sum(a.sv * b.sv) AS BIGINT) AS dot_milli2,
             CAST(sum(a.sv * a.sv) AS BIGINT) AS norm2_0,
             CAST(sum(b.sv * b.sv) AS BIGINT) AS norm2_1
           FROM cent a JOIN cent b
             ON a.label = b.label AND a.i = b.i
             AND a.half = 0 AND b.half = 1
           GROUP BY a.label)
         SELECT CAST(label AS BIGINT) AS label, n0, n1, dot_milli2,
           round(CAST(dot_milli2 AS DOUBLE) /
             sqrt(CAST(norm2_0 AS DOUBLE) * CAST(norm2_1 AS DOUBLE)), 6)
             AS cos_r
         FROM j""")
}
