package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 26: graph-embedding training data.
  *
  *   - q240 deterministic random-walk corpus (DeepWalk/node2vec input):
  *     one length-3 walk per customer node over the bidirectional
  *     trade graph, next-hop chosen by a hash of (walk, step) modulo
  *     the node's degree — RNG-free, so the corpus is bit-identical
  *     under any partitioning and any engine.
  */
object Wave26Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q240: deterministic random-walk corpus ------------------------
    // The scalable walk engine shape: materialize the INDEXED adjacency
    // once (row_number within each node's neighbor list — a window
    // PARTITIONED on the node, cost bounded by the degree), then each
    // walk step is ONE equi-join on (current node, picked index).
    // No neighbor arrays are ever collected (a hub node's array would
    // blow a row), no RNG state exists (the pick is md5(walk·10+step)
    // mod degree), and walks shuffle by their current node each round —
    // exactly how a 1000-executor walk generator balances hubs. Three
    // steps = three bounded rounds; every node has degree ≥ 1 by
    // bidirectional construction, so walks never strand.
    "q240_random_walks" -> ((s, d) => {
      val eo = table(s, d, "lineitem")
        .join(table(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
      // Distinct BEFORE symmetrizing: customers are even ids and
      // suppliers odd, so (a,b) and (b,a) can never collide and the
      // exploded frame needs no second dedup — the distinct shuffle
      // runs on half the rows.
      val edges = eo.distinct()
        .select(explode(array(
          struct(col("a").as("src"), col("b").as("dst")),
          struct(col("b").as("src"), col("a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // deg feeds 4 consumers (w0 + 3 steps) and adjR feeds 3 — eager
      // persists so each is computed ONCE; without them every step's
      // plan re-derives the lineitem⋈orders+distinct+window chain
      // (exchange reuse does not span the persisted-walk boundary
      // downstream consumers like q241 introduce). Released at the
      // harness boundary — the GraftSession.releaseQueryCaches
      // cache-lifetime contract — since the caller's terminal action
      // runs after this builder returns.
      def materialized(df: DataFrame): DataFrame = {
        val p = df.persist(org.apache.spark.storage.StorageLevel
          .MEMORY_AND_DISK)
        p.count()
        p
      }
      val deg = materialized(
        edges.groupBy("src").agg(count(lit(1)).as("degree")))
      val adjR = materialized(edges.withColumn("a_idx",
        row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
        .select(col("src").as("a_src"), col("a_idx"),
          col("dst").as("nxt")))
      // The walk frame is NODE-sized (one walk per customer), so it is
      // never force-broadcast; the shuffle_hash hint makes it the
      // per-partition-bounded BUILD side against the edge-sized
      // adjacency — without it the first round planned a sort-merge
      // join that sorted the full adjacency (the q119 discipline:
      // forbid the driver-sized build, bound the executor-sized one).
      def step(w: DataFrame, t: Int): DataFrame =
        w.join(deg.withColumnRenamed("src", "d_src"),
            col("cur") === col("d_src"))
          .withColumn("pick", expr(
            s"CAST(conv(substring(md5(CAST(walk_id * 10 + $t" +
              s" AS STRING)), 1, 13), 16, 10) AS BIGINT) % degree"))
          .hint("shuffle_hash")
          .join(adjR, col("cur") === col("a_src") &&
            col("pick") === col("a_idx"))
          .drop("d_src", "degree", "pick", "a_src", "a_idx", "cur")
          .withColumnRenamed("nxt", "cur")
      val w0 = deg.filter(col("src") % 2 === 0)
        .select(col("src").as("walk_id"), col("src").as("cur"))
      val s1 = step(w0, 1).withColumnRenamed("cur", "n1")
        .withColumn("cur", col("n1"))
      val s2 = step(s1, 2).withColumnRenamed("cur", "n2")
        .withColumn("cur", col("n2"))
      val s3 = step(s2, 3).withColumnRenamed("cur", "n3")
      s3.select("walk_id", "n1", "n2", "n3")
    }))

  val oracle: Map[String, String] = Map(
    "q240_random_walks" ->
      """WITH eo AS (
           SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         edges AS (
           SELECT DISTINCT src, dst FROM (
             SELECT a AS src, b AS dst FROM eo
             UNION ALL SELECT b AS src, a AS dst FROM eo)),
         deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY 1),
         adj AS (
           SELECT src, dst, row_number() OVER (PARTITION BY src
             ORDER BY dst) - 1 AS idx
           FROM edges),
         w0 AS (
           SELECT src AS walk_id, src AS cur FROM deg WHERE src % 2 = 0),
         s1 AS (
           SELECT w.walk_id, a.dst AS cur FROM w0 w
           JOIN deg dg ON w.cur = dg.src
           JOIN adj a ON a.src = w.cur AND a.idx =
             CAST(('0x' || substr(md5(CAST(w.walk_id * 10 + 1
               AS VARCHAR)), 1, 13)) AS BIGINT) % dg.degree),
         s2 AS (
           SELECT w.walk_id, a.dst AS cur FROM s1 w
           JOIN deg dg ON w.cur = dg.src
           JOIN adj a ON a.src = w.cur AND a.idx =
             CAST(('0x' || substr(md5(CAST(w.walk_id * 10 + 2
               AS VARCHAR)), 1, 13)) AS BIGINT) % dg.degree),
         s3 AS (
           SELECT w.walk_id, a.dst AS cur FROM s2 w
           JOIN deg dg ON w.cur = dg.src
           JOIN adj a ON a.src = w.cur AND a.idx =
             CAST(('0x' || substr(md5(CAST(w.walk_id * 10 + 3
               AS VARCHAR)), 1, 13)) AS BIGINT) % dg.degree)
         SELECT s1.walk_id, CAST(s1.cur AS BIGINT) AS n1,
                CAST(s2.cur AS BIGINT) AS n2,
                CAST(s3.cur AS BIGINT) AS n3
         FROM s1 JOIN s2 USING (walk_id) JOIN s3 USING (walk_id)""")
}
