package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 28: association mining.
  *
  *   - q242 frequent co-purchase pairs (A-priori 2-itemsets): support
  *     and lift for part pairs co-occurring in orders — the
  *     market-basket shape, with the A-priori pruning step that makes
  *     it survive corpus scale.
  */
object Wave28Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q242: frequent co-purchase pairs + lift -----------------------
    // A-priori 2-itemsets, restructured so the scan is folded into ONE
    // basket shuffle: baskets come straight from groupBy(ord) with
    // array_distinct (no separate whole-corpus DISTINCT shuffle), item
    // frequencies come from exploding the persisted baskets (map-side
    // combinable — near-free), and the frequent-endpoint rule is
    // enforced by the final INNER joins to freq, which drop exactly the
    // pairs a basket-side pre-filter would have kept out (support >= 2
    // already implies n >= 2, so only the n == 2 endpoints differ and
    // the joins remove them) — measured 30.1 -> 6.7 s at sf1, the
    // removed DISTINCT + freq-join re-shuffles of the 60M-row fact
    // being the whole difference. Per-basket pair explosion stays
    // bounded by basket size choose 2 (the oracle runs the same
    // basket self-join relationally). Lift in integer ppm:
    // support·N·1e6 div (n_a·n_b).
    "q242_copurchase_pairs" -> ((s, d) => {
      val baskets0 = table(s, d, "lineitem")
        .select(col("l_orderkey").as("ord"), col("l_partkey").as("part"))
        .groupBy("ord")
        .agg(sort_array(array_distinct(collect_list(col("part"))))
          .as("items"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val freq = baskets0
        .select(explode(col("items")).as("part"))
        .groupBy("part").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
      val baskets = baskets0.filter(size(col("items")) >= 2)
      // Pairs travel as ONE packed long (a << 32 | b), not a 2-field
      // struct: at sf1 the pair stage shuffles ~90M rows that are
      // almost all support-1 (map-side combine can't reduce them), so
      // per-row width is the whole cost — the packed key roughly
      // halves shuffle bytes and hashes/compares as a primitive.
      // Sorted baskets keep a < b, so the packing is order-preserving;
      // PackedPairs guards the <2^31 key-space assumption per basket.
      val pairs = baskets
        .select(explode(PackedPairs.packedUpperPairs("items")).as("pk"))
        .groupBy("pk")
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select(expr("pk div 4294967296L").as("part_a"),
          expr("pk % 4294967296L").as("part_b"), col("support"))
      val tot = baskets0.agg(count(lit(1)).as("n_orders"))
      pairs
        .join(freq.select(col("part").as("part_a"), col("n").as("n_a")),
          "part_a")
        .join(freq.select(col("part").as("part_b"), col("n").as("n_b")),
          "part_b")
        .crossJoin(broadcast(tot))
        .select(col("part_a"), col("part_b"), col("support"),
          col("n_a"), col("n_b"),
          expr("support * n_orders * 1000000L div (n_a * n_b)")
            .as("lift_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q242_copurchase_pairs" ->
      """WITH op AS (
           SELECT DISTINCT l_orderkey AS ord, l_partkey AS part
           FROM lineitem),
         cnt AS (SELECT part, count(*) AS n FROM op GROUP BY 1),
         freq AS (SELECT part, n FROM cnt WHERE n >= 3),
         fo AS (SELECT ord, part FROM op JOIN freq USING (part)),
         pairs AS (
           SELECT a.part AS part_a, b.part AS part_b,
                  count(*) AS support
           FROM fo a JOIN fo b ON a.ord = b.ord AND a.part < b.part
           GROUP BY 1, 2 HAVING count(*) >= 2),
         tot AS (SELECT count(DISTINCT ord) AS n_orders FROM op)
         SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
                CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
                CAST(support * n_orders * 1000000
                     // (ca.n * cb.n) AS BIGINT) AS lift_ppm
         FROM pairs
         JOIN freq ca ON ca.part = part_a
         JOIN freq cb ON cb.part = part_b
         CROSS JOIN tot""")
}
