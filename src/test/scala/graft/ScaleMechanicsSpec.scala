package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Machine-checked proofs of the two runtime mechanisms the 100 TB
  * deployment leans on hardest, neither of which the sf-scale bench
  * can exercise organically:
  *
  *  - **Dynamic partition pruning**: a partitioned fact scan must be
  *    pruned by the dim-side filter AT RUNTIME (the subquery-broadcast
  *    reuse), or a selective star join reads the whole fact table.
  *  - **AQE skew-join splitting**: a hot key in a sort-merge join must
  *    be split across reducers by the adaptive re-plan, or one task
  *    carries the whole key (the q156 salted join is the manual
  *    fallback for exactly the cases AQE cannot see).
  *
  * Both are asserted on the executed plan, so a config regression that
  * silently disables either fails the build instead of surfacing as a
  * mystery 10× on the cluster.
  */
class ScaleMechanicsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at runtime") {
    val dir = Files.createTempDirectory("graft_dpp").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/fact"
    import spark.implicits._
    // fact partitioned by `src` (the 100 TB layout: partition by
    // source/date); dim maps src -> tier, the query filters on tier
    spark.range(0, 20000)
      .select(col("id"), (col("id") % 8).cast("string").as("src"))
      .write.partitionBy("src").mode("overwrite").parquet(path)
    // the dim must be a real table: an in-memory LocalRelation folds
    // the tier filter away before the pruning rule can see it
    val dimPath = dir.getAbsolutePath + "/dim"
    Seq(("0", "gold"), ("1", "silver"), ("2", "gold"),
      ("3", "bronze"), ("4", "silver"), ("5", "bronze"),
      ("6", "web"), ("7", "web")).toDF("src", "tier")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    // keep the partition column a STRING on read: type inference would
    // make it INT and the resulting join-key cast defeats DPP — the
    // same trap a real deployment hits with numeric-looking partition
    // directory names
    withConf(
      "spark.sql.sources.partitionColumnTypeInference.enabled" -> "false") {
      val fact = spark.read.parquet(path)
      val q = fact.join(dim, "src").filter(col("tier") === "gold")
        .groupBy("src").agg(count(lit(1)).as("n"))
      val rows = q.collect()
      assert(rows.map(_.get(0).toString).sorted.toSeq == Seq("0", "2"))
      // the fact scan must carry a dynamic pruning expression — without
      // it all 8 partitions are read and the star join never scales
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"fact scan is not dynamically pruned:\n$plan")
    }
  }

  test("AQE splits a skewed sort-merge join instead of one giant task") {
    val s = spark
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // 95% of the left rows share one key: the classic hot partition
      val left = s.range(0, 200000)
        .select(when(col("id") < 190000, 0L).otherwise(col("id") % 97)
          .as("k"), col("id").as("lv"))
      val right = s.range(0, 2000)
        .select((col("id") % 97).as("k"), col("id").as("rv"))
      // global aggregate downstream: a groupBy(k) would REUSE the
      // join's k-partitioning, and AQE (correctly) refuses to split a
      // skewed join whose output partitioning a consumer depends on —
      // that reuse-vs-split tension is exactly why q156's manual salt
      // exists for the grouped case
      val q = left.join(right, "k")
        .agg(sum(col("lv") + col("rv")).as("s"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    }
  }
}
