package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Stage-decomposed timing for q204's interval sweep: islands build,
  * range explode+sort, sweep emission, final pair fold — each timed on
  * a persisted predecessor so the number is THAT stage's cost, not its
  * lineage's. Diagnostic only (like TimeOne); not part of any query.
  *
  * Usage: runMain graft.SweepProfile [sfDir]
  */
object SweepProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("data/sf1")
    val spark = GraftSession.local(32)
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sweep-profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (rep <- 1 to 2) {
    println(s"[sweep-profile] ===== rep $rep =====")
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("t"), col("event_id"))
    val prevEnd = max("iv_end")
      .over(byTime.rowsBetween(Window.unboundedPreceding, -1))
    val ivPlan = Tables.normalizeEventTs(
        spark.read.parquet(s"$sfDir/events.parquet"))
      .select(col("user_id"), col("ts").as("t"), col("event_id"),
        (col("ts") + lit(1800000000000L)).as("iv_end"))
      .withColumn("ni",
        when(prevEnd.isNull || col("t") > prevEnd, 1L).otherwise(0L))
      .withColumn("island", sum("ni")
        .over(byTime.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "island")
      .agg(min("t").as("s"), max("iv_end").as("e"))
      .select(col("user_id").cast("long").as("u"),
        col("s").cast("long"), col("e").cast("long"))
    timed("1a islands build (no persist, count)")(ivPlan.count())
    val iv = ivPlan.persist(StorageLevel.MEMORY_AND_DISK)
    val nIslands = timed("1b islands build (persist+count)")(iv.count())
    println(s"[sweep-profile]   n_islands = $nIslands")

    val nRanges = 256
    val bounds = iv.agg(min("s").as("lo"), max("e").as("hi"))
      .select(col("lo"),
        greatest(lit(1L), expr(s"(hi - lo) div $nRanges + 1")).as("wr"))
    val exploded = iv.crossJoin(broadcast(bounds))
      .select(col("u"), col("s"), col("e"),
        explode(sequence(expr("(s - lo) div wr"),
          expr("(e - 1 - lo) div wr"))).as("rng"),
        (expr("(s - lo) div wr") === col("rng")).as("isNew"))
      .repartition(col("rng"))
      .sortWithinPartitions(col("rng"), col("s"), col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nExp = timed("2 explode+repartition+sort (persist+count)")(
      exploded.count())
    println(s"[sweep-profile]   n_exploded = $nExp (carries = ${nExp - nIslands})")

    val probeMod = 20L
    import spark.implicits.newProductEncoder
    def sweep() = exploded.mapPartitions { rows =>
      var curRng = Long.MinValue
      var active: java.util.TreeMap[java.lang.Long, Long] = null
      var probeActive: java.util.TreeMap[java.lang.Long, Long] = null
      var byEnd: java.util.PriorityQueue[(Long, Long)] = null
      def reset(): Unit = {
        active = new java.util.TreeMap[java.lang.Long, Long]()
        probeActive = new java.util.TreeMap[java.lang.Long, Long]()
        byEnd = new java.util.PriorityQueue[(Long, Long)](
          11, (a: (Long, Long), b: (Long, Long)) =>
            java.lang.Long.compare(a._1, b._1))
      }
      rows.flatMap { r =>
        val matches = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        val rng = r.getLong(3)
        if (rng != curRng) { curRng = rng; reset() }
        val u = r.getLong(0); val s = r.getLong(1); val e = r.getLong(2)
        while (!byEnd.isEmpty && byEnd.peek()._1 <= s) {
          val (de, du) = byEnd.poll()
          if (active.containsKey(du) && active.get(du) == de) {
            active.remove(du)
            probeActive.remove(du)
          }
        }
        if (r.getBoolean(4)) {
          if (u % probeMod == 0) {
            val it = active.tailMap(u, false).entrySet().iterator()
            while (it.hasNext) {
              val en = it.next()
              matches += ((u * 4294967296L + en.getKey.longValue(),
                math.min(e, en.getValue) - s))
            }
          }
          val it = probeActive.headMap(u, false).entrySet().iterator()
          while (it.hasNext) {
            val en = it.next()
            matches += ((en.getKey.longValue() * 4294967296L + u,
              math.min(e, en.getValue) - s))
          }
        }
        active.put(u, e)
        if (u % probeMod == 0) probeActive.put(u, e)
        byEnd.add((e, u))
        matches
      }
    }
    val nEmit = timed("3a sweep emissions (count only, no shuffle)")(
      sweep().count())
    println(s"[sweep-profile]   n_emissions = $nEmit")

    val nPairs = timed("3b sweep + repartition + LongMap fold")(
      sweep().toDF("p", "ov")
        .repartition(col("p"))
        .mapPartitions { it =>
          val acc = new scala.collection.mutable.LongMap[Array[Long]]()
          while (it.hasNext) {
            val r = it.next()
            val p = r.getLong(0); val ov = r.getLong(1)
            val c = acc.getOrNull(p)
            if (c == null) acc.update(p, Array(1L, ov))
            else { c(0) += 1; c(1) += ov }
          }
          acc.iterator.map { case (p, c) => (p, c(0), c(1)) }
        }.count())
    println(s"[sweep-profile]   n_pairs = $nPairs")
    iv.unpersist(true); exploded.unpersist(true)
    GraftSession.releaseQueryCaches(spark)
    }

    spark.stop()
  }
}
