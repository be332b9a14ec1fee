package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary-state streaming with the `transformWithState` API — the
  * successor to `flatMapGroupsWithState` (which `Sessionize` uses):
  * typed per-key state VARIABLES (ValueState / ListState / MapState)
  * living in the RocksDB state store instead of one opaque state blob.
  *
  * The operator keeps a per-user profile — event count, max value in
  * integer cents, distinct event types — as one ValueState counter pair
  * plus a MapState acting as a distinct-set. State size per user is
  * O(1) + O(#distinct types) and the store is RocksDB, so 100 M users ×
  * tiny records is exactly the deployment this API targets; a TTL on
  * TTLConfig would bound lifetime for abandoned keys (NONE here — the
  * batch oracle has no expiry semantics).
  *
  * Emission is one updated profile row per key per micro-batch; the
  * counters grow monotonically, so "final answer" = each user's row
  * with the largest n_events — a deterministic selection however
  * AvailableNow splits the file into batches. Verified stream == batch
  * against the DuckDB group-by oracle (q138).
  */
object StateProfile {

  case class ProfileEvent(user_id: Long, event_type: String, cents: Long)
  case class UserProfile(user_id: Long, n_events: Long, max_cents: Long,
      n_types: Long)

  class UserProfileProcessor
      extends StatefulProcessor[Long, ProfileEvent, UserProfile] {
    @transient private var agg: ValueState[(Long, Long)] = _
    @transient private var types: MapState[String, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[(Long, Long)]("agg",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
      types = getHandle.getMapState[String, Boolean]("types",
        Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[ProfileEvent],
        timerValues: TimerValues): Iterator[UserProfile] = {
      var (n, mx) = if (agg.exists()) agg.get() else (0L, Long.MinValue)
      rows.foreach { e =>
        n += 1
        if (e.cents > mx) mx = e.cents
        if (!types.containsKey(e.event_type))
          types.updateValue(e.event_type, true)
      }
      agg.update((n, mx))
      Iterator.single(UserProfile(key, n, mx, types.keys().size.toLong))
    }
  }

  /** q138: drain the event stream through the stateful processor and
    * select each user's final profile. transformWithState requires the
    * RocksDB state store provider — passed as drain-scoped extraConf,
    * so it lives only on runToTable's child session and the caller's
    * session conf is never touched (r12 conf scoping). */
  def streamStateProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = StreamingOps.streamEvents(s, dir)
      .select(col("user_id"), col("event_type"),
        expr("cast(floor(value * 100) as bigint)").as("cents"))
      .as[ProfileEvent]
    val out = ds.groupByKey(_.user_id)
      .transformWithState(new UserProfileProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
    val drained = StreamingOps.runToTable(out, "update",
      extraConf = Map("spark.sql.streaming.stateStore.providerClass" ->
        ("org.apache.spark.sql.execution.streaming." +
          "state.RocksDBStateStoreProvider")))
    val w = Window.partitionBy("user_id").orderBy(col("n_events").desc)
    drained.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }
}
