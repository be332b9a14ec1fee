package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One upsert against the history table. */
final case class ChangeEvent(
    key: Long, ts: Long, eventId: Long, newVal: Long,
    eventTime: Timestamp)

/** The open (current) version kept per key. */
final case class VersionState(
    validFrom: Long, value: Long, version: Long)

/** An emitted SCD2 row; validTo = -1 marks the open version. */
final case class Scd2Row(
    key: Long, value: Long, validFrom: Long, validTo: Long,
    version: Long)

/** Streaming SCD2 (type-2 slowly-changing-dimension) materialization:
  * the stateful-streaming analogue of the batch history build (q152) —
  * each key's change stream folds into validity intervals AS IT
  * ARRIVES, instead of a nightly rebuild. A new version opens when the
  * incoming value differs from the current one (equal-value upserts
  * extend the open version — the SCD2 no-change collapse); the
  * superseded version is emitted closed. State per key is ONE small
  * record (the open version), watermark-bounded lifetime.
  *
  * Under AvailableNow each key's full batch folds in event order and
  * the open version is emitted with validTo = -1 — stream == batch
  * gaps-and-islands oracle. That drain-finalize is only correct when a
  * key's WHOLE stream lands in one micro-batch (true for a single-file
  * AvailableNow source; a multi-file corpus or maxFilesPerTrigger can
  * split it), so the operator now enforces the contract instead of
  * assuming it: after finalizing, a sentinel stays in state, and a
  * second micro-batch delivering the same key fails the query loudly
  * rather than silently duplicating open versions and resetting the
  * version numbering. A continuous deployment would instead hold the
  * open version in state and emit it on an EventTimeTimeout, exactly
  * the Sessionize pattern. Sentinel state is one tiny record per key,
  * bounded by the key domain for the run's lifetime.
  */
object Scd2Stream {

  /** version < 0 marks "this key was already finalized in an earlier
    * micro-batch" — any later arrival violates the AvailableNow
    * single-batch contract this operator is specified under. */
  private val Finalized = VersionState(-1L, 0L, -1L)

  def history(changes: Dataset[ChangeEvent]): Dataset[Scd2Row] = {
    implicit val stateEnc = Encoders.product[VersionState]
    implicit val outEnc = Encoders.product[Scd2Row]
    changes
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[VersionState, Scd2Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[ChangeEvent],
         state: GroupState[VersionState]) =>
          if (state.getOption.exists(_.version < 0)) {
            throw new IllegalStateException(
              s"Scd2Stream.history: key $key arrived in a second " +
                "micro-batch after its drain-finalize. This operator " +
                "assumes AvailableNow delivers each key's full stream " +
                "in ONE batch; for multi-file/continuous sources use " +
                "the EventTimeTimeout variant instead.")
          }
          val sorted = batch.toSeq.sortBy(e => (e.ts, e.eventId))
          val out = Seq.newBuilder[Scd2Row]
          var cur: Option[VersionState] = None
          sorted.foreach { e =>
            cur match {
              case Some(v) if e.newVal != v.value =>
                out += Scd2Row(key, v.value, v.validFrom, e.ts, v.version)
                cur = Some(VersionState(e.ts, e.newVal, v.version + 1))
              case Some(_) => // no-change upsert extends the open version
              case None =>
                cur = Some(VersionState(e.ts, e.newVal, 1L))
            }
          }
          // AvailableNow drain: finalize the open version; leave the
          // sentinel so a contract-violating second batch fails fast.
          cur.foreach { v =>
            out += Scd2Row(key, v.value, v.validFrom, -1L, v.version)
          }
          state.update(Finalized)
          out.result().iterator
      }
  }
}
