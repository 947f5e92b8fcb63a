package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.TextOps

/** Structured-Streaming operators for continuous training-data ingestion
  * (beyond-reference surface: the reference is batch-only — zero streaming
  * code in its src/). The same transformations the batch engine compiles
  * work on `readStream` inputs; this module adds the two genuinely
  * streaming-shaped pieces a corpus pipeline needs:
  *
  *   - streaming exact dedup — keep the FIRST document per content hash
  *     across the unbounded stream, with per-key state handled by
  *     `flatMapGroupsWithState` (state = one boolean per hash; bounded by
  *     distinct-hash cardinality, the same bound the batch dedup's shuffle
  *     has). At 100 TB/day this state lives in RocksDB via the state-store
  *     provider; the operator shape is unchanged.
  *   - watermarked windowed counts — tumbling-window event statistics with
  *     bounded lateness, the monitoring side of an ingestion pipeline.
  */
object Streams {

  /** Emit only the first-seen document per normalized-content hash.
    * Output schema = input schema. Works on batch frames too (useful for
    * backfill parity tests of the same operator). */
  def streamingExactDedup(
      docs: DataFrame,
      textCol: String,
  ): DataFrame = {
    val hashed = docs.withColumn("__h__",
      md5(TextOps.normalize(col(textCol)).cast("binary")))
    val outSchema = docs.schema
    val hIdx = hashed.schema.fieldIndex("__h__")
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val strEnc = Encoders.STRING
    hashed
      .groupByKey((r: Row) => r.getString(hIdx))
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // several same-hash rows can arrive in one micro-batch: keep
            // exactly one (iterator order within the group)
            rows.take(1).map(r => Row.fromSeq(r.toSeq.dropRight(1)))
          }
      }(Encoders.scalaBoolean, rowEnc)
  }

  /** Streaming gap-based sessionization — the streaming twin of
    * `Model.sessionize`. Keyed state = the one OPEN session per group
    * (start, end, count — three longs, constant per key); an event within
    * `gapSeconds` of the open session extends it, a later event closes and
    * emits it, and an event-time timeout (the watermark passing
    * session_end + gap) flushes sessions for groups that simply stop
    * sending. Out-of-order events inside the watermark extend the open
    * session exactly like the batch operator's window would; events later
    * than the watermark are dropped by the engine. Group key is emitted as
    * its string form (`group`), the price of a schema-generic operator.
    * Output: group, session_start, n_events, session_end (append mode). */
  def streamingSessionize(
      events: DataFrame,
      groupCol: String,
      tsCol: String,
      gapSeconds: Long,
      watermarkDelay: String,
  ): DataFrame = {
    import org.apache.spark.sql.types._
    val gapMs = gapSeconds * 1000L
    // null timestamps cannot belong to any session — same rule as batch
    val src = events.where(col(tsCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
    val gIdx = src.schema.fieldIndex(groupCol)
    val tIdx = src.schema.fieldIndex(tsCol)
    val outSchema = StructType(Seq(
      StructField("group", StringType, nullable = false),
      StructField("session_start", TimestampType, nullable = false),
      StructField("n_events", LongType, nullable = false),
      StructField("session_end", TimestampType, nullable = false)))
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val strEnc = Encoders.STRING
    val stateEnc = Encoders.product[(Long, Long, Long)]
    src
      .groupByKey((r: Row) => String.valueOf(r.get(gIdx)))
      .flatMapGroupsWithState[(Long, Long, Long), Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Row], state: GroupState[(Long, Long, Long)]) =>
          def emit(s: (Long, Long, Long)): Row =
            Row(key, new java.sql.Timestamp(s._1), s._3, new java.sql.Timestamp(s._2))
          if (state.hasTimedOut) {
            val done = emit(state.get)
            state.remove()
            Iterator.single(done)
          } else {
            // a micro-batch is unordered: process this batch's events in
            // event-time order so in-batch session splits are exact
            val ts = rows.map(_.getTimestamp(tIdx).getTime).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[Row]
            var cur = state.getOption
            ts.foreach { t =>
              cur = cur match {
                case None => Some((t, t, 1L))
                case Some((s0, e0, n0)) =>
                  if (t - e0 > gapMs) { closed += emit((s0, e0, n0)); Some((t, t, 1L)) }
                  else if (s0 - t > gapMs) {
                    // a watermark-admitted straggler MORE than a gap older
                    // than the open session is its own (already closed)
                    // session — batch sessionize would split here too; a
                    // stream cannot retract, so emit it immediately
                    closed += emit((t, t, 1L)); Some((s0, e0, n0))
                  }
                  // stragglers within a gap of the open session widen it,
                  // exactly like the batch operator's window would
                  else Some((math.min(s0, t), math.max(e0, t), n0 + 1L))
              }
            }
            cur.foreach { c =>
              state.update(c)
              state.setTimeoutTimestamp(c._2 + gapMs)
            }
            closed.iterator
          }
      }(stateEnc, rowEnc)
  }

  /** Tumbling-window counts per key with watermarked bounded lateness:
    * the standard `withWatermark` + `window()` aggregation; late events
    * beyond `watermarkDelay` are dropped, windows finalize incrementally. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermarkDelay: String,
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("window_start"),
        col(keyCol), col("n"))
}
