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
