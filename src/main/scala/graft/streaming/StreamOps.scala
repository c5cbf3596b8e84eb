package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One event in the typed streaming API. */
case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Running per-user aggregate maintained by the stateful operator. */
case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/**
 * Structured Streaming operators for the event-pipeline side of the engine.
 *
 * Everything here works identically on a batch DataFrame and a streaming
 * one (session_window / window / dropDuplicates are engine-agnostic), which
 * is how a 100 TB backfill and its incremental tail share one code path:
 * run the same transform over `spark.read` for the backfill and
 * `spark.readStream` for the live stream.
 *
 * Scale notes: all three aggregations shuffle on (user/session) keys with
 * watermark-bounded state — state size is proportional to the number of
 * *open* sessions/keys inside the watermark, not to history; streaming
 * dedup keeps only keys younger than the watermark.
 */
object StreamOps {

  implicit val userEventEnc: Encoder[UserEvent] = Encoders.product[UserEvent]
  implicit val userTotalsEnc: Encoder[UserTotals] = Encoders.product[UserTotals]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /**
   * Gap-based sessionization: one row per (user, session window) with event
   * count and value sum. On a stream, `watermark` bounds both lateness and
   * session-state retention.
   */
  def sessionize(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      gap: String,
      watermark: String = "1 hour",
      valueCol: String = "value"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    withWm
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("value_sum"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("value_sum"))
  }

  /** Sliding-window event counts with watermarking. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      window: String,
      slide: String,
      watermark: String = "1 hour"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    withWm
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window, slide))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))
  }

  /**
   * Streaming exact dedup: drops duplicate keys whose events arrive within
   * the watermark of each other, holding only watermark-bounded state (the
   * streaming analogue of [[graft.ops.Dedup.exact]]).
   */
  def dedupStream(events: DataFrame, tsCol: String, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming) {
      events.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keys)
    } else {
      events.dropDuplicates(keys)
    }

  /**
   * Custom stateful operator: running per-user totals via
   * `mapGroupsWithState` — the escape hatch for state machines the built-in
   * aggregations cannot express. Emits the updated running total for every
   * user seen in the batch.
   */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserTotals] =
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0d))
          var n = prev.n_events
          var total = prev.total_value
          batch.foreach { e =>
            n += 1
            total += e.value
          }
          val updated = UserTotals(userId, n, total)
          state.update(updated)
          updated
      }
}
