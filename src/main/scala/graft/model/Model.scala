package graft.model

/**
 * The nine record types of the reference engine, reproduced verbatim as the
 * public typed API surface (reference: SentimentAnalysis.scala:313-327).
 *
 * The reference streams carry no time/order fields — Flink 1.6 processing
 * time and arrival order are implicit. The rebuild makes both explicit so
 * event-time windows and order-sensitive folds are deterministic and
 * oracle-testable: see [[TimedMessage]] (`seq` = arrival order,
 * `tsec` = event-time seconds).
 */
object Model {

  /** SentimentAnalysis.scala:313 */
  trait HoldsSentiment { def sentiment: Sentiment }

  /** SentimentAnalysis.scala:315 */
  case class Message(channel: String, user: String, text: String)

  /** SentimentAnalysis.scala:317 — score in [-1,1], magnitude >= 0. */
  case class Sentiment(score: Float, magnitude: Float)

  /** SentimentAnalysis.scala:318 */
  case class MessageSentiment(message: Message, sentiment: Sentiment)
      extends HoldsSentiment

  /** SentimentAnalysis.scala:320 */
  case class Entity(key: String, salience: Float, sentiment: Sentiment)
      extends HoldsSentiment

  /** SentimentAnalysis.scala:321 */
  case class EntityCount(key: String, count: Int)

  /** SentimentAnalysis.scala:323 — value = score * magnitude
    * (SentimentAnalysis.scala:252). */
  case class Mood(key: String, value: Float, moodType: String)

  /** SentimentAnalysis.scala:325 */
  case class Category(category: String, confidence: Float)

  /** SentimentAnalysis.scala:326 */
  case class MessageCategories(message: Message, categories: List[Category])

  /** SentimentAnalysis.scala:327 */
  case class CategorySentiment(message: Message, category: Category,
      sentiment: Sentiment) extends HoldsSentiment

  /** Rebuild-side wire record: the reference's implicit arrival order and
    * processing time made explicit (SURVEY.md §1). */
  case class TimedMessage(seq: Long, tsec: Long, channel: String,
      user: String, text: String)

  /** Multimodal input record: an opaque binary payload with typed
    * metadata ([[graft.pipeline.DataOps.multimodal]]). */
  case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** Decoded multimodal features — real `javax.imageio` pixels for
    * decodable image payloads, deterministic stub geometry otherwise
    * (see [[graft.pipeline.DataOps.multimodal]]). */
  case class MediaFeature(doc_id: Long, mime: String, n_bytes: Long,
      width: Long, height: Long, frames: Long)

  /** Aspect-preserving thumbnail geometry for a decoded media record
    * ([[graft.pipeline.DataOps.mediaResize]]). */
  case class MediaThumb(doc_id: Long, width: Long, height: Long,
      thumb_w: Long, thumb_h: Long)

  /** Keyed mood record feeding the streaming count-window operator
    * (value in micro units; `seq` = arrival order within the key,
    * `tsec` = event-time seconds after the fixture epoch — what the
    * opt-in event-time state TTL keys eviction to). */
  case class MoodRec(key: String, seq: Long, tsec: Long, mood_micro: Long)

  /** One fired toxicity count window (reference
    * SentimentAnalysis.scala:304-311): the grp-th complete window of N
    * running-mood emissions for `key`, with its (micro) sum. */
  case class ToxWindow(key: String, grp: Long, mood_micro: Long)

  /** State of the streaming toxicity operator per key: the running mood
    * total (Flink's unwindowed reduce, SentimentAnalysis.scala:285) plus
    * the open count-window accumulator. */
  case class ToxState(runMicro: Long, cnt: Long, winMicro: Long, grp: Long)

  /** Typed event record for the streaming event-analytics operators
    * ([[graft.streaming.EventStreamOps]]): exact integer nanosecond
    * event time + micro-unit value, matching the batch readers. */
  case class StreamEvent(event_id: Long, tns: Long, user_id: Long,
      event_type: String, v: Long)

  /** As-of attribution result row ([[graft.pipeline.EventOps]] /
    * [[graft.streaming.EventStreamOps.asofAttributionStream]]). */
  case class Attribution(purchase_id: Long, user_id: Long, click_id: Long,
      gap_sec: Long)

  /** Per-user as-of state: the latest click seen so far (event time in
    * exact integer MICROseconds — the engine's cross-engine time grain,
    * see [[graft.pipeline.EventOps]]). */
  case class ClickState(click_id: Long, click_tus: Long)

  /** Per-user streaming funnel state: first view / first click ≥ view /
    * first purchase ≥ click, µs event time, -1 = step not reached
    * ([[graft.streaming.EventStreamOps.funnelStream]]). */
  case class FunnelState(v: Long, c: Long, p: Long)

  /** Streaming funnel changelog row — last row per user equals the
    * batch [[graft.pipeline.EventOps.funnelSteps]] answer. */
  case class FunnelRow(user_id: Long, view_tus: Long, click_tus: Long,
      purchase_tus: Long, depth: Long)

  /** Per-user SCD2 stream state: the one OPEN (current) validity row
    * ([[graft.streaming.EventStreamOps.scd2Stream]]). */
  case class Scd2Open(event_id: Long, event_type: String,
      valid_from_tus: Long)

  /** Per-type streaming-EWMA state
    * ([[graft.streaming.EventStreamOps.ewmaStream]]): the level is
    * final through `foldedUpTo`; (`pendHour`, `pendCnt`) is the open
    * hour, folded only once a later-hour event closes it. */
  case class EwmaState(foldedUpTo: Long, sm: Long, pendHour: Long,
      pendCnt: Long)

  /** Keyed document for the streaming per-source cap
    * ([[graft.streaming.StreamingOps.sourceCapStream]]). */
  case class CapDoc(doc_id: Long, source: String)

  /** An admitted document with its per-source admission rank. */
  case class CapAdmit(source: String, doc_id: Long, rk: Long)

  /** SCD2 changelog row — mirrors the batch
    * [[graft.pipeline.EventOps.eventHistoryScd2]] schema: each event is
    * first emitted current (valid_to −1), then re-emitted once closed;
    * compacting per (user_id, event_id) preferring the closed row
    * reproduces the batch table. */
  case class Scd2Row(user_id: Long, event_id: Long, event_type: String,
      valid_from_tus: Long, valid_to_tus: Long, is_current: Long)
}
