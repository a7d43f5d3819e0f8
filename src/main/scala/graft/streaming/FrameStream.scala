package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming path for the sampled-frame feed — the
  * at-ingest companion of the batch shot-segmentation telemetry
  * (`Multimodal.sceneCuts`, the `mm_scene_cuts` query). The split is
  * the same one every detector in this codebase applies: cuts fire AT
  * the feed with O(1) state per video, and the exact at-rest batch
  * query remains the authority for the per-video telemetry row.
  */
object FrameStream {

  /** One detected shot boundary: the frame that opens the new shot,
    * plus the closing frame of the previous shot it was scored
    * against.
    */
  final case class SceneCut(doc_id: Long, frame_idx: Long, prev_idx: Long,
                            prev_score: Long, score: Long)

  /** Per-video lag state: the last sampled frame seen. Three numbers
    * per video in flight, regardless of video length or feed volume.
    */
  final case class ShotState(lastIdx: Long, lastScore: Long)

  /** Streaming per-video cut detector over a sampled-frame stream
    * (doc_id, frame_idx, score, tsec): a cut is emitted the moment a
    * frame's score differs from its predecessor's by more than
    * `threshold` — the lag lives in keyed state, so the comparison
    * works across micro-batch boundaries (a video split mid-shot over
    * two batches still cuts exactly once). Event-time timeout retires
    * videos that go quiet past `idleTimeoutSec`, so a 100 TB/day frame
    * feed holds state for the videos in flight, not the corpus. The
    * score column is whatever the ingest decoder produced (the stub
    * digest in tests, frame-difference energy behind a real codec —
    * the same swap seam as the batch side). Works identically on batch
    * input (parity pinned against `Multimodal.sceneCuts` in
    * StreamingSpec).
    */
  def sceneCutStream(frames: DataFrame, threshold: Long = 524288L,
                     lateness: String = "10 seconds",
                     idleTimeoutSec: Long = 3600L): Dataset[SceneCut] = {
    val spark = frames.sparkSession
    import spark.implicits._
    val withTs = frames.withColumn("tstamp", timestamp_seconds(col("tsec")))
    val wm = if (frames.isStreaming) withTs.withWatermark("tstamp", lateness)
             else withTs
    wm.select(col("doc_id"), col("frame_idx"), col("score"), col("tstamp"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ShotState, SceneCut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (docId: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[ShotState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val pts = rows.toArray.sortBy(_._2)
            var last = state.getOption
            val out = Seq.newBuilder[SceneCut]
            var lastSec = 0L
            pts.foreach { case (_, fi, sc, ts) =>
              last match {
                case Some(s) if math.abs(sc - s.lastScore) > threshold =>
                  out += SceneCut(docId, fi, s.lastIdx, s.lastScore, sc)
                case _ => ()
              }
              last = Some(ShotState(fi, sc))
              lastSec = ts.getTime / 1000
            }
            last.foreach(state.update)
            if (pts.nonEmpty)
              state.setTimeoutTimestamp((lastSec + idleTimeoutSec) * 1000)
            out.result().iterator
          }
      }
  }
}
