package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming path for the sampled-frame feed — the
  * at-ingest companion of the batch shot-segmentation telemetry
  * (`Multimodal.sceneCuts`, the `mm_scene_cuts` query) and the audio
  * frame-energy telemetry (`Multimodal.audioFrameEnergy`,
  * `mm_audio_energy`). The split is the same one every detector in
  * this codebase applies: pages fire AT the feed with bounded state
  * per clip, and the exact at-rest batch query remains the authority
  * for the per-clip telemetry row.
  */
object FrameStream {

  /** One detected shot boundary: the frame that opens the new shot,
    * plus the closing frame of the previous shot it was scored
    * against.
    */
  final case class SceneCut(doc_id: Long, frame_idx: Long, prev_idx: Long,
                            prev_score: Long, score: Long)

  /** A frame admitted by the watermark but not yet safe to score: a
    * lower-indexed sibling could still arrive inside the lateness
    * window. Held in keyed state until the watermark passes its event
    * time.
    */
  final case class PendingFrame(idx: Long, score: Long, tsMs: Long)

  /** Per-video state: the last FINALIZED frame (the lag the next cut
    * is scored against) plus the frames still inside the lateness
    * window. The buffer is bounded by lateness × per-video frame rate
    * — the price of actually honoring the out-of-order admission the
    * watermark promises — and empties the moment the watermark passes.
    */
  final case class ShotState(lastIdx: Long, lastScore: Long,
                             hasLast: Boolean, maxTsMs: Long,
                             pending: Seq[PendingFrame])

  /** Streaming per-video cut detector over a sampled-frame stream
    * (doc_id, frame_idx, score, tsec): a cut fires when a frame's
    * score differs from its predecessor's by more than `threshold`.
    * Frames are BUFFERED in keyed state until the watermark passes
    * their event time and scored in frame_idx order, so a frame that
    * arrives out of order — in a later micro-batch than a
    * higher-indexed sibling, the exact case the `lateness` window
    * exists to admit — is still compared against its true predecessor
    * (r10 ADVICE: the v1 detector sorted only within each micro-batch,
    * so a late frame was scored against the wrong lag). Correctness
    * contract: per video, `tsec` is non-decreasing in `frame_idx`
    * (frames of one video are timestamped by position — the decoder's
    * own order), so the watermark-ready frames always form a
    * frame_idx prefix and no finalized frame can be preceded by a
    * still-pending one. The event-time timeout is armed at the OLDEST
    * pending frame's event time (capped by the idle horizon), so a
    * video whose feed pauses still drains each buffered cut one
    * watermark step after the lateness window finalizes it — cut
    * latency is bounded by `lateness`, not `idleTimeoutSec` (r11
    * ADVICE: watermark advance alone never invokes a key's function,
    * so a pure-retirement timeout held finalized cuts for the full
    * idle hour). Retirement itself happens when the watermark passes
    * `maxTs + idleTimeoutSec` with nothing pending.
    * State per video: the lag pair + the lateness-window buffer — a
    * 100 TB/day frame feed holds state for the videos in flight, not
    * the corpus. The score column is whatever the ingest decoder
    * produced (the stub digest in tests, frame-difference energy
    * behind a real codec — the same swap seam as the batch side).
    * Works identically on batch input (no watermark → every frame
    * finalizes immediately; parity pinned against
    * `Multimodal.sceneCuts` in StreamingSpec).
    */
  def sceneCutStream(frames: DataFrame, threshold: Long = 524288L,
                     lateness: String = "10 seconds",
                     idleTimeoutSec: Long = 3600L): Dataset[SceneCut] = {
    val spark = frames.sparkSession
    import spark.implicits._
    val streaming = frames.isStreaming
    val withTs = frames.withColumn("tstamp", timestamp_seconds(col("tsec")))
    val wm = if (streaming) withTs.withWatermark("tstamp", lateness)
             else withTs
    wm.select(col("doc_id"), col("frame_idx"), col("score"), col("tstamp"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ShotState, SceneCut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (docId: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[ShotState]) =>
          val empty = ShotState(0L, 0L, hasLast = false, 0L, Nil)
          // score `ready` (frame_idx order) against the finalized lag
          def emit(st: ShotState, ready: Seq[PendingFrame])
              : (ShotState, Seq[SceneCut]) = {
            var last = if (st.hasLast) Some((st.lastIdx, st.lastScore)) else None
            val out = Seq.newBuilder[SceneCut]
            ready.foreach { f =>
              last match {
                case Some((li, ls)) if math.abs(f.score - ls) > threshold =>
                  out += SceneCut(docId, f.idx, li, ls, f.score)
                case _ => ()
              }
              last = Some((f.idx, f.score))
            }
            val (li, ls) = last.getOrElse((0L, 0L))
            (st.copy(lastIdx = li, lastScore = ls,
              hasLast = last.isDefined), out.result())
          }
          if (state.hasTimedOut) {
            // flush TICK, not necessarily retirement (r11 ADVICE):
            // flatMapGroupsWithState never invokes a key on watermark
            // advance alone, so a video whose feed stopped would sit on
            // watermark-finalized cuts until the idle horizon if the
            // timeout were only a retirement signal. The timeout is
            // armed at the oldest pending frame's event time (capped by
            // the idle horizon), so buffered cuts drain one watermark
            // step after they finalize; the video itself retires only
            // once the watermark passes maxTs + idleTimeout with
            // nothing left pending.
            val st = state.getOption.getOrElse(empty)
            val wmMs = state.getCurrentWatermarkMs()
            val all = st.pending.sortBy(f => (f.idx, f.tsMs))
            val (ready, hold) = all.partition(_.tsMs <= wmMs)
            val (st1, cuts) = emit(st, ready)
            val idleAtMs = st.maxTsMs + idleTimeoutSec * 1000L
            if (hold.isEmpty && wmMs >= idleAtMs) state.remove()
            else {
              state.update(st1.copy(pending = hold))
              // every held frame has ts > watermark (that is why it is
              // held), so the max() is only the Spark legality floor
              state.setTimeoutTimestamp(math.max(wmMs + 1L,
                if (hold.isEmpty) idleAtMs
                else math.min(hold.map(_.tsMs).min, idleAtMs)))
            }
            cuts.iterator
          } else {
            val st = state.getOption.getOrElse(empty)
            val incoming = rows.map { case (_, fi, sc, ts) =>
              PendingFrame(fi, sc, ts.getTime)
            }.toSeq
            val all = (st.pending ++ incoming).sortBy(f => (f.idx, f.tsMs))
            // batch mode has no watermark (getCurrentWatermarkMs would
            // throw) — everything is final immediately
            val wmMs = if (streaming) state.getCurrentWatermarkMs()
                       else Long.MaxValue
            // Spark's late-row filter drops arriving rows with
            // ts <= watermark, so frames at or below it are final
            val (ready, hold) = all.partition(_.tsMs <= wmMs)
            val (st1, cuts) = emit(st, ready)
            val maxTs = math.max(st.maxTsMs,
              if (incoming.isEmpty) 0L else incoming.map(_.tsMs).max)
            state.update(st1.copy(maxTsMs = maxTs, pending = hold))
            if (streaming) {
              // arm at the oldest still-pending frame (it finalizes —
              // and should emit — one watermark step later), capped by
              // the idle horizon; never at or before the watermark
              // (Spark rejects that — possible when a batch delivers
              // only late frames)
              val idleAtMs = math.max(maxTs, wmMs + 1L) +
                idleTimeoutSec * 1000L
              state.setTimeoutTimestamp(math.max(wmMs + 1L,
                if (hold.isEmpty) idleAtMs
                else math.min(hold.map(_.tsMs).min, idleAtMs)))
            }
            cuts.iterator
          }
      }
  }

  /** One finalized audio-clip energy row — the streaming twin of a
    * `Multimodal.audioFrameEnergy` output row, emitted when the clip's
    * feed goes quiet (event-time timeout past `idleTimeoutSec`).
    */
  final case class ClipEnergy(doc_id: Long, n_frames: Long,
                              total_energy: Long, peak_frame: Long,
                              peak_energy: Long)

  /** Per-clip running aggregate: frame count, energy sum, peak frame
    * (earliest on ties). Four longs per clip in flight — O(1)
    * regardless of clip length.
    */
  final case class EnergyState(n: Long, total: Long, peakF: Long,
                               peakE: Long, maxTsMs: Long)

  /** Streaming per-clip audio-energy pager over a decoded frame-energy
    * feed (doc_id, frame_idx, fenergy, tsec) — the at-ingest companion
    * of `mm_audio_energy`: the running (count, Σenergy, peak) fold is
    * ORDER-FREE (sum/count commute; the peak rule "higher energy, or
    * equal energy at an earlier frame_idx, wins" is a commutative
    * idempotent max on (energy, −frame_idx)), so no frame buffering is
    * needed and late frames inside the watermark fold in exactly like
    * on-time ones. The finalized clip row emits on event-time timeout
    * (the clip went quiet for `idleTimeoutSec` — the same retirement
    * rule as [[sceneCutStream]]); state per clip is four longs. The
    * fenergy column is the per-frame Σ|sample| the ingest decoder
    * produced — in production the real codec behind
    * `Multimodal.audioFrameEnergy`'s seam, the same stub synth in
    * tests (parity pinned in StreamingSpec). Batch input emits every
    * clip immediately (no watermark, nothing more can arrive).
    */
  def audioEnergyStream(frames: DataFrame,
                        lateness: String = "10 seconds",
                        idleTimeoutSec: Long = 3600L): Dataset[ClipEnergy] = {
    val spark = frames.sparkSession
    import spark.implicits._
    val streaming = frames.isStreaming
    val withTs = frames.withColumn("tstamp", timestamp_seconds(col("tsec")))
    val wm = if (streaming) withTs.withWatermark("tstamp", lateness)
             else withTs
    wm.select(col("doc_id"), col("frame_idx"), col("fenergy"), col("tstamp"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EnergyState, ClipEnergy](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (docId: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[EnergyState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(
              ClipEnergy(docId, st.n, st.total, st.peakF, st.peakE))
          } else {
            var st = state.getOption
              .getOrElse(EnergyState(0L, 0L, 0L, -1L, 0L))
            rows.foreach { case (_, fi, e, ts) =>
              val better = e > st.peakE || (e == st.peakE && fi < st.peakF)
              st = EnergyState(st.n + 1L, st.total + e,
                if (better) fi else st.peakF,
                if (better) e else st.peakE,
                math.max(st.maxTsMs, ts.getTime))
            }
            if (streaming) {
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.maxTsMs, state.getCurrentWatermarkMs() + 1L) +
                  idleTimeoutSec * 1000L)
              Iterator.empty
            } else {
              // batch: the group is complete — emit now
              state.update(st)
              Iterator.single(
                ClipEnergy(docId, st.n, st.total, st.peakF, st.peakE))
            }
          }
      }
  }
}
