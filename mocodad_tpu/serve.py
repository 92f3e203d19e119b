"""Online (streaming) anomaly-scoring service tier.

The reference is strictly batch-offline: poses for a whole split are
materialized up front and scored in one pass (ref eval_MoCoDAD.py,
models/mocodad.py:230-321).  A production deployment instead receives
pose tracks frame by frame (e.g. from an AlphaPose+PoseFlow tracker on a
live camera) and needs per-frame anomaly scores with bounded latency.
`StreamScorer` provides that on top of the same model/scoring semantics:

* per-actor ring buffers assemble seg_len sliding windows as frames
  arrive, applying the SAME per-frame normalization as the offline
  robust path (bbox-centre coordinates via trajectories._to_bbox_centre,
  then the train-split-fitted persisted scaler) — both are per-frame /
  per-feature operations, so streamed windows are bit-identical to
  data/robust.robust_pose_windows output for the same track
  (tests/test_serve.py pins this);
* windows are scored under every affine view transform (the offline
  chain averages scores over views, ref models/mocodad.py:362-424);
* a static-shape micro-batcher pads pending windows to a fixed batch so
  the TPU program compiles ONCE (the tuned-option jit from
  ops/xla_tuning.py); per-batch losses stay on device until drained;
* `finalize_clip` runs the exact offline scoring chain (eval/harness.py
  clip_frame_scores + shift/gaussian smoothing + transform averaging)
  over the clip's accumulated window losses.

Latency/semantics note: window inference streams (the expensive part —
96% of eval time is the U-Net chain, PERF_NOTES.md); the final per-frame
score chain needs the whole clip because the reference's actor
aggregation adds a clip-global log1p amplitude term and the gaussian
smoothing is non-causal (ref models/mocodad.py:399-401,
utils/eval_utils.py:100-106).  `partial_scores` gives provisional
per-frame scores mid-clip for monitoring; `finalize_clip` is the
reference-exact result.  For latency-sensitive deployments the
config-extras sampling levers compose here unchanged: `eval_profile:
fast` (S capped at 10 under the reference chain — measured AUC-free,
PERF_NOTES.md "Fast-eval frontier") cuts per-flush inference ~4.9x, and
`sampler: ddim` with a short `ddim_steps` chain cuts further at a
measured AUC cost that grows with how separable the anomalies are.

Backpressure & overload (sustained push rate > device drain rate):

* device side — at most `max_pending_batches` launched micro-batches may
  be in flight; `flush` synchronously drains the OLDEST in-flight batch
  BEFORE each further launch, so producers throttle to device speed and
  in-flight memory never exceeds `max_pending_batches x batch_size`
  windows, even transiently.
* host side — a `push` whose window views would take the pending-window
  queue past `max_queue_windows` first dispatches any full batches
  (throttled as above, so it may block); if the queue still cannot fit
  the views (cap below batch_size, or trailing partial batches) it
  REFUSES with `OverloadError` before recording anything.  Warm-up
  frames of a track still shorter than `seg_len` enqueue nothing and
  are always accepted.  Refusal is deterministic (a pure queue-length
  threshold), the refused pose is not recorded anywhere, and the scorer
  stays fully usable — callers shed load at ingestion and may retry
  after `flush(force=True)` (a plain `flush()` is a no-op below
  `batch_size`) or after releasing clips.
* per-clip score accumulators grow with scored windows by design (the
  reference scoring chain is clip-global); `finalize_clip`/`drop_clip`
  are the release points for long-running services.

Measured overload latency (p50/p99 per push) lives in
tools/perf/probe_serve_latency.py's sustained-overload phase.
"""

from __future__ import annotations

import collections
from typing import Dict, List, Optional, Tuple

import numpy as np

from mocodad_tpu.config import Config


class OverloadError(RuntimeError):
    """Raised by `StreamScorer.push` when the pending-window queue cannot
    fit the new window's views even after dispatching full batches: the
    service is overloaded and the caller must `flush(force=True)` (or
    drop clips) before retrying.  The refused pose is NOT recorded —
    ingestion-side load shedding.

    Parity note: because the pose is not recorded, retrying the
    IDENTICAL (frame, keypoints) after recovery keeps the track's
    window stream bit-equal to the offline path; permanently shedding
    it instead makes every later window of that actor span a frame gap,
    which silently weakens the offline-equal scoring claim for that
    track."""


class _Track:
    __slots__ = ('frames', 'coords')

    def __init__(self):
        self.frames: List[int] = []
        self.coords: List[np.ndarray] = []   # raw (V*2,) image coords


class StreamScorer:
    """Streaming per-frame anomaly scoring with offline-equal semantics.

    Parameters
    ----------
    cfg: a finalized Config (same YAML the offline CLIs consume).
    variables: model variables {'params', 'batch_stats'}; when None they
        are restored from `cfg.ckpt_dir / cfg.load_ckpt` like the eval CLI.
    batch_size: static micro-batch size (windows x views per launch).
    flush_every: auto-flush whenever this many windows x views are
        pending; None flushes only on demand / finalize.
    max_pending_batches: bound on launched-but-undrained micro-batches;
        `flush` drains the oldest beyond this (device-side backpressure:
        producers block until the device catches up).
    max_queue_windows: bound on the host-side pending queue, in
        window x view ENTRIES (each accepted window enqueues
        num_transform entries — the same unit as batch_size); a
        `push` that would exceed it dispatches full batches first, then
        raises `OverloadError` before recording anything if the window's
        views still do not fit (deterministic ingestion-side refusal).
        Defaults to 64 x batch_size.
    """

    def __init__(self, cfg: Config, variables: Optional[Dict] = None,
                 batch_size: int = 256,
                 flush_every: Optional[int] = None,
                 max_pending_batches: int = 8,
                 max_queue_windows: Optional[int] = None):
        import jax

        from mocodad_tpu.data.scalers import load_scaler
        from mocodad_tpu.data.robust import scaler_artifact_path
        from mocodad_tpu.data.transforms import affine_transform_matrices
        from mocodad_tpu.models import build_model

        if cfg.num_coords not in (2, 3):
            raise NotImplementedError(
                'StreamScorer supports the local-coordinate path '
                '(num_coords 2/3); global bbox features (num_coords=6) '
                'are offline-only for now')
        if cfg.normalization_strategy != 'robust':
            raise NotImplementedError(
                'StreamScorer normalizes via the robust CSV path; '
                f'got normalization_strategy={cfg.normalization_strategy!r}')
        if cfg.aggregation_strategy == 'all':
            # 'all' yields a (B, S) per-sample loss matrix; the scoring
            # chain needs one scalar per window (the offline path rejects
            # this too, eval/harness.py post_processing) — fail before any
            # inference cost is paid
            raise ValueError(
                "aggregation_strategy 'all' produces per-sample loss "
                'vectors; StreamScorer needs a scalar-per-window strategy '
                "(e.g. 'best', 'mean')")
        if cfg.use_hr or cfg.dataset_choice == 'HR-Avenue':
            # Offline HR evaluation subsets each clip's frames by a gt-side
            # human-related mask BEFORE smoothing (eval/harness.py:
            # post_processing), which changes the smoothing neighborhoods
            # and the output length — an offline-evaluation construct, not
            # a serving one.  Streaming scores the full timeline; keep the
            # offline-exactness claim honest by refusing HR configs.
            raise NotImplementedError(
                'StreamScorer scores the full frame timeline; HR-masked '
                'evaluation (use_hr / HR-Avenue) is offline-only — run '
                'eval_MoCoDAD.py for HR-masked scores')

        if cfg.num_transform < 1:
            # offline eval with num_transform < 1 scores RANDOM temporal
            # crops per item even at test time (the reference's old_aug
            # path, ref utils/dataset.py:81,125-130; data/pipeline.py
            # old_aug) — a non-deterministic construct streaming cannot
            # reproduce; refuse rather than silently score the identity
            # view and break the offline-exactness claim
            raise NotImplementedError(
                'StreamScorer requires num_transform >= 1; the offline '
                'old_aug path (num_transform < 1) applies random '
                'temporal crops at test time and has no streaming '
                'equivalent')
        self.cfg = cfg
        self.model = build_model(cfg)
        if getattr(self.model, 'stage', None) == 'pretrain':
            # the latent variant's pretrain stage generates reconstructed
            # poses with NO per-window loss (models/mocodad_latent.py
            # generate -> (pose, None)); scoring needs the loss route
            raise NotImplementedError(
                "StreamScorer needs a per-window loss; the latent "
                "variant's 'pretrain' stage returns reconstructions only "
                "— serve the 'diffusion' stage (or the base model)")
        if variables is None:
            import os
            from mocodad_tpu.training.checkpoint import restore_variables
            path = os.path.join(cfg.ckpt_dir, cfg.load_ckpt)
            template = self.model.init_variables(jax.random.key(0))
            # use_ema must mirror the offline eval CLI's restore
            # (training/loop.py restore_and_infer) or an EMA-trained
            # config would stream scores from the raw weights
            variables = restore_variables(path, template,
                                          use_ema=cfg.use_ema)
        self.variables = {'params': variables['params'],
                          'batch_stats': variables.get('batch_stats', {})}

        self.scaler = load_scaler(scaler_artifact_path(
            cfg.ckpt_dir, 'local', cfg.normalization_strategy))
        self.vid_res = np.asarray(cfg.vid_res, dtype=np.float32)
        self.num_transform = cfg.num_transform
        self.mats = affine_transform_matrices(self.num_transform)
        self.batch_size = int(batch_size)
        if self.batch_size < 1:
            raise ValueError('batch_size must be >= 1')
        self.flush_every = flush_every
        if flush_every is not None and int(flush_every) < 1:
            raise ValueError('flush_every must be >= 1 (or None)')
        if max_pending_batches < 1:
            raise ValueError('max_pending_batches must be >= 1')
        self.max_pending_batches = int(max_pending_batches)
        self.max_queue_windows = (64 * self.batch_size
                                  if max_queue_windows is None
                                  else int(max_queue_windows))
        if self.max_queue_windows < self.num_transform:
            raise ValueError('max_queue_windows must fit at least one '
                             f'window x its {self.num_transform} views')
        self.seg_len = cfg.seg_len

        self._tracks: Dict[Tuple[int, int, int], _Track] = \
            collections.defaultdict(_Track)
        # pending windows awaiting inference
        self._q_data: List[np.ndarray] = []    # (C, T, V)
        self._q_trans: List[int] = []
        self._q_meta: List[np.ndarray] = []    # (4,)
        self._q_frames: List[np.ndarray] = []  # (T,)
        # scored results (host) per clip
        self._scored: Dict[Tuple[int, int], Dict[str, list]] = \
            collections.defaultdict(lambda: {'loss': [], 'trans': [],
                                             'meta': [], 'frames': []})
        self._pending_dev: List = []  # (loss_dev, trans, meta, frames, nval)

        # same eval domain tag as the offline loop (training/loop.py
        # run_inference): without it, micro-batch i would replay train
        # step i's exact PRNG key from the same config seed — the
        # correlation the offline path deliberately avoids
        self._rng = jax.random.fold_in(jax.random.key(cfg.seed), 0x45564C)
        self._batch_idx = 0
        self._step = self._build_step()

    # -- device step -------------------------------------------------------

    def _build_step(self):
        import jax

        from mocodad_tpu.data.transforms import apply_affine_batch
        from mocodad_tpu.ops.xla_tuning import tuned_compiler_options

        model, mats = self.model, self.mats

        def step(variables, data, trans, rng_base, batch_idx):
            rng = jax.random.fold_in(rng_base, batch_idx)
            data = apply_affine_batch(data, mats, trans)
            _, loss = model.generate(variables, data, rng)
            return loss

        return jax.jit(step, compiler_options=tuned_compiler_options())

    # -- ingestion ----------------------------------------------------------

    def push(self, scene: int, clip: int, person: int, frame: int,
             keypoints: np.ndarray) -> None:
        """Feed one actor's pose for one frame.

        keypoints: (V, 2) raw image coordinates (the CSV column layout,
        ref utils/data.py:219-236); zeros mark missing joints.  Windows
        are emitted over arrival positions exactly like the offline
        windowing (data/windows.py window_index_matrix with the eval
        split's stride 1)."""
        kp = np.asarray(keypoints, dtype=np.float32)
        # every supported config consumes the 17-joint CSV layout (kp18/
        # headless are derived downstream); reject wrong-arity poses
        # BEFORE the overload check so a malformed message fails fast
        # with ValueError instead of triggering device flushes and an
        # OverloadError whose retry guidance can never succeed
        if kp.shape != (17, 2):
            raise ValueError(
                f'keypoints must have shape (17, 2) (the CSV trajectory '
                f'layout, ref utils/data.py:219-236); got {kp.shape}')
        frame = int(frame)
        if frame < 1:
            # frames are 1-indexed like the reference CSVs (the scoring
            # scatter writes at column frame-1, eval/scoring.py
            # compute_var_matrix); frame 0 would silently wrap to the
            # LAST column and corrupt that frame's score
            raise ValueError(
                f'frame numbers are 1-indexed (reference CSV contract, '
                f'ref utils/eval_utils.py:27-34); got {frame}')
        # a push only costs queue space once its track has seg_len frames
        # (each then emits num_transform window views); warm-up frames of
        # a new/short track are free and must never be refused
        tr0 = self._tracks.get((scene, clip, person))
        would_enqueue = (len(tr0.frames) if tr0 is not None
                         else 0) >= self.seg_len - 1
        if (would_enqueue and len(self._q_data) + self.num_transform
                > self.max_queue_windows):
            # host-queue cap: dispatch any full batches first (throttled
            # by max_pending_batches, so this may block on the device);
            # if that cannot get the queue under the cap (cap below
            # batch_size, or trailing partial batches), refuse BEFORE
            # recording anything.
            self.flush()
            if (len(self._q_data) + self.num_transform
                    > self.max_queue_windows):
                raise OverloadError(
                    f'pending-window queue at {len(self._q_data)} '
                    f'(max_queue_windows={self.max_queue_windows}); '
                    'flush(force=True) runs a padded partial batch, or '
                    'finalize_clip()/drop_clip() to release state, '
                    'before retrying (a plain flush() is a no-op below '
                    'batch_size)')
        kp = kp.reshape(-1)
        tr = self._tracks[(scene, clip, person)]
        tr.frames.append(int(frame))
        tr.coords.append(kp)
        # only the trailing window is ever needed: bound per-track memory
        # for long-running streams
        if len(tr.frames) > self.seg_len:
            del tr.frames[0], tr.coords[0]
        if len(tr.frames) == self.seg_len:
            self._enqueue_window(scene, clip, person, tr, 0)
        if (self.flush_every is not None
                and len(self._q_data) >= self.flush_every):
            # latency knob: run as soon as flush_every windows pend, even
            # if that pads a partial batch to the static shape (when
            # flush_every < batch_size, trading wasted rows for latency)
            self.flush(force=True)

    def _enqueue_window(self, scene: int, clip: int, person: int,
                        tr: _Track, start: int) -> None:
        from mocodad_tpu.data.scalers import scale_trajectories
        from mocodad_tpu.data.trajectories import _to_bbox_centre

        raw = np.stack(tr.coords[start:start + self.seg_len])  # (T, V*2)
        local = _to_bbox_centre(raw, self.vid_res)
        scaled, _ = scale_trajectories(local[None], scaler=self.scaler,
                                       strategy='robust')
        t, v = self.seg_len, raw.shape[1] // 2
        window = np.empty((t, v, 3), dtype=np.float32)
        window[..., :2] = scaled[0].reshape(t, v, 2)
        window[..., 2] = 1.0
        if self.cfg.kp18_format and v == 17:
            from mocodad_tpu.data.json_pose import keypoints17_to_coco18
            window = keypoints17_to_coco18(window[None])[0]
        if self.cfg.headless:
            window = window[:, :14]
        data = np.transpose(window, (2, 0, 1))[:self.cfg.num_coords]

        meta = np.array([scene, clip, person, tr.frames[start]],
                        dtype=np.int64)
        frames = np.asarray(tr.frames[start:start + self.seg_len],
                            dtype=np.int32)
        for trans in range(self.num_transform):
            self._q_data.append(data)
            self._q_trans.append(trans)
            self._q_meta.append(meta)
            self._q_frames.append(frames)

    # -- inference ----------------------------------------------------------

    @property
    def pending(self) -> int:
        return len(self._q_data)

    def flush(self, force: bool = False) -> None:
        """Run inference on pending windows in static-shape batches.

        Launches are pipelined (device refs held, no per-batch host
        fetch).  With force=True a final partial batch is padded to
        batch_size and its padding rows dropped on drain."""
        b = self.batch_size
        while len(self._q_data) >= b or (force and self._q_data):
            n = min(b, len(self._q_data))
            data = np.stack(self._q_data[:n])
            trans = np.asarray(self._q_trans[:n], dtype=np.int32)
            meta = np.stack(self._q_meta[:n])
            frames = np.stack(self._q_frames[:n])
            del self._q_data[:n], self._q_trans[:n]
            del self._q_meta[:n], self._q_frames[:n]
            if n < b:  # pad to the static shape
                pad = b - n
                data = np.concatenate([data, np.repeat(data[-1:], pad, 0)])
                trans = np.concatenate([trans,
                                        np.repeat(trans[-1:], pad, 0)])
            while len(self._pending_dev) >= self.max_pending_batches:
                # device-side backpressure BEFORE launching: block on the
                # OLDEST in-flight batch so launched-but-undrained memory
                # never exceeds max_pending_batches x batch_size windows,
                # even transiently (a drain-after-launch would briefly
                # hold max+1 batches — enough to OOM a deployment sized
                # exactly to the documented bound)
                self._drain_one()
            loss = self._step(self.variables, data, trans, self._rng,
                              self._batch_idx)
            self._batch_idx += 1
            self._pending_dev.append((loss, trans[:n], meta, frames, n))

    def _drain_one(self) -> None:
        loss, trans, meta, frames, n = self._pending_dev.pop(0)
        loss = np.asarray(loss)[:n]   # host fetch = sync on this batch
        for i in range(n):
            key = (int(meta[i, 0]), int(meta[i, 1]))
            r = self._scored[key]
            r['loss'].append(float(loss[i]))
            r['trans'].append(int(trans[i]))
            r['meta'].append(meta[i])
            r['frames'].append(frames[i])

    def _drain(self) -> None:
        while self._pending_dev:
            self._drain_one()

    # -- scoring ------------------------------------------------------------

    def _clip_scores(self, key: Tuple[int, int], n_frames: int,
                     gt: Optional[np.ndarray], smooth: bool,
                     pad_size: Optional[int] = None) -> np.ndarray:
        from mocodad_tpu.eval.harness import clip_frame_scores
        from mocodad_tpu.eval.scoring import score_process

        r = self._scored.get(key)
        if r is None or not r['loss']:
            return np.zeros(n_frames)
        loss = np.asarray(r['loss'])
        trans = np.asarray(r['trans'])
        meta = np.stack(r['meta'])
        frames = np.stack(r['frames'])
        if pad_size is None:
            pad_size = self.cfg.pad_size
        per_view = []
        for transformation in range(self.num_transform):
            c = trans == transformation
            s = clip_frame_scores(loss[c], meta[c], frames[c], n_frames,
                                  gt=gt, pad_size=pad_size)
            if smooth:
                s = score_process(s, self.cfg.frames_shift,
                                  self.cfg.filter_kernel_size)
            per_view.append(s)
        return np.mean(np.stack(per_view, 0), 0)

    def partial_scores(self, scene: int, clip: int, n_frames: int
                       ) -> np.ndarray:
        """Provisional per-frame scores mid-clip (no absence padding or
        smoothing — those are clip-global).  Scores for recent frames
        will still rise as future windows cover them."""
        self.flush(force=True)
        self._drain()
        return self._clip_scores((scene, clip), n_frames, gt=None,
                                 smooth=False, pad_size=-1)

    def finalize_clip(self, scene: int, clip: int, n_frames: int,
                      gt: Optional[np.ndarray] = None) -> np.ndarray:
        """Reference-exact per-frame scores for a finished clip: the full
        offline chain (actor nanmax scatter, optional absence padding,
        mean + log1p amplitude, shift + gaussian smoothing, view
        averaging; ref models/mocodad.py:386-424).  Frees the clip's
        buffers."""
        # pure-config validation first: a doomed call must not pay for
        # (or force) padded partial-batch inference before erroring
        if self.cfg.pad_size != -1 and gt is None:
            raise ValueError('cfg.pad_size != -1: pass the gt mask (the '
                             'reference takes absence intervals from it)')
        self.flush(force=True)
        self._drain()
        scores = self._clip_scores((scene, clip), n_frames, gt=gt,
                                   smooth=True)
        self.drop_clip(scene, clip)
        return scores

    def drop_clip(self, scene: int, clip: int) -> None:
        """Free a clip's buffered windows/scores without scoring it — a
        long-running service must be able to discard a clip whose
        finalization inputs are invalid instead of leaking its state.

        Covers every stage a window can live in: queued host windows
        (not yet flushed), in-flight device batches (drained so their
        results land and this clip's can be discarded), scored results,
        and per-actor track buffers."""
        keep = [i for i, m in enumerate(self._q_meta)
                if not (int(m[0]) == scene and int(m[1]) == clip)]
        if len(keep) != len(self._q_meta):
            self._q_data = [self._q_data[i] for i in keep]
            self._q_trans = [self._q_trans[i] for i in keep]
            self._q_meta = [self._q_meta[i] for i in keep]
            self._q_frames = [self._q_frames[i] for i in keep]
        # draining is a device sync per in-flight batch; skip it when no
        # pending batch contains this clip (each entry carries its meta)
        if self._pending_dev and any(
                bool(np.any((m[:n, 0] == scene) & (m[:n, 1] == clip)))
                for _, _, m, _, n in self._pending_dev):
            self._drain()
        self._scored.pop((scene, clip), None)
        for key in [k for k in self._tracks
                    if k[0] == scene and k[1] == clip]:
            del self._tracks[key]
