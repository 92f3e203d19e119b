"""Streaming scorer (mocodad_tpu/serve.py): online == offline parity.

The production claim is that streamed windows and clip scores are exactly
what the offline batch pipeline produces for the same pose tracks — so
these tests pin (a) window tensors/meta/frames bit-equal to
data/robust.robust_pose_windows via build_dataset, (b) the finalize_clip
score chain equal to eval/harness.post_processing per clip, and (c) the
jitted micro-batch inference path end-to-end on tiny shapes.
"""

import os

import numpy as np
import pytest

from mocodad_tpu.config import Config
from mocodad_tpu.data import build_dataset, synthetic
from mocodad_tpu.data import trajectories as T
from mocodad_tpu.eval.harness import post_processing
from mocodad_tpu.serve import StreamScorer


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp('serve_data')
    synthetic.generate(str(d), seed=5, n_clips_per_split=2, n_actors=2,
                       n_frames=48)
    return str(d)


def _cfg(synth, tmp_path, **kw):
    base = dict(
        split='train', data_dir=synth, exp_dir=str(tmp_path),
        ckpt_dir=str(tmp_path), dataset_choice='UBnormal', seg_len=6,
        conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
        conditioning_architecture='AE', channels=[8, 4, 8],
        embedding_dim=8, h_dim=8, latent_dim=8, dropout=0.0,
        noise_steps=5, opt_lr=1e-3, batch_size=64, num_coords=2,
        num_transform=2, seg_stride=1, n_generated_samples=2,
        aggregation_strategy='best', model_return_value='loss',
        vid_res=[640, 360], normalization_strategy='robust',
        use_hr=False, validation=False, seed=7,
        filter_kernel_size=4, frames_shift=3, pad_size=-1,
        test_path=os.path.join(synth, 'testing', 'test_frame_mask'),
        gt_path=os.path.join(synth, 'testing', 'test_frame_mask'))
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope='module')
def fitted(synth, tmp_path_factory):
    """Train-split build persists the local robust scaler artifact the
    scorer loads (the offline CLI flow does the same)."""
    tmp = tmp_path_factory.mktemp('serve_ckpt')
    cfg = _cfg(synth, tmp)
    build_dataset(cfg, 'train')
    return cfg


def _stream_test_split(scorer, synth):
    """Push the test split's raw CSV tracks in the offline loader's
    trajectory order; returns the per-clip frame counts from the gt."""
    path = os.path.join(synth, 'testing', 'trajectories')
    trajs = T.load_trajectories(path, split='test')
    for t in trajs.values():
        scene, clip = map(int, t.trajectory_id.split('_')[0].split('-'))
        person = int(t.person_id)
        for i in range(len(t)):
            scorer.push(scene, clip, person, int(t.frames[i]),
                        t.coordinates[i].reshape(-1, 2))


def test_streamed_windows_equal_offline(synth, fitted):
    cfg = fitted
    ds = build_dataset(cfg, 'test')

    scorer = StreamScorer(cfg, variables=_init_vars(cfg), batch_size=32)
    _stream_test_split(scorer, synth)

    # queued entries replicate each window per view; take view 0
    sel = [i for i, tr in enumerate(scorer._q_trans) if tr == 0]
    got = np.stack([scorer._q_data[i] for i in sel])
    meta = np.stack([scorer._q_meta[i] for i in sel])
    frames = np.stack([scorer._q_frames[i] for i in sel])

    assert got.shape == ds.data.shape
    np.testing.assert_array_equal(meta, ds.meta)
    np.testing.assert_array_equal(frames, ds.frames)
    np.testing.assert_array_equal(got, ds.data)
    # every view is enqueued per window
    assert len(scorer._q_data) == ds.data.shape[0] * cfg.num_transform


def _init_vars(cfg):
    import jax
    from mocodad_tpu.models import build_model
    model = build_model(cfg)
    return model.init_variables(jax.random.key(0))


def test_finalize_matches_post_processing(synth, fitted):
    """Inject identical fabricated window losses into the scorer and the
    offline chain; per-clip finalized scores must match post_processing's
    concatenated scores exactly."""
    cfg = fitted
    ds = build_dataset(cfg, 'test')
    n = ds.num_samples
    rng = np.random.default_rng(0)
    # offline layout: all windows under view 0, then view 1 (loader's
    # virtual index space); same loss for a window under both views would
    # hide transform handling, so draw independent ones
    losses = rng.gamma(2.0, 1.0, size=n * cfg.num_transform)
    trans = np.repeat(np.arange(cfg.num_transform), n).astype(np.int64)
    meta = np.concatenate([ds.meta] * cfg.num_transform)
    frames = np.concatenate([ds.frames] * cfg.num_transform)

    auc, pds, gt = post_processing(
        losses, trans, meta, frames, gt_path=cfg.gt_path,
        num_transform=cfg.num_transform, dataset_name=cfg.dataset_choice,
        split='test', use_hr=False, pad_size=-1,
        filter_kernel_size=cfg.filter_kernel_size,
        frames_shift=cfg.frames_shift, return_scores=True)

    scorer = StreamScorer(cfg, variables=_init_vars(cfg), batch_size=32)
    # bypass inference: inject the same losses into the scored store
    for i in range(losses.shape[0]):
        key = (int(meta[i, 0]), int(meta[i, 1]))
        r = scorer._scored[key]
        r['loss'].append(float(losses[i]))
        r['trans'].append(int(trans[i]))
        r['meta'].append(meta[i])
        r['frames'].append(frames[i])

    gts = sorted(f for f in os.listdir(cfg.gt_path) if f.endswith('.npy'))
    chunks = []
    for f in gts:
        scene, clip = int(f.split('_')[0]), int(f.split('_')[1][:-4])
        n_frames = np.load(os.path.join(cfg.gt_path, f)).shape[0]
        chunks.append(scorer.finalize_clip(scene, clip, n_frames))
    np.testing.assert_allclose(np.concatenate(chunks), pds, rtol=0, atol=0)


def test_stream_inference_end_to_end(synth, fitted):
    """Real jitted micro-batched inference over streamed tracks: every
    window×view gets a finite loss, partial/final scores have the right
    shape, buffers are freed on finalize."""
    cfg = fitted
    scorer = StreamScorer(cfg, variables=_init_vars(cfg), batch_size=16,
                          flush_every=16)
    _stream_test_split(scorer, synth)
    ds = build_dataset(cfg, 'test')
    total = ds.data.shape[0] * cfg.num_transform

    # (1, 1) is a real streamed clip — synthetic scenes/clips are
    # 1-indexed; an unknown key would return all-zeros vacuously
    partial = scorer.partial_scores(1, 1, n_frames=48)
    assert partial.shape == (48,) and np.isfinite(partial).all()
    assert partial.max() > 0, 'partial scores came from an unknown clip key'
    # partial_scores force-flushed everything: every streamed window x view
    # must be scored exactly once
    scored = sum(len(r['loss']) for r in scorer._scored.values())
    assert scored == total, f'{scored} scored vs {total} streamed'

    gts = sorted(f for f in os.listdir(cfg.gt_path) if f.endswith('.npy'))
    seen = 0
    for f in gts:
        scene, clip = int(f.split('_')[0]), int(f.split('_')[1][:-4])
        scores = scorer.finalize_clip(scene, clip, n_frames=48)
        assert scores.shape == (48,)
        assert np.isfinite(scores).all()
        assert (scores >= 0).all()
        seen += 1
    assert seen == 2
    assert scorer.pending == 0
    assert not scorer._scored and not scorer._tracks


def test_guardrails(synth, fitted):
    cfg6 = _cfg(synth, fitted.ckpt_dir, num_coords=6)
    with pytest.raises(NotImplementedError):
        StreamScorer(cfg6, variables=None)

    # pad_size != -1 needs the gt mask at finalize (absence intervals);
    # the pure-config check must fire BEFORE any flush/drain, so a
    # doomed call with pending windows pays no inference
    cfg_pad = _cfg(synth, fitted.ckpt_dir, pad_size=2)
    s2 = StreamScorer(cfg_pad, variables=_init_vars(cfg_pad), batch_size=8)
    rs = np.random.default_rng(3)
    for f in range(cfg_pad.seg_len):
        s2.push(0, 0, 1, f + 1,
                rs.uniform(100, 300, (17, 2)).astype(np.float32))
    pend = s2.pending
    assert pend > 0
    with pytest.raises(ValueError):
        s2.finalize_clip(0, 0, n_frames=10)
    assert s2.pending == pend, 'doomed finalize paid for inference'

    # sizing knobs validate at construction, not deep inside flush()
    cfg = _cfg(synth, fitted.ckpt_dir)
    with pytest.raises(ValueError):
        StreamScorer(cfg, variables=_init_vars(cfg), batch_size=0)
    with pytest.raises(ValueError):
        StreamScorer(cfg, variables=_init_vars(cfg), batch_size=8,
                     flush_every=0)

    # the offline old_aug path (num_transform < 1 = random temporal
    # crops at test time) has no streaming equivalent — refuse, don't
    # silently score the identity view
    cfg0 = _cfg(synth, fitted.ckpt_dir, num_transform=0)
    with pytest.raises(NotImplementedError):
        StreamScorer(cfg0, variables=None)

    # the latent variant's pretrain stage has no per-window loss
    cfg_lat = _cfg(synth, fitted.ckpt_dir, diffusion_on_latent=True,
                   stage='pretrain')
    with pytest.raises(NotImplementedError):
        StreamScorer(cfg_lat, variables=None)


def test_drop_clip_skips_drain_for_unrelated_batches(synth, fitted):
    """drop_clip must not synchronously drain in-flight device batches
    that cannot contain the dropped clip — each pending entry carries
    its meta, so membership is checkable host-side."""
    cfg = _cfg(synth, fitted.ckpt_dir)
    scorer = StreamScorer(cfg, variables=_init_vars(cfg), batch_size=4)
    rs = np.random.default_rng(1)
    for f in range(cfg.seg_len + 1):
        scorer.push(0, 5, 1, f + 1,
                    rs.uniform(100, 300, (17, 2)).astype(np.float32))
    scorer.flush(force=True)
    assert scorer._pending_dev, 'expected an in-flight batch'
    n_inflight = len(scorer._pending_dev)
    scorer.drop_clip(0, 6)            # unrelated clip: no drain
    assert len(scorer._pending_dev) == n_inflight
    scorer.drop_clip(0, 5)            # the clip in flight: must drain
    assert not scorer._pending_dev
    assert (0, 5) not in scorer._scored


def test_drop_clip_frees_state(synth, fitted):
    """A clip whose finalization inputs are invalid can be discarded
    without scoring (the serve CLI uses this when the gt mask for absence
    padding is unavailable) — no state may leak at ANY stage: queued
    host windows (the CLI calls drop_clip without flushing first),
    in-flight device batches, scored results, track buffers."""
    cfg = _cfg(synth, fitted.ckpt_dir)
    scorer = StreamScorer(cfg, variables=_init_vars(cfg), batch_size=8)
    rs = np.random.default_rng(0)
    for f in range(cfg.seg_len + 2):
        scorer.push(0, 0, 1, f + 1,
                    rs.uniform(100, 300, (17, 2)).astype(np.float32))
        scorer.push(0, 1, 1, f + 1,
                    rs.uniform(100, 300, (17, 2)).astype(np.float32))
    assert scorer.pending > 0           # windows still queued, NOT flushed
    scorer.drop_clip(0, 0)
    assert all(k[:2] != (0, 0) for k in scorer._tracks)
    assert (0, 0) not in scorer._scored
    assert all(not (int(m[0]) == 0 and int(m[1]) == 0)
               for m in scorer._q_meta), 'queued windows leaked'
    # the other clip is untouched and still finalizes; the dropped clip's
    # windows must not reappear in _scored via a later flush
    scores = scorer.finalize_clip(0, 1, n_frames=cfg.seg_len + 2)
    assert np.isfinite(scores).all()
    assert (0, 0) not in scorer._scored and not scorer._tracks


def test_push_rejects_wrong_arity_keypoints(synth, fitted):
    """One bad pose must raise at push (the CLI skips it) and must NOT
    poison the actor's ring buffer — subsequent valid poses still emit
    windows."""
    cfg = _cfg(synth, fitted.ckpt_dir)
    scorer = StreamScorer(cfg, variables=_init_vars(cfg), batch_size=8)
    rs = np.random.default_rng(0)
    for f in range(3):
        scorer.push(0, 0, 1, f + 1,
                    rs.uniform(100, 300, (17, 2)).astype(np.float32))
    with pytest.raises(ValueError):
        scorer.push(0, 0, 1, 4, np.zeros((0,), np.float32))
    with pytest.raises(ValueError):
        scorer.push(0, 0, 1, 4, np.zeros((17, 3), np.float32))
    # frames are 1-indexed (reference CSV contract): frame 0 would wrap
    # the scoring scatter to the LAST column and silently corrupt it
    with pytest.raises(ValueError):
        scorer.push(0, 0, 1, 0,
                    np.full((17, 2), 150.0, np.float32))
    for f in range(3, cfg.seg_len + 2):
        scorer.push(0, 0, 1, f + 1,
                    rs.uniform(100, 300, (17, 2)).astype(np.float32))
    assert scorer.pending > 0           # windows emitted despite bad pushes


def test_all_aggregation_rejected(synth, fitted):
    cfg = _cfg(synth, fitted.ckpt_dir, aggregation_strategy='all')
    with pytest.raises(ValueError):
        StreamScorer(cfg, variables=None)


def test_overload_backpressure_bounds_inflight_batches(synth, fitted):
    """Sustained push rate > drain rate: launched-but-undrained batches
    never exceed max_pending_batches (flush drains the oldest beyond the
    bound), and every window is still scored exactly once."""
    cfg = fitted
    scorer = StreamScorer(cfg, variables=_init_vars(cfg), batch_size=8,
                          flush_every=8, max_pending_batches=2)
    rs = np.random.RandomState(3)
    max_seen = 0
    n_pushes = 0
    for frame in range(1, 60):
        for person in range(2):
            scorer.push(1, 1, person, frame,
                        rs.rand(17, 2).astype(np.float32) * 100 + 10)
            n_pushes += 1
            max_seen = max(max_seen, len(scorer._pending_dev))
    assert max_seen <= 2, \
        f'{max_seen} in-flight batches despite max_pending_batches=2'
    # every completed window (2 actors x 54 windows x 2 views) is scored
    scores = scorer.finalize_clip(1, 1, n_frames=60)
    assert scores.shape == (60,) and np.all(np.isfinite(scores))
    assert not scorer._pending_dev and not scorer._q_data


def test_inflight_bound_holds_at_launch_time(synth, fitted):
    """The max_pending_batches bound must hold AT LAUNCH TIME (the drain
    happens before _step, never after): a drain-after-launch would
    transiently hold max+1 in-flight batches — enough to OOM a
    deployment sized exactly to the documented bound — while looking
    fine to any check that only runs between pushes."""
    cfg = fitted
    scorer = StreamScorer(cfg, variables=_init_vars(cfg), batch_size=8,
                          flush_every=8, max_pending_batches=2)
    at_launch = []
    orig_step = scorer._step

    def spy(*a, **k):
        at_launch.append(len(scorer._pending_dev))
        return orig_step(*a, **k)

    scorer._step = spy
    rs = np.random.RandomState(6)
    for frame in range(1, 40):
        for person in range(2):
            scorer.push(1, 1, person, frame,
                        rs.rand(17, 2).astype(np.float32) * 100 + 10)
    assert at_launch and max(at_launch) <= 1, \
        f'launched with {max(at_launch)} batches already in flight ' \
        '(bound is 2 AFTER the new launch)'
    scores = scorer.finalize_clip(1, 1, n_frames=40)
    assert np.all(np.isfinite(scores))


def test_warmup_frames_always_accepted_under_overload(synth, fitted):
    """Pushes that enqueue nothing (a track still shorter than seg_len)
    cost no queue space and must never be refused, even with the
    pending-window queue pinned at the cap; the track's first
    window-emitting push is then subject to the normal refusal."""
    from mocodad_tpu.serve import OverloadError

    cfg = fitted   # seg_len=6, num_transform=2
    scorer = StreamScorer(cfg, variables=_init_vars(cfg), batch_size=32,
                          max_queue_windows=2)
    rs = np.random.RandomState(7)

    def push(person, frame):
        scorer.push(1, 1, person, frame,
                    rs.rand(17, 2).astype(np.float32) * 100 + 10)

    for frame in range(1, 7):   # actor 0 emits its first window at f6
        push(0, frame)
    assert scorer.pending == 2  # queue exactly at the cap
    with pytest.raises(OverloadError):
        push(0, 7)              # would enqueue -> refused
    for frame in range(1, 6):   # 5 warm-up frames of a NEW actor
        push(9, frame)          # enqueue nothing -> always accepted
    assert scorer.pending == 2
    assert len(scorer._tracks[(1, 1, 9)].frames) == 5
    with pytest.raises(OverloadError):
        push(9, 6)              # its first window-emitting push refuses


def test_overload_refusal_is_deterministic_and_recoverable(synth, fitted):
    """With a host-queue cap below the batch size, push refuses with
    OverloadError exactly at the documented threshold, records nothing
    for the refused pose, and the scorer keeps working after a forced
    flush."""
    from mocodad_tpu.serve import OverloadError

    cfg = fitted   # num_transform=2 -> each window enqueues 2 views
    scorer = StreamScorer(cfg, variables=_init_vars(cfg), batch_size=32,
                          max_queue_windows=6)
    rs = np.random.RandomState(4)

    def push_frame(frame):
        scorer.push(1, 1, 0, frame,
                    rs.rand(17, 2).astype(np.float32) * 100 + 10)

    # frames 1..5 fill the ring buffer; each further frame emits one
    # window (2 views).  Cap 6 => windows at frames 6,7,8 fit (queue
    # 2/4/6), frame 9 must refuse: 6 + 2 > 6 and no full batch to flush.
    for frame in range(1, 9):
        push_frame(frame)
    assert scorer.pending == 6
    state_before = (len(scorer._tracks[(1, 1, 0)].frames), scorer.pending)
    with pytest.raises(OverloadError, match='max_queue_windows=6'):
        push_frame(9)
    # the refused pose mutated nothing: ring buffer and queue unchanged
    assert (len(scorer._tracks[(1, 1, 0)].frames),
            scorer.pending) == state_before

    # recovery: a forced flush drains the queue; the same push succeeds
    scorer.flush(force=True)
    assert scorer.pending == 0
    push_frame(9)
    assert scorer.pending == 2
    scores = scorer.finalize_clip(1, 1, n_frames=12)
    assert scores.shape == (12,) and np.all(np.isfinite(scores))


@pytest.mark.parametrize('joint_kw, n_joints', [
    (dict(kp18_format=True), 18),
    (dict(headless=True), 14),
])
def test_streamed_kp18_headless_windows_and_scores(synth, fitted, tmp_path,
                                                   joint_kw, n_joints):
    """The serve-side joint remap branch (serve.py _enqueue_window: scale
    17-joint coords, then kp18 COCO-18 conversion / headless slice —
    the same order as the offline robust path) end-to-end: streamed
    windows bit-equal to build_dataset, and finalize_clip runs the
    n_joints != 17 model through inference to finite scores."""
    import pathlib
    cfg = _cfg(synth, pathlib.Path(fitted.ckpt_dir), **joint_kw)
    ds = build_dataset(cfg, 'test')
    assert ds.data.shape[1:] == (2, 6, n_joints)

    scorer = StreamScorer(cfg, variables=_init_vars(cfg), batch_size=32)
    _stream_test_split(scorer, synth)

    sel = [i for i, tr in enumerate(scorer._q_trans) if tr == 0]
    got = np.stack([scorer._q_data[i] for i in sel])
    assert got.shape == ds.data.shape
    np.testing.assert_array_equal(got, ds.data)

    key = (int(ds.meta[0, 0]), int(ds.meta[0, 1]))
    n_frames = int(ds.frames[ds.meta[:, 1] == key[1]].max()) + 1
    scores = scorer.finalize_clip(key[0], key[1], n_frames)
    assert scores.shape == (n_frames,)
    assert np.isfinite(scores).all() and scores.max() > 0
