"""Measure the streaming scorer's on-chip latency/throughput
(mocodad_tpu/serve.py) at the reference test sampling settings
(50 samples x 9 DDPM steps, 5 affine views per window).

Reports:
  * steady-state scored windows/s (windows x views folded into static
    batches of `--batch`);
  * per-flush latency (one padded batch submitted + drained) — the
    latency floor a flush_every-sized micro-batch pays.

MOCODAD_SERVE_PROFILE=fast measures the same numbers under
`eval_profile: fast` (the serve CLI's --eval-profile fast): the S cap
cuts the per-flush compute ~5x, which is the serving tier's latency
lever, not just a throughput one.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import numpy as np

from _harness import flagship_config

BATCH = 256
N_ACTORS = 4
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))


def main():
    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache(os.environ['JAX_COMPILATION_CACHE_DIR'])
    from mocodad_tpu.data import scalers as S
    from mocodad_tpu.models import build_model
    from mocodad_tpu.serve import StreamScorer

    tmp = '/tmp/serve_probe'
    os.makedirs(tmp, exist_ok=True)
    cfg = flagship_config(batch_size=BATCH, num_transform=5,
                          ckpt_dir=tmp, vid_res=[640, 360], pad_size=-1,
                          frames_shift=2, filter_kernel_size=5,
                          use_hr=False)
    cfg.extras['eval_dtype'] = 'bfloat16'
    cfg.extras['fast_eval'] = True
    profile = os.environ.get('MOCODAD_SERVE_PROFILE')
    if profile:
        from mocodad_tpu.config import apply_eval_profile
        apply_eval_profile(cfg, profile)
        print(f'eval profile: {profile}', flush=True)

    rs = np.random.RandomState(0)
    _, scaler = S.scale_trajectories(
        rs.uniform(-0.5, 0.5, size=(4096, 34)), strategy='robust')
    S.save_scaler(scaler, os.path.join(tmp, 'local_robust.npz'))

    model = build_model(cfg)
    variables = jax.device_get(model.init_variables(jax.random.key(0)))
    scorer = StreamScorer(cfg, variables=variables, batch_size=BATCH)

    def feed(n_frames, base):
        for f in range(n_frames):
            for p in range(N_ACTORS):
                kp = rs.uniform(100, 400, size=(17, 2)).astype(np.float32)
                scorer.push(0, 0, p, base + f + 1, kp)

    # warmup: compile the step
    feed(cfg.seg_len + BATCH // (5 * N_ACTORS) + 2, 0)
    t0 = time.perf_counter()
    scorer.flush(force=True)
    scorer._drain()
    print(f'compile+first flush: {time.perf_counter() - t0:.1f}s',
          flush=True)

    # steady-state throughput: feed enough frames for ~16 batches
    want = 16 * BATCH          # windows x views
    frames = want // (5 * N_ACTORS) + cfg.seg_len
    warmed = len(scorer._scored[(0, 0)]['loss'])  # exclude warmup windows
    t0 = time.perf_counter()
    feed(frames, 10_000)
    scorer.flush(force=True)
    scorer._drain()
    dt = time.perf_counter() - t0
    n = len(scorer._scored[(0, 0)]['loss']) - warmed
    print(f'steady-state: {n} window-views in {dt:.2f}s = {n / dt:.0f} '
          f'scored/s ({n / 5 / dt:.0f} windows/s incl. 5 views)',
          flush=True)

    # per-flush latency: exactly one batch pending
    lat = []
    for r in range(5):
        feed(BATCH // (5 * N_ACTORS), 20_000 + 100 * r)
        t0 = time.perf_counter()
        scorer.flush(force=True)
        scorer._drain()
        lat.append(time.perf_counter() - t0)
    lat = sorted(lat)
    print(f'per-flush latency (batch {BATCH}): p50 {lat[2]*1e3:.0f} ms, '
          f'min {lat[0]*1e3:.0f} ms, max {lat[-1]*1e3:.0f} ms', flush=True)

    # clip finalization cost (host-side scoring chain)
    t0 = time.perf_counter()
    scores = scorer.finalize_clip(0, 0, n_frames=30_000)
    print(f'finalize_clip over {len(scorer._scored) or "all"} windows: '
          f'{(time.perf_counter() - t0)*1e3:.0f} ms '
          f'(scores finite: {np.isfinite(scores).all()})', flush=True)

    # sustained overload: push as fast as the host can (>> device drain
    # rate) with auto-flush + a tight in-flight bound.  Per-push latency
    # is bimodal — ~us for buffered pushes, ~flush time when the push
    # triggers a batch whose dispatch must first drain the oldest
    # in-flight batch (serve.py backpressure) — so report p50/p99/max
    # and the measured memory bounds.
    scorer2 = StreamScorer(cfg, variables=variables, batch_size=BATCH,
                           flush_every=BATCH, max_pending_batches=2)
    lat, max_inflight, max_queue = [], 0, 0
    frames_n = (6 * BATCH) // (5 * N_ACTORS) + cfg.seg_len
    for f in range(frames_n):
        for p in range(N_ACTORS):
            kp = rs.uniform(100, 400, size=(17, 2)).astype(np.float32)
            t0 = time.perf_counter()
            scorer2.push(0, 1, p, f + 1, kp)
            lat.append(time.perf_counter() - t0)
            max_inflight = max(max_inflight, len(scorer2._pending_dev))
            max_queue = max(max_queue, scorer2.pending)
    lat = np.sort(np.asarray(lat))
    print(f'sustained overload ({len(lat)} pushes, flush_every={BATCH}, '
          f'max_pending_batches=2): per-push p50 '
          f'{lat[len(lat)//2]*1e6:.0f} us, p99 '
          f'{lat[int(len(lat)*0.99)]*1e3:.1f} ms, max '
          f'{lat[-1]*1e3:.0f} ms; bounds held: in-flight {max_inflight} '
          f'batches (<=2), host queue {max_queue} windows '
          f'(<{BATCH + 5})', flush=True)
    scorer2.drop_clip(0, 1)


if __name__ == '__main__':
    main()
