"""Streaming anomaly-scoring service CLI.

Reads a JSON-lines pose stream on stdin and emits per-frame anomaly
scores per clip on stdout — the online counterpart of eval_MoCoDAD.py
(the reference has no serving story; this consumes the same YAML config
and checkpoint artifacts).  Protocol (one JSON object per line):

  in:  {"type": "pose", "scene": 0, "clip": 1, "person": 2,
        "frame": 17, "keypoints": [[x, y], ... V entries ...]}
  in:  {"type": "end_clip", "scene": 0, "clip": 1, "n_frames": 60}
  out: {"type": "scores", "scene": 0, "clip": 1, "scores": [...]}
  out: {"type": "error", "error": "overloaded", "scene": 0, "clip": 1,
        "person": 2, "frame": 17, "detail": "..."}

An "overloaded" error line means the scorer refused that pose at
ingestion (host queue at --max-queue-windows); the pose was NOT
recorded.  Producers should retry the identical (frame, keypoints)
after clips drain to keep streamed windows offline-equal — shedding it
permanently changes that track's windows (mocodad_tpu/serve.py
OverloadError).  The service keeps running either way.

Scores follow the exact offline chain (mocodad_tpu/serve.py); when the
config sets pad_size != -1 the gt mask is read from cfg.gt_path like the
offline scorer (the reference derives absence intervals from it,
utils/eval_utils.py:133-149).
"""

import argparse
import json
import os
import sys


def serve(cfg, fin, fout, batch_size: int, flush_every,
          max_queue_windows=None):
    import numpy as np

    from mocodad_tpu.serve import OverloadError, StreamScorer

    scorer = StreamScorer(cfg, batch_size=batch_size,
                          flush_every=flush_every,
                          max_queue_windows=max_queue_windows)
    for line in fin:
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
            if not isinstance(msg, dict):
                raise ValueError('message must be a JSON object')
        except ValueError as e:
            # a long-running service must survive malformed input lines
            print(f'skipping malformed line ({e}): {line[:120]}',
                  file=sys.stderr)
            continue
        kind = msg.get('type')
        if kind == 'pose':
            # field extraction is part of the same survivability contract
            # as JSON parsing: missing keys, non-numeric ids, or ragged
            # keypoints must not kill the service
            try:
                scorer.push(int(msg['scene']), int(msg['clip']),
                            int(msg['person']), int(msg['frame']),
                            np.asarray(msg['keypoints'], dtype=np.float32))
            except OverloadError as e:
                # the documented ingestion-side refusal
                # (mocodad_tpu/serve.py OverloadError) must surface at the
                # protocol level, not kill the long-running service: emit
                # an error line so the producer can shed/retry this exact
                # (frame, keypoints) — retrying it preserves offline
                # parity, dropping it permanently alters the track's
                # windows (serve.py OverloadError docstring)
                fout.write(json.dumps({
                    'type': 'error', 'error': 'overloaded',
                    'scene': msg.get('scene'), 'clip': msg.get('clip'),
                    'person': msg.get('person'), 'frame': msg.get('frame'),
                    'detail': str(e)}) + '\n')
                fout.flush()
            except (KeyError, TypeError, ValueError) as e:
                print(f'skipping malformed pose message ({e}): {line[:120]}',
                      file=sys.stderr)
        elif kind == 'end_clip':
            try:
                scene, clip = int(msg['scene']), int(msg['clip'])
                n_frames = int(msg['n_frames'])
            except (KeyError, TypeError, ValueError) as e:
                print(f'skipping malformed end_clip message ({e}): '
                      f'{line[:120]}', file=sys.stderr)
                continue
            gt = None
            if cfg.pad_size != -1:
                # a missing/corrupt mask fails this one clip, not the
                # service (finalize_clip requires the mask when absence
                # padding is configured)
                try:
                    gt = np.load(os.path.join(cfg.gt_path,
                                              f'{scene}_{clip}.npy'))
                except (OSError, ValueError) as e:
                    print(f'cannot load gt mask for clip {scene}_{clip}: '
                          f'{e}', file=sys.stderr)
                    scorer.drop_clip(scene, clip)
                    fout.write(json.dumps({
                        'type': 'error', 'scene': scene, 'clip': clip,
                        'error': 'gt mask unavailable for absence '
                                 'padding'}) + '\n')
                    fout.flush()
                    continue
            scores = scorer.finalize_clip(scene, clip, n_frames, gt=gt)
            fout.write(json.dumps({
                'type': 'scores', 'scene': scene, 'clip': clip,
                'scores': [round(float(s), 6) for s in scores]}) + '\n')
            fout.flush()
        else:
            print(f'ignoring unknown message type {kind!r}',
                  file=sys.stderr)


def main():
    parser = argparse.ArgumentParser(description='MoCoDAD streaming scorer')
    parser.add_argument('-c', '--config', type=str, required=True)
    parser.add_argument('--batch-size', type=int, default=256,
                        help='static micro-batch (windows x views)')
    parser.add_argument('--flush-every', type=int, default=None,
                        help='auto-run inference once this many windows '
                             'are pending (default: only at end_clip)')
    parser.add_argument('--max-queue-windows', type=int, default=None,
                        help='host-side pending queue cap in window x view '
                             'entries (default: 64 x batch-size); pushes '
                             'beyond it are refused with an "overloaded" '
                             'error line instead of growing memory')
    from mocodad_tpu.config import (add_eval_profile_arg,
                                    apply_eval_profile, load_config)
    add_eval_profile_arg(parser)
    cli = parser.parse_args()

    if (cli.max_queue_windows is not None
            and cli.max_queue_windows < cli.batch_size):
        # a cap below the static batch means a plain flush() can never
        # drain the queue (it only runs full batches), so sustained input
        # would refuse every window past the cap — a sizing error, not a
        # load condition; fail at startup with the fix spelled out
        parser.error(
            f'--max-queue-windows ({cli.max_queue_windows}) must be >= '
            f'--batch-size ({cli.batch_size}): a cap below the static '
            'batch can never fill a batch, so every push past the cap '
            'would be refused')

    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    cfg = load_config(cli.config)
    apply_eval_profile(cfg, cli.eval_profile)
    serve(cfg, sys.stdin, sys.stdout, cli.batch_size, cli.flush_every,
          max_queue_windows=cli.max_queue_windows)


if __name__ == '__main__':
    main()
