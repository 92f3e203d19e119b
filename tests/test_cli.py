"""CLI subprocess smoke tests: run the three entry points end-to-end on a
tiny synthetic dataset (ref counterparts train/eval/predict_MoCoDAD.py) and
assert the artifact + replay contracts:

  * train writes config.yaml copy, last/best checkpoints, scaler npz;
  * predict writes the 5-tensor saved_tensors_{split}_{aggr}_{n}/ cache;
  * eval --load_tensors replay reproduces the direct eval AUC exactly.
"""

import os
import re
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _run(args, cwd=REPO):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PYTHONPATH', None)
    out = subprocess.run([sys.executable, '-u'] + args, cwd=cwd, env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, f'{args} failed:\n{out.stdout}\n{out.stderr}'
    return out.stdout


def _auc(stdout: str) -> float:
    m = re.search(r'AUC score: ([0-9.]+)', stdout)
    assert m, f'no AUC in output:\n{stdout}'
    return float(m.group(1))


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp('cli')
    data = root / 'data'
    from mocodad_tpu.data.synthetic import generate
    generate(str(data), seed=0, n_clips_per_split=2, n_actors=2, n_frames=60)

    base = dict(
        split='train', debug=False, seed=3, validation=False, use_hr=False,
        accelerator='cpu', devices=[0],
        dir_name='cli_smoke', data_dir=str(data) + '/',
        exp_dir=str(root / 'checkpoints'),
        test_path=str(data / 'testing' / 'test_frame_mask'),
        load_ckpt='', create_experiment_dir=True,
        use_wandb=False, use_ema=False,
        embedding_dim=8, dropout=0.0,
        conditioning_strategy='inject', conditioning_architecture='AE',
        conditioning_indices=[0, 1, 2], h_dim=8, latent_dim=8,
        channels=[8, 4, 8],
        noise_steps=5, n_epochs=1, opt_lr=1e-3,
        loss_fn='smooth_l1', rec_weight=0.01,
        n_generated_samples=2, model_return_value='loss',
        aggregation_strategy='best', filter_kernel_size=5, frames_shift=2,
        save_tensors=False, load_tensors=False,
        dataset_choice='UBnormal', seg_len=6, vid_res=[640, 360],
        batch_size=128, pad_size=-1,
        headless=False, hip_center=False, kp18_format=False,
        normalization_strategy='robust', num_coords=2, num_transform=2,
        num_workers=0, seg_stride=1, seg_th=0, start_offset=0,
        symm_range=True, use_fitted_scaler=False)

    train_yaml = root / 'train.yaml'
    train_yaml.write_text(yaml.safe_dump(base))
    test_cfg = dict(base, split='test', load_ckpt='best_weights.ckpt')
    test_yaml = root / 'test.yaml'
    test_yaml.write_text(yaml.safe_dump(test_cfg))

    _run(['train_MoCoDAD.py', '--config', str(train_yaml)])
    ckpt_dir = root / 'checkpoints' / 'UBnormal' / 'cli_smoke'
    return dict(root=root, ckpt_dir=ckpt_dir, test_yaml=test_yaml,
                test_cfg=test_cfg)


def test_train_cli_artifacts(workspace):
    ckpt_dir = workspace['ckpt_dir']
    for name in ('config.yaml', 'last.ckpt', 'best_weights.ckpt',
                 'metrics.csv', 'topk.json', 'local_robust.npz'):
        assert (ckpt_dir / name).exists(), f'missing artifact {name}'
    # the config copy must round-trip through the loader
    copied = yaml.safe_load((ckpt_dir / 'config.yaml').read_text())
    assert copied['conditioning_strategy'] == 'inject'


def test_predict_then_replay_matches_direct_eval(workspace):
    ckpt_dir = workspace['ckpt_dir']
    test_yaml = str(workspace['test_yaml'])

    _run(['predict_MoCoDAD.py', '--config', test_yaml])
    tensors_dir = ckpt_dir / 'saved_tensors_test_best_2'
    for name in ('prediction', 'gt_data', 'trans', 'metadata', 'frames'):
        assert any(f.startswith(name) for f in os.listdir(tensors_dir)), \
            f'missing saved tensor {name}'

    direct = _auc(_run(['eval_MoCoDAD.py', '--config', test_yaml]))

    replay_cfg = dict(workspace['test_cfg'], load_tensors=True)
    replay_yaml = workspace['root'] / 'replay.yaml'
    replay_yaml.write_text(yaml.safe_dump(replay_cfg))
    replay = _auc(_run(['eval_MoCoDAD.py', '--config', str(replay_yaml),
                        '--report']))

    assert abs(direct - replay) < 1e-9, (direct, replay)
    assert 0.0 <= direct <= 1.0
    # --report writes the self-contained score-analysis page
    report = ckpt_dir / 'report_test.html'
    assert report.exists() and 'base64' in report.read_text()[:200000]


def test_eval_profile_cli_flag(workspace):
    """`--eval-profile fast` on the eval/predict CLIs: the capped sample
    count drives the run AND names the saved_tensors_* cache, a replay of
    that cache under the same profile reproduces the AUC exactly, and
    `--eval-profile full` on a fast-profile config restores the
    unmodified protocol (cache dir named by the full count)."""
    root = workspace['root']
    ckpt_dir = workspace['ckpt_dir']

    # cap below the configured n_generated_samples=2 so the profile is
    # observable (effective S=1)
    fast_cfg = dict(workspace['test_cfg'], fast_profile_samples=1)
    fast_yaml = root / 'fast.yaml'
    fast_yaml.write_text(yaml.safe_dump(fast_cfg))

    _run(['predict_MoCoDAD.py', '--config', str(fast_yaml),
          '--eval-profile', 'fast'])
    assert (ckpt_dir / 'saved_tensors_test_best_1').exists()

    direct = _auc(_run(['eval_MoCoDAD.py', '--config', str(fast_yaml),
                        '--eval-profile', 'fast']))

    replay_cfg = dict(fast_cfg, load_tensors=True, eval_profile='fast')
    replay_yaml = root / 'replay_fast.yaml'
    replay_yaml.write_text(yaml.safe_dump(replay_cfg))
    replay = _auc(_run(['eval_MoCoDAD.py', '--config', str(replay_yaml)]))
    assert abs(direct - replay) < 1e-9, (direct, replay)

    # --eval-profile full strips a config-set profile: the replay falls
    # back to the full-count cache (written by the predict test when the
    # whole module runs; created here when this test runs alone)
    if not (ckpt_dir / 'saved_tensors_test_best_2').exists():
        _run(['predict_MoCoDAD.py', '--config',
              str(workspace['test_yaml'])])
    full_replay = _auc(_run(['eval_MoCoDAD.py', '--config',
                             str(replay_yaml), '--eval-profile', 'full']))
    assert 0.0 <= full_replay <= 1.0


def test_serve_cli_streams_scores(workspace):
    """serve_MoCoDAD.py: JSONL pose stream in -> per-clip scores out,
    consuming the artifacts the train CLI wrote (checkpoint + scaler)."""
    import json

    import numpy as np

    from mocodad_tpu.data import trajectories as T

    root = workspace['root']
    serve_cfg = dict(workspace['test_cfg'])
    serve_yaml = root / 'serve.yaml'
    serve_yaml.write_text(yaml.safe_dump(serve_cfg))

    # stream one clip's raw CSV tracks
    traj_dir = os.path.join(serve_cfg['data_dir'], 'testing', 'trajectories')
    trajs = T.load_trajectories(traj_dir, split='test')
    lines = []
    scene_clip = None
    for t in trajs.values():
        scene, clip = map(int, t.trajectory_id.split('_')[0].split('-'))
        if scene_clip is None:
            scene_clip = (scene, clip)
        if (scene, clip) != scene_clip:
            continue
        for i in range(len(t)):
            lines.append(json.dumps({
                'type': 'pose', 'scene': scene, 'clip': clip,
                'person': int(t.person_id), 'frame': int(t.frames[i]),
                'keypoints': t.coordinates[i].reshape(-1, 2).tolist()}))
    gt = np.load(os.path.join(serve_cfg['test_path'],
                              f'{scene_clip[0]}_{scene_clip[1]}.npy'))
    lines.append('{not json')       # malformed lines must not kill the service
    lines.append('"just a string"')
    # structurally-bad messages (fields missing/non-numeric/ragged) must be
    # skipped, not crash the long-running service
    lines.append(json.dumps({'type': 'pose', 'scene': scene_clip[0],
                             'clip': scene_clip[1]}))
    lines.append(json.dumps({'type': 'pose', 'scene': 'abc', 'clip': 1,
                             'person': 1, 'frame': 2,
                             'keypoints': [[0.0, 0.0]] * 17}))
    # valid ids + wrong-arity keypoints: must be rejected at push (a bad
    # pose must not poison the actor's ring buffer for later valid ones)
    lines.append(json.dumps({'type': 'pose', 'scene': 0, 'clip': 0,
                             'person': 1, 'frame': 2, 'keypoints': []}))
    lines.append(json.dumps({'type': 'pose', 'scene': 0, 'clip': 0,
                             'person': 1, 'frame': 2,
                             'keypoints': [[1.0, 2.0], [3.0]]}))
    lines.append(json.dumps({'type': 'end_clip', 'scene': 9}))
    lines.append(json.dumps({'type': 'end_clip', 'scene': scene_clip[0],
                             'clip': scene_clip[1],
                             'n_frames': int(gt.shape[0])}))

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PYTHONPATH', None)
    out = subprocess.run(
        [sys.executable, '-u', 'serve_MoCoDAD.py', '--config',
         str(serve_yaml), '--batch-size', '32', '--flush-every', '32',
         '--eval-profile', 'full'],
        cwd=REPO, env=env, input='\n'.join(lines) + '\n',
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, f'serve failed:\n{out.stdout}\n{out.stderr}'
    msgs = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    scores_msgs = [m for m in msgs if m.get('type') == 'scores']
    assert len(scores_msgs) == 1
    scores = np.asarray(scores_msgs[0]['scores'])
    assert scores.shape == (gt.shape[0],)
    assert np.isfinite(scores).all() and (scores >= 0).all()


def test_serve_cli_survives_sustained_overload(workspace):
    """Sustained overload surfaces as protocol-level "overloaded" error
    lines, not process death: with num_transform=5 and the queue cap at
    one batch, each accepted window enqueues 5 views, so the queue tops
    out below a full batch (30 < 32) and the next push refuses — the one
    documented OverloadError route reachable with cap >= batch_size
    (mocodad_tpu/serve.py push).  The service must keep scoring clips
    afterwards."""
    import json

    import numpy as np

    root = workspace['root']
    serve_cfg = dict(workspace['test_cfg'], num_transform=5)
    serve_yaml = root / 'serve_overload.yaml'
    serve_yaml.write_text(yaml.safe_dump(serve_cfg))

    rs = np.random.RandomState(11)
    lines = []
    n_frames = 40
    for frame in range(1, n_frames + 1):
        lines.append(json.dumps({
            'type': 'pose', 'scene': 1, 'clip': 1, 'person': 0,
            'frame': frame,
            'keypoints': (rs.rand(17, 2) * 100 + 10).tolist()}))
    lines.append(json.dumps({'type': 'end_clip', 'scene': 1, 'clip': 1,
                             'n_frames': n_frames}))
    # after the forced finalize flush the service must accept new poses
    # and score a second clip (recovery, not just survival)
    for frame in range(1, 8):
        lines.append(json.dumps({
            'type': 'pose', 'scene': 1, 'clip': 2, 'person': 0,
            'frame': frame,
            'keypoints': (rs.rand(17, 2) * 100 + 10).tolist()}))
    lines.append(json.dumps({'type': 'end_clip', 'scene': 1, 'clip': 2,
                             'n_frames': 7}))

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PYTHONPATH', None)
    out = subprocess.run(
        [sys.executable, '-u', 'serve_MoCoDAD.py', '--config',
         str(serve_yaml), '--batch-size', '32', '--max-queue-windows', '32'],
        cwd=REPO, env=env, input='\n'.join(lines) + '\n',
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, \
        f'serve died under overload:\n{out.stdout}\n{out.stderr}'
    msgs = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    overloaded = [m for m in msgs if m.get('type') == 'error'
                  and m.get('error') == 'overloaded']
    # warm-up frames 1-5 are free; frames 6-11 enqueue 5 views each
    # (queue 5..30); every later frame refuses (30 + 5 > 32, no full
    # batch to flush) until end_clip force-drains
    assert len(overloaded) == n_frames - 11, [m.get('frame')
                                              for m in overloaded]
    assert overloaded[0]['frame'] == 12 and overloaded[0]['scene'] == 1
    assert 'max_queue_windows=32' in overloaded[0]['detail']
    scores_msgs = [m for m in msgs if m.get('type') == 'scores']
    assert [(m['scene'], m['clip']) for m in scores_msgs] == [(1, 1), (1, 2)]
    for m, n in zip(scores_msgs, (n_frames, 7)):
        s = np.asarray(m['scores'])
        assert s.shape == (n,) and np.isfinite(s).all()


def test_serve_cli_rejects_undrainable_queue_cap(workspace):
    """--max-queue-windows below --batch-size is a sizing error (a plain
    flush can never fill a batch, so every post-warmup push would
    refuse): the CLI must fail at startup with the fix spelled out, not
    start a service that refuses everything."""
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PYTHONPATH', None)
    out = subprocess.run(
        [sys.executable, '-u', 'serve_MoCoDAD.py', '--config',
         str(workspace['test_yaml']), '--batch-size', '32',
         '--max-queue-windows', '8'],
        cwd=REPO, env=env, input='', capture_output=True, text=True,
        timeout=300)
    assert out.returncode == 2, (out.returncode, out.stderr)
    assert 'must be >= --batch-size' in out.stderr
