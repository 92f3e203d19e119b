"""Real-data rehearsal: the reference's EXACT on-disk layout, end to end.

The real UBnormal datasets cannot ship in this image (zero egress), so
this rehearsal proves every step around the files: a synthetic dataset
is laid out exactly as the reference repo expects it —

  {cwd}/data/UBnormal/{training,validating,testing}/trajectories/
      {scene}-{clip}/{person}.csv          (utils/get_robust_data.py:24-60)
  {cwd}/data/UBnormal/{validating,testing}/test_frame_mask/
      {scene}_{clip}.npy                   (models/mocodad.py:371-376)
  {cwd}/data/UBnormal/hr_bool_masks/{split}/test_frame_mask/
      {scene}_{clip}.npy                   (utils/eval_utils.py:169-185)

— and the three UNMODIFIED CLIs run against it from a reference-shaped
working directory with the shipped UBnormal YAML keys (only scale knobs
downsized), including `use_hr: true` consuming the hr_bool_masks tree
and a torch-exported checkpoint fed straight back through the eval CLI
(the published-checkpoint on-ramp, ref README.md:126-137).  When the
real files appear, the only untested step is the files themselves.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _run(script, config, cwd, extra=()):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PYTHONPATH', None)
    env.setdefault('MOCODAD_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/jax_comp_tests'))
    out = subprocess.run(
        [sys.executable, '-u', os.path.join(REPO, script),
         '--config', config, *extra],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, \
        f'{script} failed:\n{out.stdout[-4000:]}\n{out.stderr[-4000:]}'
    return out.stdout


def _auc(stdout):
    m = re.search(r'AUC score: ([0-9.]+)', stdout)
    assert m, f'no AUC in output:\n{stdout[-3000:]}'
    return float(m.group(1))


@pytest.fixture(scope='module')
def reference_layout(tmp_path_factory):
    """A working directory shaped exactly like the reference repo root:
    ./data/UBnormal/** + ./checkpoints/** (all paths in the YAMLs stay
    the shipped CWD-relative ones)."""
    from mocodad_tpu.data.synthetic import generate

    root = tmp_path_factory.mktemp('ref_root')
    data = root / 'data' / 'UBnormal'
    generate(str(data), seed=17, n_clips_per_split=2, n_actors=2,
             n_frames=60)

    # HR boolean-mask tree exactly as UBnormal ships it, one mask per gt
    # clip, dropping ~25% of frames (both splits; the loader picks
    # testing/validating by split name, ref utils/eval_utils.py:171-175)
    rs = np.random.RandomState(18)
    for split in ('testing', 'validating'):
        gt_dir = data / split / 'test_frame_mask'
        mask_dir = data / 'hr_bool_masks' / split / 'test_frame_mask'
        os.makedirs(mask_dir)
        for f in sorted(os.listdir(gt_dir)):
            n = np.load(gt_dir / f).shape[0]
            np.save(mask_dir / f, rs.rand(n) > 0.25)
    return root


def _shipped_config(overrides):
    """The shipped UBnormal train YAML's keys, with only scale knobs and
    run-control flags overridden (paths stay CWD-relative)."""
    with open(os.path.join(REPO, 'config', 'UBnormal',
                           'mocodad_train.yaml')) as f:
        raw = yaml.safe_load(f)
    raw.update(
        # scale knobs only: 2 epochs, small batch, 3 samples, 2 views
        n_epochs=2, batch_size=256, n_generated_samples=3,
        num_transform=2, num_workers=0, use_wandb=False,
        accelerator='cpu', devices=[0], seed=5)
    raw.update(overrides)
    return raw


def test_reference_layout_end_to_end(reference_layout):
    root = str(reference_layout)
    ckpt_dir = os.path.join(root, 'checkpoints', 'UBnormal', 'rehearsal')

    train_raw = _shipped_config(dict(dir_name='rehearsal'))
    assert train_raw['data_dir'] == './data/UBnormal/'   # shipped path
    assert train_raw['validation'] is True               # shipped flag
    assert train_raw['use_hr'] is False  # shipped train flag (test: true)
    train_yaml = os.path.join(root, 'train.yaml')
    with open(train_yaml, 'w') as f:
        yaml.safe_dump(train_raw, f)

    # train CLI: per-epoch validation runs the full HR-masked AUC chain
    # against ./data/UBnormal/validating + hr_bool_masks (shipped flow)
    out = _run('train_MoCoDAD.py', train_yaml, cwd=root)
    assert 'AUC' in out
    for name in ('last.ckpt', 'best_weights.ckpt', 'config.yaml',
                 'local_robust.npz'):
        assert os.path.exists(os.path.join(ckpt_dir, name)), name

    # the shipped TEST yaml flips use_hr on (config/UBnormal/
    # mocodad_test.yaml:8, = reference) — mirror that here
    test_raw = _shipped_config(dict(
        dir_name='rehearsal', split='test', load_ckpt='best_weights.ckpt',
        use_hr=True, validation=False, create_experiment_dir=False))
    test_yaml = os.path.join(root, 'test.yaml')
    with open(test_yaml, 'w') as f:
        yaml.safe_dump(test_raw, f)

    # predict CLI -> saved-tensor cache; eval CLI -> direct HR AUC;
    # replay eval -> identical AUC without touching the model
    _run('predict_MoCoDAD.py', test_yaml, cwd=root)
    tdir = os.path.join(ckpt_dir, 'saved_tensors_test_best_3')
    assert os.path.isdir(tdir), os.listdir(ckpt_dir)

    direct = _auc(_run('eval_MoCoDAD.py', test_yaml, cwd=root))
    assert 0.0 <= direct <= 1.0

    replay_yaml = os.path.join(root, 'replay.yaml')
    with open(replay_yaml, 'w') as f:
        yaml.safe_dump(dict(test_raw, load_tensors=True), f)
    replay = _auc(_run('eval_MoCoDAD.py', replay_yaml, cwd=root))
    assert abs(direct - replay) < 1e-9, (direct, replay)

    # the hr_bool_masks tree is really consumed: unmasked eval (replayed
    # from the same tensors, so model noise is identical) moves the AUC
    nohr_yaml = os.path.join(root, 'nohr.yaml')
    with open(nohr_yaml, 'w') as f:
        yaml.safe_dump(dict(test_raw, load_tensors=True, use_hr=False), f)
    nohr = _auc(_run('eval_MoCoDAD.py', nohr_yaml, cwd=root))
    assert nohr != direct, 'HR masking had no effect on the AUC'

    # published-checkpoint on-ramp: export the trained weights as a torch
    # state-dict file and feed it straight back through the eval CLI
    # (restore_variables detects torch checkpoints; the reference's
    # Google-Drive checkpoints take exactly this path)
    torch = pytest.importorskip('torch')
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    try:
        import convert_checkpoint
        from mocodad_tpu.config import from_dict
        cfg = from_dict(dict(test_raw, ckpt_dir=ckpt_dir))
        torch_ckpt = os.path.join(ckpt_dir, 'exported_reference_style.ckpt')
        convert_checkpoint.convert(
            cfg, 'to-torch',
            os.path.join(ckpt_dir, 'best_weights.ckpt'), torch_ckpt)
    finally:
        sys.path.pop(0)
    assert os.path.exists(torch_ckpt)
    # sanity: it IS a torch-readable file
    sd = torch.load(torch_ckpt, map_location='cpu', weights_only=False)
    assert any(k.endswith('.weight') for k in
               (sd.get('state_dict', sd)).keys())

    torch_yaml = os.path.join(root, 'torch_eval.yaml')
    with open(torch_yaml, 'w') as f:
        yaml.safe_dump(dict(test_raw,
                            load_ckpt='exported_reference_style.ckpt'), f)
    torch_auc = _auc(_run('eval_MoCoDAD.py', torch_yaml, cwd=root))
    assert abs(torch_auc - direct) < 1e-9, (torch_auc, direct)
