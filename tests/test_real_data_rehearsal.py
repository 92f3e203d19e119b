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


def _shipped_config(overrides, dataset='UBnormal', which='train'):
    """A shipped YAML's keys, with only scale knobs and run-control flags
    overridden (paths stay CWD-relative)."""
    with open(os.path.join(REPO, 'config', dataset,
                           f'mocodad_{which}.yaml')) as f:
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


def test_hr_avenue_layout_end_to_end(tmp_path):
    """HR-Avenue's exact on-disk layout through the unmodified CLIs,
    including the HARDCODED per-clip mask route end-to-end: the
    reference keeps Avenue's human-related frame masks as inline
    constants keyed by clip id with exact clip lengths
    (ref utils/eval_utils.py:152-166 — V_16 is 740 frames), so the
    synthetic tree carries a 740-frame clip 16 plus non-masked clips,
    laid out as ./data/HR-Avenue/{training,testing}/** (no validating
    split — Avenue has none; shipped config/Avenue YAMLs, scale knobs
    only)."""
    import shutil

    from mocodad_tpu.data.synthetic import generate

    root = tmp_path
    data = root / 'data' / 'HR-Avenue'
    generate(str(data), seed=19, n_clips_per_split=2, n_actors=2,
             n_frames=60, vid_res=(640, 360))
    # Avenue ships no validating split
    shutil.rmtree(data / 'validating')
    # clips 1/2 collide with hardcoded mask ids at the wrong length
    # (V_01 is 1439 frames) -> rename to non-masked ids 4/5
    tdir, gdir = data / 'testing' / 'trajectories', \
        data / 'testing' / 'test_frame_mask'
    for old, new in ((1, 4), (2, 5)):
        os.rename(tdir / f'1-{old}', tdir / f'1-{new}')
        os.rename(gdir / f'1_{old}.npy', gdir / f'1_{new}.npy')
    # the masked clip: id 16 at EXACTLY the hardcoded 740 frames
    scratch = root / 'scratch'
    generate(str(scratch), seed=20, n_clips_per_split=1, n_actors=1,
             n_frames=740, vid_res=(640, 360))
    os.rename(scratch / 'testing' / 'trajectories' / '1-1', tdir / '1-16')
    os.rename(scratch / 'testing' / 'test_frame_mask' / '1_1.npy',
              gdir / '1_16.npy')
    assert np.load(gdir / '1_16.npy').shape[0] == 740

    train_raw = _shipped_config(
        dict(dir_name='avenue_rehearsal', n_epochs=2, batch_size=256,
             n_generated_samples=3, num_transform=2, num_workers=0,
             use_wandb=False, accelerator='cpu', devices=[0], seed=6),
        dataset='Avenue')
    assert train_raw['data_dir'] == './data/HR-Avenue/'
    assert train_raw['dataset_choice'] == 'HR-Avenue'
    assert train_raw['validation'] is False
    train_yaml = str(root / 'train.yaml')
    with open(train_yaml, 'w') as f:
        yaml.safe_dump(train_raw, f)
    _run('train_MoCoDAD.py', train_yaml, cwd=str(root))
    ckpt_dir = os.path.join(str(root), 'checkpoints', 'HR-Avenue',
                            'avenue_rehearsal')
    for name in ('last.ckpt', 'best_weights.ckpt', 'local_robust.npz'):
        assert os.path.exists(os.path.join(ckpt_dir, name)), name

    test_raw = _shipped_config(
        dict(dir_name='avenue_rehearsal', load_ckpt='best_weights.ckpt',
             batch_size=256, n_generated_samples=3, num_transform=2,
             num_workers=0, use_wandb=False, accelerator='cpu',
             devices=[0], seed=6, save_tensors=True),
        dataset='Avenue', which='test')
    assert test_raw['pad_size'] == 12      # shipped Avenue absence padding
    test_yaml = str(root / 'test.yaml')
    with open(test_yaml, 'w') as f:
        yaml.safe_dump(test_raw, f)
    direct = _auc(_run('eval_MoCoDAD.py', test_yaml, cwd=str(root)))
    assert 0.0 <= direct <= 1.0

    # prove the hardcoded mask fired INSIDE the CLI run: rescore the
    # exported tensors in-process — masked equals the CLI AUC exactly,
    # unmasked (same tensors, so identical model noise) differs
    from mocodad_tpu.config import from_dict
    from mocodad_tpu.eval.harness import post_processing_from_config
    from mocodad_tpu.utils.tensors import load_tensors
    cwd = os.getcwd()
    os.chdir(str(root))      # CWD-relative shipped paths
    try:
        # from_dict skips init_args' gt_path <- test_path derivation
        cfg = from_dict(dict(test_raw, ckpt_dir=ckpt_dir,
                             gt_path=test_raw['test_path']))
        t = load_tensors(ckpt_dir, 'test', cfg.aggregation_strategy, 3)
        masked = post_processing_from_config(
            t['prediction'], t['trans'], t['metadata'], t['frames'], cfg)
        unmasked = post_processing_from_config(
            t['prediction'], t['trans'], t['metadata'], t['frames'], cfg,
            dataset_name='STC')
    finally:
        os.chdir(cwd)
    # the CLI prints the AUC rounded to 6 decimals
    assert abs(masked - direct) < 5e-7, (masked, direct)
    assert abs(unmasked - direct) > 5e-7, \
        'Avenue mask had no effect on the AUC'


def test_hr_stc_layout_end_to_end(tmp_path):
    """HR-STC's exact on-disk layout (./data/HR-ShanghaiTech/ — the
    folder name differs from the dataset_choice, ref
    config/STC/mocodad_test.yaml:17) through the unmodified train/eval
    CLIs with the shipped STC YAML family (856x480 resolution, train
    seg_stride 6, pad_size -1), scale knobs only."""
    import shutil

    from mocodad_tpu.data.synthetic import generate

    root = tmp_path
    data = root / 'data' / 'HR-ShanghaiTech'
    generate(str(data), seed=21, n_clips_per_split=2, n_actors=2,
             n_frames=60, vid_res=(856, 480))
    shutil.rmtree(data / 'validating')   # STC ships no validating split

    train_raw = _shipped_config(
        dict(dir_name='stc_rehearsal', n_epochs=2, batch_size=256,
             n_generated_samples=3, num_transform=2, num_workers=0,
             use_wandb=False, accelerator='cpu', devices=[0], seed=7),
        dataset='STC')
    assert train_raw['data_dir'] == './data/HR-ShanghaiTech/'
    assert train_raw['dataset_choice'] == 'HR-STC'
    assert train_raw['vid_res'] == [856, 480]
    assert train_raw['seg_stride'] == 6    # shipped STC train stride
    train_yaml = str(root / 'train.yaml')
    with open(train_yaml, 'w') as f:
        yaml.safe_dump(train_raw, f)
    _run('train_MoCoDAD.py', train_yaml, cwd=str(root))
    ckpt_dir = os.path.join(str(root), 'checkpoints', 'HR-STC',
                            'stc_rehearsal')
    for name in ('last.ckpt', 'best_weights.ckpt', 'local_robust.npz'):
        assert os.path.exists(os.path.join(ckpt_dir, name)), name

    test_raw = _shipped_config(
        dict(dir_name='stc_rehearsal', load_ckpt='best_weights.ckpt',
             batch_size=256, n_generated_samples=3, num_transform=2,
             num_workers=0, use_wandb=False, accelerator='cpu',
             devices=[0], seed=7),
        dataset='STC', which='test')
    assert test_raw['pad_size'] == -1      # shipped STC: no absence padding
    test_yaml = str(root / 'test.yaml')
    with open(test_yaml, 'w') as f:
        yaml.safe_dump(test_raw, f)
    auc = _auc(_run('eval_MoCoDAD.py', test_yaml, cwd=str(root)))
    # test-split windows always re-stride to 1 (utils/dataset.py:308),
    # so the stride-6 train config still scores every frame
    assert 0.0 <= auc <= 1.0
