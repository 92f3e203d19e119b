"""Oracle tests against the REAL reference MoCoDAD module.

`/root/reference/models/mocodad.py` imports pytorch_lightning, which is
absent in this image; a minimal LightningModule stub (plain nn.Module +
no-op save_hyperparameters/log) unlocks the real class, so the whole
module — build_model, _select_frames, _prepare_input_data, _unet_forward,
the sampling loop, _aggregation_strategy, post_processing — becomes the
oracle rather than any hand-written mirror.

Covered here (inject/AE and the latent stages live in
test_reference_oracle.py):
  * full-module strict state-dict load + generation-chain parity for the
    'concat', 'inbetween_imp' and 'no_condition' strategies;
  * random_imp input assembly / corrupt extraction against the real
    CPU-boolean-mask implementation (the sharding-sensitive gather path);
  * every aggregation strategy vs models/mocodad.py:454-520;
  * the full scoring chain (post_processing) vs models/mocodad.py:337-430
    on a synthetic gt tree, including pad_scores and 2 transforms.
"""

import argparse
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.models import frames as F
from mocodad_tpu.models.losses import aggregate
from mocodad_tpu.models.mocodad import MoCoDADNet
from mocodad_tpu.utils.torch_compat import export_torch_state_dict

REF = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference checkout not available')
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)


def _install_pl_stub():
    try:
        import pytorch_lightning  # noqa: F401
        return
    except ImportError:
        pass

    pl = types.ModuleType('pytorch_lightning')

    class LightningModule(torch.nn.Module):
        @property
        def device(self):
            return torch.device('cpu')

        def save_hyperparameters(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

    pl.LightningModule = LightningModule
    sys.modules['pytorch_lightning'] = pl


_install_pl_stub()


def _ref_mocodad(**overrides):
    from models.mocodad import MoCoDAD
    base = dict(
        seg_len=6, num_coords=2, embedding_dim=16, dropout=0.0,
        conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
        conditioning_architecture='AE', h_dim=32, latent_dim=16,
        channels=[32, 16, 32], opt_lr=1e-3, loss_fn='smooth_l1',
        rec_weight=0.1, noise_steps=10, aggregation_strategy='best',
        n_generated_samples=2, model_return_value='loss',
        gt_path='/tmp', split='test', use_hr=False, ckpt_dir='/tmp',
        save_tensors=False, num_transform=1, pad_size=-1,
        filter_kernel_size=4, frames_shift=3, dataset_choice='UBnormal',
        headless=False, kp18_format=False)
    base.update(overrides)
    m = MoCoDAD(argparse.Namespace(**base))
    m.eval()
    return m


def _cfg(**kw):
    base = dict(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
                conditioning_architecture='AE', channels=[32, 16, 32],
                embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.0,
                seg_len=6, num_coords=2, noise_steps=10,
                n_generated_samples=2, aggregation_strategy='best',
                batch_size=8, seed=0)
    base.update(kw)
    return Config(**base)


class _QueueRandnLike:
    """Replaces torch.randn_like with a queue of pre-drawn arrays so the
    reference sampling loop consumes deterministic noise."""

    def __init__(self, draws):
        self.draws = list(draws)

    def __call__(self, ref, *a, **k):
        out = torch.from_numpy(np.ascontiguousarray(self.draws.pop(0)))
        assert tuple(out.shape) == tuple(ref.shape)
        return out.to(ref.dtype)


@pytest.mark.parametrize('strategy,cond_idx', [
    ('concat', [0, 1, 2]),
    ('inbetween_imp', 2),
    ('no_condition', [0, 1, 2]),   # indices unused for no_condition
])
def test_generation_chain_matches_real_module(monkeypatch, strategy,
                                              cond_idx):
    """Full reference `forward` (models/mocodad.py:129-184) vs the repo's
    folded scan sampler, identical noise, per non-inject strategy."""
    model = MoCoDADModel(_cfg(conditioning_strategy=strategy,
                              conditioning_indices=cond_idx))
    variables = jax.device_get(model.init_variables(jax.random.key(21)))
    sd = export_torch_state_dict(variables)

    m = _ref_mocodad(conditioning_strategy=strategy,
                     conditioning_indices=cond_idx)
    m.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                       for k, v in sd.items()}, strict=True)
    m.eval()

    rs = np.random.RandomState(22)
    b, s, steps = 3, 2, 10
    tc = model.n_frames_corrupt
    data = rs.randn(b, 2, 6, 17).astype(np.float32)
    x0 = rs.randn(s, b, 2, tc, 17).astype(np.float32)
    zs = rs.randn(steps - 1, s, b, 2, tc, 17).astype(np.float32)

    # reference draw order: per sample, x0 then one z per step i=9..2
    draws = []
    for si in range(s):
        draws.append(x0[si])
        draws.extend(zs[k, si] for k in range(steps - 2))
    monkeypatch.setattr(torch, 'randn_like', _QueueRandnLike(draws))

    batch = [torch.from_numpy(data), torch.zeros(b, dtype=torch.long),
             torch.zeros(b, 4, dtype=torch.long),
             torch.zeros(b, 6, dtype=torch.long)]
    with torch.no_grad():
        out = m.forward(batch)
    want_loss = out[0].numpy()

    x0_f = x0.transpose(1, 0, 2, 3, 4).reshape(s * b, 2, tc, 17)
    zs_f = zs.transpose(0, 2, 1, 3, 4, 5).reshape(steps - 1, s * b, 2,
                                                  tc, 17)
    _, got_loss = model.generate(variables, jnp.asarray(data),
                                 jax.random.key(23),
                                 noise_override=(jnp.asarray(x0_f),
                                                 jnp.asarray(zs_f)))
    np.testing.assert_allclose(np.asarray(got_loss), want_loss, atol=1e-4)


def test_random_imp_assembly_matches_real_module():
    """random_imp input assembly + corrupt extraction (the CPU boolean
    masks, models/mocodad.py:654-686, 811-840) vs the device gathers in
    models/frames.py, through the real network."""
    model = MoCoDADModel(_cfg(conditioning_strategy='random_imp',
                              conditioning_indices=3))
    variables = jax.device_get(model.init_variables(jax.random.key(31)))
    sd = export_torch_state_dict(variables)
    m = _ref_mocodad(conditioning_strategy='random_imp',
                     conditioning_indices=3)
    m.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                       for k, v in sd.items()}, strict=True)
    m.eval()

    rs = np.random.RandomState(32)
    b = 4
    data = rs.randn(b, 2, 6, 17).astype(np.float32)
    # per-row orders in the framework's format: sorted cond positions
    # first, then sorted corrupt positions
    orders = np.stack([np.random.RandomState(40 + i).permutation(6)
                       for i in range(b)])
    order = np.concatenate([np.sort(orders[:, :3], axis=1),
                            np.sort(orders[:, 3:], axis=1)],
                           axis=1).astype(np.int32)
    cond_idxs = torch.from_numpy(order[:, :3].astype(np.int64))
    corrupt_idxs = torch.from_numpy(order[:, 3:].astype(np.int64))

    cond_j, corrupt_j = F.select_frames(jnp.asarray(data),
                                        jnp.asarray(order), 3)
    cond_t = torch.from_numpy(np.array(cond_j))
    corrupt_t = torch.from_numpy(np.array(corrupt_j))

    x_t = m._prepare_input_data(cond_t, corrupt_t, corrupt_idxs)
    x_j = F.assemble_input('random_imp', cond_j, corrupt_j,
                           jnp.asarray(order), 3)
    np.testing.assert_allclose(np.asarray(x_j), x_t.numpy(), atol=0)

    t = torch.full((b,), 4, dtype=torch.long)
    with torch.no_grad():
        eps_t = m._unet_forward(x_t, t=t, condition_data=None,
                                corrupt_idxs=corrupt_idxs)
    pred_j = model.net.apply(variables, x_j,
                             jnp.asarray(t.numpy(), dtype=jnp.int32), None,
                             method=MoCoDADNet.denoise)
    eps_j = F.extract_corrupt('random_imp', pred_j, jnp.asarray(order), 3)
    np.testing.assert_allclose(np.asarray(eps_j), eps_t.numpy(), atol=1e-5)

    # round-trip sanity: cond then corrupt positions tile the window
    assert (np.sort(order, axis=1) == np.arange(6)).all()


@pytest.mark.parametrize('strategy', ['all', 'mean', 'mean_pose', 'median',
                                      'median_pose', 'best', 'worst',
                                      'quantile:0.7'])
def test_aggregation_matches_real_module(strategy):
    """Every aggregation vs the real `_aggregation_strategy`
    (models/mocodad.py:454-520).  S is odd so torch's lower-median and
    numpy's midpoint median coincide."""
    m = _ref_mocodad()
    rs = np.random.RandomState(51)
    s, b = 5, 7
    xs = rs.randn(s, b, 2, 3, 17).astype(np.float32)
    target = rs.randn(b, 2, 3, 17).astype(np.float32)

    with torch.no_grad():
        sel_t, loss_t = m._aggregation_strategy(
            [torch.from_numpy(x) for x in xs],
            torch.from_numpy(target), strategy)
    sel_j, loss_j = aggregate(strategy, 'smooth_l1', jnp.asarray(xs),
                              jnp.asarray(target), rng=jax.random.key(1))
    np.testing.assert_allclose(np.asarray(loss_j), loss_t.numpy(),
                               atol=1e-5)
    if sel_t is not None:
        assert sel_j is not None
        np.testing.assert_allclose(np.asarray(sel_j), sel_t.numpy(),
                                   atol=1e-5)


def test_diffusion_schedule_matches_real_module():
    """Cosine beta/alpha/alpha-hat tables vs the real Diffusion class
    (utils/diffusion_utils.py:18-52)."""
    from utils.diffusion_utils import Diffusion
    from mocodad_tpu.diffusion import make_schedule
    for steps in (10, 100):
        ref = Diffusion(noise_steps=steps, device='cpu')
        sch = make_schedule(steps)
        np.testing.assert_allclose(np.asarray(sch.beta),
                                   ref.beta.numpy(), atol=1e-7)
        np.testing.assert_allclose(np.asarray(sch.alpha),
                                   ref.alpha.numpy(), atol=1e-7)
        # cumprod accumulates in f32 in the reference vs f64 here
        np.testing.assert_allclose(np.asarray(sch.alpha_hat),
                                   ref.alpha_hat.numpy(), rtol=3e-5,
                                   atol=1e-7)


@pytest.mark.parametrize('strategy,cond_idx,arch', [
    ('inject', [0, 1, 2], 'AE'),
    ('concat', [0, 1, 2], 'AE'),
])
def test_training_loss_matches_real_module(monkeypatch, strategy, cond_idx,
                                           arch):
    """The full training loss — frame split, condition encoding, forward
    noising, U-Net prediction, smooth-l1 + rec_weight*mse — vs the real
    `training_step` (models/mocodad.py:187-227) with identical (t, eps).
    Both sides run with frozen BN stats (eval-mode normalization) so the
    comparison isolates the loss math."""
    model = MoCoDADModel(_cfg(conditioning_strategy=strategy,
                              conditioning_indices=cond_idx,
                              conditioning_architecture=arch,
                              rec_weight=0.1, dropout=0.0))
    variables = jax.device_get(model.init_variables(jax.random.key(71)))
    sd = export_torch_state_dict(variables)
    m = _ref_mocodad(conditioning_strategy=strategy,
                     conditioning_indices=cond_idx,
                     conditioning_architecture=arch)
    m.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                       for k, v in sd.items()}, strict=True)
    m.eval()

    rs = np.random.RandomState(72)
    b = 5
    tc = model.n_frames_corrupt
    data = rs.randn(b, 2, 6, 17).astype(np.float32)
    t = rs.randint(1, 10, (b,))
    eps = rs.randn(b, 2, tc, 17).astype(np.float32)

    monkeypatch.setattr(torch, 'randint',
                        lambda *a, **k: torch.from_numpy(t))
    monkeypatch.setattr(torch, 'randn_like', _QueueRandnLike([eps]))
    # noise_graph calls t.get_device(), which returns -1 on CPU tensors
    # (the reference only ever ran on CUDA); map it to the device object
    monkeypatch.setattr(torch.Tensor, 'get_device',
                        lambda self: self.device)
    batch = [torch.from_numpy(data), torch.zeros(b, dtype=torch.long),
             torch.zeros(b, 4, dtype=torch.long),
             torch.zeros(b, 6, dtype=torch.long)]
    with torch.no_grad():
        want = float(m.training_step(batch, 0))

    loss, metrics, _ = model.loss(variables, jnp.asarray(data),
                                  jax.random.key(73), train=False,
                                  noise_override=(t, eps))
    assert float(loss) == pytest.approx(want, abs=2e-5)
    assert metrics['loss_noise'] <= loss


def test_post_processing_matches_real_module(tmp_path):
    """The full scoring chain — per-actor var matrix, nanmax, pad_scores,
    actor aggregation with the log1p amplitude term, shift+gaussian
    smoothing, transform averaging, AUC — vs the real `post_processing`
    (models/mocodad.py:337-430) on a synthetic gt tree with 2 transforms
    and absence-interval padding enabled (pad_size=2)."""
    from mocodad_tpu.data import build_dataset, synthetic
    from mocodad_tpu.eval.harness import post_processing_from_config

    droot = str(tmp_path / 'data')
    synthetic.generate(droot, seed=61, n_clips_per_split=2, n_actors=3,
                       n_frames=60)
    gt_path = os.path.join(droot, 'testing', 'test_frame_mask')
    cfg = Config(
        split='test', data_dir=droot, exp_dir=str(tmp_path),
        ckpt_dir=str(tmp_path), dataset_choice='UBnormal', seg_len=6,
        conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
        conditioning_architecture='AE', channels=[32, 16, 32],
        embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.0,
        noise_steps=10, batch_size=64, num_coords=2, num_transform=2,
        seg_stride=1, n_generated_samples=2, aggregation_strategy='best',
        vid_res=[640, 360], normalization_strategy='robust', use_hr=False,
        validation=False, seed=0, filter_kernel_size=4, frames_shift=3,
        pad_size=2, test_path=gt_path, gt_path=gt_path)
    build_dataset(cfg, 'train')
    ds = build_dataset(cfg, 'test')
    n = ds.num_samples
    rs = np.random.RandomState(62)
    out = np.concatenate([rs.rand(n).astype(np.float32) + 0.05
                          for _ in range(2)])
    trans = np.concatenate([np.zeros(n, np.int64), np.ones(n, np.int64)])
    meta = np.concatenate([ds.meta, ds.meta])
    frames = np.concatenate([ds.frames, ds.frames])

    m = _ref_mocodad(gt_path=gt_path, num_transform=2, pad_size=2)
    want = m.post_processing(out, np.zeros_like(out), trans, meta, frames)
    got = post_processing_from_config(out, trans, meta, frames, cfg)
    assert got == pytest.approx(want, abs=1e-9)


def _write_hr_mask_tree(root, split, masks):
    """Lay out {root}/{split}/test_frame_mask/{scene}_{clip}.npy exactly as
    UBnormal ships its HR boolean masks (ref utils/eval_utils.py:176)."""
    d = os.path.join(root, split, 'test_frame_mask')
    os.makedirs(d, exist_ok=True)
    for (scene, clip), m in masks.items():
        np.save(os.path.join(d, f'{scene}_{clip}.npy'), m)


def test_get_hr_ubnormal_mask_matches_reference(tmp_path, monkeypatch):
    """Golden test of the HR-UBnormal mask loader vs the real reference
    function (utils/eval_utils.py:169-185) on a synthetic npy tree,
    including the test->testing / else->validating split mapping."""
    from utils.eval_utils import get_hr_ubnormal_mask as ref_loader
    from mocodad_tpu.eval.scoring import get_hr_ubnormal_mask

    rs = np.random.RandomState(5)
    masks = {(1, 2): rs.rand(37) > 0.3, (2, 11): rs.rand(54) > 0.5}
    val_masks = {(1, 2): rs.rand(37) > 0.6}
    root = str(tmp_path / 'data' / 'UBnormal' / 'hr_bool_masks')
    _write_hr_mask_tree(root, 'testing', masks)
    _write_hr_mask_tree(root, 'validating', val_masks)

    # the reference resolves './data/UBnormal/hr_bool_masks' from CWD
    monkeypatch.chdir(tmp_path)
    for split in ('test', 'validation'):
        want = ref_loader(split)
        got = get_hr_ubnormal_mask(split, masks_root=root)
        assert sorted(got) == sorted(want)
        for key in want:
            np.testing.assert_array_equal(got[key], want[key])


def test_post_processing_hr_ubnormal_matches_real_module(
        tmp_path, monkeypatch):
    """use_hr=True scoring vs the real post_processing: the HR-UBnormal
    branch (ref models/mocodad.py:404-407 + utils/eval_utils.py:169-185)
    drops non-HR frames per masked clip before smoothing; clips without a
    mask file pass through untouched.  AUC equality pins the masking
    indexing, not just the mask constants."""
    from mocodad_tpu.data import build_dataset, synthetic
    from mocodad_tpu.eval.harness import post_processing_from_config

    droot = str(tmp_path / 'data_ds')
    synthetic.generate(droot, seed=63, n_clips_per_split=3, n_actors=3,
                       n_frames=60)
    gt_path = os.path.join(droot, 'testing', 'test_frame_mask')

    # HR masks for 2 of the 3 clips (the third exercises the unmasked
    # path); keep >= half the frames so both gt classes survive masking
    rs = np.random.RandomState(64)
    masks = {}
    for f in sorted(os.listdir(gt_path)):
        scene, clip = int(f.split('_')[0]), int(f.split('_')[1].split('.')[0])
        if clip == 3:
            continue
        n = np.load(os.path.join(gt_path, f)).shape[0]
        masks[(scene, clip)] = rs.rand(n) > 0.3
    masks_root = str(tmp_path / 'data' / 'UBnormal' / 'hr_bool_masks')
    _write_hr_mask_tree(masks_root, 'testing', masks)

    cfg = Config(
        split='test', data_dir=droot, exp_dir=str(tmp_path),
        ckpt_dir=str(tmp_path), dataset_choice='UBnormal', seg_len=6,
        conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
        conditioning_architecture='AE', channels=[32, 16, 32],
        embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.0,
        noise_steps=10, batch_size=64, num_coords=2, num_transform=2,
        seg_stride=1, n_generated_samples=2, aggregation_strategy='best',
        vid_res=[640, 360], normalization_strategy='robust', use_hr=True,
        validation=False, seed=0, filter_kernel_size=4, frames_shift=3,
        pad_size=2, test_path=gt_path, gt_path=gt_path)
    cfg.extras['hr_masks_root'] = masks_root
    build_dataset(cfg, 'train')
    ds = build_dataset(cfg, 'test')
    n = ds.num_samples
    rs = np.random.RandomState(65)
    out = np.concatenate([rs.rand(n).astype(np.float32) + 0.05
                          for _ in range(2)])
    trans = np.concatenate([np.zeros(n, np.int64), np.ones(n, np.int64)])
    meta = np.concatenate([ds.meta, ds.meta])
    frames = np.concatenate([ds.frames, ds.frames])

    m = _ref_mocodad(gt_path=gt_path, num_transform=2, pad_size=2,
                     use_hr=True)
    monkeypatch.chdir(tmp_path)   # ref globs ./data/UBnormal/hr_bool_masks
    want = m.post_processing(out, np.zeros_like(out), trans, meta, frames)
    got = post_processing_from_config(out, trans, meta, frames, cfg)
    assert got == pytest.approx(want, abs=1e-9)


def test_post_processing_hr_avenue_matches_real_module(tmp_path):
    """dataset_name='HR-Avenue' scoring vs the real post_processing: the
    hardcoded per-clip Avenue masks (ref utils/eval_utils.py:152-166,
    applied models/mocodad.py:408-411) gate clips 1/2/3/6/16 by clip id;
    other clips pass through.  Clip gt lengths must equal the mask
    lengths, as in the real dataset."""
    from mocodad_tpu.eval.harness import post_processing
    from mocodad_tpu.eval.scoring import get_avenue_mask

    gt_path = str(tmp_path / 'gt')
    os.makedirs(gt_path)
    rs = np.random.RandomState(66)
    avenue = get_avenue_mask()
    # masked clips 1 (1439 frames) and 3 (923) + unmasked clip 4 (200)
    clip_lens = {1: len(avenue[1]), 3: len(avenue[3]), 4: 200}
    for clip, n in clip_lens.items():
        gt = np.zeros(n, np.int64)
        a = rs.randint(0, n - 40)
        gt[a:a + 40] = 1
        np.save(os.path.join(gt_path, f'1_{clip}.npy'), gt)

    out, trans, meta, frames = [], [], [], []
    for t in range(2):
        for clip, n in clip_lens.items():
            for person in range(2):
                for start in range(1, n - 6, 7):
                    out.append(rs.rand() + 0.05)
                    trans.append(t)
                    meta.append([1, clip, person, start])
                    frames.append(np.arange(start, start + 6))
    out = np.asarray(out, np.float32)
    trans = np.asarray(trans, np.int64)
    meta = np.asarray(meta, np.int64)
    frames = np.asarray(frames, np.int64)

    m = _ref_mocodad(gt_path=gt_path, num_transform=2, pad_size=-1,
                     dataset_choice='HR-Avenue')
    want = m.post_processing(out, np.zeros_like(out), trans, meta, frames)
    got = post_processing(out, trans, meta, frames, gt_path=gt_path,
                          num_transform=2, dataset_name='HR-Avenue',
                          split='test', use_hr=False, pad_size=-1,
                          filter_kernel_size=4, frames_shift=3)
    assert got == pytest.approx(want, abs=1e-9)
