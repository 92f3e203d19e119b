import os

import numpy as np
import pytest

from mocodad_tpu.eval import (compute_var_matrix, gaussian_filter1d,
                              pad_scores, post_processing, roc_auc_score,
                              score_process)
from mocodad_tpu.eval.scoring import get_avenue_mask, ranges


def test_roc_auc_matches_sklearn(rng):
    import sklearn.metrics as skm
    for _ in range(5):
        y = (rng.random(200) < 0.3).astype(int)
        if y.sum() in (0, 200):
            continue
        s = rng.normal(size=200)
        # add ties
        s[::7] = s[0]
        np.testing.assert_allclose(roc_auc_score(y, s),
                                   skm.roc_auc_score(y, s), rtol=1e-12)


def test_roc_auc_degenerate_raises():
    with pytest.raises(ValueError):
        roc_auc_score(np.zeros(10), np.arange(10.0))


@pytest.mark.parametrize('sigma', [0.5, 2, 15, 30])
def test_gaussian_filter_matches_scipy(sigma, rng):
    from scipy.ndimage import gaussian_filter1d as scipy_g
    x = rng.normal(size=300)
    np.testing.assert_allclose(gaussian_filter1d(x, sigma),
                               scipy_g(x, sigma), rtol=1e-9, atol=1e-12)


def test_gaussian_filter_short_signal_vs_scipy(rng):
    # pad width exceeds the signal length -> repeated reflection
    from scipy.ndimage import gaussian_filter1d as scipy_g
    x = rng.normal(size=20)
    np.testing.assert_allclose(gaussian_filter1d(x, 30), scipy_g(x, 30),
                               rtol=1e-9, atol=1e-12)


def test_compute_var_matrix():
    pos = np.array([2.0, 5.0])
    frames = np.array([[1, 2, 3], [4, 5, 6]])  # 1-indexed
    m = compute_var_matrix(pos, frames, 8)
    want = np.zeros((2, 8))
    want[0, 0:3] = 2.0
    want[1, 3:6] = 5.0
    np.testing.assert_array_equal(m, want)


def test_score_process_matches_reference_semantics(rng):
    from scipy.ndimage import gaussian_filter1d as scipy_g
    score = rng.random(100)
    got = score_process(score, shift=18, kernel_size=30)
    shifted = np.zeros_like(score)
    shifted[18:] = score[:-18]
    np.testing.assert_allclose(got, scipy_g(shifted, 30), rtol=1e-9)
    with pytest.raises(ValueError):
        score_process(score, shift=0, kernel_size=30)


def test_ranges():
    assert ranges([0, 1, 2, 5, 6, 9]) == [(0, 2), (5, 6), (9, 9)]
    assert ranges([3]) == [(3, 3)]
    assert ranges([]) == []


def test_pad_scores_zeroes_absence_neighbourhood():
    gt = np.zeros(20)
    loss = np.zeros(20)
    loss[0:5] = 1.0    # present frames 0..4
    loss[12:20] = 2.0  # present frames 12..19
    # absence interval is 5..11 (within range(len(gt)-1) = 0..18)
    out = pad_scores(loss.copy(), gt, pad_size=2)
    # interval (5, 11) widened by 2 -> zero out [3, 13)
    assert np.all(out[3:13] == 0)
    assert np.all(out[0:3] == 1.0)
    assert np.all(out[13:20] == 2.0)


def test_pad_scores_full_absence_untouched():
    gt = np.zeros(10)
    loss = np.zeros(10)
    loss[9] = 3.0  # only the final frame scored; interval (0, 8) is "whole"
    out = pad_scores(loss.copy(), gt, pad_size=2)
    assert out[9] == 3.0


def test_avenue_mask_lengths():
    masks = get_avenue_mask()
    assert {k: len(v) for k, v in masks.items()} == {
        1: 1439, 2: 1211, 3: 923, 6: 1283, 16: 740}


def _write_gt(dirpath, scene, clip, gt):
    os.makedirs(dirpath, exist_ok=True)
    np.save(os.path.join(dirpath, f'{scene}_{clip}.npy'), gt)


def test_post_processing_perfect_separation(tmp_path):
    # Two clips, one actor each; windows covering every frame; anomalous
    # frames get much higher window losses -> AUC must be ~1.
    gt_dir = str(tmp_path / 'gt')
    n_frames = 120
    rngs = np.random.default_rng(0)
    outs, metas, frames_list, trans_list = [], [], [], []
    for clip in (1, 2):
        gt = np.zeros(n_frames, dtype=int)
        gt[60:90] = 1
        _write_gt(gt_dir, 1, clip, gt)
        # sliding windows of length 6, stride 1
        starts = np.arange(1, n_frames - 6 + 2)  # 1-indexed frames
        fr = starts[:, None] + np.arange(6)[None, :]
        # shift=1 -> score at frame f comes from window at f-1; give high
        # loss to windows whose shifted footprint covers gt frames
        loss = np.where((fr.max(1) >= 60) & (fr.min(1) <= 92), 5.0, 0.1)
        loss = loss + rngs.normal(0, 0.01, loss.shape)
        outs.append(loss)
        frames_list.append(fr)
        m = np.zeros((len(starts), 4), dtype=int)
        m[:, 0], m[:, 1], m[:, 2], m[:, 3] = 1, clip, 7, starts
        metas.append(m)
        trans_list.append(np.zeros(len(starts), dtype=int))
    auc = post_processing(
        np.concatenate(outs), np.concatenate(trans_list),
        np.concatenate(metas), np.concatenate(frames_list),
        gt_path=gt_dir, num_transform=1, dataset_name='UBnormal',
        split='test', use_hr=False, pad_size=-1, filter_kernel_size=4,
        frames_shift=1)
    assert auc > 0.95


def test_post_processing_multi_actor_and_transforms(tmp_path):
    gt_dir = str(tmp_path / 'gt2')
    n_frames = 60
    gt = np.zeros(n_frames, dtype=int)
    gt[30:45] = 1
    _write_gt(gt_dir, 2, 3, gt)
    starts = np.arange(1, n_frames - 6 + 2)
    fr = starts[:, None] + np.arange(6)[None, :]
    rows = []
    for trans in (0, 1):
        for actor in (1, 2):
            loss = np.where((fr.max(1) >= 30) & (fr.min(1) <= 46),
                            3.0 if actor == 1 else 1.0, 0.05)
            meta = np.zeros((len(starts), 4), dtype=int)
            meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3] = 2, 3, actor, starts
            rows.append((loss, np.full(len(starts), trans), meta, fr))
    out = np.concatenate([r[0] for r in rows])
    trans = np.concatenate([r[1] for r in rows])
    meta = np.concatenate([r[2] for r in rows])
    frames = np.concatenate([r[3] for r in rows])
    auc = post_processing(out, trans, meta, frames, gt_path=gt_dir,
                          num_transform=2, dataset_name='UBnormal',
                          split='test', use_hr=False, pad_size=-1,
                          filter_kernel_size=2, frames_shift=1)
    assert auc > 0.9


def test_post_processing_from_config_old_aug_zero_transforms(tmp_path):
    """num_transform: 0 (the old_aug random-crop path) stores windows once
    under trans index 0; per-config scoring must clamp to one transform
    instead of stacking an empty list."""
    from mocodad_tpu.config import Config
    from mocodad_tpu.eval.harness import post_processing_from_config
    gt_dir = str(tmp_path / 'gt0')
    n_frames = 60
    gt = np.zeros(n_frames, dtype=int)
    gt[30:45] = 1
    _write_gt(gt_dir, 1, 1, gt)
    starts = np.arange(1, n_frames - 6 + 2)
    fr = starts[:, None] + np.arange(6)[None, :]
    loss = np.where((fr.max(1) >= 30) & (fr.min(1) <= 46), 3.0, 0.05)
    meta = np.zeros((len(starts), 4), dtype=int)
    meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3] = 1, 1, 1, starts
    cfg = Config(num_transform=0, gt_path=gt_dir, use_hr=False, pad_size=-1,
                 filter_kernel_size=2, frames_shift=1, split='test',
                 dataset_choice='UBnormal')
    auc = post_processing_from_config(loss, np.zeros(len(starts), int),
                                      meta, fr, cfg)
    assert auc > 0.9


def test_post_processing_rejects_pose_output(tmp_path):
    gt_dir = str(tmp_path / 'gt3')
    _write_gt(gt_dir, 1, 1, np.zeros(10, dtype=int))
    with pytest.raises(ValueError):
        post_processing(np.zeros((4, 2, 3, 17)), np.zeros(4),
                        np.zeros((4, 4), int), np.zeros((4, 6), int),
                        gt_path=gt_dir, num_transform=1,
                        dataset_name='UBnormal', split='test', use_hr=False,
                        pad_size=-1, filter_kernel_size=2, frames_shift=1)


def test_roc_curve_matches_sklearn(rng):
    import sklearn.metrics as skm
    from mocodad_tpu.eval.auc import roc_curve
    y = (rng.random(150) < 0.4).astype(int)
    s = rng.normal(size=150)
    s[::5] = s[0]  # ties
    fpr, tpr, thr = roc_curve(y, s)
    sk_fpr, sk_tpr, sk_thr = skm.roc_curve(y, s, drop_intermediate=False)
    np.testing.assert_allclose(fpr, sk_fpr, atol=1e-12)
    np.testing.assert_allclose(tpr, sk_tpr, atol=1e-12)
    np.testing.assert_allclose(thr[1:], sk_thr[1:], atol=1e-12)


def test_compute_fig_matrix():
    from mocodad_tpu.eval.scoring import compute_fig_matrix
    pos = np.arange(2 * 2 * 3 * 4, dtype=float).reshape(2, 2, 3, 4)
    frames = np.array([[1, 2, 3], [5, 6, 7]])
    m = compute_fig_matrix(pos, frames, 10)
    assert m.shape == (2, 10, 8)
    want0 = pos[0].transpose(1, 2, 0).reshape(3, 8)
    np.testing.assert_array_equal(m[0, 0:3], want0)
    assert np.all(m[0, 3:] == 0)
    np.testing.assert_array_equal(m[1, 4:7],
                                  pos[1].transpose(1, 2, 0).reshape(3, 8))


def test_load_tensors_reads_reference_pt_caches(tmp_path):
    """The reference writes its saved-tensor cache as torch .pt files
    (ref models/mocodad.py:583-603); load_tensors must read those
    directly so its caches replay here unchanged."""
    import torch

    from mocodad_tpu.utils.tensors import load_tensors, tensors_dir

    d = tensors_dir(str(tmp_path), 'test', 'best', 5)
    os.makedirs(d)
    rng = np.random.default_rng(0)
    want = {'prediction': rng.gamma(1.0, 1.0, 32).astype(np.float32),
            'gt_data': rng.normal(size=(32, 2, 6, 17)).astype(np.float32),
            'trans': np.zeros(32, np.int64),
            'metadata': np.zeros((32, 4), np.int64),
            'frames': np.tile(np.arange(1, 7), (32, 1))}
    for name, arr in want.items():
        torch.save(torch.from_numpy(arr), os.path.join(d, name + '.pt'))

    got = load_tensors(str(tmp_path), 'test', 'best', 5)
    assert set(got) == set(want)
    for name in want:
        np.testing.assert_array_equal(got[name], want[name])


def test_load_tensors_missing_cache_names_profile_lever(tmp_path):
    """A missing cache directory must name the resolved path and explain
    that the sampling settings (eval_profile / fast_profile_samples /
    n_generated_samples) pick the `_{n}` suffix — the failure mode is a
    replay config whose `eval_profile: fast` was added after the cache
    was exported at the full count."""
    from mocodad_tpu.utils.tensors import load_tensors, tensors_dir

    with pytest.raises(FileNotFoundError) as e:
        load_tensors(str(tmp_path), 'test', 'best', 10)
    msg = str(e.value)
    assert tensors_dir(str(tmp_path), 'test', 'best', 10) in msg
    assert 'eval_profile' in msg and 'n_generated_samples' in msg


def test_roc_auc_rejects_nan_scores():
    """A NaN score ranks last in np.unique and would silently count as
    the MAXIMAL anomaly; sklearn raises — so do we."""
    y = np.array([0, 1, 0, 1])
    s = np.array([0.1, 0.9, np.nan, 0.8])
    with pytest.raises(ValueError, match='NaN'):
        roc_auc_score(y, s)
