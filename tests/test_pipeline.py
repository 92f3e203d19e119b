import json
import os

import numpy as np
import pytest

from mocodad_tpu.config import Config
from mocodad_tpu.data import build_dataset, make_loader, num_batches
from mocodad_tpu.data import synthetic
from mocodad_tpu.data.json_pose import (is_seg_continuous, json_pose_windows,
                                        keypoints17_to_coco18)


@pytest.fixture(scope='module')
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('synth')
    synthetic.generate(str(d), seed=0, n_clips_per_split=2, n_actors=2,
                       n_frames=60)
    return str(d)


def _cfg(synth_dir, tmp_path, split='train'):
    return Config(
        split=split, data_dir=synth_dir, exp_dir=str(tmp_path),
        ckpt_dir=str(tmp_path), dataset_choice='UBnormal', seg_len=6,
        vid_res=[640, 360], num_coords=2, num_transform=2, seg_stride=1,
        normalization_strategy='robust', batch_size=32,
        test_path=os.path.join(synth_dir, 'testing', 'test_frame_mask'))


def test_robust_pipeline_train_then_test(synth_dir, tmp_path):
    cfg = _cfg(synth_dir, tmp_path)
    ds = build_dataset(cfg, 'train')
    assert ds.data.ndim == 4 and ds.data.shape[1:] == (2, 6, 17)
    assert ds.meta.shape == (ds.num_samples, 4)
    assert ds.frames.shape == (ds.num_samples, 6)
    assert len(ds) == 2 * ds.num_samples  # num_transform = 2
    # train fit persisted the scaler artifact
    assert os.path.exists(os.path.join(cfg.ckpt_dir, 'local_robust.npz'))
    # data is scaled: non-missing coordinates roughly centred
    assert abs(float(np.mean(ds.data))) < 1.0

    # test split loads the train scaler (no _val artifact for UBnormal path)
    ds_test = build_dataset(cfg, 'test')
    assert ds_test.num_samples > 0
    # meta scene/clip ids match the synthetic layout
    assert set(np.unique(ds_test.meta[:, 0])) == {1}
    assert set(np.unique(ds_test.meta[:, 1])) <= {1, 2}


def test_loader_padding_and_index_mapping(synth_dir, tmp_path):
    cfg = _cfg(synth_dir, tmp_path)
    ds = build_dataset(cfg, 'train')
    batches = list(make_loader(ds, batch_size=32, shuffle=False))
    assert len(batches) == num_batches(ds, 32)
    total_valid = sum(int(b['mask'].sum()) for b in batches)
    assert total_valid == len(ds)
    for b in batches:
        assert b['data'].shape == (32, 2, 6, 17)
        assert b['trans'].shape == (32,)
    # sequential order: first num_samples items are transform 0, then 1
    flat_trans = np.concatenate([b['trans'][b['mask'] > 0] for b in batches])
    assert np.all(flat_trans[:ds.num_samples] == 0)
    assert np.all(flat_trans[ds.num_samples:] == 1)


def test_loader_padding_wraps_epoch_order(synth_dir, tmp_path):
    """Padded tail rows must be real windows wrapped from the (shuffled)
    epoch order, not duplicates of one row: padded rows are loss-masked
    but still enter BatchNorm batch statistics in train mode, so filler
    must follow the data distribution."""
    cfg = _cfg(synth_dir, tmp_path)
    ds = build_dataset(cfg, 'train')
    bs = next(b for b in (31, 29, 27) if len(ds) % b)
    batches = list(make_loader(ds, batch_size=bs, shuffle=True, seed=3,
                               yield_indices=True))
    last = batches[-1]
    valid = int(last['mask'].sum())
    assert 0 < valid < bs
    order = np.arange(len(ds))
    np.random.default_rng(3).shuffle(order)
    pad_expected = np.resize(order, bs - valid)
    n = ds.num_samples
    np.testing.assert_array_equal(last['idx'][valid:], pad_expected % n)
    np.testing.assert_array_equal(last['trans'][valid:], pad_expected // n)


def test_loader_shuffle_covers_all(synth_dir, tmp_path):
    cfg = _cfg(synth_dir, tmp_path)
    ds = build_dataset(cfg, 'train')
    b1 = list(make_loader(ds, batch_size=64, shuffle=True, seed=1))
    b2 = list(make_loader(ds, batch_size=64, shuffle=True, seed=2))
    assert not np.array_equal(b1[0]['data'], b2[0]['data'])
    total = sum(int(b['mask'].sum()) for b in b1)
    assert total == len(ds)


def test_gt_masks_exist(synth_dir):
    masks = os.listdir(os.path.join(synth_dir, 'testing', 'test_frame_mask'))
    assert len(masks) == 2
    gt = np.load(os.path.join(synth_dir, 'testing', 'test_frame_mask',
                              masks[0]))
    assert gt.ndim == 1 and set(np.unique(gt)) <= {0, 1}
    assert gt.sum() > 0  # anomalies present


# ---------- JSON path ----------

def _make_json_clip(tmp_path, n_frames=30, missing=()):
    clip = {}
    rng = np.random.default_rng(0)
    person = {}
    for f in range(n_frames):
        if f in missing:
            continue
        person[str(f)] = {
            'keypoints': rng.uniform(10, 300, size=51).tolist()}
    clip['1'] = person
    d = tmp_path / 'jsondata'
    d.mkdir(exist_ok=True)
    with open(d / '01_0001_alphapose_tracked_person.json', 'w') as f:
        json.dump(clip, f)
    return str(d)


def test_json_pose_windows_markovitz(tmp_path):
    path = _make_json_clip(tmp_path)
    data, meta, frames, _ = json_pose_windows(
        path, seg_len=6, seg_stride=1, normalization_strategy='markovitz',
        kp18_format=True, vid_res=[640, 360], symm_range=True,
        sub_mean=True, return_mean=False)
    assert data.shape[1:] == (3, 6, 18)  # kp18 conversion applied
    assert meta.shape[1] == 4
    assert np.all(meta[:, 0] == 1) and np.all(meta[:, 1] == 1)
    assert np.all(np.isfinite(data))


def test_json_windowing_skips_discontinuous(tmp_path):
    # missing 3 consecutive frames: windows crossing the hole are dropped
    path = _make_json_clip(tmp_path, n_frames=30, missing=(10, 11, 12))
    data, meta, frames, _ = json_pose_windows(
        path, seg_len=6, seg_stride=1, normalize=False,
        kp18_format=False)
    # frame ids within each window span at most seg_len+missing_th
    assert np.all(frames[:, -1] - frames[:, 0] <= 6 + 2 - 1 + 2)
    assert data.shape[0] == meta.shape[0] == frames.shape[0]


def test_is_seg_continuous():
    keys = [0, 1, 2, 3, 4, 5, 8, 9, 10, 11, 12, 13]
    assert is_seg_continuous(keys, 0, 6)         # 0..5 complete
    # 4..9 expects {4..9}; actual keys from 4: [4,5,8,9,10,11] overlap={4,5,8,9}
    # = 4 >= 6-2 -> continuous at the default threshold, not at th=1
    assert is_seg_continuous(keys, 4, 6, missing_th=2)
    assert not is_seg_continuous(keys, 4, 6, missing_th=1)


def test_keypoints17_to_coco18():
    kp = np.zeros((2, 4, 17, 3))
    kp[..., 5, :] = 1.0  # left shoulder
    kp[..., 6, :] = 3.0  # right shoulder
    out = keypoints17_to_coco18(kp)
    assert out.shape == (2, 4, 18, 3)
    np.testing.assert_allclose(out[..., 1, :], 2.0)  # neck = mean shoulders


def test_loader_double_item(synth_dir, tmp_path):
    cfg = _cfg(synth_dir, tmp_path)
    ds = build_dataset(cfg, 'train')
    b = next(make_loader(ds, batch_size=16, double_item=True))
    assert 'data2' in b and b['data2'].shape == b['data'].shape
    assert b['data2'].dtype == np.float32
    # the strong augmentation actually changes the view
    assert not np.allclose(b['data2'], b['data'])


def test_include_global_num_coords_6(synth_dir, tmp_path):
    # num_coords == 6 activates the global bbox-feature channels
    # (ref: utils/dataset.py:312; the reference's broadcast here is
    # shape-invalid -- we broadcast over joints explicitly)
    cfg = _cfg(synth_dir, tmp_path)
    cfg.num_coords = 6
    ds = build_dataset(cfg, 'train')
    assert ds.data.shape[1:] == (6, 6, 17)
    # channels 2:6 are per-frame global features, constant across joints
    g = ds.data[:, 2:6]
    assert np.allclose(g, g[:, :, :, :1])
    assert np.all(np.isfinite(ds.data))


def test_global_scaler_loads_train_artifact_on_validation(synth_dir,
                                                          tmp_path):
    """The reference's _val refit rule exists ONLY for the local scaler
    (utils/get_robust_data.py:116-127); the global block (:85-90) always
    loads the train-fitted artifact on non-train splits."""
    cfg = _cfg(synth_dir, tmp_path)
    cfg.num_coords = 6
    build_dataset(cfg, 'train')
    cfg_val = _cfg(synth_dir, tmp_path, split='validation')
    cfg_val.num_coords = 6
    cfg_val.validation = True
    build_dataset(cfg_val, 'validation')
    assert os.path.exists(os.path.join(str(tmp_path), 'local_robust.npz'))
    assert os.path.exists(
        os.path.join(str(tmp_path), 'local_robust_val.npz'))
    assert os.path.exists(os.path.join(str(tmp_path), 'global_robust.npz'))
    assert not os.path.exists(
        os.path.join(str(tmp_path), 'global_robust_val.npz')), \
        'global scaler must not refit on validation'


def test_synthetic_frames_are_one_indexed(synth_dir):
    """The scoring chain scatters window losses at frame-1 like the real
    datasets; a 0-based synthetic frame would wrap to the clip's last
    column and shift every score off its gt label."""
    from mocodad_tpu.data import trajectories as T
    trajs = T.load_trajectories(
        os.path.join(synth_dir, 'testing', 'trajectories'), split='test')
    all_frames = np.concatenate([t.frames for t in trajs.values()])
    assert all_frames.min() >= 1


def test_json_debug_clip_duplication_matches_reference(tmp_path):
    """Debug mode (num_clips) appends the truncated list to itself —
    doubling every debug clip (ref utils/dataset.py:144-145)."""
    path = _make_json_clip(tmp_path)
    kw = dict(seg_len=6, seg_stride=1, normalization_strategy='markovitz',
              kp18_format=True, vid_res=[640, 360], symm_range=True)
    data_all, *_ = json_pose_windows(path, **kw)
    data_dbg, *_ = json_pose_windows(path, num_clips=1, **kw)
    assert data_dbg.shape[0] == 2 * data_all.shape[0]
