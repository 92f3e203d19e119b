"""Data-pipeline parity against the REAL reference dataset code.

The reference's dataset stack (utils/dataset.py, utils/get_robust_data.py,
utils/data.py, utils/preprocessing.py, utils/dataset_utils.py) imports
cleanly in this image (sklearn/scipy/torch present), so the actual
implementations are the oracle:

  * the live CSV "robust" path: real `PoseDatasetRobust` vs
    `robust_pose_windows` on the same synthetic trajectory tree, both
    splits (test exercises the persisted-scaler reload), window data to
    f32 tolerance, meta/frames exactly;
  * the legacy AlphaPose-JSON path: real `PoseDataset` vs
    `json_pose_windows` for the markovitz (kp17 and kp18), bbox and stan
    normalizers — exact equality.

The reference uses `np.int` (removed in numpy>=1.24,
utils/dataset_utils.py:17,240); the fixture re-aliases it, which is one
of the documented reference crashes this framework fixes.
"""

import json
import os
import sys

import numpy as np
import pytest

REF = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference checkout not available')
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)
if not hasattr(np, 'int'):
    np.int = int


def _sorted_by_meta(meta):
    m = np.asarray(meta, np.int64)
    return np.lexsort(m.T[::-1])


@pytest.fixture(scope='module')
def csv_tree(tmp_path_factory):
    from mocodad_tpu.data import synthetic
    d = str(tmp_path_factory.mktemp('csv_oracle'))
    synthetic.generate(d, seed=77, n_clips_per_split=2, n_actors=3,
                       n_frames=80)
    return d


@pytest.fixture(scope='module')
def dirs(tmp_path_factory):
    return (str(tmp_path_factory.mktemp('ref_exp')),
            str(tmp_path_factory.mktemp('our_exp')))


@pytest.mark.parametrize('split', ['train', 'test'])
def test_csv_robust_path_matches_reference(csv_tree, dirs, split):
    """Real PoseDatasetRobust (utils/dataset.py:207-281 via
    data_of_combined_model, utils/get_robust_data.py:24-190) vs
    robust_pose_windows.  'train' fits + persists the scaler on each side;
    'test' reloads it (pickle there, .npz here)."""
    from mocodad_tpu.data.robust import robust_pose_windows
    from utils.dataset import PoseDatasetRobust

    ref_dir, our_dir = dirs
    ref = PoseDatasetRobust(
        path_to_data=csv_tree, include_global=False, split=split,
        exp_dir=ref_dir, transform_list=None, seg_len=6, seg_stride=2,
        vid_res=[640, 360], normalization_strategy='robust',
        normalize_pose=True, kp18_format=False, headless=False,
        num_coords=2)
    data, meta, frames = robust_pose_windows(
        trajectories_path=csv_tree, split=split, seg_len=6, seg_stride=2,
        vid_res=[640, 360], normalization_strategy='robust',
        exp_dir=our_dir)

    assert ref.segs_data_np.shape == data.shape
    ri = _sorted_by_meta(ref.segs_meta)
    oi = _sorted_by_meta(meta)
    np.testing.assert_array_equal(
        np.asarray(ref.segs_meta, np.int64)[ri],
        np.asarray(meta, np.int64)[oi])
    np.testing.assert_array_equal(
        np.asarray(ref.segs_ids, np.int64)[ri],
        np.asarray(frames, np.int64)[oi])
    np.testing.assert_allclose(ref.segs_data_np[ri], data[oi], atol=2e-5)


@pytest.fixture(scope='module')
def json_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('json_oracle'))
    rng = np.random.default_rng(5)
    clip = {}
    for pid in ('1', '2'):
        person = {}
        for f in range(40):
            if pid == '2' and f in (15, 16):   # a hole: windowing must skip
                continue
            person[str(f)] = {'keypoints': rng.uniform(10, 300, 51).tolist()}
        clip[pid] = person
    with open(os.path.join(root, '01_0001_alphapose_tracked_person.json'),
              'w') as f:
        json.dump(clip, f)
    return root


@pytest.mark.parametrize('strategy,kp18', [
    ('markovitz', True), ('markovitz', False),
    ('bbox', False), ('stan', False),
])
def test_json_path_matches_reference(json_tree, strategy, kp18):
    """Real PoseDataset (utils/dataset.py:13-199) vs json_pose_windows —
    exact equality across normalizers and the kp17->18 conversion."""
    from mocodad_tpu.data.json_pose import json_pose_windows
    from utils.dataset import PoseDataset

    ref = PoseDataset(path_to_json_dir=json_tree, transform_list=None,
                      return_indices=False, return_metadata=True,
                      seg_len=6, seg_stride=1,
                      normalization_strategy=strategy, kp18_format=kp18,
                      vid_res=[640, 360], num_coords=2, return_mean=False,
                      normalize_pose=True, headless=False,
                      symm_range=True, sub_mean=False)
    data, meta, frames, _ = json_pose_windows(
        json_tree, seg_len=6, seg_stride=1, normalization_strategy=strategy,
        kp18_format=kp18, vid_res=[640, 360], symm_range=True,
        sub_mean=False, return_mean=False)

    ri = _sorted_by_meta(ref.segs_meta)
    oi = _sorted_by_meta(meta)
    np.testing.assert_array_equal(
        np.asarray(ref.segs_meta, np.int64)[ri],
        np.asarray(meta, np.int64)[oi])
    np.testing.assert_array_equal(
        np.asarray(ref.segs_ids, np.int64)[ri],
        np.asarray(frames, np.int64)[oi])
    np.testing.assert_array_equal(
        np.asarray(ref.segs_data_np, np.float32)[ri], data[oi])


@pytest.mark.parametrize('seed,n_clips,n_actors,n_frames,stride', [
    (11, 1, 2, 40, 1),
    (23, 3, 2, 64, 3),
    (31, 2, 4, 100, 2),
])
def test_csv_robust_path_matches_reference_randomized(
        tmp_path_factory, seed, n_clips, n_actors, n_frames, stride):
    """The CSV-path oracle across randomized dataset shapes (clip/actor
    counts, track lengths, window strides) — guards the windowing and
    scaler plumbing beyond the single fixture geometry."""
    from mocodad_tpu.data import synthetic
    from mocodad_tpu.data.robust import robust_pose_windows
    from utils.dataset import PoseDatasetRobust

    d = str(tmp_path_factory.mktemp(f'csv_rand{seed}'))
    synthetic.generate(d, seed=seed, n_clips_per_split=n_clips,
                       n_actors=n_actors, n_frames=n_frames)
    ref_dir = str(tmp_path_factory.mktemp(f'ref{seed}'))
    our_dir = str(tmp_path_factory.mktemp(f'our{seed}'))

    for split in ('train', 'test'):
        ref = PoseDatasetRobust(
            path_to_data=d, include_global=False, split=split,
            exp_dir=ref_dir, transform_list=None, seg_len=6,
            seg_stride=stride, vid_res=[640, 360],
            normalization_strategy='robust', normalize_pose=True,
            kp18_format=False, headless=False, num_coords=2)
        data, meta, frames = robust_pose_windows(
            trajectories_path=d, split=split, seg_len=6,
            seg_stride=stride, vid_res=[640, 360],
            normalization_strategy='robust', exp_dir=our_dir)
        assert ref.segs_data_np.shape == data.shape
        ri = _sorted_by_meta(ref.segs_meta)
        oi = _sorted_by_meta(meta)
        np.testing.assert_array_equal(
            np.asarray(ref.segs_meta, np.int64)[ri],
            np.asarray(meta, np.int64)[oi])
        np.testing.assert_array_equal(
            np.asarray(ref.segs_ids, np.int64)[ri],
            np.asarray(frames, np.int64)[oi])
        np.testing.assert_allclose(ref.segs_data_np[ri], data[oi],
                                   atol=2e-5)


@pytest.mark.parametrize('kp18,headless', [(True, False), (False, True)])
def test_csv_robust_joint_remaps_match_reference(tmp_path_factory, kp18,
                                                 headless):
    """kp17->18 conversion and headless(14) trim on the robust CSV path
    (ref utils/dataset.py:269-274) vs robust_pose_windows."""
    from mocodad_tpu.data import synthetic
    from mocodad_tpu.data.robust import robust_pose_windows
    from utils.dataset import PoseDatasetRobust

    d = str(tmp_path_factory.mktemp(f'csv_remap{int(kp18)}{int(headless)}'))
    synthetic.generate(d, seed=9, n_clips_per_split=2, n_actors=2,
                       n_frames=50)
    ref_dir = str(tmp_path_factory.mktemp('ref_remap'))
    our_dir = str(tmp_path_factory.mktemp('our_remap'))

    ref = PoseDatasetRobust(
        path_to_data=d, include_global=False, split='train',
        exp_dir=ref_dir, transform_list=None, seg_len=6, seg_stride=1,
        vid_res=[640, 360], normalization_strategy='robust',
        normalize_pose=True, kp18_format=kp18, headless=headless,
        num_coords=2)
    data, meta, frames = robust_pose_windows(
        trajectories_path=d, split='train', seg_len=6, seg_stride=1,
        vid_res=[640, 360], normalization_strategy='robust',
        exp_dir=our_dir, kp18_format=kp18, headless=headless)

    assert ref.segs_data_np.shape == data.shape
    ri = _sorted_by_meta(ref.segs_meta)
    oi = _sorted_by_meta(meta)
    np.testing.assert_allclose(ref.segs_data_np[ri], data[oi], atol=2e-5)
