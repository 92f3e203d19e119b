"""AlphaPose tracked-person JSON -> CSV trajectory conversion, fed into
the real robust-path dataset builder."""

import json
import os

import numpy as np

from mocodad_tpu.data.convert import (convert_split,
                                      tracked_json_to_trajectories)


def _tracked_json(tmp_path, scene=2, clip=3, n_frames=20, persons=(1, 2)):
    rng = np.random.default_rng(0)
    tracked = {}
    for pid in persons:
        frames = {}
        for f in range(n_frames):
            kp = rng.uniform(10, 300, (17, 2))
            conf = rng.uniform(0.5, 1.0, (17, 1))
            frames[str(f)] = {'keypoints':
                              np.concatenate([kp, conf], 1).reshape(-1)
                              .tolist()}
        tracked[str(pid)] = frames
    path = tmp_path / f'{scene}_{clip}_alphapose_tracked_person.json'
    path.write_text(json.dumps(tracked))
    return str(path)


def test_tracked_json_to_trajectories_layout(tmp_path):
    jp = _tracked_json(tmp_path)
    out = tmp_path / 'trajectories'
    n = tracked_json_to_trajectories(jp, str(out))
    assert n == 2
    csvs = sorted(os.listdir(out / '2-3'))
    assert csvs == ['0001.csv', '0002.csv']
    rows = np.loadtxt(out / '2-3' / '0001.csv', delimiter=',')
    assert rows.shape == (20, 35)          # frame + 17*(x, y)
    assert np.array_equal(rows[:, 0], np.arange(20))


def test_converted_csvs_feed_the_robust_pipeline(tmp_path):
    jp = _tracked_json(tmp_path, n_frames=30)
    data_dir = tmp_path / 'data'
    out = data_dir / 'training' / 'trajectories'
    convert_split(str(tmp_path), str(out))

    from mocodad_tpu.data.robust import robust_pose_windows
    os.makedirs(tmp_path / 'ckpt', exist_ok=True)
    data, meta, frames = robust_pose_windows(
        trajectories_path=str(data_dir) + '/', split='train', seg_len=6,
        seg_stride=1, vid_res=[320, 320], normalization_strategy='robust',
        exp_dir=str(tmp_path / 'ckpt'), normalize_pose=True,
        include_global=False, debug=False, kp18_format=False,
        headless=False)
    assert data.shape[1:] == (3, 6, 17) and data.shape[0] > 0
    assert np.all(np.isfinite(data))
    # scene/clip metadata parsed from the converted folder name
    assert set(map(tuple, meta[:, :2])) == {(2, 3)}
