
import numpy as np
import pytest

from mocodad_tpu.data import scalers as S
from mocodad_tpu.data import trajectories as T
from mocodad_tpu.data import windows as W
from mocodad_tpu.data import transforms as TR


# ---------- scalers vs sklearn oracles ----------

def test_robust_scaler_matches_sklearn(rng):
    from sklearn.preprocessing import RobustScaler as SkRobust
    X = rng.normal(size=(200, 6)) * 5 + 2
    X[rng.random(X.shape) < 0.1] = np.nan
    ours = S.RobustScaler((10.0, 90.0)).fit(X)
    sk = SkRobust(quantile_range=(10.0, 90.0)).fit(X)
    Y = rng.normal(size=(50, 6))
    np.testing.assert_allclose(ours.transform(Y), sk.transform(Y), rtol=1e-9)
    np.testing.assert_allclose(ours.inverse_transform(ours.transform(Y)), Y,
                               rtol=1e-9)


def test_minmax_scaler_matches_sklearn(rng):
    from sklearn.preprocessing import MinMaxScaler as SkMinMax
    X = rng.normal(size=(100, 4)) * 3
    ours = S.MinMaxScaler().fit(X)
    sk = SkMinMax().fit(X)
    Y = rng.normal(size=(20, 4))
    np.testing.assert_allclose(ours.transform(Y), sk.transform(Y), rtol=1e-9)


def test_scale_trajectories_robust_zero_roundtrip(rng):
    X = rng.normal(size=(300, 8)) + 4
    X[rng.random(X.shape) < 0.15] = 0.0  # missing markers
    Xs, scaler = S.scale_trajectories(X, strategy='robust')
    # zeros (missing) must map back to exactly 0 in the output
    assert np.all(Xs[X == 0.0] == 0.0)
    # non-missing entries transformed by (x - median) / iqr
    nz = X != 0.0
    manual = (X - scaler.center_) / scaler.scale_
    np.testing.assert_allclose(Xs[nz], manual[nz], rtol=1e-9)
    # a second call with the fitted scaler reproduces the result
    Xs2, _ = S.scale_trajectories(X, scaler=scaler, strategy='robust')
    np.testing.assert_allclose(Xs, Xs2, rtol=1e-12)


def test_scaler_persistence_roundtrip(tmp_path, rng):
    X = rng.normal(size=(100, 4))
    for strategy in ['robust', 'zero_one', 'three_stds']:
        Xs, scaler = S.scale_trajectories(X, strategy=strategy)
        path = str(tmp_path / f'{strategy}.npz')
        S.save_scaler(scaler, path)
        loaded = S.load_scaler(path)
        Xs2, _ = S.scale_trajectories(X, scaler=loaded, strategy=strategy)
        np.testing.assert_allclose(Xs, Xs2, rtol=1e-12)


# ---------- bounding boxes / coordinate systems vs reference oracle ----------

def _bbox_oracle(keypoints, video_resolution):
    # scalar port of the documented reference behaviour (utils/data.py:11-43)
    width, height = video_resolution
    kp = keypoints.reshape(-1, 2)
    x, y = kp[:, 0], kp[:, 1]
    x, y = x[x != 0.0], y[y != 0.0]
    if x.size == 0 or y.size == 0:
        return 0, 0, 0, 0
    left, right, top, bottom = np.min(x), np.max(x), np.min(y), np.max(y)
    ew, eh = 0.1 * (right - left + 1), 0.1 * (bottom - top + 1)
    left = np.clip(left - ew, 0, width - 1)
    right = np.clip(right + ew, 0, width - 1)
    top = np.clip(top - eh, 0, height - 1)
    bottom = np.clip(bottom + eh, 0, height - 1)
    return (int(round(left)), int(round(right)), int(round(top)),
            int(round(bottom)))


def test_bounding_boxes_match_oracle(rng):
    res = (640, 360)
    coords = rng.uniform(0, 700, size=(50, 34)).astype(np.float32)
    coords[rng.random(coords.shape) < 0.2] = 0.0
    coords[7] = 0.0  # fully missing frame
    got = T.compute_bounding_boxes(coords, res)
    for i in range(coords.shape[0]):
        want = _bbox_oracle(coords[i], res)
        np.testing.assert_array_equal(got[i], want, err_msg=f'frame {i}')


def test_bbox_centre_coordinates_match_oracle(rng):
    res = np.array([640, 360], dtype=np.float32)
    coords = rng.uniform(1, 600, size=(30, 34)).astype(np.float32)
    coords[rng.random(coords.shape) < 0.15] = 0.0
    coords[3] = 0.0
    tr = T.Trajectory('1-2_0001', np.arange(30, dtype=np.int32),
                      coords.copy())
    tr.change_coordinate_system(res, 'bounding_box_centre')
    # oracle: scalar per-frame loop (utils/data.py:165-186)
    want = coords.copy()
    for i, kps in enumerate(want):
        if not np.any(kps):
            continue
        l, r, t_, b = _bbox_oracle(kps, res)
        cx, cy = (l + r) / 2, (t_ + b) / 2
        xs, ys = kps.reshape(-1, 2)[:, 0].copy(), kps.reshape(-1, 2)[:, 1].copy()
        xs = np.where(xs == 0.0, cx, xs) - cx
        ys = np.where(ys == 0.0, cy, ys) - cy
        wd, ht = r - l, b - t_
        xs = xs / wd if wd != 0 else np.zeros_like(xs)
        ys = ys / ht if ht != 0 else np.zeros_like(ys)
        want[i] = np.stack([xs, ys], -1).ravel()
    np.testing.assert_allclose(tr.coordinates, want, rtol=1e-5, atol=1e-6)


def test_global_features_shape_and_scale(rng):
    res = np.array([640, 360], dtype=np.float32)
    coords = rng.uniform(10, 300, size=(20, 34)).astype(np.float32)
    tr = T.Trajectory('1-1_0001', np.arange(20, dtype=np.int32), coords)
    g = tr.extract_global_features(res)
    assert g.shape == (20, 4)
    assert np.all(g[:, 2] >= 0) and np.all(g[:, 3] >= 0)  # width/height


# ---------- windowing ----------

def test_window_index_matrix_matches_reference_loop():
    # oracle: the reference's loop (utils/preprocessing.py:74-81)
    for L, il, gap in [(20, 6, 0), (30, 6, 5), (7, 6, 0), (6, 6, 0)]:
        span = il + gap * (il - 1)
        step = gap + 1
        want = [list(range(s, s + span, step))
                for s in range(0, L - span + 1)]
        got = W.window_index_matrix(L, il, gap)
        np.testing.assert_array_equal(got, np.array(want).reshape(-1, il))


def test_window_index_matrix_too_short():
    assert W.window_index_matrix(5, 6, 0).shape == (0, 6)


def test_aggregate_windows_meta(rng):
    coords = rng.normal(size=(12, 34)).astype(np.float32)
    frames = np.arange(100, 112, dtype=np.int32)
    tr = {'3-7_0002': T.Trajectory('3-7_0002', frames, coords)}
    X, meta, fr = W.aggregate_windows(tr, input_length=6, input_gap=0)
    assert X.shape == (7, 6, 34)
    assert np.all(meta[:, 0] == 3) and np.all(meta[:, 1] == 7)
    assert np.all(meta[:, 2] == 2)
    np.testing.assert_array_equal(meta[:, 3], frames[:7])
    np.testing.assert_array_equal(fr[0], frames[:6])


def test_remove_short_trajectories():
    mk = lambda n: T.Trajectory('1-1_0001', np.arange(n, dtype=np.int32),
                                np.zeros((n, 34), np.float32))
    trajs = {'a': mk(5), 'b': mk(6), 'c': mk(20)}
    kept = T.remove_short_trajectories(trajs, input_length=6, input_gap=0)
    assert set(kept) == {'b', 'c'}
    kept = T.remove_short_trajectories(trajs, input_length=6, input_gap=2)
    assert set(kept) == {'c'}  # needs 6 + 2*5 = 16 frames


# ---------- affine transforms ----------

def test_affine_matrices_match_reference_spec():
    mats = TR.affine_transform_matrices(5)
    np.testing.assert_allclose(mats[0], np.eye(3), atol=1e-7)   # identity
    # flip: x -> -x
    np.testing.assert_allclose(mats[1] @ [1, 2, 1], [-1, 2, 1], atol=1e-6)
    # rot90: (x, y) -> (-y, x)
    np.testing.assert_allclose(mats[2] @ [1, 2, 1], [-2, 1, 1], atol=1e-6)
    # rot90 + flip: (x, y) -> (y, x)
    np.testing.assert_allclose(mats[3] @ [1, 2, 1], [2, 1, 1], atol=1e-6)
    # rot45
    s = np.sqrt(2) / 2
    np.testing.assert_allclose(mats[4] @ [1, 0, 1], [s, s, 1], atol=1e-6)


def test_apply_affine_np_conf_passthrough(rng):
    pose = rng.normal(size=(3, 6, 17)).astype(np.float32)
    mat = TR.affine_matrix(rot=90, flip=True)
    out = TR.apply_affine_np(pose, mat)
    np.testing.assert_array_equal(out[2], pose[2])  # conf untouched
    np.testing.assert_allclose(out[0], pose[1], rtol=1e-5)   # x' = y
    np.testing.assert_allclose(out[1], pose[0], rtol=1e-5)   # y' = x


def test_apply_affine_batch_matches_np(rng):
    import jax.numpy as jnp
    data = rng.normal(size=(8, 2, 6, 17)).astype(np.float32)
    mats = TR.affine_transform_matrices(5)
    trans = np.array([0, 1, 2, 3, 4, 1, 2, 3], dtype=np.int32)
    got = np.asarray(TR.apply_affine_batch(jnp.asarray(data), mats,
                                           jnp.asarray(trans)))
    for i in range(8):
        want = TR.apply_affine_np(data[i], mats[trans[i]])
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_temporal_crop_shape(rng):
    pose = rng.normal(size=(2, 12, 17))
    out = TR.temporal_crop(pose, 6, rng=np.random.default_rng(0))
    assert out.shape == pose.shape


def test_aug_library_shapes(rng):
    from mocodad_tpu.data.transforms import (axis_mask, gaussian_blur,
                                             gaussian_noise, limbs_mask,
                                             random_rotate, random_time_flip,
                                             resample, shear, strong_augment,
                                             temporal_shift)
    g = np.random.default_rng(0)
    pose2 = rng.normal(size=(2, 12, 17))
    pose3 = rng.normal(size=(3, 12, 17))
    assert random_rotate(pose2, rng=g).shape == pose2.shape
    assert shear(pose3, rng=g).shape == pose3.shape
    assert gaussian_blur(pose2, rng=np.random.default_rng(1)).shape == pose2.shape
    assert temporal_shift(pose2, rng=g).shape == pose2.shape
    assert strong_augment(pose2, rng=g).shape == pose2.shape
    out = limbs_mask(pose2, p=1.0, rng=g)
    assert out.shape == pose2.shape and np.any(out == 0)
    out = axis_mask(pose2, p=1.0, rng=g)
    assert (out[0] == 0).all() or (out[1] == 0).all()
    assert random_time_flip(pose2, p=1.0, rng=g).shape == pose2.shape
    r = resample(pose2, rng=np.random.default_rng(5))
    assert r.shape[0] == 2 and r.shape[2] == 17 and 7 <= r.shape[1] <= 16


def test_resample_matches_scipy(rng):
    from scipy.signal import resample as scipy_resample
    from mocodad_tpu.data.transforms import resample
    pose = rng.normal(size=(2, 12, 17))
    # fix the random rate by seeding identically
    g = np.random.default_rng(3)
    rate = int(g.integers(7, 14)) * 0.1
    want = scipy_resample(pose, int(12 * rate), axis=1)
    got = resample(pose, rng=np.random.default_rng(3))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_gaussian_blur_constant_signal():
    # the reference kernel is unnormalized: a constant signal scales by
    # sum(w) away from the (zero-padded) edges
    from mocodad_tpu.data.transforms import gaussian_blur
    pose = np.ones((2, 40, 17))
    g = np.random.default_rng(0)
    out = gaussian_blur(pose, kernel=15, sigma=(1.0, 1.0), p=1.0, rng=g)
    idx = np.arange(-7, 8)
    wsum = np.exp(-idx**2 / 2.0).sum()
    np.testing.assert_allclose(out[:, 20], wsum, rtol=1e-9)


def test_native_csv_parser_matches_python(tmp_path, rng):
    from mocodad_tpu.data import native
    from mocodad_tpu.data.trajectories import read_csv_matrix
    m = rng.normal(size=(37, 35)).astype(np.float32)
    path = str(tmp_path / 't.csv')
    with open(path, 'w') as f:
        for row in m:
            f.write(','.join('%.6f' % v for v in row) + '\n')
    if not native.available():
        pytest.skip('no native toolchain')
    got = native.read_csv_matrix(path)
    assert got is not None and got.shape == (37, 35)
    np.testing.assert_allclose(got, m, atol=1e-6)
    # the public reader routes through the native tier transparently
    np.testing.assert_allclose(read_csv_matrix(path), m, atol=1e-6)


def test_native_csv_parser_handles_trailing_newline_and_ints(tmp_path):
    from mocodad_tpu.data import native
    if not native.available():
        pytest.skip('no native toolchain')
    path = str(tmp_path / 'u.csv')
    with open(path, 'w') as f:
        f.write('5,1.5,2\n6,2.5,3\n\n')  # trailing blank line
    got = native.read_csv_matrix(path)
    np.testing.assert_allclose(got, [[5, 1.5, 2], [6, 2.5, 3]])


def test_handle_zeros_in_scale_near_constant():
    """sklearn 1.3 (the reference's pin) treats any scale < 10*eps as
    constant (scale 1), not just exact zeros — a ~1e-16 quantile range
    must not blow a feature up by 1e15."""
    X = np.zeros((50, 3), dtype=np.float64)
    X[:, 0] = np.linspace(0, 1, 50)            # real spread
    X[:, 1] = 1.0
    X[:, 1][::2] += 1e-16                      # round-off-level range
    X[:, 2] = 5.0                              # exactly constant
    from sklearn.preprocessing import RobustScaler as SkRobust
    sk = SkRobust(quantile_range=(10.0, 90.0)).fit(X)
    ours = S.RobustScaler((10.0, 90.0)).fit(X)
    np.testing.assert_allclose(ours.scale_, sk.scale_)
    got = ours.transform(X)
    assert np.abs(got).max() < 1e3


def test_quantile_transform_matches_sklearn_with_ties(rng):
    """Tied scores (every actor-less frame scores exactly 0) must map to
    ONE shared quantile, as sklearn's quantile_transform does — not to
    distinct position-dependent ranks (ref utils/data.py:440-444)."""
    from sklearn.preprocessing import quantile_transform
    from mocodad_tpu.data.trajectories import quantile_transform_errors
    y = rng.normal(size=200).astype(np.float64)
    y[::3] = 0.0                                # heavy ties
    want = quantile_transform(y.reshape(-1, 1)).reshape(-1)
    got = quantile_transform_errors({'c0': y.copy()})['c0']
    np.testing.assert_allclose(got, want, atol=1e-12)
    # all ties share one output value
    assert len(np.unique(got[y == 0.0])) == 1


def test_random_rotate_repads_channels_each_rotation(rng):
    """The reference re-pads 2->3 channels by repetition and truncates
    back after EVERY rotation (utils/tools.py:117-119): the 3rd channel
    entering the second rotation is the current x, not the rotated z."""
    import math as _math

    from mocodad_tpu.data.transforms import random_rotate
    pose = rng.normal(size=(2, 6, 17)).astype(np.float64)
    got = random_rotate(pose, rng=np.random.default_rng(5))

    r = np.random.default_rng(5)
    main_axis = int(r.integers(0, 3))
    seq = np.transpose(pose, (1, 2, 0))
    for axis in (0, 1):
        hi = 30 if axis == main_axis else 1
        a = _math.radians(r.uniform(0, hi))
        c, s = _math.cos(a), _math.sin(a)
        R = (np.array([[1, 0, 0], [0, c, s], [0, -s, c]]) if axis == 0
             else np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]]))
        seq3 = np.tile(seq, (1, 1, 2))[:, :, :3]   # [x, y, x] each time
        seq = np.matmul(seq3, R.T)[:, :, :2]
    np.testing.assert_allclose(got, np.transpose(seq, (2, 0, 1)),
                               rtol=1e-12, atol=1e-12)
