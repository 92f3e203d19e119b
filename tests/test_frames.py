import jax
import jax.numpy as jnp
import numpy as np

from mocodad_tpu.models import frames as F


def _data(b=4, c=2, t=6, v=17):
    return jnp.arange(b * c * t * v, dtype=jnp.float32).reshape(b, c, t, v)


def test_static_select_and_assemble_roundtrip():
    data = _data()
    order = F.static_order((0, 2, 4), (1, 3, 5))
    cond, corrupt = F.select_frames(data, order, 3)
    np.testing.assert_array_equal(np.asarray(cond),
                                  np.asarray(data[:, :, (0, 2, 4)]))
    np.testing.assert_array_equal(np.asarray(corrupt),
                                  np.asarray(data[:, :, (1, 3, 5)]))
    # inbetween_imp assembly restores the original window exactly
    full = F.assemble_input('inbetween_imp', cond, corrupt, order, 3)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(data))
    # extraction returns the corrupted frames
    ext = F.extract_corrupt('inbetween_imp', full, order, 3)
    np.testing.assert_array_equal(np.asarray(ext), np.asarray(corrupt))


def test_concat_assembly_orders_cond_first():
    data = _data()
    # conditioning at the END of the window (allowed by the reference)
    order = F.static_order((3, 4, 5), (0, 1, 2))
    cond, corrupt = F.select_frames(data, order, 3)
    full = F.assemble_input('concat', cond, corrupt, order, 3)
    np.testing.assert_array_equal(np.asarray(full[:, :, :3]),
                                  np.asarray(data[:, :, 3:]))
    # extraction uses the ORIGINAL corrupt positions (reference quirk,
    # models/mocodad.py:836): positions 0..2 of the concat output
    ext = F.extract_corrupt('concat', full, order, 3)
    np.testing.assert_array_equal(np.asarray(ext), np.asarray(full[:, :, :3]))


def test_random_order_properties():
    order = F.random_order(jax.random.key(0), 64, 6, 3)
    o = np.asarray(order)
    assert o.shape == (64, 6)
    # each row is a permutation of 0..5
    assert all(sorted(row) == list(range(6)) for row in o)
    # both halves are sorted (position order preserved, like the reference's
    # boolean-mask indexing)
    assert np.all(np.diff(o[:, :3], axis=1) > 0)
    assert np.all(np.diff(o[:, 3:], axis=1) > 0)
    # selections actually vary across the batch
    assert len({tuple(r[:3]) for r in o}) > 1


def test_random_select_assemble_roundtrip():
    data = _data(b=8)
    order = F.random_order(jax.random.key(1), 8, 6, 3)
    cond, corrupt = F.select_frames(data, order, 3)
    full = F.assemble_input('random_imp', cond, corrupt, order, 3)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(data))
    ext = F.extract_corrupt('random_imp', full, order, 3)
    np.testing.assert_array_equal(np.asarray(ext), np.asarray(corrupt))


def test_no_condition_passthrough():
    data = _data()
    order = F.static_order((), tuple(range(6)))
    cond, corrupt = F.select_frames(data, order, 0)
    assert cond is None
    np.testing.assert_array_equal(np.asarray(corrupt), np.asarray(data))
    full = F.assemble_input('no_condition', cond, corrupt, order, 0)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(data))
