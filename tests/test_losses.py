import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mocodad_tpu.models.losses import (aggregate, elementwise_loss,
                                       per_sample_losses)


@pytest.mark.parametrize('kind,torch_fn', [
    ('l1', torch.nn.L1Loss(reduction='none')),
    ('mse', torch.nn.MSELoss(reduction='none')),
    ('smooth_l1', torch.nn.SmoothL1Loss(reduction='none')),
])
def test_elementwise_losses_match_torch(kind, torch_fn, rng):
    a = rng.normal(size=(16, 8)).astype(np.float32) * 3
    b = rng.normal(size=(16, 8)).astype(np.float32) * 3
    got = np.asarray(elementwise_loss(kind, jnp.asarray(a), jnp.asarray(b)))
    want = torch_fn(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _setup(rng, s=6, b=5, shape=(2, 3, 17)):
    xs = rng.normal(size=(s, b) + shape).astype(np.float32)
    tgt = rng.normal(size=(b,) + shape).astype(np.float32)
    return jnp.asarray(xs), jnp.asarray(tgt), xs, tgt


def _torch_losses(xs, tgt):
    loss = torch.nn.SmoothL1Loss(reduction='none')
    out = []
    for x in xs:
        l = loss(torch.from_numpy(x), torch.from_numpy(tgt))
        out.append(l.reshape(l.shape[0], -1).mean(-1))
    return torch.stack(out)  # (S, B)


def test_per_sample_losses_match_torch(rng):
    xs_j, tgt_j, xs, tgt = _setup(rng)
    got = np.asarray(per_sample_losses('smooth_l1', xs_j, tgt_j))
    np.testing.assert_allclose(got, _torch_losses(xs, tgt).numpy(),
                               rtol=1e-5, atol=1e-6)


def test_aggregate_best_worst_match_torch_semantics(rng):
    xs_j, tgt_j, xs, tgt = _setup(rng)
    tl = _torch_losses(xs, tgt)
    for strat, red in [('best', tl.min(0)), ('worst', tl.max(0))]:
        sel, loss = aggregate(strat, 'smooth_l1', xs_j, tgt_j)
        np.testing.assert_allclose(np.asarray(loss), red.values.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sel), xs[red.indices.numpy(), np.arange(xs.shape[1])],
            rtol=1e-6)


def test_aggregate_best_worst_skip_nan(rng):
    """The reference's running-comparison loop (models/mocodad.py:504-512)
    never selects a NaN loss; a bare argmin/argmax would."""
    xs_j, tgt_j, xs, tgt = _setup(rng)
    xs_nan = xs.copy()
    xs_nan[0, 1] = np.nan                   # sample 0 of window 1
    tl = _torch_losses(xs[1:], tgt).numpy()  # finite samples only
    got_best = np.asarray(aggregate('best', 'smooth_l1',
                                    jnp.asarray(xs_nan), tgt_j)[1])
    got_worst = np.asarray(aggregate('worst', 'smooth_l1',
                                     jnp.asarray(xs_nan), tgt_j)[1])
    assert np.isfinite(got_best).all() and np.isfinite(got_worst).all()
    np.testing.assert_allclose(got_best[1], tl[:, 1].min(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_worst[1], tl[:, 1].max(),
                               rtol=1e-5, atol=1e-6)
    # all samples NaN for a window: a big sentinel (inf), never NaN,
    # mirroring the reference's untouched 1e10 initialization
    xs_nan[:, 2] = np.nan
    loss_all = np.asarray(aggregate('best', 'smooth_l1',
                                    jnp.asarray(xs_nan), tgt_j)[1])
    assert not np.isnan(loss_all).any() and np.isposinf(loss_all[2])


def test_aggregate_median_matches_torch_lower_median(rng):
    # even sample count: torch.median picks the LOWER middle element
    xs_j, tgt_j, xs, tgt = _setup(rng, s=6)
    tl = _torch_losses(xs, tgt)
    _, loss = aggregate('median', 'smooth_l1', xs_j, tgt_j)
    np.testing.assert_allclose(np.asarray(loss),
                               tl.median(dim=0).values.numpy(),
                               rtol=1e-5, atol=1e-6)
    # median_pose: elementwise lower median of the samples
    sel, _ = aggregate('median_pose', 'smooth_l1', xs_j, tgt_j)
    want = torch.from_numpy(xs).median(dim=0).values.numpy()
    np.testing.assert_allclose(np.asarray(sel), want, rtol=1e-6)


def test_aggregate_quantile_matches_torch(rng):
    xs_j, tgt_j, xs, tgt = _setup(rng)
    tl = _torch_losses(xs, tgt)
    _, loss = aggregate('quantile:0.3', 'smooth_l1', xs_j, tgt_j)
    want = torch.quantile(tl, 0.3, dim=0).numpy()
    np.testing.assert_allclose(np.asarray(loss), want, rtol=1e-4, atol=1e-6)


def test_aggregate_mean_and_all(rng):
    xs_j, tgt_j, xs, tgt = _setup(rng)
    tl = _torch_losses(xs, tgt).numpy()
    sel, loss = aggregate('mean', 'smooth_l1', xs_j, tgt_j)
    assert sel is None
    np.testing.assert_allclose(np.asarray(loss), tl.mean(0), rtol=1e-5,
                               atol=1e-6)
    sel, loss = aggregate('all', 'smooth_l1', xs_j, tgt_j)
    assert sel.shape == (5, 6, 2, 3, 17) and loss.shape == (5, 6)
    np.testing.assert_allclose(np.asarray(loss), tl.T, rtol=1e-5, atol=1e-6)


def test_aggregate_random_is_valid_choice(rng):
    xs_j, tgt_j, xs, tgt = _setup(rng)
    sel, loss = aggregate('random', 'smooth_l1', xs_j, tgt_j,
                          rng=jax.random.key(0))
    assert sel.shape == tgt_j.shape and loss.shape == (5,)
    # each selected row equals one of the generated samples
    sel_np = np.asarray(sel)
    for bi in range(5):
        assert any(np.allclose(sel_np[bi], xs[si, bi]) for si in range(6))


def test_aggregate_unknown_raises(rng):
    xs_j, tgt_j, _, _ = _setup(rng)
    with pytest.raises(ValueError):
        aggregate('nope', 'smooth_l1', xs_j, tgt_j)
