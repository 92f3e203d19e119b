import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocodad_tpu import diffusion


def _reference_cosine_betas(n):
    # Independent re-derivation of the squared-cosine schedule
    # (oracle for utils/diffusion_utils.py:38-44 behaviour).
    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    return np.array([
        min(1 - alpha_bar((i + 1) / n) / alpha_bar(i / n), 0.999)
        for i in range(n)
    ])


@pytest.mark.parametrize('n', [10, 50])
def test_cosine_schedule_matches_reference_formula(n):
    got = diffusion.cosine_beta_schedule(n)
    want = _reference_cosine_betas(n)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_schedule_tables():
    sched = diffusion.make_schedule(10)
    assert sched.noise_steps == 10
    np.testing.assert_allclose(np.asarray(sched.alpha),
                               1.0 - np.asarray(sched.beta), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.alpha_hat),
                               np.cumprod(np.asarray(sched.alpha)), rtol=1e-5)
    # alpha_hat strictly decreasing in (0, 1]
    ah = np.asarray(sched.alpha_hat)
    assert np.all(np.diff(ah) < 0) and np.all(ah > 0) and np.all(ah <= 1)


def test_sample_timesteps_range():
    sched_steps = 10
    t = diffusion.sample_timesteps(jax.random.key(0), 4096, sched_steps)
    t = np.asarray(t)
    assert t.min() >= 1 and t.max() <= sched_steps - 1
    # both endpoints reachable
    assert 1 in t and (sched_steps - 1) in t


def test_forward_noise_matches_closed_form():
    sched = diffusion.make_schedule(10)
    x = jnp.ones((8, 2, 3, 17))
    t = jnp.array([1, 2, 3, 4, 5, 6, 7, 9])
    x_t, eps = diffusion.forward_noise(sched, jax.random.key(1), x, t)
    a_hat = np.asarray(sched.alpha_hat)[np.asarray(t)]
    want = (np.sqrt(a_hat)[:, None, None, None] * np.asarray(x)
            + np.sqrt(1 - a_hat)[:, None, None, None] * np.asarray(eps))
    np.testing.assert_allclose(np.asarray(x_t), want, rtol=1e-5, atol=1e-6)


def test_reverse_sample_deterministic_and_shaped():
    sched = diffusion.make_schedule(10)

    def denoise(x, t):
        return 0.1 * x

    out1 = diffusion.reverse_sample(sched, denoise, jax.random.key(7),
                                    (4, 2, 3, 17))
    out2 = diffusion.reverse_sample(sched, denoise, jax.random.key(7),
                                    (4, 2, 3, 17))
    assert out1.shape == (4, 2, 3, 17)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = diffusion.reverse_sample(sched, denoise, jax.random.key(8),
                                    (4, 2, 3, 17))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_reverse_sample_zero_net_reduces_variance():
    # With eps_hat = 0 the chain is a scaled random walk; just check finite
    # values and that the jitted path agrees with the eager path.
    sched = diffusion.make_schedule(10)
    fn = lambda x, t: jnp.zeros_like(x)
    eager = diffusion.reverse_sample(sched, fn, jax.random.key(3), (2, 2, 3, 17))
    jitted = jax.jit(
        lambda k: diffusion.reverse_sample(sched, fn, k, (2, 2, 3, 17))
    )(jax.random.key(3))
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               rtol=1e-5, atol=1e-6)


# -- DDIM sampler (framework extension; Song et al. 2021 eq. 12) -----------

def test_ddim_timesteps_selection():
    # full request degenerates to the DDPM sequence T-1..1
    np.testing.assert_array_equal(diffusion.ddim_timesteps(10, 9),
                                  np.arange(9, 0, -1))
    np.testing.assert_array_equal(diffusion.ddim_timesteps(10, 99),
                                  np.arange(9, 0, -1))
    # evenly spaced subsets keep both endpoints, descending
    np.testing.assert_array_equal(diffusion.ddim_timesteps(10, 3),
                                  np.array([9, 5, 1]))
    np.testing.assert_array_equal(diffusion.ddim_timesteps(10, 2),
                                  np.array([9, 1]))
    # a single step starts from the top (pure noise), not t=1
    np.testing.assert_array_equal(diffusion.ddim_timesteps(10, 1),
                                  np.array([9]))


def _ddim_oracle_chain(sched, ts_desc, eta, x, eps_fn, zs):
    """Textbook DDIM update, literal form (x0_hat regrouping happens in
    ddim_plan; this oracle keeps the published two-term expression)."""
    x = np.asarray(x, np.float64)
    for i, t in enumerate(ts_desc):
        ah_t = float(sched.alpha_hat[t])
        ah_p = float(sched.alpha_hat[ts_desc[i + 1]]) \
            if i + 1 < len(ts_desc) else 1.0
        eps = eps_fn(x, t)
        x0_hat = (x - math.sqrt(1 - ah_t) * eps) / math.sqrt(ah_t)
        sigma = eta * math.sqrt((1 - ah_p) / (1 - ah_t)) \
            * math.sqrt(max(1 - ah_t / ah_p, 0.0))
        x = math.sqrt(ah_p) * x0_hat \
            + math.sqrt(max(1 - ah_p - sigma ** 2, 0.0)) * eps \
            + sigma * zs[i]
    return x


@pytest.mark.parametrize('eta,k', [(0.0, 3), (0.7, 4), (1.0, 9)])
def test_ddim_plan_matches_textbook_update(eta, k):
    sched = diffusion.make_schedule(10)
    ts = diffusion.ddim_timesteps(10, k)
    cx, ce, cz = diffusion.ddim_plan(sched, ts, eta)
    assert cx.shape == ce.shape == cz.shape == ts.shape

    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 5))
    zs = rng.normal(size=(len(ts), 4, 5))

    def eps_fn(x, t):
        # deterministic stand-in denoiser with real t dependence
        return 0.3 * x + 0.01 * t

    want = _ddim_oracle_chain(sched, ts, eta, x0, eps_fn, zs)
    x = x0.copy()
    for i, t in enumerate(ts):
        x = cx[i] * x + ce[i] * eps_fn(x, t) + cz[i] * zs[i]
    np.testing.assert_allclose(x, want, rtol=1e-5, atol=1e-7)


def test_ddim_final_step_is_noise_free_for_any_eta():
    sched = diffusion.make_schedule(10)
    for k in (1, 3, 9):
        _, _, cz = diffusion.ddim_plan(sched, diffusion.ddim_timesteps(10, k),
                                       eta=1.0)
        assert cz[-1] == 0.0
    # eta=0 is deterministic at every step
    _, _, cz0 = diffusion.ddim_plan(sched, diffusion.ddim_timesteps(10, 5),
                                    eta=0.0)
    np.testing.assert_array_equal(cz0, np.zeros_like(cz0))
