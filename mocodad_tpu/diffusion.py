"""DDPM noise schedule and forward/reverse diffusion primitives.

Behavioural counterpart of /root/reference/utils/diffusion_utils.py
(cosine schedule via squared-cosine alpha-bar, `betas_for_alpha_bar`
at :8-14, `Diffusion` at :18-75), re-expressed for JAX: the schedule is
a small pytree of constant tables, forward noising is a pure function,
and the reverse chain is a single fused `lax.scan` (the reference runs
the chain as a Python loop of per-step kernel launches,
models/mocodad.py:163-178).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def betas_for_alpha_bar(num_steps: int, alpha_bar: Callable[[float], float],
                        max_beta: float = 0.999) -> np.ndarray:
    """Discretize a continuous alpha-bar curve into per-step betas
    (ref: utils/diffusion_utils.py:8-14)."""
    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def cosine_beta_schedule(num_steps: int) -> np.ndarray:
    """Squared-cosine schedule (ref: utils/diffusion_utils.py:38-44)."""
    return betas_for_alpha_bar(
        num_steps,
        lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
    )


def linear_beta_schedule(num_steps: int, beta_start: float = 1e-4,
                         beta_end: float = 0.02) -> np.ndarray:
    """Linear schedule (ref: utils/diffusion_utils.py:34-35; dead code in
    the reference but kept for API completeness)."""
    return np.linspace(beta_start, beta_end, num_steps)


class DiffusionSchedule(NamedTuple):
    """Constant noise-schedule tables.

    Kept as HOST (numpy) arrays on purpose: jitted programs embed them as
    literal constants at trace time.  Device-resident constants force
    every cold-process lowering to fetch them back to host to build the
    MLIR module — measured ~20 s per tiny array through a remote-device
    transport (PERF_NOTES.md "End-to-end eval wall time").  Index them
    with a traced timestep via `coef()`.
    """
    beta: np.ndarray         # (noise_steps,)
    alpha: np.ndarray        # (noise_steps,)
    alpha_hat: np.ndarray    # (noise_steps,) cumulative product of alpha

    @property
    def noise_steps(self) -> int:
        return self.beta.shape[0]


def coef(table: np.ndarray, t) -> jnp.ndarray:
    """Gather a schedule coefficient at (possibly traced) timestep(s) `t`.

    Works under jit (the host table becomes a program literal) and
    eagerly (plain numpy indexing for concrete `t`)."""
    return jnp.asarray(table)[t]


def make_schedule(noise_steps: int, kind: str = 'cosine') -> DiffusionSchedule:
    if kind == 'cosine':
        beta = cosine_beta_schedule(noise_steps)
    elif kind == 'linear':
        beta = linear_beta_schedule(noise_steps)
    else:
        raise ValueError(f'unknown schedule kind {kind!r}')
    # float32 sequential ops, matching what the previous on-device f32
    # construction produced bit-for-bit
    beta = np.asarray(beta, dtype=np.float32)
    alpha = np.asarray(1.0 - beta, dtype=np.float32)
    alpha_hat = np.cumprod(alpha, dtype=np.float32)
    return DiffusionSchedule(beta=beta, alpha=alpha, alpha_hat=alpha_hat)


def sample_timesteps(rng: jax.Array, n: int, noise_steps: int) -> jnp.ndarray:
    """Uniform t ~ [1, noise_steps) (ref: utils/diffusion_utils.py:74-75)."""
    return jax.random.randint(rng, (n,), 1, noise_steps)


def forward_noise(schedule: DiffusionSchedule, rng: jax.Array,
                  x: jnp.ndarray, t: jnp.ndarray,
                  eps: jnp.ndarray = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q(x_t | x_0): x_t = sqrt(a-bar_t) x + sqrt(1 - a-bar_t) eps.

    Works for any rank of `x`; `t` has shape (B,) aligned with axis 0
    (generalizes noise_graph/noise_latent, utils/diffusion_utils.py:56-71).
    `eps` overrides the gaussian draw (oracle tests inject the reference's
    noise); normal callers leave it None.
    """
    a_hat = coef(schedule.alpha_hat, t)
    bshape = (x.shape[0],) + (1,) * (x.ndim - 1)
    sqrt_a = jnp.sqrt(a_hat).reshape(bshape)
    sqrt_1ma = jnp.sqrt(1.0 - a_hat).reshape(bshape)
    if eps is None:
        eps = jax.random.normal(rng, x.shape, dtype=x.dtype)
    return sqrt_a * x + sqrt_1ma * eps, eps


def ddim_timesteps(noise_steps: int, n_steps: int) -> np.ndarray:
    """Descending timestep subsequence for DDIM sampling.

    Picks `n_steps` (approximately) evenly spaced integers from the DDPM
    chain's timestep range [1, noise_steps-1], always including the top
    step (pure noise) so the chain starts where training's forward process
    ends.  `n_steps >= noise_steps-1` degenerates to the full DDPM
    timestep sequence.
    """
    full = noise_steps - 1
    n = max(1, min(int(n_steps), full))
    if n == 1:
        ts = np.array([full], dtype=np.int64)
    else:
        ts = np.unique(np.round(np.linspace(1, full, n)).astype(np.int64))
    return ts[::-1].copy()


def ddim_plan(schedule: DiffusionSchedule, ts_desc: np.ndarray,
              eta: float = 0.0
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-step affine coefficients for the DDIM update (Song et al. 2021,
    eq. 12), precomputed on host in float64.

    Step i moves x from timestep ts_desc[i] to ts_desc[i+1] (the final
    step moves to the clean sample, alpha_hat_prev = 1, so its noise
    coefficient is exactly 0 for any eta — mirroring the DDPM chain's
    z = 0 at t == 1).  The update applied by the sampler is

        x <- c_x * x + c_eps * eps_hat + c_z * z,      z ~ N(0, I)

    which is the standard form
        x_prev = sqrt(ah_prev) * x0_hat
                 + sqrt(1 - ah_prev - sigma^2) * eps_hat + sigma * z,
        x0_hat = (x - sqrt(1 - ah_t) * eps_hat) / sqrt(ah_t)
    regrouped by (x, eps_hat, z).  eta = 0 gives the deterministic DDIM
    sampler; eta = 1 gives the small-variance DDPM posterior (NOT the
    reference's sqrt(beta) large-variance chain, models/mocodad.py:178 —
    this sampler is a framework extension, not a parity surface).

    Returns (c_x, c_eps, c_z) as float32 arrays of len(ts_desc).
    """
    ts_desc = np.asarray(ts_desc, dtype=np.int64)
    ah_t = schedule.alpha_hat[ts_desc].astype(np.float64)
    ah_prev = np.concatenate(
        [schedule.alpha_hat[ts_desc[1:]].astype(np.float64), [1.0]])
    sigma = eta * np.sqrt((1.0 - ah_prev) / (1.0 - ah_t)) \
        * np.sqrt(np.maximum(1.0 - ah_t / ah_prev, 0.0))
    c_x = np.sqrt(ah_prev / ah_t)
    c_eps = np.sqrt(np.maximum(1.0 - ah_prev - sigma ** 2, 0.0)) \
        - c_x * np.sqrt(1.0 - ah_t)
    return (c_x.astype(np.float32), c_eps.astype(np.float32),
            sigma.astype(np.float32))


def reverse_sample(schedule: DiffusionSchedule,
                   denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
                   rng: jax.Array,
                   shape: Tuple[int, ...],
                   dtype=jnp.float32) -> jnp.ndarray:
    """Full reverse DDPM chain as one `lax.scan`.

    `denoise_fn(x, t)` predicts the noise for a batch `x` at integer time
    `t` (shape (B,)).  Matches the update rule at models/mocodad.py:178:
        x <- (1/sqrt(a)) (x - (1-a)/sqrt(1-a_hat) eps_hat) + sqrt(b) z
    with z = 0 on the final (t == 1) step.
    """
    rng_init, rng_steps = jax.random.split(rng)
    x0 = jax.random.normal(rng_init, shape, dtype=dtype)
    ts = jnp.arange(schedule.noise_steps - 1, 0, -1)  # T-1 .. 1

    def step(x, inputs):
        t, key = inputs
        tb = jnp.full((shape[0],), t, dtype=jnp.int32)
        eps_hat = denoise_fn(x, tb)
        a = coef(schedule.alpha, t)
        a_hat = coef(schedule.alpha_hat, t)
        b = coef(schedule.beta, t)
        z = jax.random.normal(key, shape, dtype=dtype)
        z = jnp.where(t > 1, z, jnp.zeros_like(z))
        x = (1.0 / jnp.sqrt(a)) * (
            x - ((1.0 - a) / jnp.sqrt(1.0 - a_hat)) * eps_hat
        ) + jnp.sqrt(b) * z
        return x, None

    keys = jax.random.split(rng_steps, ts.shape[0])
    x, _ = jax.lax.scan(step, x0, (ts, keys))
    return x
