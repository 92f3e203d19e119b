"""MoCoDAD: motion-conditioned diffusion for skeleton anomaly detection.

Behavioural counterpart of /root/reference/models/mocodad.py (the
LightningModule), re-architected for TPU:

* model state is an explicit flax variables pytree (params + batch_stats);
* the training loss and the full multi-sample reverse-diffusion generation
  are pure jittable functions;
* the reference's eval loop — `n_generated_samples` x (noise_steps-1)
  sequential Python-dispatched U-Net calls per batch
  (models/mocodad.py:160-180, ~450 launches) — is ONE compiled program:
  the sample axis S is folded into the batch and the step loop is a
  `lax.scan`, so the U-Net runs (noise_steps-1) times on an (S*B) batch;
* frame selection / input assembly are device gathers (see models/frames.py)
  instead of CPU boolean-mask round-trips (ref :673-683, 829-837).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mocodad_tpu.config import Config
from mocodad_tpu.diffusion import (DiffusionSchedule, coef, ddim_plan,
                                   ddim_timesteps, forward_noise,
                                   make_schedule, sample_timesteps)
from mocodad_tpu.models import frames as F
from mocodad_tpu.models.losses import aggregate, elementwise_loss
from mocodad_tpu.nn import STSAE, STSE, STSAEUnet, STSEUnet


def _mirror_fold(z_half: jnp.ndarray, s: int) -> jnp.ndarray:
    """(B, ceil(S/2), ...) independent gaussians -> (S*B, ...) b-major
    sample fold where each window's samples are [z_0..z_{h-1},
    -z_0..-z_{s-h-1}] (antithetic pairs)."""
    b, h = z_half.shape[:2]
    z = jnp.concatenate([z_half, -z_half[:, :s - h]], axis=1)
    return z.reshape((s * b,) + z_half.shape[2:])


class MoCoDADNet(nn.Module):
    """Flax container bundling the condition encoder and the main U-Net so
    the whole model is one variables pytree (ref `build_model`,
    models/mocodad.py:90-126)."""
    num_coords: int
    n_joints: int
    embedding_dim: int
    dropout: float
    strategy: str
    conditioning_architecture: Optional[str]
    h_dim: int
    latent_dim: int
    channels: Tuple[int, ...]
    n_frames_condition: int
    input_n_frames: int

    def setup(self):
        if self.strategy == 'inject':
            arch = self.conditioning_architecture
            if arch == 'AE':
                self.condition_encoder = STSAE(
                    c_in=self.num_coords, h_dim=self.h_dim,
                    latent_dim=self.latent_dim,
                    n_frames=self.n_frames_condition,
                    n_joints=self.n_joints, layer_channels=self.channels,
                    dropout=self.dropout)
            elif arch == 'E':
                self.condition_encoder = STSE(
                    c_in=self.num_coords, h_dim=self.h_dim,
                    latent_dim=self.latent_dim,
                    n_frames=self.n_frames_condition,
                    n_joints=self.n_joints, layer_channels=self.channels,
                    dropout=self.dropout)
            elif arch == 'E_unet':
                self.condition_encoder = STSEUnet(
                    c_in=self.num_coords, embedding_dim=None,
                    latent_dim=self.latent_dim,
                    n_frames=self.n_frames_condition,
                    n_joints=self.n_joints, dropout=self.dropout,
                    set_out_layer=True)
            else:
                raise NotImplementedError(
                    f'Conditioning architecture {arch} not implemented.')
        else:
            self.condition_encoder = None
        self.model = self.make_main_net()

    def make_main_net(self) -> nn.Module:
        return STSAEUnet(c_in=self.num_coords,
                         embedding_dim=self.embedding_dim,
                         n_frames=self.input_n_frames,
                         n_joints=self.n_joints, dropout=self.dropout,
                         inject_condition=(self.strategy == 'inject'))

    def encode_condition(self, cond: Optional[jnp.ndarray],
                         *, train: bool = False):
        """(ref `_encode_condition`, models/mocodad.py:546-560)."""
        if self.condition_encoder is None or cond is None:
            return None, None
        out = self.condition_encoder(cond, None, train=train)
        if isinstance(out, tuple):
            latent, rec = out
            # Only the AE architecture produces a reconstruction (the
            # reference guards its rec loss on arch == 'AE',
            # models/mocodad.py:220); STSEUnet returns (latent, []) — an
            # empty hidden-state list, not a reconstruction — which must
            # not leak into `rec is not None` loss guards.
            if isinstance(rec, (list, tuple)) and len(rec) == 0:
                rec = None
            return latent, rec
        return out, None

    def denoise(self, x: jnp.ndarray, t: jnp.ndarray,
                cond_emb: Optional[jnp.ndarray], *, train: bool = False
                ) -> jnp.ndarray:
        pred, _ = self.model(x, t, cond_emb, train=train)
        return pred

    def __call__(self, x, t, cond, *, train: bool = False):
        emb, rec = self.encode_condition(cond, train=train)
        return self.denoise(x, t, emb, train=train), rec


class MoCoDADModel:
    """Orchestrator exposing pure functions for train/eval.

    Holds only static configuration; all state (params, batch_stats) flows
    through function arguments, so every method is jit/pjit friendly.
    """

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.strategy = cfg.strategy
        self.n_frames = cfg.seg_len
        self.num_coords = cfg.num_coords
        self.n_joints = cfg.n_joints
        (self.n_frames_condition, self.n_frames_corrupt,
         self.input_n_frames) = cfg.conditioning_split()
        cond_idxs, corrupt_idxs = cfg.cond_corrupt_indices()
        self._static_order = (None if cond_idxs is None else
                              F.static_order(cond_idxs, corrupt_idxs))
        self.loss_kind = cfg.loss_fn
        self.rec_weight = cfg.rec_weight
        self.aggregation_strategy = cfg.aggregation_strategy
        self.model_return_value = cfg.model_return_value
        self.schedule: DiffusionSchedule = make_schedule(cfg.noise_steps)
        # Generation compute dtype: bf16 halves HBM traffic on the
        # bandwidth-bound sampling loop; losses are reduced in f32.
        # Opt-in via the 'eval_dtype: bfloat16' config key.
        self.eval_dtype = {'float32': jnp.float32,
                           'bfloat16': jnp.bfloat16}[
            str(cfg.extras.get('eval_dtype', 'float32'))]
        # Layout-optimized eval U-Net (ops/fast_unet.py); numerically
        # equivalent (parity-tested), disable via 'fast_eval: false'.
        self.fast_eval = bool(cfg.extras.get('fast_eval', True))
        # Mixed-precision TRAINING compute dtype (opt-in, framework
        # extension): master params, optimizer state, grads, the
        # diffusion noising math, and the loss reduction stay float32;
        # only the net's forward/backward runs in the compute dtype
        # (params cast inside the differentiated graph, so grads land
        # back in f32).  Measured study in PERF_NOTES.md ("bf16 training
        # study").
        self.train_dtype = {'float32': jnp.float32,
                            'bfloat16': jnp.bfloat16}[
            str(cfg.extras.get('train_dtype', 'float32'))]
        # Reverse-chain scan unrolling knob (re-probe on toolchain bumps).
        # Measured NEUTRAL end-to-end on this toolchain: an isolated
        # denoise-chain probe suggested -5..-8% from removing the scan's
        # per-iteration barrier, but an alternating A/B on the full
        # generate() (S-fold + assembly + aggregation) reads -1.7/+0.4/
        # +0.1% across rounds — noise — while full unroll multiplies the
        # compiled program 9x (tools/perf/probe_scan_unroll.py,
        # probe_unroll_ab.py).  Default stays 1 ('auto' == 1).
        su = cfg.extras.get('scan_unroll', 'auto')
        self.scan_unroll = 1 if su == 'auto' else max(1, int(su))
        # Named eval profile (opt-in, framework extension): 'fast' caps
        # the Monte-Carlo sample count at 10 (override the cap with the
        # `fast_profile_samples` extras key) while keeping the reference
        # DDPM chain untouched.  Chosen from the measured frontier
        # (PERF_NOTES.md "Fast-eval frontier"): at four synthetic
        # operating points spanning AUC 0.64-0.91, reducing S under the
        # reference sampler is AUC-free to within seed noise (the
        # best/mean aggregations converge by S~10) and is worth 4.9x
        # throughput (21.9k w/s at bench settings), while DDIM short
        # chains cost AUC that GROWS with operating-point separability
        # (-0.004 at the noise floor but -0.12 at AUC~0.9) and
        # antithetic draws are AUC-neutral but no faster.  The reference
        # itself validates with S=5 (config/UBnormal/mocodad_train.yaml
        # n_generated_samples) — the profile stays inside the reference's
        # own sampling semantics, unlike the sampler/antithetic extras.
        # (profile validation lives in effective_n_generated_samples —
        # shared with the model-free replay/viz cache-resolution paths)
        from mocodad_tpu.config import effective_n_generated_samples
        self.n_generated_samples = effective_n_generated_samples(cfg)
        # Antithetic sampling (opt-in, framework extension): draw half the
        # gaussians and mirror them per window (pairs (z, -z) for x0 and
        # every step injection), a classic variance-reduction trick — the
        # min/best aggregation then covers the noise space more evenly per
        # sample, letting fewer generations match the AUC of more
        # independent ones (study: PERF_NOTES.md "Antithetic sampling").
        self.antithetic = bool(cfg.extras.get('antithetic', False))
        # Reverse sampler (opt-in, framework extension): 'ddpm' is the
        # reference chain (models/mocodad.py:160-180); 'ddim' runs the
        # deterministic (eta=0) Song et al. sampler over a subsequence of
        # 'ddim_steps' timesteps — the denoise chain is ~96% of eval time
        # (PERF_NOTES.md), so K steps cost ~K/(noise_steps-1) of the DDPM
        # chain.  AUC study: PERF_NOTES.md "DDIM sampler".
        self.sampler = str(cfg.extras.get('sampler', 'ddpm'))
        if self.sampler not in ('ddpm', 'ddim'):
            raise ValueError(f"sampler must be 'ddpm' or 'ddim', "
                             f"got {self.sampler!r}")
        self.ddim_steps = int(cfg.extras.get('ddim_steps',
                                             cfg.noise_steps - 1))
        self.ddim_eta = float(cfg.extras.get('ddim_eta', 0.0))
        # Per-layer matmul association in the fast eval forward: layers
        # whose channel mix narrows run it before the TV^2 graph dot
        # (exact algebra; measured win — tools/perf/probe_assoc.py).
        self.assoc_narrowing = bool(cfg.extras.get('assoc_narrowing', True))
        self.net = self.build_net()

    # -- construction ---------------------------------------------------

    def build_net(self) -> MoCoDADNet:
        cfg = self.cfg
        return MoCoDADNet(
            num_coords=self.num_coords, n_joints=self.n_joints,
            embedding_dim=cfg.embedding_dim, dropout=cfg.dropout,
            strategy=self.strategy,
            conditioning_architecture=(cfg.conditioning_architecture
                                       if self.strategy == 'inject' else None),
            h_dim=cfg.h_dim, latent_dim=cfg.latent_dim,
            channels=tuple(cfg.channels),
            n_frames_condition=self.n_frames_condition,
            input_n_frames=self.input_n_frames)

    def init_variables(self, rng: jax.Array) -> Dict[str, Any]:
        b = 2
        x = jnp.zeros((b, self.num_coords, self.input_n_frames, self.n_joints))
        t = jnp.zeros((b,), jnp.int32)
        cond = (jnp.zeros((b, self.num_coords, self.n_frames_condition,
                           self.n_joints))
                if self.strategy == 'inject' else None)
        # jit: eager flax init dispatches hundreds of tiny ops, which is
        # painfully slow over a remote-device tunnel
        return jax.jit(self.net.init)(rng, x, t, cond)

    # -- frame bookkeeping ----------------------------------------------

    def frame_order(self, rng: Optional[jax.Array], batch: int) -> jnp.ndarray:
        """(T,) static or (B, T) random frame order; see models/frames.py."""
        if self._static_order is not None:
            return self._static_order
        return F.random_order(rng, batch, self.n_frames,
                              self.n_frames_condition)

    # -- training -------------------------------------------------------

    @staticmethod
    def _masked_mean(x: jnp.ndarray, sample_mask: Optional[jnp.ndarray]
                     ) -> jnp.ndarray:
        """Mean over all elements, with optional per-sample validity weights
        (for jit-static padded batches; all-ones mask == plain mean)."""
        if sample_mask is None:
            return x.mean()
        m = sample_mask.reshape((-1,) + (1,) * (x.ndim - 1))
        # elements per sample; max(1, ...) keeps a degenerate empty batch
        # a harmless nan (0/0 with an all-zero mask) instead of a
        # zero-division crash at trace time
        per_sample = max(1, int(np.prod(x.shape[1:])))
        return (x * m).sum() / (sample_mask.sum() * per_sample)

    def loss(self, variables: Dict[str, Any], data: jnp.ndarray,
             rng: jax.Array, *, train: bool = True,
             sample_mask: Optional[jnp.ndarray] = None,
             noise_override: Optional[Tuple[jnp.ndarray, jnp.ndarray]]
             = None
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
        """Diffusion noise-prediction loss (+ AE reconstruction term)
        (ref `training_step`, models/mocodad.py:187-227).

        Returns (loss, metrics, mutated-collections).  `noise_override`,
        when given, is `(t, eps)` replacing the sampled timesteps and
        forward noise so the loss can be compared against an external
        oracle; normal callers never pass it.
        """
        r_order, r_t, r_noise, r_drop = jax.random.split(rng, 4)
        b = data.shape[0]
        order = self.frame_order(r_order, b)
        cond_data, corrupt_data = F.select_frames(data, order,
                                                  self.n_frames_condition)
        inject_cond = cond_data if self.strategy == 'inject' else None

        if noise_override is not None:
            t, eps = noise_override
            t = jnp.asarray(t, jnp.int32)
            eps = jnp.asarray(eps, corrupt_data.dtype)
        else:
            t = sample_timesteps(r_t, b, self.schedule.noise_steps)
            eps = None
        x_t, noise = forward_noise(self.schedule, r_noise, corrupt_data, t,
                                   eps=eps)
        x_in = F.assemble_input(self.strategy, cond_data, x_t, order,
                                self.n_frames_condition)

        # mixed-precision training (opt-in `train_dtype: bfloat16`): the
        # noising math above ran in f32 (schedule-exact); cast params and
        # net inputs here, INSIDE the differentiated graph, so grads
        # arrive back in f32 at the master params
        dt = self.train_dtype if train else jnp.float32
        if dt != jnp.float32:
            def _cast(x):
                return (x.astype(dt)
                        if jnp.issubdtype(x.dtype, jnp.floating) else x)
            # cast PARAMS only: batch_stats must enter the BN running-stat
            # EMA in f32 (momentum*ra + (1-m)*batch_mean) — casting ra to
            # bf16 first would quantize the accumulated value itself, so
            # updates below ~0.4% of the running value round away and the
            # stats stall near convergence.  The batch mean/var are
            # computed from bf16 activations either way; only the
            # accumulator precision is at stake.
            variables = dict(variables)
            variables['params'] = jax.tree_util.tree_map(
                _cast, variables['params'])
            x_in = x_in.astype(dt)
            inject_cond = (None if inject_cond is None
                           else inject_cond.astype(dt))

        def run(variables):
            return self.net.apply(
                variables, x_in, t, inject_cond, train=train,
                mutable=['batch_stats'] if train else False,
                rngs={'dropout': r_drop} if train else None)

        if train:
            (pred, rec_cond), mutated = run(variables)
        else:
            pred, rec_cond = run(variables)
            mutated = {}
        if dt != jnp.float32:
            # reductions in f32; the running stats already come back f32
            # (f32 accumulator x momentum promotes) — the tree_map is a
            # dtype safety net for any stat a layer stores differently
            pred = pred.astype(jnp.float32)
            rec_cond = (None if rec_cond is None
                        else rec_cond.astype(jnp.float32))
            if mutated:
                mutated = jax.tree_util.tree_map(
                    lambda x: (x.astype(jnp.float32)
                               if jnp.issubdtype(x.dtype, jnp.floating)
                               else x), mutated)
        pred = F.extract_corrupt(self.strategy, pred, order,
                                 self.n_frames_condition)

        loss_noise = self._masked_mean(
            elementwise_loss(self.loss_kind, pred, noise), sample_mask)
        metrics = {'loss_noise': loss_noise}
        loss = loss_noise
        if rec_cond is not None:
            loss_rec = self._masked_mean(jnp.square(rec_cond - cond_data),
                                         sample_mask)
            loss = loss_noise + self.rec_weight * loss_rec
            metrics['loss_recons'] = loss_rec
        metrics['loss'] = loss
        return loss, metrics, mutated

    # -- generation / evaluation ----------------------------------------

    def generate(self, variables: Dict[str, Any], data: jnp.ndarray,
                 rng: jax.Array, aggr_strategy: Optional[str] = None,
                 n_samples: Optional[int] = None,
                 noise_override: Optional[Tuple[jnp.ndarray, jnp.ndarray]]
                 = None
                 ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
        """Sample S futures per window and aggregate
        (ref `forward`, models/mocodad.py:129-184).

        Returns (selected_x, loss_of_selected_x); selected_x is None for
        loss-only aggregations, matching the reference.

        `noise_override`, when given, is `(x0, zs)` — the initial noise
        (S*B, C, Tc, V) and the per-step noise (n_chain_steps, S*B, C,
        Tc, V), both in the b-major sample fold (row = b*S + s);
        n_chain_steps is noise_steps-1 for the DDPM sampler and the
        length of the DDIM timestep subsequence otherwise.  It
        replaces the internal gaussian draws so the sampling chain can be
        compared step-for-step against an external oracle (the reference
        torch loop); normal callers never pass it.
        """
        aggr = aggr_strategy or self.aggregation_strategy
        s = n_samples or self.n_generated_samples
        r_order, r_init, r_steps, r_aggr = jax.random.split(rng, 4)
        b = data.shape[0]

        order = self.frame_order(r_order, b)
        cond_data, corrupt_data = F.select_frames(data, order,
                                                  self.n_frames_condition)
        dt = self.eval_dtype
        if dt != data.dtype:
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(dt)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, variables)
            data = data.astype(dt)
            cond_data = None if cond_data is None else cond_data.astype(dt)
        inject_cond = cond_data if self.strategy == 'inject' else None
        cond_emb, _ = self.net.apply(variables, inject_cond,
                                     method=MoCoDADNet.encode_condition)

        # Fold the sample axis into the batch: every tensor the U-Net sees
        # is (B*S, ...), so each of the (noise_steps-1) scan iterations is
        # one large MXU-friendly launch.  The fold is b-MAJOR (row = b*S+s,
        # via repeat): under a batch-sharded mesh each device then samples
        # for its own windows only — no resharding collectives.
        def tile(x):
            return None if x is None else jnp.repeat(x, s, axis=0)

        cond_tiled = tile(cond_data)
        emb_tiled = tile(cond_emb)
        order_tiled = order if order.ndim == 1 else tile(order)

        corrupt_shape = (s * b, self.num_coords, self.n_frames_corrupt,
                         self.n_joints)
        use_ddim = self.sampler == 'ddim'
        if use_ddim:
            ts_np = ddim_timesteps(self.schedule.noise_steps, self.ddim_steps)
            cxs, ces, czs = (jnp.asarray(c) for c in
                             ddim_plan(self.schedule, ts_np, self.ddim_eta))
            ts = jnp.asarray(ts_np, dtype=jnp.int32)
        else:
            ts = jnp.arange(self.schedule.noise_steps - 1, 0, -1)
        antithetic = self.antithetic and s > 1 and noise_override is None
        if noise_override is not None:
            x0, z_src = noise_override
            x0 = jnp.asarray(x0, dtype=data.dtype)
            z_src = jnp.asarray(z_src, dtype=data.dtype)
        elif antithetic:
            x0 = _mirror_fold(
                jax.random.normal(
                    r_init, (b, (s + 1) // 2) + corrupt_shape[1:],
                    dtype=data.dtype), s)
            z_src = jax.random.split(r_steps, ts.shape[0])
        else:
            x0 = jax.random.normal(r_init, corrupt_shape, dtype=data.dtype)
            z_src = jax.random.split(r_steps, ts.shape[0])

        denoise_fn = self._make_denoise_fn(variables)

        def draw_z(z_in, x):
            if noise_override is not None:
                return z_in
            if antithetic:
                return _mirror_fold(jax.random.normal(
                    z_in, (b, (s + 1) // 2) + x.shape[1:], dtype=x.dtype), s)
            return jax.random.normal(z_in, x.shape, dtype=x.dtype)

        def step(x, inputs):
            if use_ddim:
                t_scalar, cx_i, ce_i, cz_i, z_in = inputs
            else:
                t_scalar, z_in = inputs
            x_in = F.assemble_input(self.strategy, cond_tiled, x,
                                    order_tiled, self.n_frames_condition)
            tb = jnp.full((s * b,), t_scalar, dtype=jnp.int32)
            eps = denoise_fn(x_in, tb, emb_tiled)
            eps = F.extract_corrupt(self.strategy, eps, order_tiled,
                                    self.n_frames_condition)
            if use_ddim:
                # x <- c_x x + c_eps eps + c_z z (diffusion.ddim_plan);
                # c_z == 0 everywhere when eta == 0, so skip the draw
                x = cx_i.astype(x.dtype) * x + ce_i.astype(x.dtype) * eps
                if self.ddim_eta != 0.0:
                    x = x + cz_i.astype(x.dtype) * draw_z(z_in, x)
                return x, None
            a = coef(self.schedule.alpha, t_scalar)
            a_hat = coef(self.schedule.alpha_hat, t_scalar)
            beta = coef(self.schedule.beta, t_scalar)
            # keep the update in the compute dtype (f32 scalars would
            # silently promote a bf16 chain back to f32)
            c1 = (1.0 / jnp.sqrt(a)).astype(x.dtype)
            c2 = ((1.0 - a) / jnp.sqrt(1.0 - a_hat)).astype(x.dtype)
            c3 = jnp.sqrt(beta).astype(x.dtype)
            z = draw_z(z_in, x)
            z = jnp.where(t_scalar > 1, z, jnp.zeros_like(z))
            x = c1 * (x - c2 * eps) + c3 * z
            return x, None

        xs_in = (ts, cxs, ces, czs, z_src) if use_ddim else (ts, z_src)
        x, _ = jax.lax.scan(step, x0, xs_in, unroll=self.scan_unroll)
        xs = x.reshape((b, s) + x.shape[1:]).astype(jnp.float32)
        xs = jnp.moveaxis(xs, 1, 0)  # (S, B, ...)
        return aggregate(aggr, self.loss_kind, xs,
                         corrupt_data.astype(jnp.float32), rng=r_aggr)

    def supports_pallas_eval(self) -> bool:
        """The megakernel covers the flagship family: pose-space model,
        inject conditioning (identity assemble/extract), default U-Net."""
        return self.strategy == 'inject'

    def build_pallas_eval(self, variables: Dict[str, Any], nb: int = 256,
                          interpret: bool = False):
        """Build a jitted multi-sample generation function around the
        Pallas megakernel (ops/pallas_unet.py).

        `variables` must be CONCRETE (the layer constants are folded on the
        host and baked into the program); rebuild after params change.
        Returns gen(data, rng) -> (selected_x, loss), matching generate().
        """
        if not self.supports_pallas_eval():
            raise ValueError('pallas eval supports the inject strategy only')
        from mocodad_tpu.ops.pallas_unet import build_pallas_denoiser
        from mocodad_tpu.nn.components import sinusoidal_pos_encoding

        dt = self.eval_dtype
        variables = jax.device_get(variables)
        denoise = build_pallas_denoiser(
            variables['params']['model'], variables['batch_stats']['model'],
            c_in=self.num_coords, n_frames=self.input_n_frames,
            n_joints=self.n_joints, embedding_dim=self.cfg.embedding_dim,
            nb=nb, compute_dtype=dt, interpret=interpret)
        s = self.n_generated_samples
        order = self._static_order
        n_cond = self.n_frames_condition
        tc, v, c = self.n_frames_corrupt, self.n_joints, self.num_coords

        def gen(data, rng):
            r_init, r_steps, r_aggr = jax.random.split(rng, 3)
            b = data.shape[0]
            cond_data, corrupt_data = F.select_frames(data, order, n_cond)
            cond_emb, _ = self.net.apply(variables, cond_data,
                                         method=MoCoDADNet.encode_condition)
            # (E, B*S), b-major fold like generate(); the sampler state
            # lives in the kernel's batch-in-lanes (C, T*V, N) layout so
            # the scan body has no transposes at all
            emb_t = jnp.repeat(cond_emb, s, axis=0).T

            x = jax.random.normal(r_init, (c, tc * v, b * s), dtype=dt)
            ts = jnp.arange(self.schedule.noise_steps - 1, 0, -1)
            keys = jax.random.split(r_steps, ts.shape[0])

            def step(x, inputs):
                t_scalar, key = inputs
                t_emb = sinusoidal_pos_encoding(
                    jnp.full((1,), t_scalar), self.cfg.embedding_dim)
                silu_emb = jax.nn.silu(emb_t + t_emb.T)     # (E, B*S)
                eps = denoise(x, silu_emb).astype(jnp.float32)
                a = coef(self.schedule.alpha, t_scalar)
                a_hat = coef(self.schedule.alpha_hat, t_scalar)
                beta = coef(self.schedule.beta, t_scalar)
                z = jax.random.normal(key, x.shape, dtype=jnp.float32)
                z = jnp.where(t_scalar > 1, z, jnp.zeros_like(z))
                x32 = x.astype(jnp.float32)
                x = ((1.0 / jnp.sqrt(a)) * (
                    x32 - ((1.0 - a) / jnp.sqrt(1.0 - a_hat)) * eps)
                    + jnp.sqrt(beta) * z).astype(dt)
                return x, None

            x, _ = jax.lax.scan(step, x, (ts, keys))
            # (C, Tc*V, B*S) -> (S, B, C, Tc, V) for aggregation
            xs = x.reshape(c, tc, v, b, s).astype(jnp.float32)
            xs = jnp.transpose(xs, (4, 3, 0, 1, 2))
            return aggregate(self.aggregation_strategy, self.loss_kind, xs,
                             corrupt_data.astype(jnp.float32), rng=r_aggr)

        return jax.jit(gen)

    def _make_denoise_fn(self, variables: Dict[str, Any]):
        """Denoiser for the sampling loop: the layout-optimized forward
        (ops/fast_unet.py) when enabled, else the module forward."""
        if self.fast_eval and 'model' in variables.get('batch_stats', {}):
            from mocodad_tpu.ops.fast_unet import build_fast_denoiser
            return build_fast_denoiser(
                variables['params']['model'],
                variables['batch_stats']['model'],
                c_in=self.num_coords, n_frames=self.input_n_frames,
                n_joints=self.n_joints,
                embedding_dim=self.cfg.embedding_dim,
                inject_condition=(self.strategy == 'inject'),
                channel_first_when_narrowing=self.assoc_narrowing)
        return lambda x, tb, emb: self.net.apply(
            variables, x, tb, emb, method=MoCoDADNet.denoise)

# model_return_value packing (ref `_pack_out_data`, models/mocodad.py:
# 606-636) lives in utils/tensors.pack_prediction_tensors, consumed by
# Trainer.run_inference callers (eval/predict CLIs).
