"""Latent-space MoCoDAD variant (two-stage: pretrain / diffusion).

Behavioural counterpart of /root/reference/models/mocodad_latent.py:
stage 'pretrain' trains a bottlenecked STSAE-U-Net to reconstruct the
corrupted frames; stage 'diffusion' freezes the pretrained encoder
(down path) and learns a DDPM over the latent code with an MLP denoiser.
Selected when the config carries `diffusion_on_latent`
(ref: train_MoCoDAD.py:68).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mocodad_tpu.config import Config
from mocodad_tpu.diffusion import coef, forward_noise, sample_timesteps
from mocodad_tpu.models import frames as F
from mocodad_tpu.models.losses import aggregate, elementwise_loss
from mocodad_tpu.models.mocodad import MoCoDADModel, MoCoDADNet
from mocodad_tpu.nn import Denoiser, STSAEUnet, STSEUnet

# The reference passes a constant t=-1 through the U-Net in both latent
# stages (ref: mocodad_latent.py:95, 157).
_CONST_T = -1


class MoCoDADLatentNet(MoCoDADNet):
    stage: str = 'pretrain'
    latent_embedding_dim: int = 64
    hidden_sizes: Tuple[int, ...] = (64, 128, 128, 64)

    def setup(self):
        super().setup()
        if self.stage == 'diffusion':
            self.denoiser = Denoiser(input_size=self.latent_embedding_dim,
                                     hidden_sizes=self.hidden_sizes,
                                     cond_size=self.embedding_dim)

    def make_main_net(self):
        if self.stage == 'diffusion':
            # Frozen encoder: corrupt window -> latent
            # (ref: mocodad_latent.py:51-55)
            return STSEUnet(c_in=self.num_coords,
                            embedding_dim=self.embedding_dim,
                            latent_dim=self.latent_embedding_dim,
                            n_frames=self.input_n_frames,
                            n_joints=self.n_joints, dropout=self.dropout,
                            set_out_layer=True,
                            unet_down_channels=(16, 32, 32, 64, 64, 128, 64))
        # Pretrain: bottlenecked reconstruction U-Net
        # (ref: mocodad_latent.py:59-64)
        return STSAEUnet(c_in=self.num_coords,
                         embedding_dim=self.embedding_dim,
                         n_frames=self.input_n_frames,
                         n_joints=self.n_joints, dropout=self.dropout,
                         inject_condition=(self.strategy == 'inject'),
                         use_bottleneck=True,
                         latent_dim=self.latent_embedding_dim)

    def encode_input(self, x: jnp.ndarray,
                     cond_emb: Optional[jnp.ndarray],
                     *, train: bool = False) -> jnp.ndarray:
        t = jnp.full((x.shape[0],), _CONST_T, dtype=jnp.int32)
        out, _ = self.model(x, t, cond_emb, train=train)
        return out

    def denoise_latent(self, z: jnp.ndarray, t: jnp.ndarray,
                       cond_emb: Optional[jnp.ndarray],
                       *, train: bool = False) -> jnp.ndarray:
        return self.denoiser(z, t, cond_emb, train=train)

    def __call__(self, x, t, cond, *, train: bool = False):
        emb, rec = self.encode_condition(cond, train=train)
        out = self.encode_input(x, emb, train=train)
        if self.stage == 'diffusion':
            tb = jnp.ones((x.shape[0],), jnp.int32)
            out = self.denoise_latent(out, tb, emb, train=train)
        return out, rec

    def loss_forward(self, cond_data, corrupt_data, t, eps, sqrt_a, sqrt_1ma,
                     *, train: bool = False):
        """Single-apply training forward (one mutable batch_stats pass).

        Returns (prediction, target, cond_reconstruction)."""
        emb, rec = self.encode_condition(cond_data, train=train)
        if self.stage == 'diffusion':
            latent = self.encode_input(corrupt_data, emb, train=train)
            # noising math at the COEFFICIENT dtype (f32, schedule-exact)
            # even when the encoder ran bf16; the denoiser then runs at
            # the net's compute dtype again (all no-ops in f32 mode)
            z_t = (sqrt_a[:, None] * latent.astype(sqrt_a.dtype)
                   + sqrt_1ma[:, None] * eps)
            pred = self.denoise_latent(z_t.astype(latent.dtype), t, emb,
                                       train=train)
            return pred, eps, rec
        pred = self.encode_input(corrupt_data, emb, train=train)
        return pred, corrupt_data, rec


class MoCoDADLatentModel(MoCoDADModel):

    def __init__(self, cfg: Config):
        self.stage = cfg.stage
        self.latent_embedding_dim = cfg.latent_embedding_dim
        self.hidden_sizes = tuple(cfg.hidden_sizes)
        super().__init__(cfg)
        if self.strategy != 'inject':
            raise ValueError('Conditioning strategy must be inject for the '
                             'latent variant (ref: mocodad_latent.py:32)')
        if self.hidden_sizes[-1] != self.latent_embedding_dim:
            # the denoiser MLP's last hidden layer IS its output (ref
            # components.py:237: Linear(input, hidden_sizes[-1]) with no
            # further projection), so the latent DDPM is well-formed only
            # when it matches the latent width — the reference crashes
            # with an opaque broadcast error here
            raise ValueError(
                f'hidden_sizes[-1] ({self.hidden_sizes[-1]}) must equal '
                f'latent_embedding_dim ({self.latent_embedding_dim}): the '
                'denoiser MLP predicts the latent-space noise')
        # Pretrain stage always returns poses (ref: mocodad_latent.py:33)
        if self.stage == 'pretrain':
            self.model_return_value = 'pose'

    def build_net(self) -> MoCoDADLatentNet:
        cfg = self.cfg
        return MoCoDADLatentNet(
            num_coords=self.num_coords, n_joints=self.n_joints,
            embedding_dim=cfg.embedding_dim, dropout=cfg.dropout,
            strategy=self.strategy,
            conditioning_architecture=cfg.conditioning_architecture,
            h_dim=cfg.h_dim, latent_dim=cfg.latent_dim,
            channels=tuple(cfg.channels),
            n_frames_condition=self.n_frames_condition,
            input_n_frames=self.n_frames_corrupt,
            stage=self.stage,
            latent_embedding_dim=self.latent_embedding_dim,
            hidden_sizes=self.hidden_sizes)

    def init_variables(self, rng: jax.Array) -> Dict[str, Any]:
        b = 2
        x = jnp.zeros((b, self.num_coords, self.n_frames_corrupt,
                       self.n_joints))
        t = jnp.zeros((b,), jnp.int32)
        cond = jnp.zeros((b, self.num_coords, self.n_frames_condition,
                          self.n_joints))
        return jax.jit(self.net.init)(rng, x, t, cond)

    def supports_pallas_eval(self) -> bool:
        """The megakernel bakes the base model's pose-space U-Net +
        generate semantics; both latent stages (bottlenecked STSAEUnet /
        STSEUnet + latent DDPM) differ, so the opt-in path is unsupported
        here rather than silently wrong."""
        return False

    def trainable_mask(self, params) -> Any:
        """Stage 'diffusion' freezes the pretrained encoder + condition
        encoder; only the latent MLP denoiser trains
        (ref: mocodad_latent.py:223-228)."""
        if self.stage != 'diffusion':
            return jax.tree_util.tree_map(lambda _: True, params)
        return {k: jax.tree_util.tree_map(lambda _: k == 'denoiser', v)
                for k, v in params.items()}

    # -- training ---------------------------------------------------------

    def loss(self, variables, data, rng, *, train: bool = True,
             sample_mask=None):
        """(ref `MoCoDADlatent.training_step`, mocodad_latent.py:135-181)."""
        r_order, r_t, r_noise, r_drop = jax.random.split(rng, 4)
        b = data.shape[0]
        order = self.frame_order(r_order, b)
        cond_data, corrupt_data = F.select_frames(data, order,
                                                  self.n_frames_condition)

        t = sample_timesteps(r_t, b, self.schedule.noise_steps)
        a_hat = coef(self.schedule.alpha_hat, t)
        sqrt_a, sqrt_1ma = jnp.sqrt(a_hat), jnp.sqrt(1.0 - a_hat)
        eps = jax.random.normal(r_noise, (b, self.latent_embedding_dim),
                                dtype=jnp.float32)

        # mixed-precision training (opt-in `train_dtype: bfloat16`): same
        # contract as MoCoDADModel.loss — f32 master params / grads / BN
        # accumulators / noising coefficients / loss reduction, bf16 net
        # compute; the cast sits inside the differentiated graph
        dt = self.train_dtype if train else jnp.float32
        cond_in, corrupt_in = cond_data, corrupt_data
        if dt != jnp.float32:
            def _cast(x):
                return (x.astype(dt)
                        if jnp.issubdtype(x.dtype, jnp.floating) else x)
            variables = dict(variables)
            variables['params'] = jax.tree_util.tree_map(
                _cast, variables['params'])
            cond_in = cond_data.astype(dt)
            corrupt_in = corrupt_data.astype(dt)

        args = (cond_in, corrupt_in, t, eps, sqrt_a, sqrt_1ma)
        if train:
            (pred, target, rec_cond), mutated = self.net.apply(
                variables, *args, train=True, mutable=['batch_stats'],
                rngs={'dropout': r_drop},
                method=MoCoDADLatentNet.loss_forward)
        else:
            pred, target, rec_cond = self.net.apply(
                variables, *args, method=MoCoDADLatentNet.loss_forward)
            mutated = {}
        if dt != jnp.float32:
            pred = pred.astype(jnp.float32)
            rec_cond = (None if rec_cond is None
                        else rec_cond.astype(jnp.float32))
            if self.stage != 'diffusion':
                # the pretrain reconstruction target is the ORIGINAL f32
                # window, not its bf16 net-input cast (the diffusion
                # target eps passed through loss_forward untouched, f32)
                target = corrupt_data
            mutated = jax.tree_util.tree_map(
                lambda x: (x.astype(jnp.float32)
                           if jnp.issubdtype(x.dtype, jnp.floating)
                           else x), mutated)

        metrics: Dict[str, jnp.ndarray] = {}
        loss = self._masked_mean(
            elementwise_loss(self.loss_kind, pred, target), sample_mask)
        if self.stage == 'diffusion':
            metrics['loss_noise'] = loss
        else:
            metrics['loss_unet'] = loss
            if rec_cond is not None:
                loss_rec = self._masked_mean(
                    jnp.square(rec_cond - cond_data), sample_mask)
                loss = loss + self.rec_weight * loss_rec
                metrics['loss_recons'] = loss_rec
        metrics['loss'] = loss
        return loss, metrics, mutated

    # -- generation ---------------------------------------------------------

    def generate(self, variables, data, rng, aggr_strategy=None,
                 n_samples=None, noise_override=None):
        """(ref `MoCoDADlatent.forward`, mocodad_latent.py:69-132).

        `noise_override`, when given, is `(z0, zs)` — the initial latent
        noise (S*B, latent_embedding_dim) and the per-step noise
        (n_chain_steps, S*B, latent_embedding_dim), both in the b-major
        sample fold (row = b*S + s); n_chain_steps is noise_steps-1 for
        the DDPM sampler and the DDIM subsequence length otherwise.  It
        replaces the internal gaussian draws so the latent reverse chain
        can be pinned step-for-step against the reference torch loop
        (ref mocodad_latent.py:102-129); normal callers never pass it.
        Ignored in the 'pretrain' stage (no sampling there).
        """
        aggr = aggr_strategy or self.aggregation_strategy
        s = n_samples or self.n_generated_samples
        r_order, r_init, r_steps, r_aggr = jax.random.split(rng, 4)
        b = data.shape[0]
        order = self.frame_order(r_order, b)
        cond_data, corrupt_data = F.select_frames(data, order,
                                                  self.n_frames_condition)
        cond_emb, _ = self.net.apply(variables, cond_data,
                                     method=MoCoDADLatentNet.encode_condition)

        if self.stage == 'pretrain':
            pose = self.net.apply(variables, corrupt_data, cond_emb,
                                  method=MoCoDADLatentNet.encode_input)
            # (selected pose, no loss); gt for scoring is corrupt_data
            return pose, None

        latent = self.net.apply(variables, corrupt_data, cond_emb,
                                method=MoCoDADLatentNet.encode_input)
        # b-major sample fold (see MoCoDADModel.generate)
        emb_tiled = jnp.repeat(cond_emb, s, axis=0)
        antithetic = (self.antithetic and s > 1
                      and noise_override is None)
        if noise_override is not None:
            z0, z_steps = noise_override
            z0 = jnp.asarray(z0, dtype=latent.dtype)
            z_steps = jnp.asarray(z_steps, dtype=latent.dtype)
        elif antithetic:
            from mocodad_tpu.models.mocodad import _mirror_fold
            z0 = _mirror_fold(jax.random.normal(
                r_init, (b, (s + 1) // 2, self.latent_embedding_dim),
                dtype=latent.dtype), s)
        else:
            z0 = jax.random.normal(r_init,
                                   (s * b, self.latent_embedding_dim),
                                   dtype=latent.dtype)
        use_ddim = self.sampler == 'ddim'
        if use_ddim:
            from mocodad_tpu.diffusion import ddim_plan, ddim_timesteps
            ts_np = ddim_timesteps(self.schedule.noise_steps, self.ddim_steps)
            cxs, ces, czs = (jnp.asarray(c) for c in
                             ddim_plan(self.schedule, ts_np, self.ddim_eta))
            ts = jnp.asarray(ts_np, dtype=jnp.int32)
        else:
            ts = jnp.arange(self.schedule.noise_steps - 1, 0, -1)
        z_src = (z_steps if noise_override is not None
                 else jax.random.split(r_steps, ts.shape[0]))

        def draw_noise(z_in, z):
            if noise_override is not None:
                return z_in
            if antithetic:
                from mocodad_tpu.models.mocodad import _mirror_fold
                return _mirror_fold(jax.random.normal(
                    z_in, (b, (s + 1) // 2, z.shape[-1]), dtype=z.dtype), s)
            return jax.random.normal(z_in, z.shape, dtype=z.dtype)

        def step(z, inputs):
            if use_ddim:
                t_scalar, cx_i, ce_i, cz_i, key = inputs
            else:
                t_scalar, key = inputs
            tb = jnp.full((s * b,), t_scalar, dtype=jnp.int32)
            eps = self.net.apply(variables, z, tb, emb_tiled,
                                 method=MoCoDADLatentNet.denoise_latent)
            if use_ddim:
                z = cx_i.astype(z.dtype) * z + ce_i.astype(z.dtype) * eps
                if self.ddim_eta != 0.0:
                    z = z + cz_i.astype(z.dtype) * draw_noise(key, z)
                return z, None
            a = coef(self.schedule.alpha, t_scalar)
            a_hat = coef(self.schedule.alpha_hat, t_scalar)
            beta = coef(self.schedule.beta, t_scalar)
            noise = draw_noise(key, z)
            noise = jnp.where(t_scalar > 1, noise, jnp.zeros_like(noise))
            z = (1.0 / jnp.sqrt(a)) * (
                z - ((1.0 - a) / jnp.sqrt(1.0 - a_hat)) * eps
            ) + jnp.sqrt(beta) * noise
            return z, None

        xs_in = (ts, cxs, ces, czs, z_src) if use_ddim else (ts, z_src)
        z, _ = jax.lax.scan(step, z0, xs_in,
                            unroll=self.scan_unroll)
        zs = jnp.moveaxis(z.reshape(b, s, self.latent_embedding_dim), 1, 0)
        return aggregate(aggr, self.loss_kind, zs, latent, rng=r_aggr)
