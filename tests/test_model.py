import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADModel, MoCoDADLatentModel, build_model


def _cfg(**kw):
    base = dict(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
                seg_len=6, num_coords=2, embedding_dim=16, h_dim=32,
                latent_dim=16, channels=[32, 16, 32], dropout=0.0,
                noise_steps=10, n_generated_samples=3,
                aggregation_strategy='best', conditioning_architecture='AE')
    base.update(kw)
    return Config(**base)


_MODEL_CACHE = {}


def _cached_model(**kw):
    """Share (model, variables) across tests: flax init is a full jit
    compile on this 1-core host, so re-initializing per test dominated the
    suite wall-time."""
    key = tuple(sorted((k, str(v)) for k, v in kw.items()))
    if key not in _MODEL_CACHE:
        model = MoCoDADModel(_cfg(**kw))
        _MODEL_CACHE[key] = (model, model.init_variables(jax.random.key(0)))
    return _MODEL_CACHE[key]


STRATEGIES = [
    dict(conditioning_strategy='inject', conditioning_indices=[0, 1, 2]),
    dict(conditioning_strategy='concat', conditioning_indices=2),
    dict(conditioning_strategy='inbetween_imp', conditioning_indices=2),
    dict(conditioning_strategy='random_imp', conditioning_indices=3),
    dict(conditioning_strategy='no_condition'),
]


@pytest.mark.parametrize('kw', STRATEGIES,
                         ids=[s['conditioning_strategy'] for s in STRATEGIES])
def test_loss_and_generate_for_every_strategy(kw):
    model, variables = _cached_model(**kw)
    data = jax.random.normal(jax.random.key(1), (8, 2, 6, 17))
    loss, metrics, mutated = jax.jit(
        lambda v, d, r: model.loss(v, d, r))(variables, data,
                                             jax.random.key(2))
    assert np.isfinite(float(loss))
    assert 'loss_noise' in metrics
    if model.cfg.conditioning_architecture == 'AE' and model.strategy == 'inject':
        assert 'loss_recons' in metrics
    assert 'batch_stats' in mutated

    # generate() compiles the full sampling scan (~1-3 min each on this
    # 1-core host); the frame-assembly code it exercises is shared with
    # loss(), so compile it only for the two structurally distinct cases:
    # static order (inject) and per-batch random order (random_imp).
    if kw['conditioning_strategy'] not in ('inject', 'random_imp'):
        return
    data = data[:4]
    sel, gloss = jax.jit(
        lambda v, d, r: model.generate(v, d, r))(variables, data,
                                                 jax.random.key(2))
    n_corrupt = model.n_frames_corrupt
    assert sel.shape == (4, 2, n_corrupt, 17)
    assert gloss.shape == (4,)
    assert np.all(np.isfinite(np.asarray(gloss)))


def test_generate_deterministic_under_key():
    model, variables = _cached_model()
    data = jax.random.normal(jax.random.key(1), (4, 2, 6, 17))
    _, l1 = model.generate(variables, data, jax.random.key(5))
    _, l2 = model.generate(variables, data, jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_training_reduces_loss():
    import optax
    model, variables = _cached_model()
    params, stats = variables['params'], variables['batch_stats']
    data = jax.random.normal(jax.random.key(1), (32, 2, 6, 17)) * 0.1
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state, rng):
        def lf(p):
            loss, metrics, mut = model.loss(
                {'params': p, 'batch_stats': stats}, data, rng)
            return loss, mut
        (loss, mut), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), mut['batch_stats'], \
            opt_state, loss

    rng = jax.random.key(3)
    first = None
    for i in range(12):
        # fixed rng per step so the loss target is stationary
        params, stats, opt_state, loss = step(params, stats, opt_state, rng)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_pack_prediction_tensors_variants():
    """model_return_value packing (ref _pack_out_data,
    models/mocodad.py:606-636); the e2e path is test_return_value.py."""
    from mocodad_tpu.utils.tensors import pack_prediction_tensors
    import numpy as np
    res = {'loss': np.ones((2,)), 'pose': np.ones((2, 2, 3, 17)),
           'trans': np.zeros((2,)), 'meta': np.zeros((2, 4)),
           'frames': np.zeros((2, 6))}
    gt = np.zeros((2, 2, 6, 17))
    assert pack_prediction_tensors(res, 'loss', gt)['prediction'].shape == (2,)
    p = pack_prediction_tensors(res, 'pose', gt)
    assert p['prediction'].ndim == 4 and p['loss'].shape == (2,)
    a = pack_prediction_tensors(res, 'all', gt)
    assert a['prediction'].shape == (2,) and a['pose'].ndim == 4
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pack_prediction_tensors({**res, 'pose': None}, 'pose', gt)


def test_model_dispatch_on_latent_key():
    assert isinstance(build_model(_cfg()), MoCoDADModel)
    cfg = _cfg(diffusion_on_latent=True, stage='pretrain')
    m = build_model(cfg)
    assert isinstance(m, MoCoDADLatentModel)


def test_latent_pretrain_loss_and_forward():
    model = MoCoDADLatentModel(_cfg(diffusion_on_latent=True,
                                    stage='pretrain'))
    variables = model.init_variables(jax.random.key(0))
    data = jax.random.normal(jax.random.key(1), (4, 2, 6, 17))
    loss, metrics, mutated = model.loss(variables, data, jax.random.key(2))
    assert np.isfinite(float(loss)) and 'loss_unet' in metrics
    pose, none = model.generate(variables, data, jax.random.key(3))
    assert pose.shape == (4, 2, 3, 17) and none is None
    assert model.model_return_value == 'pose'


def test_latent_diffusion_loss_generate_and_mask():
    model = MoCoDADLatentModel(_cfg(diffusion_on_latent=True,
                                    stage='diffusion',
                                    latent_embedding_dim=64,
                                    hidden_sizes=[64, 128, 128, 64]))
    variables = model.init_variables(jax.random.key(0))
    data = jax.random.normal(jax.random.key(1), (4, 2, 6, 17))
    loss, metrics, _ = model.loss(variables, data, jax.random.key(2))
    assert np.isfinite(float(loss)) and 'loss_noise' in metrics
    sel, l = model.generate(variables, data, jax.random.key(3))
    assert sel.shape == (4, 64) and l.shape == (4,)
    # freeze mask: only the denoiser trains
    mask = model.trainable_mask(variables['params'])
    flat = jax.tree_util.tree_leaves_with_path(mask)
    for path, trainable in flat:
        top = path[0].key
        assert trainable == (top == 'denoiser'), (path, trainable)


def test_latent_requires_inject():
    with pytest.raises(ValueError):
        MoCoDADLatentModel(_cfg(diffusion_on_latent=True,
                                conditioning_strategy='concat',
                                conditioning_indices=2))


@pytest.mark.parametrize('kw,v,check', [
    (dict(kp18_format=True), 18, 'loss'),
    (dict(headless=True), 14, 'generate'),
])
def test_model_works_for_alternate_joint_counts(kw, v, check):
    # the reference's hardcoded 17-joint U-Net pyramid crashes here
    # (models/stsae/stsae_unet.py:11); our level-'a' follows n_joints.
    # One compile per joint count (loss for 18, generate for 14) keeps the
    # coverage while halving this test's wall-time.
    model = MoCoDADModel(_cfg(**kw))
    assert model.n_joints == v
    variables = model.init_variables(jax.random.key(0))
    data = jax.random.normal(jax.random.key(1), (4, 2, 6, v))
    if check == 'loss':
        loss, _, _ = model.loss(variables, data, jax.random.key(2))
        assert np.isfinite(float(loss))
    else:
        sel, l = model.generate(variables, data, jax.random.key(3))
        assert sel.shape == (4, 2, 3, v)


def test_mirror_fold_layout():
    """Antithetic fold: b-major rows, second half of each window's samples
    are the negated first half (odd S keeps the unpaired draw)."""
    from mocodad_tpu.models.mocodad import _mirror_fold
    b, s = 3, 4
    z_half = jnp.arange(b * 2 * 5, dtype=jnp.float32).reshape(b, 2, 5) + 1.0
    out = np.asarray(_mirror_fold(z_half, s))
    assert out.shape == (s * b, 5)
    for w in range(b):
        np.testing.assert_array_equal(out[w * s + 0], z_half[w, 0])
        np.testing.assert_array_equal(out[w * s + 1], z_half[w, 1])
        np.testing.assert_array_equal(out[w * s + 2], -z_half[w, 0])
        np.testing.assert_array_equal(out[w * s + 3], -z_half[w, 1])

    out5 = np.asarray(_mirror_fold(
        jnp.ones((b, 3, 5), jnp.float32), 5))
    assert out5.shape == (5 * b, 5)
    np.testing.assert_array_equal(out5[3:5], -np.ones((2, 5)))


def test_antithetic_generate_smoke():
    cfg = _cfg(channels=[8, 4, 8], embedding_dim=8, h_dim=8, latent_dim=8,
               noise_steps=5, n_generated_samples=4)
    cfg.extras['antithetic'] = True
    model = MoCoDADModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    data = jax.random.normal(jax.random.key(1), (8, 2, 6, 17)) * 0.1
    _, loss = jax.jit(lambda v, d, r: model.generate(v, d, r))(
        variables, data, jax.random.key(2))
    loss = np.asarray(loss)
    assert loss.shape == (8,) and np.isfinite(loss).all()

    cfg2 = _cfg(channels=[8, 4, 8], embedding_dim=8, h_dim=8, latent_dim=8,
                noise_steps=5, n_generated_samples=4)
    model2 = MoCoDADModel(cfg2)
    _, loss2 = jax.jit(lambda v, d, r: model2.generate(v, d, r))(
        variables, data, jax.random.key(2))
    # same rng, different sampling scheme -> different losses
    assert not np.allclose(loss, np.asarray(loss2))


def test_antithetic_latent_generate_smoke():
    cfg = _cfg(diffusion_on_latent=True, stage='diffusion',
               latent_embedding_dim=64, hidden_sizes=[64, 128, 128, 64])
    cfg.extras['antithetic'] = True
    model = MoCoDADLatentModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    data = jax.random.normal(jax.random.key(1), (4, 2, 6, 17))
    sel, loss = model.generate(variables, data, jax.random.key(3))
    assert sel.shape == (4, 64)
    assert loss.shape == (4,) and np.isfinite(np.asarray(loss)).all()


@pytest.mark.parametrize('latent', [False, True])
def test_e_unet_condition_arch_trains(latent):
    """E_unet condition encoders return (latent, []) — an empty
    hidden-state list, not a reconstruction — which must not trip the
    AE-only rec-loss guard (ref models/mocodad.py:220 guards on
    arch == 'AE'); regression for a TypeError in the latent pretrain
    stage."""
    kw = dict(conditioning_architecture='E_unet', channels=[8, 4, 8],
              embedding_dim=8, h_dim=8, latent_dim=8, noise_steps=5,
              n_generated_samples=2)
    if latent:
        kw.update(diffusion_on_latent=True, stage='pretrain',
                  latent_embedding_dim=16,
                  hidden_sizes=[16, 32, 32, 16])
    model = build_model(_cfg(**kw))
    variables = model.init_variables(jax.random.key(0))
    data = jax.random.normal(jax.random.key(1), (4, 2, 6, 17)) * 0.1
    loss, metrics, _ = model.loss(variables, data, jax.random.key(2))
    assert np.isfinite(float(loss))
    assert 'loss_recons' not in metrics  # AE-only term


def test_ddim_generate_smoke_and_eta0_determinism():
    """sampler='ddim' (framework extension): a 3-step chain runs, and with
    eta=0 the per-step noise injections are provably unused — overriding
    them with garbage leaves the output bit-identical."""
    cfg = _cfg(channels=[8, 4, 8], embedding_dim=8, h_dim=8, latent_dim=8,
               noise_steps=10, n_generated_samples=2)
    cfg.extras.update(sampler='ddim', ddim_steps=3)
    model = MoCoDADModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    data = jax.random.normal(jax.random.key(1), (4, 2, 6, 17)) * 0.1

    sel, loss = model.generate(variables, data, jax.random.key(2))
    assert sel.shape == (4, 2, 3, 17) and loss.shape == (4,)
    assert np.isfinite(np.asarray(loss)).all()

    b, s = 4, 2
    x0 = jax.random.normal(jax.random.key(3), (s * b, 2, 3, 17))
    zs_a = jnp.zeros((3, s * b, 2, 3, 17))
    zs_b = jnp.full((3, s * b, 2, 3, 17), 7.0)
    _, la = model.generate(variables, data, jax.random.key(2),
                           noise_override=(x0, zs_a))
    _, lb = model.generate(variables, data, jax.random.key(2),
                           noise_override=(x0, zs_b))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # eta>0 consumes the injected noise
    cfg2 = _cfg(channels=[8, 4, 8], embedding_dim=8, h_dim=8, latent_dim=8,
                noise_steps=10, n_generated_samples=2)
    cfg2.extras.update(sampler='ddim', ddim_steps=3, ddim_eta=1.0)
    model2 = MoCoDADModel(cfg2)
    _, la2 = model2.generate(variables, data, jax.random.key(2),
                             noise_override=(x0, zs_a))
    _, lb2 = model2.generate(variables, data, jax.random.key(2),
                             noise_override=(x0, zs_b))
    assert not np.allclose(np.asarray(la2), np.asarray(lb2))


def test_ddim_latent_generate_smoke():
    cfg = _cfg(diffusion_on_latent=True, stage='diffusion',
               latent_embedding_dim=64, hidden_sizes=[64, 128, 128, 64])
    cfg.extras.update(sampler='ddim', ddim_steps=3)
    model = MoCoDADLatentModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    data = jax.random.normal(jax.random.key(1), (4, 2, 6, 17))
    sel, loss = model.generate(variables, data, jax.random.key(3))
    assert sel.shape == (4, 64)
    assert loss.shape == (4,) and np.isfinite(np.asarray(loss)).all()


def test_unknown_sampler_rejected():
    cfg = _cfg()
    cfg.extras['sampler'] = 'euler'
    with pytest.raises(ValueError):
        MoCoDADModel(cfg)


def test_train_dtype_bf16_mixed_precision_contract():
    """`train_dtype: bfloat16` (opt-in): master params/grads/BN running
    stats and the loss value stay f32 while the net computes in bf16;
    the loss tracks the f32 step closely."""
    model, variables = _cached_model()
    data = jax.random.normal(jax.random.key(3), (8, 2, 6, 17))
    rng = jax.random.key(4)

    cfg16 = _cfg()
    cfg16.extras['train_dtype'] = 'bfloat16'
    m16 = MoCoDADModel(cfg16)

    def grads_of(m):
        def f(params):
            loss, metrics, mutated = m.loss(
                {'params': params,
                 'batch_stats': variables['batch_stats']},
                data, rng, train=True)
            return loss, (metrics, mutated)
        return jax.grad(f, has_aux=True)(variables['params'])

    g32, (met32, _) = jax.jit(lambda: grads_of(model))()
    g16, (met16, mut16) = jax.jit(lambda: grads_of(m16))()
    for leaf in jax.tree_util.tree_leaves(g16):
        assert leaf.dtype == jnp.float32          # grads at master dtype
    for leaf in jax.tree_util.tree_leaves(mut16):
        assert leaf.dtype == jnp.float32          # BN stats stay f32
    assert met16['loss'].dtype == jnp.float32
    # bf16 forward/backward tracks f32 closely (same RNG keys; bf16 has
    # ~3 decimal digits, so per-step loss agreement within ~1% is the
    # expected regime)
    l32, l16 = float(met32['loss']), float(met16['loss'])
    assert abs(l16 - l32) / abs(l32) < 2e-2, (l32, l16)
    # grads correlate strongly with the f32 ones
    v32 = np.concatenate([np.asarray(x).ravel()
                          for x in jax.tree_util.tree_leaves(g32)])
    v16 = np.concatenate([np.asarray(x).ravel()
                          for x in jax.tree_util.tree_leaves(g16)])
    cos = float(v32 @ v16 / (np.linalg.norm(v32) * np.linalg.norm(v16)))
    assert cos > 0.99, cos

    # eval-side sampling is untouched by the knob
    assert m16.eval_dtype == jnp.float32

    # BN running stats must enter the EMA as f32 ACCUMULATORS, not just
    # come back stored as f32: seed every running mean with a value whose
    # bf16 rounding error is measurable (1 + 2^-12 rounds to 1.0 in
    # bf16), then check the update still carries the 2^-12 at f32
    # precision — new_ra(v) - new_ra(0) == momentum * v, which a
    # cast-to-bf16-first implementation would quantize away entirely.
    delta = 2.0 ** -12

    def seeded(v):
        return jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, v), variables['batch_stats'])

    def mutated_with(bs):
        _, _, mut = m16.loss({'params': variables['params'],
                              'batch_stats': bs}, data, rng, train=True)
        return mut['batch_stats']

    mut_v = jax.jit(lambda: mutated_with(seeded(1.0 + delta)))()
    mut_0 = jax.jit(lambda: mutated_with(seeded(0.0)))()
    means_v = [np.asarray(x) for x in jax.tree_util.tree_leaves(mut_v)]
    means_0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(mut_0)]
    momentum = 0.9   # nn/stsgcn.py BatchNorm momentum
    for a, b in zip(means_v, means_0):
        got = (a - b).ravel()[0]
        want = momentum * (1.0 + delta)
        assert abs(got - want) < delta / 4, (got, want)


def test_train_dtype_bf16_latent_variant_contract():
    """The latent variant honors `train_dtype: bfloat16` with the same
    contract as the base model (f32 masters/grads/BN stats/loss, bf16
    net compute), in BOTH stages; the pretrain reconstruction target and
    the diffusion eps target stay f32."""
    data = jax.random.normal(jax.random.key(3), (8, 2, 6, 17))
    rng = jax.random.key(4)
    for stage in ('pretrain', 'diffusion'):
        lcfg = _cfg(conditioning_strategy='inject',
                    conditioning_indices=[0, 1, 2], stage=stage,
                    latent_embedding_dim=16, hidden_sizes=[32, 16])
        lcfg16 = _cfg(conditioning_strategy='inject',
                      conditioning_indices=[0, 1, 2], stage=stage,
                      latent_embedding_dim=16, hidden_sizes=[32, 16])
        lcfg16.extras['train_dtype'] = 'bfloat16'
        m32, m16 = MoCoDADLatentModel(lcfg), MoCoDADLatentModel(lcfg16)
        variables = m32.init_variables(jax.random.key(0))

        def grads_of(m):
            def f(params):
                loss, metrics, mutated = m.loss(
                    {'params': params,
                     'batch_stats': variables['batch_stats']},
                    data, rng, train=True)
                return loss, (metrics, mutated)
            return jax.grad(f, has_aux=True)(variables['params'])

        g32, (met32, _) = jax.jit(lambda: grads_of(m32))()
        g16, (met16, mut16) = jax.jit(lambda: grads_of(m16))()
        for leaf in jax.tree_util.tree_leaves(g16):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(mut16):
            assert leaf.dtype == jnp.float32
        assert met16['loss'].dtype == jnp.float32
        l32, l16 = float(met32['loss']), float(met16['loss'])
        assert abs(l16 - l32) / abs(l32) < 2e-2, (stage, l32, l16)
        v32 = np.concatenate([np.asarray(x).ravel()
                              for x in jax.tree_util.tree_leaves(g32)])
        v16 = np.concatenate([np.asarray(x).ravel()
                              for x in jax.tree_util.tree_leaves(g16)])
        cos = float(v32 @ v16 / (np.linalg.norm(v32) * np.linalg.norm(v16)))
        assert cos > 0.99, (stage, cos)


def test_eval_profile_fast_caps_samples_keeps_reference_chain():
    """`eval_profile: fast` caps the Monte-Carlo sample count at 10
    (measured AUC-free under the reference DDPM chain, PERF_NOTES
    "Fast-eval frontier") without touching the sampler; the cap is
    adjustable, never raises the configured count, and artifact naming
    follows the effective count."""
    from mocodad_tpu.config import effective_n_generated_samples

    cfg = _cfg(n_generated_samples=50)
    cfg.extras['eval_profile'] = 'fast'
    m = MoCoDADModel(cfg)
    assert m.n_generated_samples == 10
    assert (m.sampler, m.antithetic) == ('ddpm', False)  # chain untouched
    assert effective_n_generated_samples(cfg) == 10

    cfg2 = _cfg(n_generated_samples=50)
    cfg2.extras.update(eval_profile='fast', fast_profile_samples=26)
    assert MoCoDADModel(cfg2).n_generated_samples == 26

    cfg3 = _cfg(n_generated_samples=5)   # cap never raises the count
    cfg3.extras['eval_profile'] = 'fast'
    assert MoCoDADModel(cfg3).n_generated_samples == 5

    base = MoCoDADModel(_cfg(n_generated_samples=50))
    assert base.n_generated_samples == 50

    cfg4 = _cfg()
    cfg4.extras['eval_profile'] = 'turbo'
    # the helper itself must reject typos: replay/viz paths resolve cache
    # directories model-free, and a silent fallback to the uncapped count
    # would look up the wrong saved_tensors_* directory
    with pytest.raises(ValueError, match='eval_profile'):
        effective_n_generated_samples(cfg4)
    with pytest.raises(ValueError, match='eval_profile'):
        MoCoDADModel(cfg4)


def test_fast_profile_unsafe_aggregation_gate(monkeypatch):
    """Aggregation families measured S-cap-UNSAFE (study_aggr.py) are
    refused under `eval_profile: fast` whenever the cap would actually
    reduce the sample count — unless explicitly overridden.  The
    'measured AUC-free' contract must not silently lapse for estimator
    families the frontier study flagged."""
    from mocodad_tpu import config as config_mod
    from mocodad_tpu.config import effective_n_generated_samples

    monkeypatch.setattr(config_mod, 'FAST_PROFILE_UNSAFE_AGGREGATIONS',
                        frozenset({'quantile'}))

    cfg = _cfg(n_generated_samples=50, aggregation_strategy='quantile:0.9')
    cfg.extras['eval_profile'] = 'fast'
    with pytest.raises(ValueError, match='UNSAFE'):
        effective_n_generated_samples(cfg)

    # explicit override accepts the measured accuracy risk
    cfg.extras['fast_profile_allow_unsafe_aggregation'] = True
    assert effective_n_generated_samples(cfg) == 10

    # a cap that does not bite (configured count already <= cap) is not
    # a coarsening and must pass
    cfg2 = _cfg(n_generated_samples=8, aggregation_strategy='quantile:0.9')
    cfg2.extras['eval_profile'] = 'fast'
    assert effective_n_generated_samples(cfg2) == 8

    # safe families ride the cap untouched
    cfg3 = _cfg(n_generated_samples=50, aggregation_strategy='best')
    cfg3.extras['eval_profile'] = 'fast'
    assert effective_n_generated_samples(cfg3) == 10


def test_fast_profile_unsafe_set_matches_archived_study():
    """The shipped FAST_PROFILE_UNSAFE_AGGREGATIONS set is exactly what
    the archived aggregation-frontier measurements imply under the
    study's decision rule (|mean AUC(S=10) - mean AUC(S=50)| >
    max(2 x max seed spread, 0.005) at ANY operating point) — the gate
    cannot drift from the evidence it cites."""
    import glob
    import json
    import os

    from mocodad_tpu.config import FAST_PROFILE_UNSAFE_AGGREGATIONS

    paths = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'tools', 'perf', 'results', 'aggr_*.json')))
    assert paths, 'archived aggregation study results missing'
    with open(paths[-1]) as f:
        res = json.load(f)

    cells = {}   # (aggr, op, S) -> list of seed AUCs
    for key, vals in res.items():
        if not key.startswith('auc/'):
            continue
        _, op, chain, samp, s, aggr = key.split('/')
        # the decision rule is defined on the reference chain with
        # independent sampling only; a future archive that also carries
        # ddim/antithetic cells must not contaminate the spread/delta
        if chain != 'ddpm-9' or samp != 'ind':
            continue
        assert (aggr, op, int(s[1:])) not in cells, key
        cells[(aggr, op, int(s[1:]))] = vals

    unsafe = set()
    aggrs = {a for a, _, _ in cells}
    assert aggrs, 'archive holds no ddpm-9/ind cells'
    for aggr in aggrs:
        ops = {o for a, o, _ in cells if a == aggr}
        for op in ops:
            lo = cells.get((aggr, op, 10))
            hi = cells.get((aggr, op, 50))
            # a (aggr, op) without both endpoints would make this test
            # pass vacuously — a truncated/re-parameterized archive must
            # fail loudly, not silently validate an empty unsafe set
            assert lo and hi, (aggr, op, 'archive missing S10/S50 cell')
            # the study's bound uses the max seed spread over ALL S
            # cells of this (aggr, op), including S=26
            spread = max(max(v) - min(v) for (a, o, _), v in cells.items()
                         if a == aggr and o == op)
            delta = abs(sum(lo) / len(lo) - sum(hi) / len(hi))
            if delta > max(2 * spread, 0.005):
                unsafe.add(aggr.split(':')[0])
    assert FAST_PROFILE_UNSAFE_AGGREGATIONS == frozenset(unsafe), (
        unsafe, FAST_PROFILE_UNSAFE_AGGREGATIONS)


def test_apply_eval_profile_cli_override(monkeypatch):
    """The CLI-level `--eval-profile` override: 'fast' enables the cap,
    'full' strips a config-set profile, None is a no-op, and a profile
    that the unsafe-aggregation gate refuses fails eagerly at the CLI
    boundary rather than mid-eval."""
    from mocodad_tpu import config as config_mod
    from mocodad_tpu.config import (apply_eval_profile,
                                    effective_n_generated_samples)

    cfg = _cfg(n_generated_samples=50)
    apply_eval_profile(cfg, None)
    assert 'eval_profile' not in cfg.extras
    assert effective_n_generated_samples(cfg) == 50

    apply_eval_profile(cfg, 'fast')
    assert cfg.extras['eval_profile'] == 'fast'
    assert effective_n_generated_samples(cfg) == 10

    apply_eval_profile(cfg, 'full')
    assert 'eval_profile' not in cfg.extras
    assert effective_n_generated_samples(cfg) == 50

    with pytest.raises(ValueError, match='fast'):
        apply_eval_profile(cfg, 'warp')

    # the gate fires at apply time: a measured-unsafe aggregation turns
    # the override into an immediate refusal — and leaves the config
    # unchanged, so a caller may catch and continue on the old profile
    monkeypatch.setattr(config_mod, 'FAST_PROFILE_UNSAFE_AGGREGATIONS',
                        frozenset({'best'}))
    with pytest.raises(ValueError, match='UNSAFE'):
        apply_eval_profile(cfg, 'fast')
    assert 'eval_profile' not in cfg.extras
    assert effective_n_generated_samples(cfg) == 50


def test_add_eval_profile_arg_parser_wiring():
    """The shared `--eval-profile` definition (config.add_eval_profile_arg)
    accepts exactly the values apply_eval_profile accepts, defaults to
    no-op None, and rejects unknown profiles at parse time — the three
    CLIs stay in lockstep by construction."""
    import argparse

    from mocodad_tpu.config import add_eval_profile_arg

    p = argparse.ArgumentParser()
    add_eval_profile_arg(p)
    assert p.parse_args([]).eval_profile is None
    assert p.parse_args(['--eval-profile', 'fast']).eval_profile == 'fast'
    assert p.parse_args(['--eval-profile', 'full']).eval_profile == 'full'
    with pytest.raises(SystemExit):
        p.parse_args(['--eval-profile', 'warp'])
