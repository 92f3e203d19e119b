"""Round-2 roadmap leftover (round-3 verdict item 7): manual DMA
double-buffering / emit_pipeline-style pipelining at nb=256.

Hypothesis: the whole-step Pallas megakernel loses to XLA (32.4 vs
25.7 ms/forward, PERF_NOTES "Mosaic probe results") because ~200 grid
programs x 34 small dots pay ~4.7 us of per-program Mosaic overhead, and
the tile sizes that would amortize it (nb>=512) OOM the remote compiler.
A SINGLE-program kernel that loops over the batch chunks inside one
Mosaic program — weights resident in VMEM once, activations streamed
HBM->VMEM with 2-slot double-buffered manual DMAs overlapping compute —
removes the per-program re-entry entirely at the same nb=256 tile.  This
probe measures that variant against the shipping grid megakernel and the
XLA fast path on one 51200-row denoise forward (bench protocol shapes).

Inputs are pre-chunked to (num_chunks, ...) on the XLA side so every DMA
slices the leading dim (the supported sliced-DMA form).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 256
N_ROWS = 51200      # bench protocol: 1024 windows x 50 samples fold


def build_dma_pipelined_denoiser(params, batch_stats, *, c_in, n_frames,
                                 n_joints, embedding_dim,
                                 unet_down_channels=(16, 32, 32, 64, 64,
                                                     128, 64),
                                 unet_up_channels=None, nb=NB,
                                 compute_dtype=jnp.bfloat16,
                                 interpret=False,
                                 vmem_limit_bytes=100 * 2**20):
    """Single-program variant of ops/pallas_unet.build_pallas_denoiser:
    same folded weights, same 34-dot body, but the batch-chunk loop runs
    INSIDE one kernel program with manual double-buffered DMAs."""
    from mocodad_tpu.nn.unet import joint_pyramid
    from mocodad_tpu.ops.pallas_unet import _fold_gcn, _fold_joint

    jp = joint_pyramid(n_joints)
    t = n_frames
    tva = t * jp['a']
    # Mosaic requires sliced-DMA shapes aligned to the (8,128) tiling on
    # the two minor dims; tva (second-minor in the chunk layout) is 51
    # for the flagship, so the DMA'd buffers carry it padded to 8 and the
    # kernel value-slices back to tva for compute (the dot bodies are
    # unchanged vs the grid megakernel).
    tva_pad = -(-tva // 8) * 8
    cdt = compute_dtype

    gw = [_fold_gcn(params[n], batch_stats[n], cdt)
          for n in ('p1a', 'd1_0', 'd1_1', 'd2_0', 'd2_1', 'd3_0', 'd3_1',
                    'u4_0', 'u4_1', 'u3_0', 'u3_1')]
    jw = [_fold_joint(params[n], batch_stats[n], t, cdt)
          for n in ('down1', 'down2', 'up3', 'up2')]

    flats = []
    for w in gw:
        flats += [w.k2, w.w2, w.bias, w.slope, w.we2, w.eb]
        if w.wr2 is not None:
            flats += [w.wr2]
    for w in jw:
        flats += [w.d2, w.rs, w.rt]
    has_res = [w.wr2 is not None for w in gw]

    def kernel(num_chunks_ref, x_hbm, semb_hbm, *refs):
        it = iter(refs)
        ws = []
        for hr in has_res:
            ws.append(dict(k2=next(it), w2=next(it), bias=next(it),
                           slope=next(it), we2=next(it), eb=next(it),
                           wr2=next(it) if hr else None))
        js = [dict(d2=next(it), rs=next(it), rt=next(it)) for _ in jw]
        o_hbm = next(it)
        xbuf, sbuf, obuf, xsem, ssem, osem = (next(it) for _ in range(6))
        num_chunks = num_chunks_ref[0]

        def xdma(slot, i):
            return pltpu.make_async_copy(x_hbm.at[i], xbuf.at[slot],
                                         xsem.at[slot])

        def sdma(slot, i):
            return pltpu.make_async_copy(semb_hbm.at[i], sbuf.at[slot],
                                         ssem.at[slot])

        def odma(slot, i):
            return pltpu.make_async_copy(obuf.at[slot], o_hbm.at[i],
                                         osem.at[slot])

        def dg(a, b, dims):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(dims, ((), ())),
                preferred_element_type=jnp.float32)

        def gcn(f, w, semb, in_b):
            f = f.astype(cdt)
            if in_b:
                g = dg(w['k2'][:], f, ((1,), (0,)))
                r_dims = ((1,), (1,))
            else:
                g = dg(w['k2'][:], f, ((1,), (1,)))
                r_dims = ((1,), (0,))
            y = dg(w['w2'][:], g, ((1,), (1,)))
            if w['wr2'] is not None:
                y = y + dg(w['wr2'][:], f, r_dims)
            else:
                y = y + (jnp.swapaxes(f, 0, 1) if in_b else f)
            y = y + w['bias'][:]
            a = w['slope'][0, 0]
            y = jnp.where(y >= 0, y, a * y)
            e = dg(w['we2'][:], semb, ((1,), (0,))) + w['eb'][:]
            return (y + e[:, None, :]).astype(cdt)

        def joint(f, w):
            h = dg(w['d2'][:], f.astype(cdt), ((1,), (1,)))
            return (h * w['rs'][:] + w['rt'][:]).astype(cdt)

        def forward(x0, semb):
            f = gcn(x0, ws[0], semb, False)
            f = gcn(f, ws[1], semb, False)
            f = gcn(f, ws[2], semb, False)
            d1 = f
            f = joint(f, js[0])
            f = gcn(f, ws[3], semb, True)
            f = gcn(f, ws[4], semb, False)
            d2 = f
            f = joint(f, js[1])
            f = gcn(f, ws[5], semb, True)
            f = gcn(f, ws[6], semb, False)
            f = jnp.swapaxes(joint(f, js[2]), 0, 1) + d2
            f = gcn(f, ws[7], semb, False)
            f = gcn(f, ws[8], semb, False)
            f = jnp.swapaxes(joint(f, js[3]), 0, 1) + d1
            f = gcn(f, ws[9], semb, False)
            f = gcn(f, ws[10], semb, False)
            return (f.astype(jnp.float32) + x0.astype(jnp.float32))

        # warm-up: start chunk 0's input DMAs
        xdma(0, 0).start()
        sdma(0, 0).start()

        def body(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < num_chunks)
            def _():
                xdma(nxt, i + 1).start()
                sdma(nxt, i + 1).start()

            xdma(slot, i).wait()
            sdma(slot, i).wait()
            # value-slice the tiling pad off (match the grid kernel's cast)
            x0 = xbuf[slot][:, :tva, :].astype(cdt)
            semb = sbuf[slot].astype(cdt)
            y = forward(x0, semb)
            if tva_pad != tva:
                y = jnp.concatenate(
                    [y, jnp.zeros((y.shape[0], tva_pad - tva, y.shape[2]),
                                  y.dtype)], axis=1)

            # this output slot was last DMA'd out at i-2; wait before
            # overwriting it
            @pl.when(i >= 2)
            def _():
                odma(slot, i - 2).wait()

            obuf[slot] = y.astype(obuf.dtype)
            odma(slot, i).start()

        jax.lax.fori_loop(0, num_chunks, body, None)

        # drain the (up to) 2 output DMAs still in flight
        @pl.when(num_chunks >= 2)
        def _():
            odma(num_chunks % 2, num_chunks - 2).wait()

        @pl.when(num_chunks >= 1)
        def _():
            odma((num_chunks - 1) % 2, num_chunks - 1).wait()

    const_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flats]
    params_kw = (dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=vmem_limit_bytes))
        if vmem_limit_bytes and not interpret else {})

    def call(x_ctn, silu_emb_en):
        n = x_ctn.shape[2]
        n_pad = -(-n // nb) * nb
        if n_pad != n:
            x_ctn = jnp.pad(x_ctn, ((0, 0), (0, 0), (0, n_pad - n)))
            silu_emb_en = jnp.pad(silu_emb_en, ((0, 0), (0, n_pad - n)))
        k = n_pad // nb
        # pre-chunk on the XLA side: every DMA slices the leading dim;
        # tva rides padded to the 8-sublane tiling so the slices align
        if tva_pad != tva:
            x_ctn = jnp.pad(x_ctn, ((0, 0), (0, tva_pad - tva), (0, 0)))
        xc = jnp.moveaxis(x_ctn.reshape(c_in, tva_pad, k, nb), 2, 0)
        sc = jnp.moveaxis(silu_emb_en.reshape(embedding_dim, k, nb), 1, 0)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                          pl.BlockSpec(memory_space=pltpu.ANY)]
                + const_specs,
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                scratch_shapes=[
                    pltpu.VMEM((2, c_in, tva_pad, nb), x_ctn.dtype),
                    pltpu.VMEM((2, embedding_dim, nb), silu_emb_en.dtype),
                    pltpu.VMEM((2, c_in, tva_pad, nb), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ]),
            out_shape=jax.ShapeDtypeStruct((k, c_in, tva_pad, nb),
                                           jnp.float32),
            interpret=interpret,
            **params_kw,
        )(jnp.array([k], jnp.int32), xc, sc, *flats)
        out = jnp.moveaxis(out, 0, 2).reshape(c_in, tva_pad, n_pad)
        return out[:, :tva, :n]

    return call


def main():
    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache(os.environ['JAX_COMPILATION_CACHE_DIR'])
    from mocodad_tpu.config import flagship_config
    from mocodad_tpu.models import MoCoDADModel
    from mocodad_tpu.ops import pallas_unet

    cfg = flagship_config(batch_size=1024, n_generated_samples=50)
    model = MoCoDADModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    p = variables['params']['model']
    bs = variables['batch_stats']['model']
    kw = dict(c_in=2, n_frames=model.input_n_frames, n_joints=17,
              embedding_dim=16)
    tva = model.input_n_frames * 17

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, tva, N_ROWS), jnp.float32)
    se = jnp.asarray(rs.randn(16, N_ROWS), jnp.float32)

    def bench(name, fn, *args, co=None):
        args = args or (x, se)
        t0 = time.perf_counter()
        y = np.asarray(jax.jit(fn, compiler_options=co)(*args))
        print(f'{name}: compile+first {time.perf_counter() - t0:.0f}s',
              flush=True)
        # Time with a device-side sum and a 4-byte scalar fetch: fetching
        # the full (2, tva, 51200) f32 output (~21 MB) through the tunnel
        # costs seconds and swamps the ~25 ms compute under comparison.
        # The scalar fetch still fences (launches execute in order).
        f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)),
                    compiler_options=co)
        times = []
        for _ in range(9):
            t0 = time.perf_counter()
            np.asarray(f(*args))   # host-fetch fence (PERF_NOTES rule)
            times.append(time.perf_counter() - t0)
        ms = np.median(times[1:]) * 1e3
        print(f'{name}: {ms:.1f} ms/forward (median of 8, '
              f'range {min(times[1:])*1e3:.1f}-{max(times[1:])*1e3:.1f})',
              flush=True)
        return y, ms

    # parity first in interpret mode on tiny rows (CPU semantics)
    small_x, small_se = x[:, :, :2 * NB], se[:, :2 * NB]
    ref_call = pallas_unet.build_pallas_denoiser(p, bs, nb=NB,
                                                 interpret=True, **kw)
    new_call = build_dma_pipelined_denoiser(p, bs, nb=NB, interpret=True,
                                            **kw)
    a = np.asarray(ref_call(small_x, small_se))
    b = np.asarray(new_call(small_x, small_se))
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    print(f'interpret-mode parity vs grid megakernel: rel {rel:.2e}',
          flush=True)
    assert rel < 1e-5

    grid_call = pallas_unet.build_pallas_denoiser(p, bs, nb=NB, **kw)
    dma_call = build_dma_pipelined_denoiser(p, bs, nb=NB, **kw)
    yg, ms_g = bench('grid megakernel (shipping opt-in)', grid_call)
    yd, ms_d = bench('single-program DMA-pipelined', dma_call)
    rel = np.abs(yg - yd).mean() / (np.abs(yg).mean() + 1e-9)
    print(f'on-TPU parity: rel {rel:.2e}', flush=True)

    # same-run XLA fast path at the same row count (batch-major layout;
    # timing reference only — it computes its own timestep embedding)
    from mocodad_tpu.ops.fast_unet import build_fast_denoiser
    from mocodad_tpu.ops.xla_tuning import tuned_compiler_options
    den = build_fast_denoiser(p, bs, inject_condition=True, **kw)
    x_nctv = jnp.asarray(
        rs.randn(N_ROWS, 2, model.input_n_frames, 17), jnp.bfloat16)
    tb = jnp.full((N_ROWS,), 5, jnp.int32)
    emb = jnp.asarray(rs.randn(N_ROWS, 16) * 0.5, jnp.bfloat16)

    _, ms_x = bench('XLA fast path (shipping default, bf16+tuned)',
                    den, x_nctv, tb, emb,
                    co=tuned_compiler_options() or None)
    print(f'delta: {(ms_d / ms_g - 1) * 100:+.1f}% vs grid megakernel, '
          f'{(ms_d / ms_x - 1) * 100:+.1f}% vs XLA fast path', flush=True)


if __name__ == '__main__':
    main()
