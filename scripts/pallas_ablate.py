"""Ablate the fused-correlator cost: full kernel vs stripped variants.

Measures marginal per-invocation cost of the Mosaic kernel inside a
lax.scan (the tracker's usage pattern) via N-scaling, to separate
per-call dispatch overhead ('noop') from the baseband stage ('bb'),
span-wide phase ('phase'), one-hot build ('oh'), and the full
contractions ('vpu'/'mxu').  MODES env var picks modes (comma-separated).
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import softgnss_tpu as sg
from softgnss_tpu.track.pallas_kernel import _kernel, grid_shape
from softgnss_tpu.track.tables import onehot_width

cfg = sg.default_config(number_of_channels=12, correlator_impl="pallas",
                        pallas_k_tiles=int(os.environ.get("K_CAP", "0")))
C = 12
pack = cfg.track_pack
tile = cfg.track_tile
t_pp = (cfg.track_window // pack) // tile
w = onehot_width(cfg)
k_tiles, t_groups = grid_shape(cfg)
span = k_tiles * tile
G = t_groups * pack
print(f"C={C} pack={pack} tile={tile} t_pp={t_pp} w={w} "
      f"k_tiles={k_tiles} t_groups={t_groups}")

rng = np.random.default_rng(0)
frame = jnp.asarray(rng.integers(-2000, 2000, (C, cfg.track_window // pack),
                                 dtype=np.int32))
scal = jnp.asarray(rng.integers(1, 1000, (C, 8), dtype=np.int32))
digs = jnp.asarray(rng.integers(0, 30, (C, G, 1, 4), dtype=np.int32))
hb = jnp.asarray(rng.integers(0, 30, (C, G, 1, span), dtype=np.int32))
codes = jnp.asarray(rng.choice([-1, 1],
                               (C, pack * t_pp, 3, w)).astype(np.int8))


def make_fn(mode):
    if mode == "noop":
        def kern(scal_ref, frame_ref, digs_ref, hb_ref, codes_ref, out_ref):
            g = pl.program_id(0)
            b = pl.program_id(1)

            @pl.when(jnp.logical_and(g == 0, b == 0))
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)
            out_ref[...] += jnp.float32(1.0)
        kernel = kern
    elif mode in ("bb", "phase", "oh"):
        # stripped: baseband only / + span-wide phase / + one-hot build
        def kern(scal_ref, frame_ref, digs_ref, hb_ref, codes_ref, out_ref):
            g = pl.program_id(0)
            b = pl.program_id(1)

            @pl.when(jnp.logical_and(g == 0, b == 0))
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
            phase_eff = scal_ref[:, 0:1]
            carr_w = scal_ref[:, 1:2]
            sp0 = scal_ref[:, 2:3]
            sp1 = scal_ref[:, 3:4]
            sp2 = scal_ref[:, 4:5]
            o = scal_ref[:, 5:6]
            blk = scal_ref[:, 6:7]
            x32 = frame_ref[...].astype(jnp.int32)
            v = ((x32 << (24 - 8 * b)) >> 24).astype(jnp.float32)
            k_base = pack * span * g + b
            kk = k_base + pack * lane
            mask = jnp.logical_and(kk >= o, kk < o + blk)
            raw = jnp.where(mask, v, jnp.float32(0.0))
            counts = (phase_eff + carr_w * k_base) + (carr_w * pack) * lane
            u32 = pltpu.bitcast(counts, jnp.uint32)
            mant = (u32 >> 9) | jnp.uint32(0x3F800000)
            turns = pltpu.bitcast(mant, jnp.float32) - jnp.float32(1.0)
            from softgnss_tpu.signals.nco import sin_turns
            bb_i = sin_turns(turns) * raw
            bb_q = sin_turns(turns + jnp.float32(0.25)) * raw
            if mode == "bb":
                out_ref[...] += (jnp.sum(bb_i, axis=1, keepdims=True)
                                 + jnp.sum(bb_q, axis=1, keepdims=True))
                return
            dg = digs_ref[...]
            t0 = dg[:, 0, :, 0] + sp0 * lane
            t1 = dg[:, 0, :, 1] + sp1 * lane + (t0 >> 16)
            t2 = dg[:, 0, :, 2] + sp2 * lane + (t1 >> 16)
            hrel = (t2 >> 8) - hb_ref[:, 0, 0, :]
            if mode == "phase":
                out_ref[...] += jnp.sum(hrel.astype(jnp.float32), axis=1,
                                        keepdims=True)
                return
            acc = jnp.zeros((out_ref.shape[0], 8), jnp.float32)
            for k in range(k_tiles):
                h_local = hrel[:, k * tile:(k + 1) * tile]
                oh = h_local[:, None, :] == iota_w
                bi = bb_i[:, k * tile:(k + 1) * tile]
                acc += jnp.sum(
                    jnp.sum(jnp.where(oh, bi[:, None, :], jnp.float32(0.0)),
                            axis=2), axis=1, keepdims=True)
            out_ref[...] += acc
        kernel = kern
    else:
        kernel = functools.partial(_kernel, pack=pack, tile=tile,
                                   k_tiles=k_tiles, w=w, contraction=mode)
    call = pl.pallas_call(
        kernel,
        grid=(t_groups, pack),
        in_specs=[
            pl.BlockSpec((C, 8), lambda g, b: (g * 0, g * 0)),
            pl.BlockSpec((C, span), lambda g, b: (g * 0, g)),
            pl.BlockSpec((C, 1, 1, 4),
                         lambda g, b: (g * 0, b * t_groups + g, g * 0, g * 0)),
            pl.BlockSpec((C, 1, 1, span),
                         lambda g, b: (g * 0, b * t_groups + g, g * 0, g * 0)),
            pl.BlockSpec((C, k_tiles, 3, w),
                         lambda g, b: (g * 0, b * t_groups + g, g * 0, g * 0)),
        ],
        out_specs=pl.BlockSpec((C, 8), lambda g, b: (g * 0, g * 0)),
        out_shape=jax.ShapeDtypeStruct((C, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(s0, n):
        def step(carry, _):
            out = call(scal + carry, frame, digs, hb, codes)
            return carry + out[0, 0].astype(jnp.int32), out[:, 0]
        c, ys = jax.lax.scan(step, s0, None, length=n)
        return ys.sum() + c
    return run


for mode in os.environ.get("MODES", "noop,vpu,mxu").split(","):
    run = make_fn(mode)
    lens = (50, 400)
    times = {}
    for n in lens:
        v = run(jnp.int32(0), n)
        v.block_until_ready()  # compile
        best = np.inf
        for r in range(3):
            t0 = time.perf_counter()
            run(jnp.int32(r + 1), n).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_call = (times[lens[1]] - times[lens[0]]) / (lens[1] - lens[0])
    print(f"{mode:6s}: {per_call*1e6:8.2f} us/call")
