"""Ablate the megakernel's per-ms cost: which stage dominates?

Marginal-cost timing (N-scaling inside one jit) of stripped variants at
the reference workload.  MODES env var picks variants:
  noop   - frames streaming + state init + outputs only (pipeline floor)
  bb     - + unpack, mask, carrier NCO, shared-fold sincos baseband
  phase  - + span-wide digit phase ramp
  taps   - + funnel-shift code lookup and the six correlator sums (full
           correlator, no loop filters)
  full   - the real kernel (_mega_call)
  build  - the frames builder alone (build_frames)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import softgnss_tpu as sg
from softgnss_tpu.track.megakernel import _mega_call, _sincos_counts, build_frames
from softgnss_tpu.track.tables import (MEGA_PACK, build_tables, mega_grid,
                                       mega_n_words, mega_width, mega_window)

cfg = sg.default_config(number_of_channels=int(os.environ.get("CH", "12")),
                        correlator_impl="megakernel",
                        pallas_k_tiles=int(os.environ.get("KT", "0")))
C = cfg.number_of_channels
pack = MEGA_PACK
tile = cfg.track_tile
win = mega_window(cfg)
win_w = win // pack
spc = cfg.samples_per_code
spc_w = spc // pack
n_tab = mega_n_words(cfg)
k_tiles, t_groups = mega_grid(cfg)
span = k_tiles * tile
B = cfg.track_block_ms
print(f"C={C} win={win} wbits={mega_width(cfg)} n_tab={n_tab} "
      f"k_tiles={k_tiles} t_groups={t_groups} B={B}")

prns = np.arange(1, C + 1)
freqs = cfg.intermediate_freq + np.linspace(-3000, 3000, C)
tables = build_tables(cfg, prns, freqs)
tabs = jnp.asarray(tables.mega_tabs)
hb0 = jnp.asarray(tables.mega_hb0)
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(-2**30, 2**30, (B, C, win_w),
                                  np.int64).astype(np.int32))
capw = jnp.asarray(rng.integers(-2**30, 2**30, (1, (B + 4) * spc_w),
                                np.int64).astype(np.int32))
starts = jnp.asarray(np.sort(rng.integers(0, spc_w, C)).astype(np.int32))
ci = jnp.zeros((C, 8), jnp.int32).at[:, 1].set(1).at[:, 0].set(123456789)
sf = jnp.zeros((C, 16), jnp.float32)
si = jnp.zeros((C, 16), jnp.int32).at[:, 0].set(60).at[:, 4].set(4000)


def make_stripped(mode):
    def kern(frames_ref, *rest):
        tab_refs = rest[:n_tab]
        hb0_ref, ci_ref, sf_ref, ys_ref, sfo_ref, stf = rest[n_tab:]
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            stf[...] = sf_ref[...]

        o = stf[:, 1:2].astype(jnp.int32) + 60
        blk = o * 0 + spc - 4
        w_carr = ci_ref[:, 0:1]
        phase_eff = ci_ref[:, 0:1] * 3
        sp0 = ci_ref[:, 2:3] + 7
        sp1 = ci_ref[:, 3:4] + 3
        sp2 = ci_ref[:, 4:5] + 1
        a0l = ci_ref[:, 5:6] + 2
        a1l = ci_ref[:, 6:7] + 5
        a2l = ci_ref[:, 7:8] + 9
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
        acc = [jnp.zeros((C, 1), jnp.float32) for _ in range(6)]
        if mode != "noop":
            for b in range(pack):
                for g in range(t_groups):
                    cb = b * t_groups + g
                    x32 = frames_ref[0, :, g * span:(g + 1) * span]
                    v = ((x32 << (24 - 8 * b)) >> 24).astype(jnp.float32)
                    k_base = b + pack * span * g
                    kk = k_base + pack * lane
                    mask = jnp.logical_and(kk >= o, kk < o + blk)
                    raw = jnp.where(mask, v, jnp.float32(0.0))
                    counts = (phase_eff + w_carr * k_base) + (w_carr * pack) * lane
                    sn, cs = _sincos_counts(counts)
                    bb_i = sn * raw
                    bb_q = cs * raw
                    if mode == "bb":
                        acc[0] += jnp.sum(bb_i, axis=1, keepdims=True)
                        acc[3] += jnp.sum(bb_q, axis=1, keepdims=True)
                        continue
                    t0 = a0l + sp0 * lane
                    t1 = a1l + sp1 * lane + (t0 >> 16)
                    t2 = a2l + sp2 * lane + (t1 >> 16)
                    if mode == "phase":
                        acc[0] += jnp.sum((t2 >> 8).astype(jnp.float32),
                                          axis=1, keepdims=True)
                        continue
                    sl = slice(cb * span, (cb + 1) * span)
                    ws = [pltpu.bitcast(t_ref[:, sl], jnp.uint32)
                          for t_ref in tab_refs]
                    h_local = (t2 >> 8) - (tab_refs[-1][:, sl] >> 16)
                    hc = jnp.minimum(jnp.maximum(h_local, jnp.int32(0)),
                                     jnp.int32(32 * n_tab - 1))
                    hcu = pltpu.bitcast(hc, jnp.uint32)
                    hs = hcu & jnp.uint32(31)
                    sh = None
                    for u in range(n_tab):
                        whi = ws[u + 1] if u + 1 < n_tab else ws[u]
                        sh_u = (ws[u] >> hs) | (
                            (whi << (jnp.uint32(31) - hs)) << jnp.uint32(1))
                        sh = sh_u if sh is None else jnp.where(
                            (hc >> 5) == u, sh_u, sh)
                    nb_i = -bb_i
                    nb_q = -bb_q
                    for x, bit in enumerate((1, 2, 4)):
                        up = (sh & jnp.uint32(bit)) != 0
                        acc[x] += jnp.sum(jnp.where(up, bb_i, nb_i),
                                          axis=1, keepdims=True)
                        acc[3 + x] += jnp.sum(jnp.where(up, bb_q, nb_q),
                                              axis=1, keepdims=True)
        for i in range(6):
            ys_ref[0, :, i:i + 1] = acc[i]
        ys_ref[0, :, 6:16] = jnp.zeros((C, 10), jnp.float32)
        stf[:, 0:1] = stf[:, 0:1] + acc[0]

        @pl.when(j == B - 1)
        def _():
            sfo_ref[...] = stf[...]

    zmap2 = lambda j: (j * 0, j * 0)
    return pl.pallas_call(
        kern, grid=(B,),
        in_specs=[pl.BlockSpec((1, C, win_w), lambda j: (j, j * 0, j * 0))]
        + [pl.BlockSpec((C, win), zmap2)] * n_tab
        + [pl.BlockSpec((C, hb0.shape[1]), zmap2),
           pl.BlockSpec((C, 8), zmap2),
           pl.BlockSpec((C, 16), zmap2)],
        out_specs=(pl.BlockSpec((1, C, 16), lambda j: (j, j * 0, j * 0)),
                   pl.BlockSpec((C, 16), zmap2)),
        out_shape=(jax.ShapeDtypeStruct((B, C, 16), jnp.float32),
                   jax.ShapeDtypeStruct((C, 16), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((C, 16), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
    )


def timeit(mode):
    if mode == "full":
        def call(sf_):
            ys, sfo, sio = _mega_call(cfg, B, frames, tabs, hb0, ci, sf_, si)
            return sfo[:, 0:1], ys[:, 0, 0]
    elif mode == "build":
        def call(sf_):
            fr = build_frames(cfg, B, C, capw,
                              starts + sf_[0, 0].astype(jnp.int32) * 0)
            return sf_[:, 0:1] + fr[0, 0, 0] * jnp.float32(1e-20), \
                fr[:, 0, 0].astype(jnp.float32)
    else:
        stripped = make_stripped(mode)

        def call(sf_):
            ys, sfo = stripped(frames, *(tabs[:, u] for u in range(n_tab)),
                               hb0, ci, sf_)
            return sfo[:, 0:1], ys[:, 0, 0]

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(sf_, n):
        def step(carry, _):
            s2, ys = call(carry + sf_ * 0)
            return carry + s2 * 1e-9, ys.sum()
        c, ys = jax.lax.scan(step, jnp.zeros((C, 1), jnp.float32), None,
                             length=n)
        return ys.sum() + c.sum()

    times = {}
    for n in (4, 32):
        run(sf, n).block_until_ready()
        best = np.inf
        for r in range(3):
            t0 = time.perf_counter()
            run(sf + r * 1e-6, n).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_ms = (times[32] - times[4]) / (28 * B)
    print(f"{mode:6s}: {per_ms*1e6:7.2f} us/ms", flush=True)


for mode in os.environ.get("MODES", "noop,bb,phase,taps,full,build").split(","):
    timeit(mode)
