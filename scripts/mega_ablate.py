"""Ablate the megakernel's per-ms cost: which stage dominates?

Marginal-cost timing (N-scaling inside one jit) of stripped variants at
the reference workload.  MODES env var picks variants:
  noop   - state init + outputs only (grid/dispatch floor)
  bb     - + unpack, mask, carrier NCO, baseband (all chunks)
  phase  - + span-wide digit phase ramp
  taps   - + bit-shift code lookup and the six correlator sums (full
           correlator, no loop filters)
  full   - the real kernel (_mega_call)
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
from softgnss_tpu.signals.nco import sin_turns
from softgnss_tpu.track.megakernel import _mega_call, mega_tables
from softgnss_tpu.track.megakernel import _MEGA_K_CAP
from softgnss_tpu.track.pallas_kernel import grid_shape
from softgnss_tpu.track.tables import build_tables, n_tiles, onehot_width

cfg = sg.default_config(number_of_channels=int(os.environ.get("CH", "12")),
                        correlator_impl="megakernel")
C = cfg.number_of_channels
pack = cfg.track_pack
tile = cfg.track_tile
win_pk = cfg.track_window // pack
T = n_tiles(cfg)
w = onehot_width(cfg)
n_words = (w + 31) // 32
k_tiles, t_groups = grid_shape(cfg, default_cap=_MEGA_K_CAP)
span = k_tiles * tile
t_pp = win_pk // tile
B = cfg.track_block_ms
print(f"C={C} pack={pack} win_pk={win_pk} T={T} w={w} nw={n_words} "
      f"k_tiles={k_tiles} t_groups={t_groups} B={B}")

prns = np.arange(1, C + 1)
freqs = cfg.intermediate_freq + np.linspace(-3000, 3000, C)
tables = build_tables(cfg, prns, freqs)
codes_bits, hb = mega_tables(cfg, jax.tree.map(jnp.asarray, tables))
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(-2000, 2000, (B, C, win_pk),
                                  np.int32).astype(np.int16))
ci = jnp.zeros((C, 8), jnp.int32).at[:, 1].set(1).at[:, 0].set(12345)
sf = jnp.zeros((C, 16), jnp.float32)
si = jnp.zeros((C, 16), jnp.int32).at[:, 0].set(60)


def make_stripped(mode):
    def kern(frames_ref, codes_ref, hb_ref, ci_ref, sf_ref, si_ref,
             ysf_ref, sfo_ref, stf):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            stf[...] = sf_ref[...]

        o = si_ref[:, 0:1]
        blk = si_ref[:, 0:1] + 38192 - 60
        w_carr = ci_ref[:, 0:1]
        phase_eff = si_ref[:, 1:2] + stf[:, 0:1].astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
        acc = [jnp.zeros((C, 1), jnp.float32) for _ in range(6)]
        if mode != "noop":
            for b in range(pack):
                for gch in range(t_groups):
                    x32 = frames_ref[0, :, gch * span:(gch + 1) * span].astype(jnp.int32)
                    v = ((x32 << (24 - 8 * b)) >> 24).astype(jnp.float32)
                    k_base = b + pack * span * gch
                    kk = k_base + pack * lane
                    mask = jnp.logical_and(kk >= o, kk < o + blk)
                    raw = jnp.where(mask, v, jnp.float32(0.0))
                    counts = (phase_eff + w_carr * k_base) + (w_carr * pack) * lane
                    u32 = pltpu.bitcast(counts, jnp.uint32)
                    mant = (u32 >> 9) | jnp.uint32(0x3F800000)
                    turns = pltpu.bitcast(mant, jnp.float32) - jnp.float32(1.0)
                    bb_i = sin_turns(turns) * raw
                    bb_q = sin_turns(turns + jnp.float32(0.25)) * raw
                    if mode == "bb":
                        acc[0] += jnp.sum(bb_i, axis=1, keepdims=True)
                        acc[3] += jnp.sum(bb_q, axis=1, keepdims=True)
                        continue
                    sp0 = ci_ref[:, 2:3] + 7
                    sp1 = ci_ref[:, 3:4] + 3
                    sp2 = ci_ref[:, 4:5] + 1
                    t0 = counts + sp0 * lane
                    t1 = (counts >> 3) + sp1 * lane + (t0 >> 16)
                    t2 = (counts >> 5) + sp2 * lane + (t1 >> 16)
                    hrel = t2 >> 8
                    if mode == "phase":
                        acc[0] += jnp.sum(hrel.astype(jnp.float32), axis=1,
                                          keepdims=True)
                        continue
                    gb = b * t_groups + gch
                    hb_lane = jnp.repeat(hb_ref[:, gb, :], tile, axis=1)
                    h_local = hrel - (hb_lane + 1024)
                    in_win = jnp.logical_and(h_local >= 0, h_local < w)
                    for x in range(3):
                        valbit = jnp.zeros_like(h_local)
                        for u in range(n_words):
                            bits_lane = jnp.repeat(
                                codes_ref[:, x, u, gb, :], tile, axis=1)
                            hs = h_local - 32 * u
                            sel = jnp.logical_and(hs >= 0, hs < 32)
                            hc = jnp.minimum(jnp.maximum(hs, jnp.int32(0)),
                                             jnp.int32(31))
                            valbit = jnp.where(sel, (bits_lane >> hc) & 1,
                                               valbit)
                        cv = jnp.where(in_win,
                                       (2 * valbit - 1).astype(jnp.float32),
                                       jnp.float32(0.0))
                        acc[x] += jnp.sum(cv * bb_i, axis=1, keepdims=True)
                        acc[3 + x] += jnp.sum(cv * bb_q, axis=1,
                                              keepdims=True)
        for i in range(6):
            ysf_ref[0, :, i:i + 1] = acc[i]
        ysf_ref[0, :, 6:16] = jnp.zeros((C, 10), jnp.float32)
        stf[:, 0:1] = stf[:, 0:1] + acc[0]

        @pl.when(j == B - 1)
        def _():
            sfo_ref[...] = stf[...]

    g_chunks = pack * t_groups
    zmap2 = lambda j: (j * 0, j * 0)
    zmap3 = lambda j: (j * 0, j * 0, j * 0)
    zmap5 = lambda j: (j * 0, j * 0, j * 0, j * 0, j * 0)
    return pl.pallas_call(
        kern, grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, win_pk), lambda j: (j, j * 0, j * 0)),
            pl.BlockSpec((C, 3, n_words, g_chunks, k_tiles), zmap5),
            pl.BlockSpec((C, g_chunks, k_tiles), zmap3),
            pl.BlockSpec((C, 8), zmap2),
            pl.BlockSpec((C, 16), zmap2),
            pl.BlockSpec((C, 16), zmap2),
        ],
        out_specs=(pl.BlockSpec((1, C, 16), lambda j: (j, j * 0, j * 0)),
                   pl.BlockSpec((C, 16), zmap2)),
        out_shape=(jax.ShapeDtypeStruct((B, C, 16), jnp.float32),
                   jax.ShapeDtypeStruct((C, 16), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((C, 16), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def timeit(mode):
    if mode == "full":
        def call(sf_):
            ysf, ysi, sfo, sio = _mega_call(cfg, B, frames, codes_bits, hb,
                                            ci, sf_, si)
            return sfo[:, 0:1], ysf[:, 0, 0]
    else:
        stripped = make_stripped(mode)

        def call(sf_):
            ysf, sfo = stripped(frames, codes_bits, hb, ci, sf_, si)
            return sfo[:, 0:1], ysf[:, 0, 0]

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
    print(f"{mode:6s}: {per_ms*1e6:7.2f} us/ms")


for mode in os.environ.get("MODES", "noop,bb,phase,taps,full").split(","):
    timeit(mode)
