"""Bisect which megakernel stage blows the scoped-VMEM stack at the
reference workload.  Each variant keeps the same BlockSpecs and grid and
adds one stage; compile errors report the VMEM demand."""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import softgnss_tpu as sg
from softgnss_tpu.signals.nco import sin_turns
from softgnss_tpu.track.pallas_kernel import grid_shape
from softgnss_tpu.track.tables import n_tiles, onehot_width

cfg = sg.default_config(number_of_channels=12, correlator_impl="megakernel")
C = 12
pack = cfg.track_pack
tile = cfg.track_tile
win_pk = cfg.track_window // pack
T = n_tiles(cfg)
w = onehot_width(cfg)
k_tiles, t_groups = grid_shape(cfg)
span = k_tiles * tile
R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
print(f"R={R} pack={pack} win_pk={win_pk} T={T} w={w} "
      f"k_tiles={k_tiles} t_groups={t_groups}")

rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(-30000, 30000, (R, C, win_pk),
                                  np.int32).astype(np.int16))
codes = jnp.asarray(rng.choice([-1, 1], (C, 3, T, w)).astype(np.int8))
hb = jnp.asarray(rng.integers(0, 50, (C, T), dtype=np.int32))
ci = jnp.ones((C, 8), jnp.int32)
sf = jnp.zeros((C, 16), jnp.float32)
si = jnp.zeros((C, 16), jnp.int32)


def make(mode):
    def kern(frames_ref, codes_ref, hb_ref, ci_ref, sf_ref, si_ref,
             ysf_ref, ysi_ref, sfo_ref, sio_ref, stf, sti):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            stf[...] = sf_ref[...]
            sti[...] = si_ref[...]

        o = sti[:, 0:1]
        blk = ci_ref[:, 0:1] * 0 + 38192
        w_carr = ci_ref[:, 0:1]
        phase_eff = sti[:, 1:2]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
        acc_i = jnp.zeros((C, 3), jnp.float32)
        acc_q = jnp.zeros((C, 3), jnp.float32)
        if mode != "noop":
            for b in range(pack):
                for gch in range(t_groups):
                    x32 = frames_ref[0, :, gch * span:(gch + 1) * span].astype(
                        jnp.int32)
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
                        acc_i += jnp.sum(bb_i, axis=1, keepdims=True)
                        acc_q += jnp.sum(bb_q, axis=1, keepdims=True)
                        continue
                    hrel = (counts >> 8)  # stand-in phase
                    for k in range(k_tiles):
                        t = b * (t_groups * k_tiles) + gch * k_tiles + k
                        h_local = (hrel[:, k * tile:(k + 1) * tile]
                                   - hb_ref[:, t:t + 1])
                        oh = h_local[:, None, :] == iota_w
                        cds = codes_ref[:, :, t, :].astype(jnp.float32)
                        bi = bb_i[:, k * tile:(k + 1) * tile]
                        bq = bb_q[:, k * tile:(k + 1) * tile]
                        cv = jax.lax.dot_general(
                            cds, oh.astype(jnp.float32),
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
                        acc_i += jnp.sum(cv * bi[:, None, :], axis=2)
                        acc_q += jnp.sum(cv * bq[:, None, :], axis=2)
        for i in range(3):
            ysf_ref[0, :, i:i + 1] = acc_i[:, i:i + 1]
            ysf_ref[0, :, 3 + i:4 + i] = acc_q[:, i:i + 1]
        ysf_ref[0, :, 6:16] = jnp.zeros((C, 10), jnp.float32)
        ysi_ref[0, :, :] = jnp.zeros((C, 8), jnp.int32)
        stf[:, 0:1] = stf[:, 0:1] + acc_i[:, 0:1]
        sti[:, 0:1] = sti[:, 0:1] + 0

        @pl.when(j == R - 1)
        def _():
            sfo_ref[...] = stf[...]
            sio_ref[...] = sti[...]

    zmap2 = lambda j: (j * 0, j * 0)
    zmap4 = lambda j: (j * 0, j * 0, j * 0, j * 0)
    return pl.pallas_call(
        kern, grid=(R,),
        in_specs=[
            pl.BlockSpec((1, C, win_pk), lambda j: (j, j * 0, j * 0)),
            pl.BlockSpec((C, 3, T, w), zmap4),
            pl.BlockSpec((C, T), zmap2),
            pl.BlockSpec((C, 8), zmap2),
            pl.BlockSpec((C, 16), zmap2),
            pl.BlockSpec((C, 16), zmap2),
        ],
        out_specs=(
            pl.BlockSpec((1, C, 16), lambda j: (j, j * 0, j * 0)),
            pl.BlockSpec((1, C, 8), lambda j: (j, j * 0, j * 0)),
            pl.BlockSpec((C, 16), zmap2),
            pl.BlockSpec((C, 16), zmap2),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, C, 16), jnp.float32),
            jax.ShapeDtypeStruct((R, C, 8), jnp.int32),
            jax.ShapeDtypeStruct((C, 16), jnp.float32),
            jax.ShapeDtypeStruct((C, 16), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((C, 16), jnp.float32),
                        pltpu.VMEM((C, 16), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


import time
for mode in ("noop", "bb", "full"):
    try:
        t0 = time.perf_counter()
        out = make(mode)(frames, codes, hb, ci, sf, si)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        # marginal timing
        best = np.inf
        for rpt in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(make(mode)(frames, codes, hb, ci + rpt, sf, si))
            best = min(best, time.perf_counter() - t0)
        print(f"OK   {mode}: compile+run {dt:.1f}s, run {best/R*1e6:.1f} us/ms")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        at = msg.find("Scoped allocation")
        print(f"FAIL {mode}: {msg[at:at+90] if at >= 0 else msg[:200]}")
