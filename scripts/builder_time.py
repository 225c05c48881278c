"""Standalone timing of the Pallas frames builder + roll-width variants.

Measures build_frames (two-pow2-roll residual shift) against prototype
kernels with different roll-window widths, on random capture words.
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
from softgnss_tpu.track.megakernel import build_frames
from softgnss_tpu.track.tables import MEGA_ALIGN_W, MEGA_PACK, mega_window

cfg = sg.default_config(number_of_channels=int(os.environ.get("CH", "12")),
                        correlator_impl="megakernel",
                        track_block_ms=int(os.environ.get("BMS", "64")))
C = cfg.number_of_channels
B = cfg.track_block_ms
spc_w = cfg.samples_per_code // MEGA_PACK
win_w = mega_window(cfg) // MEGA_PACK
w_slab = win_w + MEGA_ALIGN_W
l_blk = B * spc_w + w_slab + 4 * MEGA_ALIGN_W

rng = np.random.default_rng(0)
cap = jnp.asarray(rng.integers(-2**30, 2**30, (1, l_blk), np.int64)
                  .astype(np.int32))
starts = jnp.asarray(rng.integers(0, 2 * MEGA_ALIGN_W, C, np.int64)
                     .astype(np.int32))


def timeit(fn, *args):
    fn(*args).block_until_ready()
    best = np.inf
    for _ in range(7):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


@functools.partial(jax.jit, static_argnums=(0,))
def run_current(n, starts_):
    def step(c, _):
        f = build_frames(cfg, B, C, cap, starts_ + c)
        return c + 1, f[B - 1, :, ::997].sum()
    c, ys = jax.lax.scan(step, jnp.int32(0), None, length=n)
    return ys.sum() + c


# --- variant: multi-window roll with width W (pow2) -------------------------
def _builder_var(starts_ref, cap_ref, out_ref, scratch, sems, *, r, c_dim, W):
    j = pl.program_id(0)

    def _start(jj, c):
        al = pl.multiple_of(
            jnp.int32((starts_ref[c] + jj * spc_w >> 7) << 7), MEGA_ALIGN_W)
        pltpu.make_async_copy(cap_ref.at[:, pl.ds(al, w_slab)],
                              scratch.at[jnp.int32(c)],
                              sems.at[jnp.int32(c)]).start()

    @pl.when(j == 0)
    def _prime():
        for c in range(c_dim):
            _start(0, c)

    fresh = W - MEGA_ALIGN_W          # wrap-free words per window
    for c in range(c_dim):
        f = starts_ref[c] + j * spc_w
        pltpu.make_async_copy(
            cap_ref.at[:, pl.ds(pl.multiple_of(
                jnp.int32((f >> 7) << 7), MEGA_ALIGN_W), w_slab)],
            scratch.at[jnp.int32(c)], sems.at[jnp.int32(c)]).wait()
        res = f - ((f >> 7) << 7)
        slab = scratch[c]
        base = 0
        while base < win_w:
            n_out = min(fresh, win_w - base)
            # keep the W-wide window inside the slab; fold the overhang
            # into the roll amount (still wrap-free: base_r >= w_slab - W)
            base_r = min(base, w_slab - W)
            rw = pltpu.roll(slab[:, base_r:base_r + W],
                            -(res + (base - base_r)), 1)
            out_ref[0, c, base:base + n_out] = rw[0, :n_out]
            base += n_out

        @pl.when(j + 1 < r)
        def _pre(c=c):
            _start(j + 1, c)


@functools.partial(jax.jit, static_argnums=(0, 1))
def run_var(W, n, starts_):
    kern = functools.partial(_builder_var, r=B, c_dim=C, W=W)
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, C, win_w), lambda j, s: (j, 0 * j, 0 * j)),
            scratch_shapes=[
                pltpu.VMEM((C, 1, w_slab), jnp.int32),
                pltpu.SemaphoreType.DMA((C,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, win_w), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )

    def step(c, _):
        f = call(starts_ + c, cap)
        return c + 1, f[B - 1, :, ::997].sum()
    c, ys = jax.lax.scan(step, jnp.int32(0), None, length=n)
    return ys.sum() + c


if __name__ == "__main__":
    n = int(os.environ.get("N", "24"))
    t = timeit(run_current, n, starts)
    print(f"current 2xpow2 : {t / (n * B) * 1e6:6.2f} us/ms", flush=True)
    # build_frames now emits the mega_split row layout (row q*C + c =
    # window piece q of channel c); reconstruct the flat per-channel
    # windows so the W-variant prototypes (flat layout) compare 1:1
    from softgnss_tpu.track.tables import mega_split
    S = mega_split(cfg)
    ref_split = build_frames(cfg, B, C, cap, starts)
    ref_frames = jnp.concatenate(
        [ref_split[:, q * C:(q + 1) * C] for q in range(S)], axis=2)
    for W in (1024, 2048, 4096):
        # full-array correctness vs current first
        kern = functools.partial(_builder_var, r=B, c_dim=C, W=W)
        got_frames = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(B,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((1, C, win_w),
                                       lambda j, s: (j, 0 * j, 0 * j)),
                scratch_shapes=[pltpu.VMEM((C, 1, w_slab), jnp.int32),
                                pltpu.SemaphoreType.DMA((C,))],
            ),
            out_shape=jax.ShapeDtypeStruct((B, C, win_w), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=jax.default_backend() != "tpu",
        )(starts, cap)
        ok = bool(jnp.array_equal(ref_frames, got_frames))
        t = timeit(run_var, W, n, starts)
        print(f"W={W:5d} rolls : {t / (n * B) * 1e6:6.2f} us/ms  match={ok}",
              flush=True)
