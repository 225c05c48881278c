"""Probe 4b: frames builder — grid (r,), static channel loop, depth-4
DMA pipeline, dynamic lane roll, (1, C, win_w) pipeline output blocks.
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

C = 12
DEPTH = 4
spc = 38192
spc_w = spc // 4
win_w = 9600
w_slab = win_w + 128
B = 64
L = (B + 4) * spc
Lw = L // 4

rng = np.random.default_rng(0)
cap = jnp.asarray(rng.integers(-2**30, 2**30, (1, Lw), np.int64
                               ).astype(np.int32))
starts = jnp.asarray(rng.integers(0, spc_w, C), jnp.int32)


def kernel(st_ref, cap_ref, out_ref, scratch, sems):
    j = pl.program_id(0)

    def start_dma(slot, jj, c):
        f = st_ref[c] + jj * spc_w
        al = pl.multiple_of(jnp.int32((f >> 7) << 7), 128)
        pltpu.make_async_copy(cap_ref.at[:, pl.ds(al, w_slab)],
                              scratch.at[slot], sems.at[slot]).start()

    @pl.when(j == 0)
    def _first():
        for c in range(min(DEPTH, C)):
            start_dma(c % DEPTH, 0, c)

    for c in range(C):
        slot = c % DEPTH
        f = st_ref[c] + j * spc_w
        al = pl.multiple_of(jnp.int32((f >> 7) << 7), 128)
        pltpu.make_async_copy(cap_ref.at[:, pl.ds(al, w_slab)],
                              scratch.at[slot], sems.at[slot]).wait()
        res = f - ((f >> 7) << 7)
        rolled = pltpu.roll(scratch[slot], -res, 1)
        out_ref[0, c, :] = rolled[0, :win_w]
        nxt = c + DEPTH
        if nxt < C:
            start_dma(nxt % DEPTH, j, nxt)
        else:
            nc = nxt - C

            @pl.when(j + 1 < B)
            def _pre(nc=nc, slot=slot):
                start_dma(slot, j + 1, nc)


@jax.jit
def run(cap, starts):
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, C, win_w), lambda j: (j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, win_w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, 1, w_slab), jnp.int32),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(starts, cap)


out = run(cap, starts)
out.block_until_ready()
capn = np.asarray(cap)[0]
st = np.asarray(starts)
ref = np.stack([np.stack([capn[st[c] + j * spc_w:
                               st[c] + j * spc_w + win_w]
                          for c in range(C)]) for j in range(B)])
print("exact match:", bool((np.asarray(out) == ref).all()))


@functools.partial(jax.jit, static_argnums=(1,))
def loop(cap, n, starts):
    def step(acc, _):
        y = run(cap, starts + acc.astype(jnp.int32) * 0)
        return acc + y[0, 0, 0].astype(jnp.float32) * 1e-20, ()
    a, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
    return a


times = {}
for n in (4, 24):
    loop(cap, n, starts).block_until_ready()
    best = np.inf
    for r in range(5):
        t0 = time.perf_counter()
        loop(cap, n, starts).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    times[n] = best
per_block = (times[24] - times[4]) / 20
mb = B * C * win_w * 4 / 1e6
print(f"frames builder: {per_block*1e6:8.1f} us/block "
      f"({per_block/B*1e6:6.2f} us/ms, ~{mb/per_block/1e3:.0f} GB/s out)")
