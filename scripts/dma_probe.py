"""Probe: can the megakernel fetch its per-ms frame via an in-kernel DMA
from an HBM-resident buffer (dynamic minor-dim offset, whole-slab copy)?

Round 3's attempts at per-row / dynamic-slot DMA patterns crashed the
remote Mosaic compile helper (HTTP 500).  This probes the ONE pattern the
new design needs: grid step j copies buf[:, j*spc_pk + o : ... + win_pk]
(a single (C, win_pk) slab, dynamic offset on the minor axis) into VMEM
scratch, double-buffered across grid steps.
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

C = 16   # padded to a multiple of 8 sublanes for the DMA slab slice
spc_pk = 9548
win_pk = 9728
B = 64
buf_len = (B + 1) * spc_pk + 128

rng = np.random.default_rng(0)
buf = jnp.asarray(rng.integers(-2**20, 2**20, (C, buf_len), np.int64
                               ).astype(np.int32))


def kernel(buf_ref, o_ref, ysum_ref, scratch, sems):
    j = pl.program_id(0)

    def start(slot, jj):
        off = pl.multiple_of(((jj * spc_pk + o_ref[0]) >> 7) << 7, 128)
        pltpu.make_async_copy(
            buf_ref.at[:, pl.ds(off, win_pk + 128)],
            scratch.at[slot], sems.at[slot]).start()

    @pl.when(j == 0)
    def _first():
        start(0, 0)

    @pl.when(j + 1 < B)
    def _next():
        start((j + 1) % 2, j + 1)

    slot = j % 2
    off = pl.multiple_of(((j * spc_pk + o_ref[0]) >> 7) << 7, 128)
    pltpu.make_async_copy(
        buf_ref.at[:, pl.ds(off, win_pk + 128)],
        scratch.at[slot], sems.at[slot]).wait()
    x = scratch[slot]
    ysum_ref[0, :, :] = jnp.sum(
        x.astype(jnp.float32), axis=1, keepdims=True) + 0.0 * j


@jax.jit
def run(buf, o):
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, C, 1), lambda j: (j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, C, win_pk + 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(buf, o)


o = jnp.zeros((1,), jnp.int32)
out = run(buf, o)
out.block_until_ready()
# correctness
ref = np.stack([np.asarray(buf)[:, (j * spc_pk // 128) * 128:
                                (j * spc_pk // 128) * 128 + win_pk + 128]
                .astype(np.float32).sum(axis=1) for j in range(B)])
got = np.asarray(out)[:, :, 0]
print("max rel err:", float(np.max(np.abs(got - ref) / (np.abs(ref) + 1))))

# timing: marginal over repeated calls inside one jit
@functools.partial(jax.jit, static_argnums=(1,))
def loop(buf, n, o):
    def step(c, _):
        y = run(buf, o + c.astype(jnp.int32)[None] * 0)
        return c + y[0, 0, 0] * 1e-20, ()
    c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
    return c


times = {}
for n in (4, 24):
    loop(buf, n, o).block_until_ready()
    best = np.inf
    for r in range(5):
        t0 = time.perf_counter()
        loop(buf, n, o + r * 0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    times[n] = best
per_block = (times[24] - times[4]) / 20
mb = B * C * (win_pk + 128) * 4 / 1e6
print(f"dma slab: {per_block*1e6:8.1f} us/block ({per_block/B*1e6:6.2f} us/ms, "
      f"~{mb/per_block/1e3:.0f} GB/s)")
