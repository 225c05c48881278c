"""Probe Mosaic features the multi-ms fused tracking kernel needs.

Run on TPU:  python scripts/mega_probe.py

Checks, each in isolation so a failure names its feature:
  1. transcendentals: jnp.arctan, jnp.sqrt on (C, 8) f32 blocks
  2. HBM (ANY) input + manual double-buffered DMA at arbitrary
     (non-128-aligned) minor-dim offsets
  3. fori_loop over tiles with dynamic VMEM ref slicing (pl.ds)
  4. scratch state persisting across sequential grid steps
  5. per-grid-step overhead at grid=(N,) for N in {1, 8, 64}
     (is the noop cost per-call or per-step?)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 8


def check(name, fn):
    try:
        out = fn()
        print(f"OK   {name}: {np.asarray(out).ravel()[:4]}")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")


# 1. transcendentals --------------------------------------------------------
def t_transcendental():
    def kern(x_ref, o_ref):
        v = x_ref[...]
        o_ref[...] = jnp.arctan(v) + jnp.sqrt(jnp.abs(v)) + jnp.arctan2(v, 1.0 + v * v)

    x = jnp.asarray(np.linspace(-2, 2, C * 8, dtype=np.float32).reshape(C, 8))
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((C, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


# 2. ANY input + DMA at odd offsets -----------------------------------------
def t_dma():
    N = 4096
    WIN = 512

    def kern(hbm_ref, o_ref):
        def body(scratch, sem):
            # odd, non-128-multiple offset
            dma = pltpu.make_async_copy(
                hbm_ref.at[:, pl.ds(333, WIN)], scratch, sem)
            dma.start()
            dma.wait()
            o_ref[...] = jnp.sum(scratch[...].astype(jnp.float32), axis=1,
                                 keepdims=True)

        pl.run_scoped(body, scratch=pltpu.VMEM((C, WIN), jnp.int16),
                      sem=pltpu.SemaphoreType.DMA(()))

    x = jnp.asarray(np.arange(C * N, dtype=np.int16).reshape(C, N) % 251)
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((C, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


# 3. fori_loop with dynamic VMEM slicing ------------------------------------
def t_fori_dyn():
    T, TILE = 16, 128

    def kern(x_ref, tab_ref, o_ref):
        def body(k, acc):
            sl = x_ref[:, pl.ds(k * TILE, TILE)]
            tv = tab_ref[:, k]                      # dynamic major index
            return acc + jnp.sum(sl * tv[:, None], axis=1, keepdims=True)

        o_ref[...] = jax.lax.fori_loop(0, T, body, jnp.zeros((C, 1), jnp.float32))

    x = jnp.asarray(np.random.default_rng(0).normal(size=(C, T * TILE)).astype(np.float32))
    tab = jnp.asarray(np.arange(C * T, dtype=np.float32).reshape(C, T))
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((C, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, tab)


# 4. scratch persists across grid steps --------------------------------------
def t_scratch_carry():
    N = 16

    def kern(x_ref, o_ref, st_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            st_ref[...] = jnp.zeros_like(st_ref)

        st_ref[...] += x_ref[...]

        @pl.when(j == N - 1)
        def _():
            o_ref[...] = st_ref[...]

    x = jnp.ones((N, C, 8), jnp.float32)
    return pl.pallas_call(
        kern, grid=(N,),
        in_specs=[pl.BlockSpec((1, C, 8), lambda j: (j, 0, 0))],
        out_specs=pl.BlockSpec((1, C, 8), lambda j: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, C, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, C, 8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))(x)


# 5. per-grid-step overhead ---------------------------------------------------
def t_grid_overhead():
    def make(n):
        def kern(x_ref, o_ref):
            j = pl.program_id(0)

            @pl.when(j == 0)
            def _():
                o_ref[...] = jnp.zeros_like(o_ref)

            o_ref[...] += x_ref[...]

        call = pl.pallas_call(
            kern, grid=(n,),
            in_specs=[pl.BlockSpec((C, 128), lambda j: (0, 0))],
            out_specs=pl.BlockSpec((C, 128), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)))

        @jax.jit
        def run(x):
            def step(c, _):
                o = call(x + c)
                return c + o[0, 0], o[0, 0]
            c, ys = jax.lax.scan(step, jnp.float32(0), None, length=200)
            return ys.sum()
        return run

    x = jnp.ones((C, 128), jnp.float32)
    for n in (1, 8, 64):
        run = make(n)
        run(x).block_until_ready()
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            run(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"   grid=({n},): {best / 200 * 1e6:7.2f} us/call")
    return np.zeros(1)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check("transcendentals", t_transcendental)
    check("ANY+DMA odd offset", t_dma)
    check("fori dynamic slice", t_fori_dyn)
    check("scratch carry across grid", t_scratch_carry)
    check("grid-step overhead", t_grid_overhead)
