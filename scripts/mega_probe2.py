"""Probe round 2: the exact Mosaic patterns the multi-ms kernel will use."""
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
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")


def t_mathops():
    """sqrt / floor / mod / sign juggling on (C, 8) f32 + i32 blocks."""
    def kern(x_ref, o_ref):
        v = x_ref[...]
        s = jnp.sqrt(jnp.abs(v))
        f = jnp.floor(v + 0.5)
        i = f.astype(jnp.int32)
        m = (i % 7).astype(jnp.float32)
        o_ref[...] = s + f + m

    x = jnp.asarray(np.linspace(-3, 3, C * 8, dtype=np.float32).reshape(C, 8))
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((C, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


def t_guarded_out():
    """Per-j output blocks written only at the last inner grid step, with
    an inner-step accumulator in scratch — the megakernel's output shape."""
    B, G = 4, 3

    def kern(x_ref, o_ref, acc_ref):
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += x_ref[...]

        @pl.when(g == G - 1)
        def _():
            o_ref[...] = acc_ref[...]

    x = jnp.ones((B, G, C, 8), jnp.float32)
    return pl.pallas_call(
        kern, grid=(B, G),
        in_specs=[pl.BlockSpec((1, 1, C, 8), lambda j, g: (j, g, 0, 0))],
        out_specs=pl.BlockSpec((1, C, 8), lambda j, g: (j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, C, 8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")))(x)


def t_multi_out():
    """Two outputs of different dtypes, one written per-j, one only at the
    very last grid step (the final-state output)."""
    B = 4

    def kern(x_ref, of_ref, oi_ref):
        j = pl.program_id(0)
        of_ref[...] = x_ref[...] * 2.0

        @pl.when(j == B - 1)
        def _():
            oi_ref[...] = (x_ref[...].astype(jnp.int32) + j)

    x = jnp.ones((B, C, 8), jnp.float32)
    return pl.pallas_call(
        kern, grid=(B,),
        in_specs=[pl.BlockSpec((1, C, 8), lambda j: (j, 0, 0))],
        out_specs=(pl.BlockSpec((1, C, 8), lambda j: (j, 0, 0)),
                   pl.BlockSpec((C, 8), lambda j: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, C, 8), jnp.float32),
                   jax.ShapeDtypeStruct((C, 8), jnp.int32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))(x)[1]


def t_atan_poly():
    """Polynomial arctan(q/i) (full quadrant fold) accuracy vs numpy."""
    # minimax-ish odd polynomial for atan on [-1, 1] (degree 17, f32)
    CS = [0.99999988079071, -0.3333295583724976, 0.19993269443511963,
          -0.14203716814517975, 0.10640866309404373, -0.07504668831825256,
          0.04269665479660034, -0.016165791451930255, 0.0028498587198555468]

    def atan1(z):
        z2 = z * z
        acc = jnp.float32(CS[-1])
        for c in CS[-2::-1]:
            acc = acc * z2 + jnp.float32(c)
        return z * acc

    def kern(q_ref, i_ref, o_ref):
        q, i = q_ref[...], i_ref[...]
        safe_i = jnp.where(i != 0, i, jnp.float32(1.0))
        x = q / safe_i
        ax = jnp.abs(x)
        inv = ax > 1.0
        z = jnp.where(inv, 1.0 / jnp.where(inv, ax, jnp.float32(1.0)), ax)
        a = atan1(z)
        a = jnp.where(inv, jnp.float32(np.pi / 2) - a, a)
        a = jnp.where(x < 0, -a, a)
        o_ref[...] = jnp.where(i != 0, a, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    q = rng.normal(size=(C, 128)).astype(np.float32) * 100
    i = rng.normal(size=(C, 128)).astype(np.float32) * 100
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(q), jnp.asarray(i))
    ref = np.arctan(q / i)
    err = np.max(np.abs(np.asarray(out) - ref))
    print(f"   atan poly max err: {err:.3e}")
    return np.asarray([err])


def t_big_unroll():
    """Static 150-iteration unrolled tile loop: compile time + correctness."""
    T, TILE, W = 150, 128, 32

    def kern(x_ref, codes_ref, o_ref):
        acc = jnp.zeros((C, 8), jnp.float32)
        for k in range(T):
            sl = x_ref[:, k * TILE:(k + 1) * TILE]
            cv = codes_ref[:, k, :]                  # (C, W)
            h = (sl.astype(jnp.int32) & 31)
            oh = h[:, None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (1, W, 1), 1)
            u = jnp.sum(jnp.where(oh, sl[:, None, :], jnp.float32(0.0)), axis=2)
            acc += jnp.sum(cv * u, axis=1, keepdims=True)
        o_ref[...] = acc

    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(C, T * TILE)).astype(np.float32))
    codes = jnp.asarray(np.random.default_rng(2).choice(
        [-1.0, 1.0], (C, T, W)).astype(np.float32))
    t0 = time.perf_counter()
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((C, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, codes)
    out.block_until_ready()
    print(f"   150-tile unroll compile+run: {time.perf_counter() - t0:.1f} s")
    return out


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check("math ops", t_mathops)
    check("guarded per-j output", t_guarded_out)
    check("multi-dtype outputs", t_multi_out)
    check("atan polynomial", t_atan_poly)
    check("150-tile static unroll", t_big_unroll)
