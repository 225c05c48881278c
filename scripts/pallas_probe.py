"""Probe the environment's Mosaic capabilities (VERDICT r1 #2 groundwork).

Round-1 findings (memory/axon-tpu-quirks): gridded pallas_call failed to
legalize `func.return`; i32->f32 convert recursed; dynamic VMEM scalar
reads failed.  Re-verify before redesigning the fused correlator.
"""
import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), jax.devices())


def probe(name, fn):
    try:
        out = fn()
        print(f"[ok]   {name}: {np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return False


# 1. textbook gridded kernel: grid over rows, add one
def _k_grid(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def gridded():
    x = jnp.ones((64, 128), jnp.float32)
    return pl.pallas_call(
        _k_grid,
        grid=(8,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
    )(x)


# 2. gridded with accumulation across grid steps (output revisited)
def _k_acc(x_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[...] += jnp.sum(x_ref[...], axis=1, keepdims=True)


def gridded_acc():
    x = jnp.ones((64, 128), jnp.float32)
    return pl.pallas_call(
        _k_acc,
        grid=(8,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
    )(x)


# 3. i32 -> f32 convert_element_type
def _k_conv(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(jnp.float32)


def conv():
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    return pl.pallas_call(
        _k_conv,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)


# 4. 3D broadcast compare + reduce over last axis (channel-batched onehot)
def _k_3d(h_ref, b_ref, o_ref):
    h = h_ref[...]                       # (8, 256)
    oh = h[:, None, :] == jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
    b = b_ref[...]                       # (8, 256)
    o_ref[...] = jnp.sum(jnp.where(oh, b[:, None, :], 0.0), axis=2)


def batched3d():
    h = jnp.tile(jnp.arange(256, dtype=jnp.int32) // 8, (8, 1))
    b = jnp.ones((8, 256), jnp.float32)
    return pl.pallas_call(
        _k_3d,
        out_shape=jax.ShapeDtypeStruct((8, 32), jnp.float32),
    )(h, b)


# 5. batched dot_general inside kernel (C-batched (3,w)@(w,2))
def _k_bdot(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def bdot():
    a = jnp.ones((4, 8, 128), jnp.float32)
    b = jnp.ones((4, 128, 8), jnp.float32)
    return pl.pallas_call(
        _k_bdot,
        out_shape=jax.ShapeDtypeStruct((4, 8, 8), jnp.float32),
    )(a, b)


# 6. 2D dot on MXU inside a grid-free kernel with fori accumulation
def _k_dot(a_ref, b_ref, o_ref):
    def body(i, acc):
        return acc + jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.float32)
    o_ref[...] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(4), body,
                                   jnp.zeros_like(o_ref))


def dot2d():
    a = jnp.ones((32, 512), jnp.float32)
    b = jnp.ones((512, 128), jnp.float32)
    return pl.pallas_call(
        _k_dot,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(a, b)


if __name__ == "__main__":
    results = {}
    for name, fn in [("gridded", gridded), ("gridded_acc", gridded_acc),
                     ("i32->f32 convert", conv), ("3D batched onehot", batched3d),
                     ("batched dot_general", bdot), ("fori 2D dot (MXU)", dot2d)]:
        results[name] = probe(name, fn)
    print(results)
