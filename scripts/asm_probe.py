"""Measure block-mode frame-assembly variants on the real device.

The megakernel consumes (r, C, win_pk) stacked frames per block; the XLA
assembly (per-channel batched dynamic_slice + static re-framing) measured
~7 us/step at pack=2 (int16 view, ~55 GB/s).  Variants:

  p2_buf   pack=2: vmapped dyn_slice -> (C, buf) i16, then stack r frames
  p4_buf   pack=4: same through the int32 view
  p4_dir   pack=4: (r*C)-batched dyn_slice straight to (r, C, win_pk) i32
  p4_cat   pack=4: buf slice, then one concatenate of r static slices
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import softgnss_tpu as sg
from softgnss_tpu.track.scan import _packed_view

cfg = sg.default_config(number_of_channels=int(os.environ.get("CH", "12")))
C = cfg.number_of_channels
spc = cfg.samples_per_code
win = cfg.track_window
B = cfg.track_block_ms
n_ms = 512
rng = np.random.default_rng(0)
signal = jnp.asarray(rng.integers(-120, 120, (n_ms + B + 4) * spc, np.int64
                                  ).astype(np.int8))
base0 = jnp.asarray(rng.integers(0, spc, C), jnp.int64)


def make(variant):
    pack = 2 if variant.startswith("p2") else 4
    spc_pk = spc // pack
    win_pk = win // pack

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(base, nblocks):
        sig_pack = _packed_view(signal, pack)

        def block(carry, i):
            start = (base + i * B * spc) // pack * pack
            if variant.endswith("dir"):
                starts = (start[None, :] // pack
                          + jnp.arange(B, dtype=jnp.int64)[:, None] * spc_pk)
                frames = jax.vmap(jax.vmap(lambda p: jax.lax.dynamic_slice(
                    sig_pack, (p,), (win_pk,))))(starts)
            else:
                buf_len = (B + 1) * spc
                buf = jax.vmap(lambda p: jax.lax.dynamic_slice(
                    sig_pack, (p // pack,), (buf_len // pack,)))(start)
                if variant.endswith("cat"):
                    frames = jnp.concatenate(
                        [buf[None, :, i * spc_pk:i * spc_pk + win_pk]
                         for i in range(B)], 0)
                else:
                    frames = jnp.stack(
                        [buf[:, i * spc_pk:i * spc_pk + win_pk]
                         for i in range(B)], 0)
            frames = jax.lax.optimization_barrier(frames)
            s = jnp.sum(frames[:, :, :128], dtype=jnp.int64) + carry
            return s, ()

        out, _ = jax.lax.scan(block, jnp.int64(0),
                              jnp.arange(nblocks, dtype=jnp.int64))
        return out

    return run


for variant in ("p2_buf", "p4_buf", "p4_dir", "p4_cat"):
    run = make(variant)
    times = {}
    for n in (4, 24):
        run(base0, n).block_until_ready()
        best = np.inf
        for r in range(5):
            t0 = time.perf_counter()
            run(base0 + r, n).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_block = (times[24] - times[4]) / 20
    mb = C * (B + 1) * spc / 1e6
    print(f"{variant}: {per_block*1e6:8.1f} us/block "
          f"({per_block/B*1e6:6.2f} us/ms, ~{mb/per_block/1e3:.0f} GB/s eff)")
