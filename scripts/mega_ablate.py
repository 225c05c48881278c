"""Megakernel component timing: the real kernel vs the frames builder.

Modes (env MODE, default both):
  full   - the real kernel (_mega_call) on prebuilt frames
  build  - the frames builder alone (build_frames)

The round-4 stripped-kernel ablations this script used to carry matched a
superseded kernel structure; their measured numbers live in BASELINE.md.
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
from softgnss_tpu.track.megakernel import (_mega_call, _pad_rows, build_frames,
                                           mega_c_pad, mega_rows)
from softgnss_tpu.track.tables import (MEGA_PACK, build_tables, mega_grid,
                                       mega_n_words, mega_split, mega_width,
                                       mega_window)

cfg = sg.default_config(number_of_channels=int(os.environ.get("CH", "12")),
                        correlator_impl="megakernel",
                        pallas_k_tiles=int(os.environ.get("KT", "0")))
C = cfg.number_of_channels
CP = mega_c_pad(C)
RP = mega_rows(cfg, C)
S = mega_split(cfg)
win = mega_window(cfg)
win_w = win // MEGA_PACK
half_w = win_w // S
spc_w = cfg.samples_per_code // MEGA_PACK
n_tab = mega_n_words(cfg)
k_tiles, t_groups = mega_grid(cfg)
B = cfg.track_block_ms
print(f"C={C} rows={RP} win={win} wbits={mega_width(cfg)} n_tab={n_tab} "
      f"k_tiles={k_tiles} t_groups={t_groups} S={S} B={B}")

prns = np.arange(1, C + 1)
freqs = cfg.intermediate_freq + np.linspace(-3000, 3000, C)
tables = build_tables(cfg, prns, freqs)
tabs = _pad_rows(jnp.asarray(tables.mega_tabs), RP)
hb0 = _pad_rows(jnp.asarray(tables.mega_hb0), CP)
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(-2**30, 2**30, (B, RP, half_w),
                                  np.int64).astype(np.int32))
capw = jnp.asarray(rng.integers(-2**30, 2**30, (1, (B + 4) * spc_w),
                                np.int64).astype(np.int32))
starts = jnp.asarray(np.sort(rng.integers(0, spc_w, C)).astype(np.int32))
ci = jnp.zeros((CP, 8), jnp.int32).at[:C, 1].set(1).at[:, 0].set(123456789)
sf = jnp.zeros((CP, 16), jnp.float32)
si = jnp.zeros((CP, 16), jnp.int32).at[:, 0].set(60).at[:, 4].set(4000)


def timeit(call):
    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(sf_, n):
        def step(carry, _):
            out, y = call(carry + sf_ * 0)
            return carry + out * 1e-9, y
        c, ys = jax.lax.scan(step, jnp.zeros((CP, 16), jnp.float32), None,
                             length=n)
        return ys.sum() + c.sum()

    times = {}
    for n in (4, 16):
        loop(sf, n).block_until_ready()
        best = np.inf
        for r in range(6):
            t0 = time.perf_counter()
            loop(sf + r * 1e-6, n).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[16] - times[4]) / (12 * B)


def call_full(sf_):
    ys, sfo, sio = _mega_call(cfg, B, C, frames, tabs, hb0, ci, sf_, si)
    return sfo, ys[0, 0, 0]


def call_build(sf_):
    fr = build_frames(cfg, B, C, capw,
                      starts + sf_[0, 0].astype(jnp.int32) * 0,
                      rows_pad=RP)
    return sf_ + fr[0, 0, 0] * jnp.float32(1e-20), \
        fr[0, 0, 0].astype(jnp.float32)


modes = os.environ.get("MODE", "full,build").split(",")
for m in modes:
    t = timeit({"full": call_full, "build": call_build}[m])
    print(f"{m:6s}: {t * 1e6:6.2f} us/ms", flush=True)
