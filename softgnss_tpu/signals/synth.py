"""Synthetic GPS L1 IF signal generator — the framework's test/bench backend.

The reference ships no test data (its golden inputs are unpublished textbook
recordings, reference: initialize.py:99, main.py:60), so correctness here is
established closed-loop: inject known PRNs / Doppler / delays / nav bits,
synthesize int8 IF samples, and verify that every receiver stage recovers the
injected truth (SURVEY.md §4).

The generator runs as a jitted JAX program, chunked per millisecond block so
arbitrarily long captures stream through device memory; on a TPU it
synthesizes the reference's full 37 s x 38.192 MHz workload in seconds.

Signal model (per satellite)::

    s[k] = A * CA_prn(floor(chips(k)) mod 1023) * D(floor(chips(k)/1023/20))
             * sin(2*pi*(IF + fd) * k/fs + phi0)
    chips(k) = fc_eff * (k - delay_samples) / fs
    fc_eff   = code_freq_basis * (1 + fd / fL1)        # consistent code Doppler

so ``delay_samples mod samples_per_code`` is the acquisition code phase and
``IF + fd`` the acquisition carrier frequency.  The carrier is sine-phased:
with the reference's mixing convention (I = sin * x, reference:
tracking.py:205-207) a phase-locked PLL then yields nav bits on I_P.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.signals.ca import gold_codes

_BITS_PER_PERIOD = 20  # nav bit = 20 C/A code periods


@dataclass(frozen=True)
class SatelliteSignal:
    """Injected truth for one satellite."""

    prn: int
    #: carrier Doppler relative to the IF, Hz
    doppler_hz: float = 0.0
    #: signal delay in samples; acquisition should report
    #: ``delay_samples mod samples_per_code`` as the code phase
    delay_samples: float = 0.0
    amplitude: float = 1.0
    #: carrier phase at k=0, radians
    phase0: float = 0.0
    #: +/-1 nav bits, one per 20 ms; indexed by bit counter mod len.
    #: None -> constant +1 (no data modulation).
    nav_bits: tuple[int, ...] | None = None
    #: override the code chipping rate; None -> Doppler-consistent
    code_freq_hz: float | None = None

    def effective_code_freq(self, config: ReceiverConfig) -> float:
        if self.code_freq_hz is not None:
            return self.code_freq_hz
        return config.code_freq_basis * (1.0 + self.doppler_hz / config.l1_freq)


def _nav_bit_array(sat: SatelliteSignal) -> np.ndarray:
    if sat.nav_bits is None:
        return np.ones(1, np.float32)
    bits = np.asarray(sat.nav_bits, np.float32)
    if not np.all(np.abs(bits) == 1):
        raise ValueError("nav_bits must be +/-1")
    return bits


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 5))
def _synth_chunks(config: ReceiverConfig, sat_static: tuple, n_ms: int,
                  sat_dynamic: dict, noise_key, noise_std: float):
    """All-ms synthesis: scan over 1-ms chunks, vmap over satellites."""
    spms = config.samples_per_code  # samples per ms (fs divisible by 1000)
    fs = config.sampling_freq

    prns, bit_lens = sat_static
    codes = jnp.asarray(gold_codes()[np.asarray(prns) - 1], jnp.float32)  # (S, 1023)
    max_bits = max(bit_lens)
    # per-sat nav bit tables padded to a common length; index mod actual len
    bit_table = sat_dynamic["bits"]          # (S, max_bits) f32
    bit_len = jnp.asarray(bit_lens, jnp.int64)  # (S,)
    amp = sat_dynamic["amp"]                 # (S,) f32
    phi0 = sat_dynamic["phi0"]               # (S,) f64
    delay = sat_dynamic["delay"]             # (S,) f64 samples
    fcarr = sat_dynamic["fcarr"]             # (S,) f64  = IF + doppler
    fcode = sat_dynamic["fcode"]             # (S,) f64

    k_local = jnp.arange(spms, dtype=jnp.float64)

    def one_sat_chunk(code, bits, blen, a, p0, d, fc_car, fc_code, k0):
        k = k0 + k_local
        chips = fc_code * (k - d) / fs
        chip_idx = jnp.floor(chips).astype(jnp.int64)
        code_val = code[(chip_idx % 1023).astype(jnp.int32)]
        period = jnp.floor_divide(chip_idx, 1023)
        bit_idx = jnp.floor_divide(period, _BITS_PER_PERIOD)
        bit_val = bits[(bit_idx % blen).astype(jnp.int32)]
        ang = 2.0 * jnp.pi * fc_car * k / fs + p0
        carrier = jnp.sin(ang).astype(jnp.float32)
        return a * code_val * bit_val * carrier

    def chunk_step(carry_key, ms):
        k0 = (ms * spms).astype(jnp.float64)
        per_sat = jax.vmap(one_sat_chunk, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None))(
            codes, bit_table, bit_len, amp, phi0, delay, fcarr, fcode, k0)
        x = per_sat.sum(axis=0)
        key, sub = jax.random.split(carry_key)
        if noise_std > 0.0:
            x = x + noise_std * jax.random.normal(sub, (spms,), jnp.float32)
        q = jnp.clip(jnp.round(x), -128, 127).astype(jnp.int8)
        return key, q

    _, out = jax.lax.scan(chunk_step, noise_key, jnp.arange(n_ms, dtype=jnp.int64))
    return out.reshape(-1)


def synthesize_signal(config: ReceiverConfig, sats: list[SatelliteSignal],
                      n_ms: int, noise_std: float = 0.0, seed: int = 0) -> np.ndarray:
    """Generate ``n_ms`` milliseconds of int8 IF samples for the given satellites."""
    if config.sampling_freq % 1000:
        raise ValueError("synthesizer requires sampling_freq divisible by 1000")
    if not sats:
        raise ValueError("need at least one satellite")

    bit_arrays = [_nav_bit_array(s) for s in sats]
    max_bits = max(len(b) for b in bit_arrays)
    bits = np.stack([np.pad(b, (0, max_bits - len(b))) for b in bit_arrays])

    sat_static = (tuple(s.prn for s in sats), tuple(len(b) for b in bit_arrays))
    sat_dynamic = {
        "bits": jnp.asarray(bits, jnp.float32),
        "amp": jnp.asarray([s.amplitude for s in sats], jnp.float32),
        "phi0": jnp.asarray([s.phase0 for s in sats], jnp.float64),
        "delay": jnp.asarray([s.delay_samples for s in sats], jnp.float64),
        "fcarr": jnp.asarray(
            [config.intermediate_freq + s.doppler_hz for s in sats], jnp.float64),
        "fcode": jnp.asarray([s.effective_code_freq(config) for s in sats], jnp.float64),
    }
    key = jax.random.PRNGKey(seed)
    out = _synth_chunks(config, sat_static, int(n_ms), sat_dynamic, key, float(noise_std))
    return np.asarray(jax.device_get(out))


def default_scenario(config: ReceiverConfig, num_sats: int = 4, noise_std: float = 2.0,
                     seed: int = 7) -> tuple[list[SatelliteSignal], np.ndarray]:
    """A reproducible multi-satellite scenario + its IF capture (for tests/bench)."""
    rng = np.random.default_rng(seed)
    spc = config.samples_per_code
    sats = []
    for i in range(num_sats):
        sats.append(SatelliteSignal(
            prn=int(rng.integers(1, 33)) if i else 5,
            doppler_hz=float(rng.uniform(-4000, 4000)),
            delay_samples=float(rng.uniform(0, spc)),
            amplitude=float(rng.uniform(0.8, 1.5)),
            phase0=float(rng.uniform(0, 2 * np.pi)),
            nav_bits=tuple(rng.choice([-1, 1], size=64)),
        ))
    # ensure distinct PRNs
    seen = set()
    uniq = []
    next_prn = 1
    for s in sats:
        prn = s.prn
        while prn in seen:
            prn = next_prn
            next_prn += 1
        seen.add(prn)
        uniq.append(dataclasses.replace(s, prn=prn))
    signal = synthesize_signal(config, uniq, config.ms_to_process + config.acquisition_ms + 2,
                               noise_std=noise_std, seed=seed)
    return uniq, signal
