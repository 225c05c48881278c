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


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 5))
def _synth_dynamic_chunks(config: ReceiverConfig, prns: tuple, n_ms: int,
                          sat_dynamic: dict, noise_key, noise_std: float):
    """Per-ms-piecewise-linear-delay synthesis: scan over 1-ms chunks.

    The delay tables sample the true light time at every ms boundary; within
    a chunk tau(t) is interpolated linearly (curvature error over 1 ms is
    ~1e-7 samples for GPS dynamics), keeping code phase and carrier phase
    continuous and geometry-consistent across the whole capture.
    """
    spms = config.samples_per_code
    fs = config.sampling_freq
    f_l1 = config.l1_freq
    f_if = config.intermediate_freq
    fc = config.code_freq_basis

    codes = jnp.asarray(gold_codes()[np.asarray(prns) - 1], jnp.float32)  # (S, 1023)
    bit_table = sat_dynamic["bits"]          # (S, n_bits) f32 +/-1
    n_bits = bit_table.shape[1]
    amp = sat_dynamic["amp"]                 # (S,)
    phi0 = sat_dynamic["phi0"]               # (S,) f64 rad
    delays = sat_dynamic["delays"]           # (S, n_ms+1) f64 seconds
    t_offset = sat_dynamic["t_offset"]       # scalar f64: t_rx0 - t_bits0

    k_local = jnp.arange(spms, dtype=jnp.float64)

    def one_sat_chunk(code, bits, a, p0, d0, d1, t0):
        t = t0 + k_local / fs                       # receiver time since capture
        tau = d0 + (d1 - d0) * (k_local / spms)
        t_tx = t_offset + t - tau                   # transmit time since bit 0
        chips = fc * t_tx
        chip_idx = jnp.floor(chips).astype(jnp.int64)
        code_val = code[(chip_idx % 1023).astype(jnp.int32)]
        bit_idx = jnp.floor_divide(chip_idx, 1023 * _BITS_PER_PERIOD)
        bit_val = bits[jnp.clip(bit_idx, 0, n_bits - 1).astype(jnp.int32)]
        # carrier phase in cycles, reduced mod 1 before the sin for accuracy
        cycles = f_if * t - f_l1 * tau + p0 / (2.0 * jnp.pi)
        ang = 2.0 * jnp.pi * (cycles - jnp.floor(cycles))
        carrier = jnp.sin(ang).astype(jnp.float32)
        return a * code_val * bit_val * carrier

    def chunk_step(carry_key, ms):
        t0 = ms.astype(jnp.float64) * (spms / fs)
        per_sat = jax.vmap(one_sat_chunk, in_axes=(0, 0, 0, 0, 0, 0, None))(
            codes, bit_table, amp, phi0, delays[:, ms], delays[:, ms + 1], t0)
        x = per_sat.sum(axis=0)
        key, sub = jax.random.split(carry_key)
        if noise_std > 0.0:
            x = x + noise_std * jax.random.normal(sub, (spms,), jnp.float32)
        q = jnp.clip(jnp.round(x), -128, 127).astype(jnp.int8)
        return key, q

    _, out = jax.lax.scan(chunk_step, noise_key, jnp.arange(n_ms, dtype=jnp.int64))
    return out.reshape(-1)


def synthesize_dynamic(config: ReceiverConfig, prns: list[int],
                       delays_s: np.ndarray, bit_streams: np.ndarray,
                       t_rx0_minus_bits0: float, n_ms: int,
                       amplitudes: np.ndarray | None = None,
                       phase0: np.ndarray | None = None,
                       noise_std: float = 0.0, seed: int = 0) -> np.ndarray:
    """Geometry-consistent IF capture with per-ms time-varying delays.

    ``delays_s``: (S, >= n_ms+1) light times (s) at each ms boundary;
    ``bit_streams``: (S, n_bits) +/-1 transmitted nav bits, bit 0 starting
    at transmit time 0; ``t_rx0_minus_bits0``: receiver capture start minus
    bit-stream start, in GPS seconds.  Used by the golden-scenario builder
    (softgnss_tpu.scenario) for closed-loop navigation tests.
    """
    if config.sampling_freq % 1000:
        raise ValueError("synthesizer requires sampling_freq divisible by 1000")
    s = len(prns)
    delays_s = np.asarray(delays_s, np.float64)
    if delays_s.shape[0] != s or delays_s.shape[1] < n_ms + 1:
        raise ValueError(f"delays_s must be (n_sats, >= n_ms+1), got {delays_s.shape}")
    bit_streams = np.asarray(bit_streams, np.float32)
    if not np.all(np.abs(bit_streams) == 1):
        raise ValueError("bit_streams must be +/-1")
    sat_dynamic = {
        "bits": jnp.asarray(bit_streams),
        "amp": jnp.asarray(amplitudes if amplitudes is not None else np.ones(s), jnp.float32),
        "phi0": jnp.asarray(phase0 if phase0 is not None else np.zeros(s), jnp.float64),
        "delays": jnp.asarray(delays_s[:, :n_ms + 1]),
        "t_offset": jnp.float64(t_rx0_minus_bits0),
    }
    out = _synth_dynamic_chunks(config, tuple(int(p) for p in prns), int(n_ms),
                                sat_dynamic, jax.random.PRNGKey(seed), float(noise_std))
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
