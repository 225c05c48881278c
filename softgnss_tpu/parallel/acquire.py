"""Mesh-sharded acquisition: partition the PRN axis of the search grid.

The acquisition tensor (PRN x Doppler x code-phase) is independent per
PRN; only the Doppler-mixed signal FFTs are shared.  Those are computed
once and replicated, then `shard_map` runs the per-PRN block math
(acquire.search._prn_block — the same function the single-chip path
chunks over) on each mesh slot's PRN subset.  No collectives are needed
until the (32,)-sized results are gathered — which `jax.jit` does
automatically when the sharded outputs are read.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from softgnss_tpu.acquire.search import (
    AcquisitionResults,
    _baseband_ffts,
    _prn_block,
)
from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.signals.ca import ca_table, gold_codes


@partial(jax.jit, static_argnums=(0, 1))
def _acquire_sharded_device(config: ReceiverConfig, mesh: Mesh, long_signal,
                            code_fd, gold):
    axis = config.channel_axis
    xs, sig0dc = _baseband_ffts(config, long_signal)

    def shard_fn(cfd_local, gold_local, xsr, s0r):
        return _prn_block(config, xsr, s0r, cfd_local, gold_local)

    shard = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(None, None, None), P(None)),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    return shard(code_fd, gold, xs, sig0dc)


@partial(jax.jit, static_argnums=(0, 1))
def _acquire_sharded_hinted(config: ReceiverConfig, mesh: Mesh, long_signal,
                            code_fd, gold, bin_mask):
    """Hinted variant: the (P, B) Doppler-bin mask shards with the PRN
    axis (each slot masks its own PRN subset inside _prn_block)."""
    axis = config.channel_axis
    xs, sig0dc = _baseband_ffts(config, long_signal)

    def shard_fn(cfd_local, gold_local, mask_local, xsr, s0r):
        return _prn_block(config, xsr, s0r, cfd_local, gold_local,
                          bin_mask=mask_local)

    shard = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(None, None, None), P(None)),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    return shard(code_fd, gold, bin_mask, xs, sig0dc)


def acquire_sharded(config: ReceiverConfig, long_signal: np.ndarray,
                    mesh: Mesh, doppler_hints: np.ndarray | None = None,
                    hint_halfwidth_hz: float = 500.0) -> AcquisitionResults:
    """Acquisition with the PRN search sharded over ``mesh``'s channel axis.

    Results are identical to :func:`softgnss_tpu.acquire.acquire` (same
    math, different partitioning), including assisted starts:
    ``doppler_hints`` (per-PRN predicted carrier frequencies, NaN = none)
    restrict each PRN's Doppler bins exactly as on the single-device
    path — the (PRN, bin) mask shards with the PRN axis.  The PRN list
    is padded to a multiple of the axis size with repeats (discarded
    after the gather).
    """
    need = config.acquisition_ms * config.samples_per_code
    if long_signal.shape[0] < need:
        raise ValueError(f"acquisition needs {need} samples, got {long_signal.shape[0]}")

    prn_list = np.asarray(config.acq_satellite_list, np.int64)
    n_prn = len(prn_list)
    n_shards = mesh.shape[config.channel_axis]
    pad = (-n_prn) % n_shards
    padded = np.concatenate([prn_list, prn_list[:1].repeat(pad)])

    from softgnss_tpu.acquire.search import _corr_fft_len

    codes = ca_table(config)[padded - 1]
    code_fd = np.conj(np.fft.fft(codes.astype(np.complex64),
                                 _corr_fft_len(config))).astype(np.complex64)
    gold = gold_codes()[padded - 1].astype(np.float32)

    from softgnss_tpu.acquire.search import hint_bin_mask

    mask = hint_bin_mask(config, doppler_hints, hint_halfwidth_hz)
    if mask is None:
        carr, phase, metric = _acquire_sharded_device(
            config, mesh, jnp.asarray(long_signal[:need]),
            jnp.asarray(code_fd), jnp.asarray(gold))
    else:
        mask_p = np.concatenate([mask, mask[:1].repeat(pad, axis=0)])
        carr, phase, metric = _acquire_sharded_hinted(
            config, mesh, jnp.asarray(long_signal[:need]),
            jnp.asarray(code_fd), jnp.asarray(gold), jnp.asarray(mask_p))
    out = tuple(np.asarray(jax.device_get(v))[:n_prn] for v in (carr, phase, metric))

    carr_freq = np.zeros(32)
    code_phase = np.zeros(32, np.int64)
    peak_metric = np.zeros(32)
    for i, prn in enumerate(prn_list):
        carr_freq[prn - 1] = out[0][i]
        code_phase[prn - 1] = out[1][i]
        peak_metric[prn - 1] = out[2][i]
    return AcquisitionResults(carr_freq, code_phase, peak_metric)
