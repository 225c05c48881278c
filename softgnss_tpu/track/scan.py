"""Multi-channel DLL/PLL tracking as a ``lax.scan`` over milliseconds.

The reference tracks channels one-by-one in Python, reading the capture file
inside the per-millisecond hot loop (reference: tracking.py:59,132,154).  Here:

* the whole capture lives in device HBM as int8; each channel consumes it
  with a per-ms ``dynamic_slice`` — no host I/O in the loop,
* channels are **vmapped** (and shardable over a mesh axis — see
  softgnss_tpu.parallel) instead of serialized,
* the per-ms loop is a single ``lax.scan`` whose carry is the loop-filter /
  NCO state pytree; one compiled step serves all 37k milliseconds,
* the data-dependent block size ("read ceil((1023-remCodePhase)/codePhaseStep)
  samples", reference: tracking.py:148-154) becomes a fixed-size window
  ``track_window`` with a masked tail — static shapes for XLA — while exact
  integer NCO bookkeeping (Q40 code phase, uint32 carrier turns, see
  softgnss_tpu.signals.nco) reproduces the variable block boundaries,
  including the ``absoluteSample`` sample counter that pseudoranges are
  derived from (reference: tracking.py:255, postNavigation.py:60-61).

Loop equations (identical math to reference: tracking.py:221-249):

    PLL:  err = atan(Q_P / I_P) / 2pi
          nco += (tau2/tau1)(err - err_prev) + err * PDI/tau1
          carrFreq = acquiredFreq + nco
    DLL:  err = (|E| - |L|) / (|E| + |L|),  |X| = sqrt(I_X^2 + Q_X^2)
          nco += (tau2/tau1)(err - err_prev) + err * PDI/tau1
          codeFreq = codeFreqBasis - nco
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from softgnss_tpu.acquire.search import Channels
from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.signals.nco import (
    CODE_FRAC_BITS,
    CODE_ONE,
    carrier_sin_cos,
    carrier_step_u32,
    ceil_chip_index,
    chips_to_q,
    code_step_q,
)
from softgnss_tpu.track.tables import (
    CorrelatorTables,
    build_tables,
    onehot_width,
    subdivision,
)


class TrackState(NamedTuple):
    """Per-channel tracking loop state (the scan carry). Leaves are (C,)."""

    ptr: jnp.ndarray          # i64: absolute sample index of next read
    carr_phase: jnp.ndarray   # i32: carrier NCO counts (uint32 semantics)
    code_rem_q: jnp.ndarray   # i64: remainder code phase, Q40 chips
    carr_freq: jnp.ndarray    # f64: current carrier frequency, Hz
    code_freq: jnp.ndarray    # f64: current code frequency, Hz
    carr_nco: jnp.ndarray     # f64: PLL filter accumulator
    carr_err: jnp.ndarray     # f64: previous PLL discriminator
    code_nco: jnp.ndarray     # f64: DLL filter accumulator
    code_err: jnp.ndarray     # f64: previous DLL discriminator


class MsOutputs(NamedTuple):
    """Per-ms logged observables (reference: tracking.py:253-275), plus
    ``sample_frac``: the sub-sample fraction of the code-period boundary.
    The reference's pseudoranges quantize at the integer fid.tell() sample
    counter (c/fs meters, tracking.py:255); the Q40 code NCO knows the
    boundary exactly — it crossed 1023 chips ``rem/step`` samples before
    ``absolute_sample`` — so ``absolute_sample - sample_frac`` is the
    boundary arrival to sub-millimeter code-phase resolution."""

    absolute_sample: jnp.ndarray  # i64
    sample_frac: jnp.ndarray      # f64 in [0, 1)
    code_freq: jnp.ndarray        # f64
    carr_freq: jnp.ndarray        # f64
    i_p: jnp.ndarray              # f32
    i_e: jnp.ndarray
    i_l: jnp.ndarray
    q_e: jnp.ndarray
    q_p: jnp.ndarray
    q_l: jnp.ndarray
    dll_discr: jnp.ndarray        # f64
    dll_discr_filt: jnp.ndarray
    pll_discr: jnp.ndarray
    pll_discr_filt: jnp.ndarray


@dataclass
class TrackResults:
    """Tracking output; array fields are (channels, ms)."""

    prn: np.ndarray
    status: list[str]
    absolute_sample: np.ndarray
    sample_frac: np.ndarray
    code_freq: np.ndarray
    carr_freq: np.ndarray
    i_p: np.ndarray
    i_e: np.ndarray
    i_l: np.ndarray
    q_e: np.ndarray
    q_p: np.ndarray
    q_l: np.ndarray
    dll_discr: np.ndarray
    dll_discr_filt: np.ndarray
    pll_discr: np.ndarray
    pll_discr_filt: np.ndarray
    #: loop state after the last tracked millisecond; pass as ``state=`` to
    #: :func:`track` to resume the capture exactly where this run stopped
    final_state: "TrackState | None" = None

    @property
    def n_ms(self) -> int:
        return self.i_p.shape[1]


def initial_state(config: ReceiverConfig, channels: Channels) -> TrackState:
    """Loop state at the first millisecond (reference: tracking.py:107-130)."""
    c = len(channels)
    active = np.asarray([s == "T" for s in channels.status])
    return TrackState(
        ptr=jnp.asarray(config.skip_samples + channels.code_phase, jnp.int64),
        carr_phase=jnp.zeros(c, jnp.int32),
        code_rem_q=jnp.zeros(c, jnp.int64),
        carr_freq=jnp.asarray(channels.acquired_freq, jnp.float64),
        code_freq=jnp.full(c, config.code_freq_basis, jnp.float64),
        carr_nco=jnp.zeros(c, jnp.float64),
        carr_err=jnp.zeros(c, jnp.float64),
        code_nco=jnp.zeros(c, jnp.float64),
        code_err=jnp.zeros(c, jnp.float64),
    )


def _correlate_gather(config: ReceiverConfig, tables, tq, i_bb, q_bb):
    """Reference-style correlators: per-sample code lookups
    (reference: tracking.py:164-190, 209-219).  Exact, but the three
    data-dependent gathers are pathologically slow on TPU — used as the
    cross-check / debug path (config.correlator_impl='gather')."""
    half_q = chips_to_q(config.dll_correlator_spacing)
    code_pad = tables.code_pads
    # padded-code index is the ceil'd chip phase itself: pad[i] = chip i-1,
    # so pad[ceil(t)] = chip ceil(t)-1, the reference's convention
    # (tracking.py:166-188).  Clip covers only the masked tail.
    idx_p = jnp.clip(ceil_chip_index(tq), 0, 1024)
    idx_e = jnp.clip(ceil_chip_index(tq - half_q), 0, 1024)
    idx_l = jnp.clip(ceil_chip_index(tq + half_q), 0, 1024)
    early, prompt, late = code_pad[idx_e], code_pad[idx_p], code_pad[idx_l]
    return (jnp.sum(early * i_bb), jnp.sum(prompt * i_bb), jnp.sum(late * i_bb),
            jnp.sum(early * q_bb), jnp.sum(prompt * q_bb), jnp.sum(late * q_bb))


def _correlate_onehot(config: ReceiverConfig, tables, tq, i_bb, q_bb):
    """Gather-free correlators: tile-local half-chip one-hot contraction.

    Same sums as the gather formulation (see softgnss_tpu.track.tables):
    the half-chip index h = ceil(2*tq) selects E/P/L code values through
    static per-tile tables, so the per-ms compute is pure elementwise ops
    plus two small batched matmuls — the TPU fast path.
    """
    tile = config.track_tile
    t_count = config.track_window // tile
    w = onehot_width(config)
    s_div = subdivision(config)

    # ceil(S*tq) via the Q40 representation: integer ceil of x/2^40 with
    # x = S*tq_q (S static; x stays well inside int64)
    h = ((tq * s_div) + (CODE_ONE - 1)) >> CODE_FRAC_BITS         # (W,) i64
    h_local = (h.reshape(t_count, tile) - tables.h_base[:, None]).astype(jnp.int32)
    iota_w = jnp.arange(w, dtype=jnp.int32)
    oh = (h_local[:, :, None] == iota_w[None, None, :]).astype(jnp.float32)

    bb = jnp.stack([i_bb.reshape(t_count, tile),
                    q_bb.reshape(t_count, tile)], axis=-1)        # (T, tile, 2)
    u = jnp.einsum("tkw,tkc->twc", oh, bb,
                   preferred_element_type=jnp.float32)            # (T, w, 2)
    corr = jnp.einsum("twc,twx->xc", u, tables.codes_static,
                      preferred_element_type=jnp.float32)         # (3, 2)
    return (corr[0, 0], corr[1, 0], corr[2, 0],
            corr[0, 1], corr[1, 1], corr[2, 1])


def _channel_ms(config: ReceiverConfig, signal, tables, carr_basis, active, st: TrackState):
    """One millisecond of one channel. All inputs per-channel scalars except
    ``signal`` (shared capture) and ``tables`` (per-channel static arrays)."""
    fs = config.sampling_freq
    blk_win = config.track_window
    code_len_q = config.code_length * CODE_ONE

    # --- block size from exact integer code NCO ---------------------------
    step_q = code_step_q(st.code_freq, fs)
    blk = (code_len_q - st.code_rem_q + step_q - 1) // step_q    # i64 scalar

    raw = jax.lax.dynamic_slice(signal, (st.ptr,), (blk_win,)).astype(jnp.float32)
    k64 = jnp.arange(blk_win, dtype=jnp.int64)
    mask = k64 < blk
    raw = jnp.where(mask, raw, 0.0)

    tq = st.code_rem_q + step_q * k64                             # Q40 chips

    # --- carrier mix via uint32 NCO (reference: tracking.py:192-207) -------
    w = carrier_step_u32(st.carr_freq, fs)
    sin_v, cos_v = carrier_sin_cos(st.carr_phase, w, jnp.arange(blk_win, dtype=jnp.int32))
    i_bb = sin_v * raw
    q_bb = cos_v * raw

    # --- six correlators (reference: tracking.py:209-219) ------------------
    if config.correlator_impl == "onehot":
        i_e, i_p, i_l, q_e, q_p, q_l = _correlate_onehot(config, tables, tq, i_bb, q_bb)
    elif config.correlator_impl == "gather":
        i_e, i_p, i_l, q_e, q_p, q_l = _correlate_gather(config, tables, tq, i_bb, q_bb)
    else:
        raise ValueError(f"unknown correlator_impl {config.correlator_impl!r}")

    return _filters_and_outputs(config, carr_basis, active, st, step_q, blk, w,
                                (i_e, i_p, i_l, q_e, q_p, q_l))


def _filters_and_outputs(config: ReceiverConfig, carr_basis, active, st,
                         step_q, blk, w, corr):
    """Loop-filter updates + logged outputs from the six correlator sums.

    Pure elementwise math — serves both the per-channel (scalar, vmapped)
    and the channel-batched Pallas step.  Equations per reference
    tracking.py:221-275.
    """
    code_len_q = config.code_length * CODE_ONE
    tau1c, tau2c = config.pll_taus
    tau1d, tau2d = config.dll_taus
    pdi = config.pdi_s
    i_e, i_p, i_l, q_e, q_p, q_l = corr

    # --- PLL (reference: tracking.py:221-235) -------------------------------
    i_p64, q_p64 = i_p.astype(jnp.float64), q_p.astype(jnp.float64)
    safe_ip = jnp.where(i_p64 != 0, i_p64, 1.0)
    carr_err = jnp.where(i_p64 != 0, jnp.arctan(q_p64 / safe_ip), 0.0) / (2.0 * jnp.pi)
    carr_nco = st.carr_nco + tau2c / tau1c * (carr_err - st.carr_err) + carr_err * (pdi / tau1c)
    carr_freq = carr_basis + carr_nco

    # --- DLL (reference: tracking.py:237-251) -------------------------------
    e_mag = jnp.sqrt(i_e.astype(jnp.float64) ** 2 + q_e.astype(jnp.float64) ** 2)
    l_mag = jnp.sqrt(i_l.astype(jnp.float64) ** 2 + q_l.astype(jnp.float64) ** 2)
    denom = jnp.where(e_mag + l_mag > 0, e_mag + l_mag, 1.0)
    code_err = jnp.where(e_mag + l_mag > 0, (e_mag - l_mag) / denom, 0.0)
    code_nco = st.code_nco + tau2d / tau1d * (code_err - st.code_err) + code_err * (pdi / tau1d)
    code_freq = config.code_freq_basis - code_nco

    # --- state update (frozen when inactive) --------------------------------
    new = TrackState(
        ptr=st.ptr + blk,
        carr_phase=st.carr_phase + w * blk.astype(jnp.int32),
        code_rem_q=st.code_rem_q + step_q * blk - code_len_q,
        carr_freq=carr_freq,
        code_freq=code_freq,
        carr_nco=carr_nco,
        carr_err=carr_err,
        code_nco=code_nco,
        code_err=code_err,
    )
    new = jax.tree.map(lambda n, o: jnp.where(active, n, o), new, st)

    z32 = jnp.float32(0.0)
    z64 = jnp.float64(0.0)
    frac = new.code_rem_q.astype(jnp.float64) / step_q.astype(jnp.float64)
    outs = MsOutputs(
        absolute_sample=jnp.where(active, new.ptr, jnp.int64(0)),
        sample_frac=jnp.where(active, frac, z64),
        code_freq=jnp.where(active, code_freq, z64),
        carr_freq=jnp.where(active, carr_freq, z64),
        i_p=jnp.where(active, i_p, z32),
        i_e=jnp.where(active, i_e, z32),
        i_l=jnp.where(active, i_l, z32),
        q_e=jnp.where(active, q_e, z32),
        q_p=jnp.where(active, q_p, z32),
        q_l=jnp.where(active, q_l, z32),
        dll_discr=jnp.where(active, code_err, z64),
        dll_discr_filt=jnp.where(active, code_nco, z64),
        pll_discr=jnp.where(active, carr_err, z64),
        pll_discr_filt=jnp.where(active, carr_nco, z64),
    )
    return new, outs


def _channels_ms_pallas(config: ReceiverConfig, signal, codes_t, h_base,
                        carr_basis, active, st: TrackState):
    """One millisecond for ALL channels via the fused Pallas correlator.

    ``codes_t``: (C, 3, T, w) transposed static code tables;
    ``h_base``: (C, T) i64.  Scalar NCO bookkeeping stays exact int64 XLA.
    """
    from softgnss_tpu.track.pallas_kernel import fused_correlate, phase_decomposition

    fs = config.sampling_freq
    blk_win = config.track_window
    tile = config.track_tile
    code_len_q = config.code_length * CODE_ONE

    step_q = code_step_q(st.code_freq, fs)                       # (C,) i64
    blk = (code_len_q - st.code_rem_q + step_q - 1) // step_q

    windows = jax.vmap(
        lambda p: jax.lax.dynamic_slice(signal, (p,), (blk_win,)))(st.ptr)
    windows = windows.astype(jnp.float32).reshape(len(st.ptr), -1, tile)

    h_int, frac24, step24 = phase_decomposition(config, st.code_rem_q, step_q, h_base)
    carr_w = carrier_step_u32(st.carr_freq, fs)                  # (C,) i32
    scalars = jnp.stack([step24, st.carr_phase, carr_w,
                         blk.astype(jnp.int32)], axis=1)
    corr = fused_correlate(config, windows, h_int, frac24, codes_t, scalars)
    corr6 = tuple(corr[:, i] for i in range(6))
    return _filters_and_outputs(config, carr_basis, active, st, step_q, blk,
                                carr_w, corr6)


@partial(jax.jit, static_argnums=(0, 5))
def _track_device(config: ReceiverConfig, signal, tables: CorrelatorTables,
                  carr_basis, active, n_ms: int, state0: TrackState):
    """Scan over milliseconds with channels vmapped (or channel-batched
    through the fused Pallas kernel when correlator_impl='pallas')."""

    if config.correlator_impl == "pallas":
        codes_t = jnp.transpose(tables.codes_static, (0, 1, 3, 2))  # (C,T,3,w)
        h_base = jnp.asarray(tables.h_base, jnp.int64)

        def step(state, _):
            return _channels_ms_pallas(config, signal, codes_t, h_base,
                                       carr_basis, active, state)
    else:
        step_fn = jax.vmap(
            lambda tab, cb, act, st: _channel_ms(config, signal, tab, cb, act, st),
            in_axes=(0, 0, 0, 0),
        )

        def step(state, _):
            return step_fn(tables, carr_basis, active, state)

    final, ys = jax.lax.scan(step, state0, None, length=n_ms)
    return final, ys


def track(config: ReceiverConfig, signal: np.ndarray, channels: Channels,
          n_ms: int | None = None, state: TrackState | None = None) -> TrackResults:
    """Track all channels over ``n_ms`` milliseconds of the capture.

    ``signal`` is the full raw capture (int8), *including* any skipped
    prefix — channel pointers are absolute sample indices, exactly like the
    reference's ``fid.tell()`` bookkeeping (tracking.py:107,255).
    """
    n_ms = int(config.ms_to_process if n_ms is None else n_ms)
    # anchor the length check at the resume pointer, not the capture start
    start = (config.skip_samples if state is None
             else int(np.max(np.asarray(state.ptr))))
    needed = start + (n_ms + 2) * config.samples_per_code
    if signal.shape[0] < needed:
        raise ValueError(
            f"capture too short for tracking: need >= {needed} samples, got {signal.shape[0]}"
        )

    tables = build_tables(config, np.asarray(channels.prn),
                          np.asarray(channels.acquired_freq))
    active = np.asarray([s == "T" for s in channels.status])

    if state is None:
        state = initial_state(config, channels)

    final, ys = _track_device(
        config, jnp.asarray(signal), jax.tree.map(jnp.asarray, tables),
        jnp.asarray(channels.acquired_freq, jnp.float64), jnp.asarray(active),
        n_ms, state)
    ys = jax.device_get(ys)

    return TrackResults(
        final_state=jax.tree.map(np.asarray, jax.device_get(final)),
        prn=np.asarray(channels.prn),
        status=list(channels.status),
        absolute_sample=np.asarray(ys.absolute_sample).T,
        sample_frac=np.asarray(ys.sample_frac).T,
        code_freq=np.asarray(ys.code_freq).T,
        carr_freq=np.asarray(ys.carr_freq).T,
        i_p=np.asarray(ys.i_p).T,
        i_e=np.asarray(ys.i_e).T,
        i_l=np.asarray(ys.i_l).T,
        q_e=np.asarray(ys.q_e).T,
        q_p=np.asarray(ys.q_p).T,
        q_l=np.asarray(ys.q_l).T,
        dll_discr=np.asarray(ys.dll_discr).T,
        dll_discr_filt=np.asarray(ys.dll_discr_filt).T,
        pll_discr=np.asarray(ys.pll_discr).T,
        pll_discr_filt=np.asarray(ys.pll_discr_filt).T,
    )
