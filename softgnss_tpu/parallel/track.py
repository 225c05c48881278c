"""Mesh-sharded tracking: channels data-parallel, time blocks sequence-parallel.

Two shardings compose over the receiver mesh (see SURVEY.md §5.7-5.8):

* **Channel sharding** (exact): the vmapped channel axis of the tracking
  scan is partitioned; the capture is replicated.  Zero communication in
  the loop.

* **Time-block sharding** (re-lock approximation): the capture is
  partitioned into contiguous blocks along the 'time' axis.  Each shard
  receives its neighbors' boundary samples via `lax.ppermute` halos
  (overlap-save), starts from a loop state *propagated analytically* from
  acquisition (code phase advanced at the Doppler-consistent chip rate),
  and re-locks during ``config.time_shard_warmup_ms`` before its outputs
  count.  The recurrent loop-filter carry (reference: tracking.py:116-130)
  is the serializing dependency; warm-up re-lock converts it into
  embarrassing parallelism at the cost of warmup_ms of redundant compute
  per shard.  Propagated code phase is accurate to ~0.1 chip over tens of
  seconds (acquisition fine-frequency error ~2 Hz -> code-rate error
  ~1.3e-3 Hz), well inside the DLL pull-in range, so block-local period
  numbering matches the sequential run exactly and stitched outputs align
  millisecond-for-millisecond.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from softgnss_tpu.acquire.search import Channels
from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.track.scan import (
    _F32_FIELDS,
    MsOutputs,
    TrackResults,
    TrackState,
    _check_overflow,
    _scan_ms,
    initial_state,
)
from softgnss_tpu.track.tables import CorrelatorTables, build_tables


def _pad_channels(config: ReceiverConfig, channels: Channels, multiple: int) -> Channels:
    c = len(channels)
    pad = (-c) % multiple
    if pad == 0:
        return channels
    return Channels(
        prn=np.concatenate([channels.prn, np.zeros(pad, np.int64)]),
        acquired_freq=np.concatenate([channels.acquired_freq, np.zeros(pad)]),
        code_phase=np.concatenate([channels.code_phase, np.zeros(pad, np.int64)]),
        status=list(channels.status) + ["-"] * pad,
    )


def _track_inputs(config: ReceiverConfig, channels: Channels):
    tables = build_tables(config, np.asarray(channels.prn),
                          np.asarray(channels.acquired_freq))
    active = np.asarray([s == "T" for s in channels.status])
    carr_basis = np.asarray(channels.acquired_freq, np.float64)
    return tables, carr_basis, active


def _results_from_ys(channels: Channels, ys: MsOutputs, n_channels: int) -> TrackResults:
    get = lambda a: np.asarray(a).T[:n_channels]
    return TrackResults(
        prn=np.asarray(channels.prn)[:n_channels],
        status=list(channels.status)[:n_channels],
        absolute_sample=get(ys.absolute_sample),
        sample_frac=get(ys.sample_frac),
        code_freq=get(ys.code_freq), carr_freq=get(ys.carr_freq),
        i_p=get(ys.i_p), i_e=get(ys.i_e), i_l=get(ys.i_l),
        q_e=get(ys.q_e), q_p=get(ys.q_p), q_l=get(ys.q_l),
        dll_discr=get(ys.dll_discr), dll_discr_filt=get(ys.dll_discr_filt),
        pll_discr=get(ys.pll_discr), pll_discr_filt=get(ys.pll_discr_filt),
    )


# --------------------------------------------------------------------------
# channel sharding (exact)
# --------------------------------------------------------------------------

def _table_specs(tables: CorrelatorTables, axis: str):
    return CorrelatorTables(*[P(axis, *([None] * (np.ndim(leaf) - 1)))
                              for leaf in tables])


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _track_channels_sharded(config: ReceiverConfig, mesh: Mesh, n_ms: int,
                            start_phase: int, signal, tables, carr_basis,
                            active, state0):
    ch_axis = config.channel_axis

    def shard_fn(signal_r, tables_l, carr_basis_l, active_l, state_l):
        final, ys, ovf = _scan_ms(config, signal_r, tables_l, carr_basis_l,
                                  active_l, n_ms, state_l, start_phase)
        return final, ys, ovf[None]

    state_spec = jax.tree.map(lambda _: P(ch_axis), state0,
                              is_leaf=lambda x: x is not state0)
    shard = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), _table_specs(tables, ch_axis), P(ch_axis), P(ch_axis),
                  state_spec),
        out_specs=(state_spec,
                   jax.tree.map(lambda _: P(None, ch_axis), MsOutputs(*[0] * 14),
                                is_leaf=lambda x: not isinstance(x, MsOutputs)),
                   P(ch_axis)),
    )
    return shard(signal, tables, carr_basis, active, state0)


def track_channels_sharded(config: ReceiverConfig, signal: np.ndarray,
                           channels: Channels, mesh: Mesh,
                           n_ms: int | None = None,
                           state: TrackState | None = None) -> TrackResults:
    """Channel-sharded tracking over ``mesh``; numerically identical to the
    single-device :func:`softgnss_tpu.track.track` (same per-channel math,
    integer-NCO recurrence is device-count invariant).  ``state``: resume
    from a previous run's ``final_state`` (leaves sized to the UNPADDED
    channel count) instead of the acquisition-derived initial state."""
    n_ms = int(config.ms_to_process if n_ms is None else n_ms)
    n_shards = mesh.shape[config.channel_axis]
    n_channels = len(channels)
    padded = _pad_channels(config, channels, n_shards)
    tables, carr_basis, active = _track_inputs(config, padded)
    state0 = initial_state(config, padded)
    start_ms = 0
    if state is not None:
        # graft the resumed leaves onto the padded template (pad rows are
        # inactive; their state is never consumed)
        state0 = jax.tree.map(
            lambda pad_leaf, live: jnp.asarray(
                np.concatenate([np.asarray(live),
                                np.asarray(pad_leaf)[n_channels:]])),
            state0, jax.tree.map(np.asarray, state))
        start_ms = int(np.max(np.asarray(state.ms)))
    # block-grid phase only (see scan.track): keeps resumes on one compile
    # AND anchors a resumed run's frames to the same absolute ms grid as
    # the uninterrupted run
    B = config.track_block_ms
    from softgnss_tpu.track.scan import host_pack_signal

    final, ys, ovf = _track_channels_sharded(
        config, mesh, n_ms, start_ms % B if B > 1 else 0,
        jnp.asarray(host_pack_signal(config, signal)),
        jax.tree.map(jnp.asarray, tables),
        jnp.asarray(carr_basis), jnp.asarray(active), state0)
    ys = jax.device_get(ys)
    _check_overflow(np.max(jax.device_get(ovf)))
    res = _results_from_ys(padded, ys, n_channels)
    res.final_state = jax.tree.map(
        lambda x: np.asarray(x)[:n_channels], jax.device_get(final))
    return res


# --------------------------------------------------------------------------
# time-block sharding (halo exchange + warm-up re-lock)
# --------------------------------------------------------------------------

def propagate_state(config: ReceiverConfig, channels: Channels,
                    start_ms: int) -> TrackState:
    """Loop state estimate at tracked millisecond ``start_ms``.

    Code phase is advanced analytically at the Doppler-consistent chip
    rate; loop-filter accumulators seed the DLL at that rate.  Host-side
    (NumPy f64) — exact integer sample estimates.
    """
    if start_ms == 0:
        return initial_state(config, channels)
    c = len(channels)
    active = np.asarray([s == "T" for s in channels.status])
    acq = np.asarray(channels.acquired_freq, np.float64)
    fc = config.code_freq_basis
    fc_eff = np.where(active, fc * (1.0 + (acq - config.intermediate_freq) / config.l1_freq), fc)
    spp = config.sampling_freq / (fc_eff / config.code_length)   # samples/period
    phase0 = np.asarray(channels.code_phase, np.float64)
    # the sequential tracker completes exactly one code period per tracked
    # millisecond, so the period INDEX at start_ms is start_ms itself —
    # selecting the nearest boundary to a target sample instead would slip
    # one period once cumulative code-Doppler drift exceeds the initial
    # code phase, shifting that shard's outputs by a whole millisecond
    ptr = config.skip_samples + np.rint(phase0 + start_ms * spp).astype(np.int64)
    return TrackState(
        ptr=jnp.asarray(ptr, jnp.int64),
        carr_phase=jnp.zeros(c, jnp.int32),
        code_rem_q=jnp.zeros(c, jnp.int64),
        carr_freq=jnp.asarray(acq, jnp.float64),
        code_freq=jnp.asarray(fc_eff, jnp.float64),
        carr_nco=jnp.zeros(c, jnp.float64),
        carr_err=jnp.zeros(c, jnp.float64),
        code_nco=jnp.asarray(fc - fc_eff, jnp.float64),
        code_err=jnp.zeros(c, jnp.float64),
        ms=jnp.full(c, start_ms, jnp.int64),
        block_base=jnp.asarray(ptr - config.track_frame_pre, jnp.int64),
        **{f: jnp.zeros(c, jnp.float32) for f in _F32_FIELDS},
    )


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _track_time_sharded(config: ReceiverConfig, mesh: Mesh, block_ms: int,
                        warmup_ms: int, signal_blocks, tail, tables,
                        carr_basis, active, states0):
    """signal_blocks: (n_t * L,) int8 sharded over 'time'; tail:
    ((warmup+2) spc,) replicated; states0 leaves: (n_t, C).

    Schedule (total_steps = block + warmup everywhere, SPMD-uniform):
    shard 0 tracks ms [0, block+warmup) from the exact acquisition state —
    no idle warm-up; its overshoot into shard 1's block feeds the polarity
    vote.  Shard b>0 tracks ms [b*block - warmup, (b+1)*block), re-locking
    during the first ``warmup`` steps.  The last shard (any b>0 layout)
    ends exactly at ms n_t*block, so its final state resumes the capture.
    """
    t_axis, ch_axis = config.time_axis, config.channel_axis
    spc = config.samples_per_code
    n_t = mesh.shape[t_axis]
    block_len = block_ms * spc
    halo_prev = (warmup_ms + 1) * spc
    halo_next = (warmup_ms + 2) * spc
    total_steps = warmup_ms + block_ms

    def shard_fn(sig_l, tail_r, tables_l, carr_basis_l, active_l, state_l):
        b = jax.lax.axis_index(t_axis)
        sig_l = sig_l.reshape(-1)                       # (L,)
        # overlap-save halos over the time ring: my tail -> next shard,
        # my head -> previous shard
        prev_tail = jax.lax.ppermute(sig_l[-halo_prev:], t_axis,
                                     [(i, (i + 1) % n_t) for i in range(n_t)])
        next_head = jax.lax.ppermute(sig_l[:halo_next], t_axis,
                                     [(i, (i - 1) % n_t) for i in range(n_t)])
        # the last shard's successor is the replicated global tail
        next_head = jnp.where(b == n_t - 1, tail_r, next_head)
        assembled = jnp.concatenate([prev_tail, sig_l, next_head])

        # global sample index of assembled[0] (absolute, incl. skip)
        base = config.skip_samples + b.astype(jnp.int64) * block_len - halo_prev
        state_l = jax.tree.map(lambda x: x[0], state_l)   # drop unit time dim
        state_l = state_l._replace(ptr=state_l.ptr - base)

        final, ys, ovf = _scan_ms(config, assembled, tables_l, carr_basis_l,
                                  active_l, total_steps, state_l)
        ys = ys._replace(absolute_sample=jnp.where(
            ys.absolute_sample != 0, ys.absolute_sample + base, 0))
        final = final._replace(ptr=final.ptr + base)      # back to global samples
        final = jax.tree.map(lambda x: x[None], final)    # add unit time dim
        return final, jax.tree.map(lambda x: x[None], ys), ovf[None, None]

    state_specs = jax.tree.map(lambda _: P(t_axis, ch_axis), states0,
                               is_leaf=lambda x: x is not states0)
    shard = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(t_axis), P(), _table_specs(tables, ch_axis), P(ch_axis),
                  P(ch_axis), state_specs),
        out_specs=(state_specs,
                   jax.tree.map(lambda _: P(t_axis, None, ch_axis),
                                MsOutputs(*[0] * 14),
                                is_leaf=lambda x: not isinstance(x, MsOutputs)),
                   P(t_axis, ch_axis)),
    )
    return shard(signal_blocks, tail, tables, carr_basis, active, states0)


def track_time_sharded(config: ReceiverConfig, signal: np.ndarray,
                       channels: Channels, mesh: Mesh,
                       n_ms: int | None = None) -> TrackResults:
    """Time-block + channel sharded tracking.

    ``n_ms`` must divide evenly into ``mesh`` 'time'-axis blocks.  Outputs
    are stitched from each shard's post-warm-up region; the first
    ``time_shard_warmup_ms`` after each interior block boundary are
    re-locked (not carried), so loop-filter transients there may differ
    slightly from a sequential run while correlators and nav bits agree.
    """
    n_ms = int(config.ms_to_process if n_ms is None else n_ms)
    n_t = mesh.shape[config.time_axis]
    n_ch_shards = mesh.shape[config.channel_axis]
    if n_ms % n_t:
        raise ValueError(f"n_ms={n_ms} not divisible by time shards={n_t}")
    block_ms = n_ms // n_t
    if n_t > 1 and block_ms < 3:
        raise ValueError(f"time blocks of {block_ms} ms cannot host a warm-up")
    # warmup <= block_ms - 2 keeps both halos ((warmup+1) / (warmup+2)
    # periods) within a neighbor's block; >= 1 keeps the polarity vote
    # non-empty.  A single time shard is the sequential run: no boundary
    # to heal, no warm-up.
    warmup = int(np.clip(config.time_shard_warmup_ms, 1, block_ms - 2)) if n_t > 1 else 0
    spc = config.samples_per_code
    skip = config.skip_samples
    needed = skip + (n_ms + 2) * spc
    if signal.shape[0] < needed:
        raise ValueError(f"capture too short: need >= {needed} samples, got {signal.shape[0]}")

    n_channels = len(channels)
    padded = _pad_channels(config, channels, n_ch_shards)
    tables, carr_basis, active = _track_inputs(config, padded)

    # per-shard initial states: shard 0 exact at ms 0, b>0 propagated to
    # ms (b*block - warmup)
    states = [propagate_state(config, padded, max(0, b * block_ms - warmup))
              for b in range(n_t)]
    states0 = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    body = np.ascontiguousarray(signal[skip: skip + n_ms * spc])
    # the last shard's next-halo: the 2 real code periods past the capture
    # body, zero-padded to the uniform (warmup+2)-period halo shape (the
    # padding is never consumed — the last shard stops at ms n_ms)
    tail = np.zeros((warmup + 2) * spc, body.dtype)
    tail[:2 * spc] = signal[skip + n_ms * spc: skip + (n_ms + 2) * spc]

    finals, ys, ovf = _track_time_sharded(
        config, mesh, block_ms, warmup, jnp.asarray(body), jnp.asarray(tail),
        jax.tree.map(jnp.asarray, tables), jnp.asarray(carr_basis),
        jnp.asarray(active), states0)
    ys = MsOutputs(*[np.asarray(leaf) for leaf in jax.device_get(ys)])
    _check_overflow(np.max(jax.device_get(ovf)))

    # --- polarity reconciliation ------------------------------------------
    # A freshly re-locked Costas/atan PLL settles with a 50% 180-degree
    # phase ambiguity: shard b's correlators may be sign-flipped relative
    # to shard b-1.  Shard b's warm-up steps re-track the SAME milliseconds
    # [b*block - half, b*block) as shard b-1's late steps, so the overlap
    # votes the relative polarity; flips accumulate across shards.  atan
    # discriminators and envelopes are (I,Q) -> (-I,-Q) invariant, so
    # flipping the six correlator streams restores a continuous nav-bit
    # polarity exactly.  (Shard 0 starts at step 0, so ms m is its step m;
    # shard b>0 starts warmup early, so ms m is its step m - b*block + warmup.)
    flips = np.ones((n_t, len(padded)))
    half = max(1, warmup // 2)
    for b in range(1, n_t):
        prev_off = (block_ms if b == 1 else block_ms + warmup)
        prev = ys.i_p[b - 1, prev_off - half: prev_off]
        cur = ys.i_p[b, warmup - half: warmup]
        dot = np.sum(np.sign(prev) * np.sign(cur), axis=0)   # (C,)
        flips[b] = flips[b - 1] * np.where(dot < 0, -1.0, 1.0)

    # stitch: shard 0 contributes steps [0, block) == ms [0, block);
    # shard b>0 contributes steps [warmup, warmup+block) == the same range
    def stitch(a, signed):                             # (n_t, steps, C)
        parts = []
        for b in range(n_t):
            off = 0 if b == 0 else warmup
            block = a[b, off:off + block_ms]
            parts.append(block * flips[b][None, :].astype(a.dtype) if signed else block)
        return np.concatenate(parts)

    signed_fields = {"i_p", "q_p", "i_e", "q_e", "i_l", "q_l"}
    ys = MsOutputs(*[stitch(leaf, name in signed_fields)
                     for name, leaf in zip(MsOutputs._fields, ys)])
    res = _results_from_ys(padded, ys, n_channels)
    # the last block's final scan state is the end-of-capture loop state.
    # If that shard was stitched with a polarity flip, rotate its carrier
    # phase by half a cycle so a resumed run continues with the SAME
    # output polarity as the stitched streams (a global half-turn flips
    # I/Q sign and is invisible to the atan discriminator).
    final = jax.tree.map(lambda x: np.asarray(x)[-1, :n_channels],
                         jax.device_get(finals))
    half_turn = np.where(flips[-1][:n_channels] < 0, np.int64(1) << 31, 0)
    ph = (final.carr_phase.astype(np.int64) + half_turn) & 0xFFFFFFFF
    res.final_state = final._replace(carr_phase=ph.astype(np.uint32).view(np.int32))
    return res


# --------------------------------------------------------------------------
# exact time blocking (sequential carry handoff)
# --------------------------------------------------------------------------

def track_time_exact(config: ReceiverConfig, signal: np.ndarray,
                     channels: Channels, mesh: Mesh,
                     n_ms: int | None = None) -> TrackResults:
    """Time-blocked tracking with the EXACT sequential loop-state carry.

    The capture is processed in ``mesh``-'time'-axis-count blocks, each
    channel-sharded over the mesh, with block b starting from block b-1's
    final integer-NCO loop state (the SURVEY §5.7 handoff design).  The
    recurrent carry serializes the blocks, so wall time stays sequential —
    this mode is the exact correctness anchor the warm-up re-lock mode
    (:func:`track_time_sharded`) is measured against
    (scripts/warmup_sweep.py), and the resumable-checkpoint path for
    captures processed in bounded slices.  Integer-NCO observables
    (absolute_sample, sample_frac — everything pseudoranges consume) and
    nav-bit signs are bit-identical to the single-device tracker; the f64
    loop-filter streams can differ by ~1 ulp because each block length
    compiles its own scan and XLA's fusion choices differ
    (tests/test_sharding.py pins both properties).
    """
    n_ms = int(config.ms_to_process if n_ms is None else n_ms)
    n_t = mesh.shape[config.time_axis]
    if n_ms % n_t:
        raise ValueError(f"n_ms={n_ms} not divisible by time blocks={n_t}")
    block_ms = n_ms // n_t

    state = None
    parts: list[TrackResults] = []
    for _ in range(n_t):
        r = track_channels_sharded(config, signal, channels, mesh,
                                   n_ms=block_ms, state=state)
        state = r.final_state
        parts.append(r)

    cat = lambda name: np.concatenate([getattr(p, name) for p in parts], axis=1)
    return TrackResults(
        prn=parts[0].prn, status=parts[0].status,
        final_state=parts[-1].final_state,
        **{k: cat(k) for k in (
            "absolute_sample", "sample_frac", "code_freq", "carr_freq",
            "i_p", "i_e", "i_l", "q_e", "q_p", "q_l", "dll_discr",
            "dll_discr_filt", "pll_discr", "pll_discr_filt")})
