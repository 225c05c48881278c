"""Multi-millisecond fused tracking kernel: a whole block per ``pallas_call``.

The round-2 fused correlator (track.pallas_kernel) runs ONE millisecond per
kernel launch; measured on v5e (scripts/pallas_ablate.py), the launch itself
costs ~14 us — more than the ~11 us of correlator compute — and the XLA glue
between launches (f64 loop filters, int64 NCO bookkeeping, per-ms phase-digit
precompute) adds ~23 us more, so the 12-channel step ran at ~49 us against a
~14.5 us VPU floor.  This kernel amortizes ALL of that: one ``pallas_call``
processes an entire ``track_block_ms`` block, carrying the complete DLL/PLL
loop state in VMEM scratch across a ``grid=(block_ms,)`` — **one grid step
is one whole millisecond** (an earlier (ms, plane, group) decomposition
spent ~0.2 us of Mosaic per-grid-step overhead x 640 steps; with the plane
and tile loops statically unrolled inside the step, the overhead is paid 64
times instead).  Measured v5e, 12 ch @ fs=38.192 MHz: see BASELINE.md /
bench.py (BENCH_IMPL=megakernel).

Everything the XLA scan body used to do per millisecond moves in-kernel:

* **Exact Q40 code NCO in 16-bit-digit int32 arithmetic** (Mosaic has no
  int64).  The code phase, block length ``blk = ceil((1023 chips - rem) /
  step)``, remainder update, and the per-lane sub-chip phase ramp are all
  computed on 4x16-bit digit vectors with carry normalization — exact
  integer arithmetic, the same sequences as the XLA path's int64 (the
  in-lane digit identity is the one track.pallas_kernel already used; here
  the digits are *produced* in-kernel too).  ``blk`` uses a float32
  quotient estimate corrected to the exact ceiling with two digit-compare
  steps each way.
* **Loop filters in float32 with a polynomial arctan** (Mosaic lowers
  neither f64 nor atan).  The discriminator/filter equations are the
  reference's (tracking.py:221-249) evaluated in f32: the discriminators
  are noise-dominated, and the filter accumulators are O(kHz) corrections
  where f32's 2^-24 relative error is ~1e-4 Hz — far below both the u32
  carrier-NCO quantization (fs/2^32 ~ 0.009 Hz) and the tracking noise
  floor.  atan uses a 9-term minimax odd polynomial (max err ~1e-7 rad,
  ~1 f32 ulp at pi/4) with the |x|>1 fold atan(x) = pi/2 - atan(1/x).
* **NCO steps split basis + delta**: step_q = round(basis/fs*2^40) is a
  compile-time integer; the in-kernel part is round(-code_nco * 2^40/fs),
  an i32.  The two roundings can differ from the f64 path's single
  rounding by 1 Q40 ulp (1e-12 chips/sample) — physically nil, but it
  means megakernel trajectories are their own numerical lineage: parity
  is tested against the float64 oracle (<1e-3 RMS, the same budget as the
  other correlator impls), not bit-compared to the XLA path.  Within the
  megakernel the recurrence is exactly reproducible, and segment
  boundaries round-trip the state losslessly (f32 values are exact in
  f64, digits are exact in int64), so resumed runs are bit-identical to
  uninterrupted ones (tests/test_megakernel.py).
* **Frames via Mosaic's own pipeline**: XLA stacks the block's per-ms
  static windows into an (r, C, win/pack) tensor (plain slices of the
  block buffer — no gather) and the grid streams (1, C, win/pack) frame
  blocks HBM->VMEM double-buffered, overlapping the correlator compute —
  replacing both the per-ms dynamic_slice and the per-call operand setup.

Per-ms correlator math (byte-plane unpack, carrier NCO via f32-mantissa
turns + polynomial sine, one-hot half-chip contraction against static
per-tile code tables on the MXU) is identical to track.pallas_kernel —
see that module and track.tables for the derivations.  Matches reference
tracking.py:132-275 (the whole per-ms hot loop including loop filters)
through the same equations.

State layout (VMEM scratch, both (C, 16)):
  stf f32: 0 code_nco, 1 code_err, 2 carr_nco, 3 carr_err, 4..9 pdi acc
  sti i32: 0 o (frame offset), 1 carr_phase, 2..5 rem digits, 6 ms
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.signals.nco import CODE_FRAC_BITS, CODE_ONE, sin_turns
from softgnss_tpu.track.pallas_kernel import PHASE_BIAS, grid_shape
from softgnss_tpu.track.tables import onehot_width, subdivision

#: chunk-size cap (tiles per span chunk): bigger chunks than the
#: per-ms kernel's 32 amortize the per-chunk fixed work (measured
#: v5e optimum; config.pallas_k_tiles overrides)
_MEGA_K_CAP = 75

_M16 = (1 << 16) - 1
_ND = 4

# minimax odd polynomial for atan(z), z in [-1, 1]: max err ~1.05e-7 rad
# evaluated in f32 (fit: least-squares with Lawson reweighting on 20k
# Chebyshev nodes; ~1 f32 ulp at pi/4)
_ATAN_CS = (0.9999998807907104, -0.33332598209381104, 0.19985906779766083,
            -0.14161226153373718, 0.10498934984207153, -0.07234836369752884,
            0.03978099301457405, -0.014401225373148918, 0.0024566929787397385)


def _atan_poly(x):
    """arctan(x) for any finite x, f32, via the |x|>1 fold."""
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.where(inv, ax, jnp.float32(1.0)), ax)
    z2 = z * z
    acc = jnp.float32(_ATAN_CS[-1])
    for c in _ATAN_CS[-2::-1]:
        acc = acc * z2 + jnp.float32(c)
    a = z * acc
    a = jnp.where(inv, jnp.float32(np.pi / 2) - a, a)
    return jnp.where(x < 0, -a, a)


# --- 4x16-bit digit arithmetic on i32 lanes ---------------------------------
# A value v (|v| < 2^62) is held as digits [d0, d1, d2, d3] with
# v = d0 + (d1 << 16) + (d2 << 32) + (d3 << 48); after _dnorm the low three
# digits are in [0, 2^16) and d3 carries the sign.  All ops are elementwise
# on (C, 1) i32 tensors, so digit math vectorizes over channels.

def _dnorm(d):
    out, c = [], None
    for i in range(_ND - 1):
        t = d[i] if c is None else d[i] + c
        out.append(t & _M16)
        c = t >> 16                     # arithmetic shift: signed carries work
    out.append(d[_ND - 1] + c)
    return out


def _dadd(a, b):
    return _dnorm([x + y for x, y in zip(a, b)])


def _dsub(a, b):
    return _dnorm([x - y for x, y in zip(a, b)])


def _dmul_small(a, m):
    """Digits times a scalar multiplier with |m| < 2^15 (partials and
    carries stay inside int32: |d*m| < 2^31 - 2^16)."""
    return _dnorm([x * m for x in a])


def _dmul_u16(a, m):
    """Digits times a scalar in [0, 2^16): split the multiplier so every
    partial fits int32."""
    lo = m & 0x1FF                       # < 2^9
    hi = m >> 9                          # < 2^7
    r = _dmul_small(a, lo)
    return _dadd(r, _dmul_small(_dmul_small(a, hi), 1 << 9))


def _dconst(v: int):
    """Python int -> static digit list (broadcastable scalars)."""
    return [jnp.int32((v >> (16 * i)) & _M16) for i in range(_ND - 1)] + [
        jnp.int32(v >> (16 * (_ND - 1)))]


def _dfloat(d):
    """Approximate f32 value of a digit vector (for quotient estimates)."""
    return (d[0].astype(jnp.float32)
            + d[1].astype(jnp.float32) * jnp.float32(65536.0)
            + d[2].astype(jnp.float32) * jnp.float32(4294967296.0)
            + d[3].astype(jnp.float32) * jnp.float32(281474976710656.0))


def _dneg_mask(d):
    """1 where the (normalized) digit value is < 0, else 0 — i32."""
    return (d[_ND - 1] < 0).astype(jnp.int32)


def _dwhere(m_bool, a, b):
    return [jnp.where(m_bool, x, y) for x, y in zip(a, b)]


def _read_d(ref, base):
    return [ref[:, base + i:base + i + 1] for i in range(_ND)]


def _round_f32_to_i32(x, bound: float):
    """floor(x + 0.5) clamped to +-bound — the in-kernel rounding.  (The
    f64 path uses round-half-even; they differ only at exact .5 inputs, a
    measure-zero event on filter outputs.)  NB: jnp.clip with Python
    scalar bounds makes weak f64/i64 constants under x64, which Mosaic's
    convert lowering recurses on — bounds must be typed."""
    c = jnp.minimum(jnp.maximum(x, jnp.float32(-bound)), jnp.float32(bound))
    return jnp.floor(c + jnp.float32(0.5)).astype(jnp.int32)


def _kernel(frames_ref, codes_ref, hb_ref, ci_ref, sf_ref, si_ref,
            ysf_ref, ysi_ref, sfo_ref, sio_ref, stf, sti, *,
            config: ReceiverConfig, r: int, pack: int, tile: int,
            w_oh: int):
    """One grid step = one millisecond, all channels, all planes/tiles
    statically unrolled.  See module docstring for the state layout."""
    j = pl.program_id(0)

    win_pk = config.track_window // pack
    t_pp = win_pk // tile                           # tiles per byte plane
    fs = config.sampling_freq
    s_div = subdivision(config)
    spc = config.samples_per_code
    K = config.pdi_ms
    tau1c, tau2c = config.pll_taus
    tau1d, tau2d = config.dll_taus
    pdi = config.pdi_s
    k1 = float(CODE_ONE) / fs                       # Hz -> Q40 step delta
    k2 = float(2**32) / fs                          # Hz -> u32 step delta
    sb = _dconst(int(round(config.code_freq_basis / fs * CODE_ONE)))
    len_q = _dconst(config.code_length * CODE_ONE)
    a_const = _dconst((CODE_ONE - 1) + (PHASE_BIAS << CODE_FRAC_BITS))
    two_pi = jnp.float32(2.0 * np.pi)

    active = ci_ref[:, 1:2] != 0                    # (C, 1) bool
    activef = active.astype(jnp.float32)

    @pl.when(j == 0)
    def _init():
        stf[...] = sf_ref[...]
        sti[...] = si_ref[...]

    # --- per-ms prologue: NCO steps and exact block length ------------------
    code_nco = stf[:, 0:1]
    carr_nco = stf[:, 2:3]
    aid_hz = jnp.float32(0.0)
    if config.carrier_aided_dll:
        # stf lane 10 carries the static per-channel ratio*(acquired-IF)
        # Doppler part; the dynamic part rides carr_nco (config docstring)
        ratio = jnp.float32(config.code_freq_basis / config.l1_freq)
        aid_hz = stf[:, 10:11] + ratio * carr_nco
    delta_c = _round_f32_to_i32((aid_hz - code_nco) * jnp.float32(k1),
                                2.0**30)
    step = _dnorm([sb[0] + delta_c, sb[1] + delta_c * 0,
                   sb[2] + delta_c * 0, sb[3] + delta_c * 0])
    w_carr = ci_ref[:, 0:1] + _round_f32_to_i32(
        carr_nco * jnp.float32(k2), 2.0**30)
    rem = _read_d(sti, 2)
    numer = _dsub(len_q, rem)                        # >= 0
    est = jnp.floor(_dfloat(numer) / _dfloat(step)).astype(jnp.int32)
    est = jnp.minimum(jnp.maximum(est, jnp.int32(0)), jnp.int32(_M16))
    d = _dsub(_dmul_u16(step, est), numer)           # step*est - numer
    for _ in range(2):                               # est too small: d < 0
        low = _dneg_mask(d)
        est = est + low
        d = _dwhere(low != 0, _dadd(d, step), d)
    for _ in range(2):                               # est too big: d-step >= 0
        d2 = _dsub(d, step)
        high = jnp.logical_and(_dneg_mask(d2) == 0, est > 0)
        est = est - high.astype(jnp.int32)
        d = _dwhere(high, d2, d)
    blk = est
    rem_new = d                                      # = rem + step*blk - len_q

    o = sti[:, 0:1]
    rem_eff = _dsub(rem, _dmul_small(step, o))
    a0 = _dadd(_dmul_small(rem_eff, s_div), a_const)
    s_q = _dmul_small(step, s_div)
    sp = _dmul_small(s_q, pack)
    sp0, sp1 = sp[0], sp[1]
    sp2 = sp[2] + (sp[3] << 16)
    phase_eff = sti[:, 1:2] - w_carr * o

    # --- correlate: static loops over (byte plane, span chunk); the code
    # lookup is a span-wide VARIABLE BIT SHIFT, not a one-hot contraction.
    # Each tile's E/P/L sub-chip code values are +-1, so they pack into
    # ceil(w/32) uint32 words per (channel, tap, tile); the per-sample code
    # value is ((word >> h_local) & 1)*2 - 1 after a per-lane broadcast of
    # the tile words (jnp.repeat).  This replaces the per-ms kernel's
    # (C, w, tile) one-hot build + MXU dot with ~8 elementwise ops per tap
    # — and, critically, it has NO per-tile temporaries: Mosaic allocates
    # unrolled per-tile intermediates without stack reuse, which blew the
    # 16 MB scoped-VMEM limit at 300 tiles/ms (the bisect is
    # scripts/mega_vmem_bisect.py).
    n_words = (w_oh + 31) // 32
    k_tiles, t_groups = grid_shape(config, default_cap=_MEGA_K_CAP)
    span = k_tiles * tile
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
    bias = jnp.int32(PHASE_BIAS)
    # six span-wide accumulators, reduced to scalars ONCE at the end of the
    # ms: per-chunk lane reductions (60/ms) cost more than all the
    # elementwise tap math combined
    acc_sp = [None] * 6
    for b in range(pack):
        a_b = _dadd(a0, _dmul_small(s_q, b))         # plane phase base
        for gch in range(t_groups):
            x32 = frames_ref[0, :, gch * span:(gch + 1) * span].astype(
                jnp.int32)                           # (C, span)
            v = ((x32 << (24 - 8 * b)) >> 24).astype(jnp.float32)
            k_base = b + pack * span * gch
            kk = k_base + pack * lane
            mask = jnp.logical_and(kk >= o, kk < o + blk)
            raw = jnp.where(mask, v, jnp.float32(0.0))

            counts = (phase_eff + w_carr * k_base) + (w_carr * pack) * lane
            u32 = pltpu.bitcast(counts, jnp.uint32)
            mant = (u32 >> 9) | jnp.uint32(0x3F800000)
            turns = pltpu.bitcast(mant, jnp.float32) - jnp.float32(1.0)
            bb_i = sin_turns(turns) * raw            # (C, span)
            bb_q = sin_turns(turns + jnp.float32(0.25)) * raw

            a_g = _dadd(a_b, _dmul_u16(_dmul_small(s_q, pack * gch), span))
            a0l, a1l = a_g[0], a_g[1]
            a2l = a_g[2] + (a_g[3] << 16)
            t0 = a0l + sp0 * lane                    # (C, span)
            t1 = a1l + sp1 * lane + (t0 >> 16)
            t2 = a2l + sp2 * lane + (t1 >> 16)
            hrel = t2 >> 8

            gb = b * t_groups + gch                  # chunk index
            # tables come pre-reshaped to (..., G, k_tiles) so every
            # in-kernel slice starts at lane 0 — Mosaic's repeat/reshape
            # lowering rejects lane-offset slices at some widths
            hb_lane = jnp.repeat(hb_ref[:, gb, :], tile, axis=1)
            h_local = hrel - (hb_lane + bias)        # (C, span)
            # No in-window gate on cv: any sample whose h_local leaves the
            # table window is masked (raw == 0 -> bb == 0), so cv*bb == 0
            # for ANY finite cv — the overflow check (mega_track_segment /
            # _frame_overflow) guarantees unmasked samples stay in
            # coverage.  Only the shift amount needs clamping.
            hc0 = jnp.minimum(jnp.maximum(h_local, jnp.int32(0)),
                              jnp.int32(31))
            for x in range(3):                       # E / P / L taps
                if n_words == 1:
                    bits_lane = jnp.repeat(
                        codes_ref[:, x, 0, gb, :], tile, axis=1)
                    valbit = (bits_lane >> hc0) & 1
                else:
                    valbit = jnp.zeros_like(h_local)
                    for u in range(n_words):
                        bits_lane = jnp.repeat(
                            codes_ref[:, x, u, gb, :], tile, axis=1)
                        hs = h_local - 32 * u
                        sel = jnp.logical_and(hs >= 0, hs < 32)
                        hc = jnp.minimum(jnp.maximum(hs, jnp.int32(0)),
                                         jnp.int32(31))
                        valbit = jnp.where(sel, (bits_lane >> hc) & 1,
                                           valbit)
                cv = (2 * valbit - 1).astype(jnp.float32)
                ti = cv * bb_i
                tq = cv * bb_q
                acc_sp[x] = ti if acc_sp[x] is None else acc_sp[x] + ti
                acc_sp[3 + x] = (tq if acc_sp[3 + x] is None
                                 else acc_sp[3 + x] + tq)

    corr = [jnp.sum(a, axis=1, keepdims=True) for a in acc_sp]

    # --- loop filters + state update + outputs -------------------------------
    ms = sti[:, 6:7]
    if K > 1:
        acc6 = [stf[:, 4 + i:5 + i] + corr[i] for i in range(6)]
        upd = (ms % K) == (K - 1)
    else:
        acc6 = corr
        upd = None
    a_ie, a_ip, a_il, a_qe, a_qp, a_ql = acc6

    # PLL (reference tracking.py:221-235), f32 + polynomial atan
    safe_ip = jnp.where(a_ip != 0, a_ip, jnp.float32(1.0))
    carr_err = jnp.where(a_ip != 0, _atan_poly(a_qp / safe_ip),
                         jnp.float32(0.0)) / two_pi
    carr_nco_n = (stf[:, 2:3]
                  + jnp.float32(tau2c / tau1c) * (carr_err - stf[:, 3:4])
                  + carr_err * jnp.float32(pdi / tau1c))
    if config.fll_bandwidth_hz > 0:
        # FLL assist: bit-insensitive cross/dot over consecutive prompt
        # sums (stf lanes 11/12 carry the previous update's I_P/Q_P)
        ip_prev = stf[:, 11:12]
        qp_prev = stf[:, 12:13]
        cross = ip_prev * a_qp - qp_prev * a_ip
        dot = ip_prev * a_ip + qp_prev * a_qp
        safe_dot = jnp.where(dot != 0, dot, jnp.float32(1.0))
        ferr = jnp.where(dot != 0, _atan_poly(cross / safe_dot),
                         jnp.float32(0.0)) / jnp.float32(2.0 * np.pi * pdi)
        carr_nco_n = carr_nco_n + jnp.float32(
            4.0 * config.fll_bandwidth_hz * pdi) * ferr
    # DLL (reference tracking.py:237-251)
    e_mag = jnp.sqrt(a_ie * a_ie + a_qe * a_qe)
    l_mag = jnp.sqrt(a_il * a_il + a_ql * a_ql)
    s_el = e_mag + l_mag
    denom = jnp.where(s_el > 0, s_el, jnp.float32(1.0))
    code_err = jnp.where(s_el > 0, (e_mag - l_mag) / denom, jnp.float32(0.0))
    code_nco_n = (stf[:, 0:1]
                  + jnp.float32(tau2d / tau1d) * (code_err - stf[:, 1:2])
                  + code_err * jnp.float32(pdi / tau1d))

    if K > 1:
        carr_err = jnp.where(upd, carr_err, stf[:, 3:4])
        carr_nco_n = jnp.where(upd, carr_nco_n, stf[:, 2:3])
        code_err = jnp.where(upd, code_err, stf[:, 1:2])
        code_nco_n = jnp.where(upd, code_nco_n, stf[:, 0:1])
        acc_new = [jnp.where(upd, jnp.float32(0.0), a) for a in acc6]
        fll_new = (jnp.where(upd, a_ip, stf[:, 11:12]),
                   jnp.where(upd, a_qp, stf[:, 12:13]))
    else:
        acc_new = [stf[:, 4 + i:5 + i] for i in range(6)]
        fll_new = (a_ip, a_qp)

    frac = _dfloat(rem_new) / _dfloat(step)

    # per-slot stores: Mosaic's tpu.concatenate miscompiles wide fan-in
    # concats of (C, 1) vectors, so outputs and state are written lane by
    # lane (each store is a cheap masked (C, 16) op)
    for i in range(6):
        ysf_ref[0, :, i:i + 1] = corr[i] * activef
    ysf_ref[0, :, 6:7] = code_err * activef
    ysf_ref[0, :, 7:8] = code_nco_n * activef
    ysf_ref[0, :, 8:9] = carr_err * activef
    ysf_ref[0, :, 9:10] = carr_nco_n * activef
    ysf_ref[0, :, 10:11] = frac * activef
    ysf_ref[0, :, 11:16] = jnp.zeros((activef.shape[0], 5), jnp.float32)
    ai32 = active.astype(jnp.int32)
    ysi_ref[0, :, 0:1] = blk * ai32
    ysi_ref[0, :, 1:2] = o
    ysi_ref[0, :, 2:8] = jnp.zeros((activef.shape[0], 6), jnp.int32)

    stf[:, 0:1] = jnp.where(active, code_nco_n, stf[:, 0:1])
    stf[:, 1:2] = jnp.where(active, code_err, stf[:, 1:2])
    stf[:, 2:3] = jnp.where(active, carr_nco_n, stf[:, 2:3])
    stf[:, 3:4] = jnp.where(active, carr_err, stf[:, 3:4])
    for i in range(6):
        stf[:, 4 + i:5 + i] = jnp.where(active, acc_new[i],
                                        stf[:, 4 + i:5 + i])
    stf[:, 11:12] = jnp.where(active, fll_new[0], stf[:, 11:12])
    stf[:, 12:13] = jnp.where(active, fll_new[1], stf[:, 12:13])
    sti[:, 0:1] = jnp.where(active, o + blk - spc, sti[:, 0:1])
    sti[:, 1:2] = jnp.where(active, sti[:, 1:2] + w_carr * blk, sti[:, 1:2])
    for i in range(_ND):
        sti[:, 2 + i:3 + i] = jnp.where(active, rem_new[i],
                                        sti[:, 2 + i:3 + i])
    sti[:, 6:7] = jnp.where(active, ms + 1, sti[:, 6:7])

    @pl.when(j == r - 1)
    def _final():
        sfo_ref[...] = stf[...]
        sio_ref[...] = sti[...]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _mega_call(config: ReceiverConfig, r: int, frames, codes_t, hb,
               consts_i, state_f, state_i):
    """Invoke the megakernel on ``r`` stacked frames.  Returns
    (ys_f (r,C,16), ys_i (r,C,8), state_f' (C,16), state_i' (C,16))."""
    c = frames.shape[1]
    pack = config.track_pack
    tile = config.track_tile
    w_oh = onehot_width(config)
    win_pk = config.track_window // pack
    assert win_pk <= 1 << 15, (
        "track window too large for the in-kernel 16-bit phase-digit ramp")
    assert config.samples_per_code + 64 < 1 << 16, (
        "samples_per_code too large for the in-kernel u16 block math")

    k_tiles, t_groups = grid_shape(config, default_cap=_MEGA_K_CAP)
    g = pack * t_groups
    kernel = functools.partial(
        _kernel, config=config, r=r, pack=pack, tile=tile, w_oh=w_oh)
    zmap2 = lambda j: (j * 0, j * 0)                 # noqa: E731
    zmap3 = lambda j: (j * 0, j * 0, j * 0)          # noqa: E731
    zmap5 = lambda j: (j * 0, j * 0, j * 0, j * 0, j * 0)   # noqa: E731
    ysf, ysi, sfo, sio = pl.pallas_call(
        kernel,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, c, win_pk), lambda j: (j, j * 0, j * 0)),
            pl.BlockSpec((c, 3, (w_oh + 31) // 32, g, k_tiles), zmap5),
            pl.BlockSpec((c, g, k_tiles), zmap3),
            pl.BlockSpec((c, 8), zmap2),
            pl.BlockSpec((c, 16), zmap2),
            pl.BlockSpec((c, 16), zmap2),
        ],
        out_specs=(
            pl.BlockSpec((1, c, 16), lambda j: (j, j * 0, j * 0)),
            pl.BlockSpec((1, c, 8), lambda j: (j, j * 0, j * 0)),
            pl.BlockSpec((c, 16), zmap2),
            pl.BlockSpec((c, 16), zmap2),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, c, 16), jnp.float32),
            jax.ShapeDtypeStruct((r, c, 8), jnp.int32),
            jax.ShapeDtypeStruct((c, 16), jnp.float32),
            jax.ShapeDtypeStruct((c, 16), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c, 16), jnp.float32),   # stf
            pltpu.VMEM((c, 16), jnp.int32),     # sti
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=jax.default_backend() != "tpu",
    )(frames, codes_t, hb, consts_i, state_f, state_i)
    return ysf, ysi, sfo, sio


def _digits_i64(v):
    """(C,) int64 -> (C, 4) i32 digits (low three in [0, 2^16))."""
    return jnp.stack(
        [((v >> (16 * i)) & _M16).astype(jnp.int32) for i in range(_ND - 1)]
        + [(v >> (16 * (_ND - 1))).astype(jnp.int32)], axis=1)


def _i64_from_digits(d):
    """(C, 4) i32 digits -> (C,) int64."""
    acc = d[:, _ND - 1].astype(jnp.int64)
    for i in range(_ND - 2, -1, -1):
        acc = (acc << 16) + d[:, i].astype(jnp.int64)
    return acc


def mega_track_segment(config: ReceiverConfig, frames, fb0, codes_t, hb,
                       carr_basis, active, st):
    """Track ``r = frames.shape[0]`` consecutive milliseconds for all
    channels in one fused kernel call.

    ``frames``: (r, C, track_window/pack) packed windows; frame ``i``'s
    element 0 is absolute capture sample ``fb0 + i*samples_per_code``
    (``fb0``: (C,) int64).  Returns (new_state, MsOutputs with (r, C)
    leaves, overflow) — the same contract as scanning
    scan._frame_ms_packed over the frames, with this kernel's own f32
    loop-filter numerics (module docstring).
    """
    from softgnss_tpu.signals.nco import carrier_step_u32
    from softgnss_tpu.track.scan import (MsOutputs, TrackState,
                                         _frame_overflow)

    r = frames.shape[0]
    fs = config.sampling_freq

    o0 = (st.ptr - fb0).astype(jnp.int32)
    w_basis = carrier_step_u32(carr_basis, fs)
    consts_i = jnp.stack(
        [w_basis, active.astype(jnp.int32)] + [jnp.zeros_like(w_basis)] * 6,
        axis=1)

    z32 = jnp.zeros_like(o0, dtype=jnp.float32)
    ratio = config.code_freq_basis / config.l1_freq
    aid0 = (ratio * (carr_basis - config.intermediate_freq)).astype(
        jnp.float32)                       # static Doppler part of aiding
    state_f = jnp.stack(
        [st.code_nco.astype(jnp.float32), st.code_err.astype(jnp.float32),
         st.carr_nco.astype(jnp.float32), st.carr_err.astype(jnp.float32)]
        + [getattr(st, f) for f in
           ("acc_i_e", "acc_i_p", "acc_i_l", "acc_q_e", "acc_q_p", "acc_q_l")]
        + [aid0, st.fll_ip, st.fll_qp] + [z32] * 3, axis=1)
    rem_d = _digits_i64(st.code_rem_q)
    state_i = jnp.concatenate(
        [o0[:, None], st.carr_phase[:, None], rem_d,
         st.ms.astype(jnp.int32)[:, None],
         jnp.zeros((o0.shape[0], 9), jnp.int32)], axis=1)

    ysf, ysi, sfo, sio = _mega_call(config, r, frames, codes_t, hb,
                                    consts_i, state_f, state_i)

    blk = ysi[:, :, 0].astype(jnp.int64)                     # (r, C)
    ptr_series = st.ptr[None, :] + jnp.cumsum(blk, axis=0)
    o_entry = ysi[:, :, 1].astype(jnp.int64)
    ovf = jax.vmap(lambda o, bl: _frame_overflow(config, active, o, bl))(
        o_entry, blk).max()

    basis = jnp.float64(config.code_freq_basis)
    code_nco = ysf[:, :, 7].astype(jnp.float64)
    carr_nco = ysf[:, :, 9].astype(jnp.float64)
    if config.carrier_aided_dll:
        aid_series = aid0.astype(jnp.float64)[None, :] + ratio * carr_nco
        aid_final = (aid0.astype(jnp.float64)
                     + ratio * sfo[:, 2].astype(jnp.float64))
    else:
        aid_series = jnp.float64(0.0)
        aid_final = jnp.float64(0.0)
    zf = jnp.float64(0.0)
    outs = MsOutputs(
        absolute_sample=jnp.where(active[None, :], ptr_series, jnp.int64(0)),
        sample_frac=ysf[:, :, 10].astype(jnp.float64),
        code_freq=jnp.where(active[None, :],
                            basis - code_nco + aid_series, zf),
        carr_freq=jnp.where(active[None, :],
                            carr_basis[None, :] + carr_nco, zf),
        i_p=ysf[:, :, 1], i_e=ysf[:, :, 0], i_l=ysf[:, :, 2],
        q_e=ysf[:, :, 3], q_p=ysf[:, :, 4], q_l=ysf[:, :, 5],
        dll_discr=ysf[:, :, 6].astype(jnp.float64),
        dll_discr_filt=code_nco,
        pll_discr=ysf[:, :, 8].astype(jnp.float64),
        pll_discr_filt=carr_nco,
    )

    new = TrackState(
        ptr=ptr_series[-1],
        carr_phase=sio[:, 1],
        code_rem_q=_i64_from_digits(sio[:, 2:6]),
        carr_freq=jnp.where(active, carr_basis
                            + sfo[:, 2].astype(jnp.float64), st.carr_freq),
        code_freq=jnp.where(active, basis - sfo[:, 0].astype(jnp.float64)
                            + aid_final, st.code_freq),
        carr_nco=jnp.where(active, sfo[:, 2].astype(jnp.float64), st.carr_nco),
        carr_err=jnp.where(active, sfo[:, 3].astype(jnp.float64), st.carr_err),
        code_nco=jnp.where(active, sfo[:, 0].astype(jnp.float64), st.code_nco),
        code_err=jnp.where(active, sfo[:, 1].astype(jnp.float64), st.code_err),
        ms=sio[:, 6].astype(jnp.int64),
        block_base=st.block_base,
        acc_i_e=sfo[:, 4], acc_i_p=sfo[:, 5], acc_i_l=sfo[:, 6],
        acc_q_e=sfo[:, 7], acc_q_p=sfo[:, 8], acc_q_l=sfo[:, 9],
        fll_ip=sfo[:, 11], fll_qp=sfo[:, 12],
    )
    return new, outs, ovf


def mega_tables(config: ReceiverConfig, tables):
    """Bit-packed code tables (C, 3, n_words, G, k_tiles) i32 + one-hot
    bases (C, G, k_tiles) i32, where G = pack * t_groups chunks of
    k_tiles tiles each (tile t = gb*k_tiles + k).

    bits[c, x, u, gb, k] holds sub-chip code values u*32..u*32+31 of tap
    x (E/P/L) at that tile as sign bits (1 = +1 chip): the kernel's
    per-sample code lookup is ``((bits >> h_local) & 1)*2 - 1`` — see
    _kernel.  Bit h of an int32 survives ARITHMETIC
    right-shift-then-mask, so the u32 patterns are stored bit-exactly in
    i32.  The chunk axis is explicit so every in-kernel slice starts at
    lane 0 (Mosaic's repeat lowering rejects lane-offset slices at some
    chunk widths)."""
    cs = jnp.asarray(tables.codes_static)            # (C, T, w, 3) +-1 f32
    c, t_count, w, _ = cs.shape
    n_words = (w + 31) // 32
    k_tiles, t_groups = grid_shape(config, default_cap=_MEGA_K_CAP)
    g = config.track_pack * t_groups
    pos = jnp.transpose(cs > 0, (0, 3, 1, 2)).astype(jnp.int32)  # (C,3,T,w)
    words = []
    for u in range(n_words):
        wsl = pos[:, :, :, 32 * u:min(w, 32 * u + 32)]
        sh = jnp.arange(wsl.shape[-1], dtype=jnp.int32)
        # disjoint bits: the sum is carry-free (== bitwise OR); bit 31's
        # i32 wraparound is the intended two's-complement pattern
        words.append(jnp.sum(wsl << sh, axis=-1).astype(jnp.int32))
    codes_bits = jnp.stack(words, axis=2)            # (C, 3, n_words, T)
    codes_bits = codes_bits.reshape(c, 3, n_words, g, k_tiles)
    hb = jnp.asarray(tables.h_base).astype(jnp.int32).reshape(c, g, k_tiles)
    return codes_bits, hb
