"""Multi-millisecond fused tracking kernel: a whole block per ``pallas_call``.

One ``pallas_call`` processes an entire ``track_block_ms`` block with the
complete DLL/PLL loop state carried in VMEM scratch across a
``grid=(block_ms,)`` — one grid step is one whole millisecond, all
channels.  This amortizes the ~14 us per-launch cost that dominated the
per-ms fused kernel (track.pallas_kernel) and keeps every per-ms
dependency (loop filters, exact Q40/uint32 NCOs) inside the kernel.
Matches reference tracking.py:132-275 (the whole per-ms hot loop
including loop filters) through the same equations.

Round-5 design (see BASELINE.md for the measured history):

* **Frames via in-kernel DMA, not XLA assembly.**  The per-channel block
  buffer (sliced from the int32 capture view) stays in HBM; each grid
  step copies one (C, win/4 + 128) i32 slab at a 128-word-aligned offset
  into a single VMEM slab — the next millisecond's copy is issued right
  after the correlator's last read, hiding it behind the loop-filter
  tail and the next prologue (a two-slot buffer would force dynamic-slot
  VMEM reads, which Mosaic resolves with per-chunk copies).  The <= 511-sample alignment residual rides the in-frame offset
  ``o``.  This removes the round-3 (r, C, win/pack) frame-stack assembly
  that cost ~7 us/step of HBM round-trips at ~55 GB/s.  Offsets are
  anchored at the ABSOLUTE millisecond (static ``p0`` = block phase), so a
  resumed run reads bit-identical frames (tests/test_megakernel.py).
* **Packed channel rows** (tables.mega_split, :func:`mega_rows`): Mosaic
  prices a sublane-misaligned (12, span) tensor WORSE than an aligned
  (16, span) one, so each channel's window is stored as S row pieces
  (row q*C + c = piece q of channel c) and every per-sample tensor
  carries S*C REAL rows padded once, as a whole, to the 8-row tile —
  zero pad at the reference C=12.  Per-channel scalars expand q-major
  through a VMEM scratch (``exs``); the six piece sums fold back per
  channel after the chunk loop.
* **Per-LANE joint code tables** (tables.mega_lane_tables): static i32
  words per capture sample position hold the E/P/L code signs as
  adjacent bits of a joint window PLUS the lane's sub-chip base offset.
  The per-sample code lookup is one funnel shift + three bit tests — a
  SINGLE logical shift at front ends whose joint window fits one word
  (mega_n_words == 1, the reference geometry).
* **Shared per-ms lane tables**: the carrier sin/cos of the per-lane NCO
  ramp and the Q40 digit-ramp lane products are computed once per
  millisecond and reused by every chunk; each chunk combines the
  carrier by the angle-addition identity from a per-channel scalar
  rotation (exact in phase — the integer turns split mod 2^32; ~1e-7
  f32 rounding in the combination).
* **Shared-fold sine/cosine** (:func:`_sincos_counts`): quadrant folding
  happens once on the integer NCO counts; one odd + one even minimax
  polynomial produce sin and cos together (~2e-7 max error, tighter than
  the separate sin_turns calls it replaces).
* **No tensor left-shifts** in the digit pairings: the 2026-08 libtpu
  miscompiles ``(rows, 1) << 16`` to 0 inside this kernel (hardware
  only — interpret mode is fine), so pairings use ``* 65536``; see the
  ``sp2`` note and scripts/oracle_check.py for the hardware regression
  check.
* **Exact Q40 code NCO in 16-bit-digit int32 arithmetic** (Mosaic has no
  int64): block length ``blk = ceil((1023 chips - rem)/step)``, remainder
  update, and the per-lane sub-chip phase ramp are computed on 4x16-bit
  digit vectors with carry normalization — exact integer arithmetic, the
  same sequences as the XLA path's int64.
* **Loop filters in float32 with a polynomial arctan** (Mosaic lowers
  neither f64 nor atan).  The discriminator/filter equations are the
  reference's (tracking.py:221-249) in f32: discriminators are
  noise-dominated and the filter accumulators are O(kHz) corrections
  where f32's 2^-24 relative error is ~1e-4 Hz — far below the u32
  carrier-NCO quantization (fs/2^32 ~ 0.009 Hz) and the tracking noise
  floor.  NCO steps split basis + delta as in round 3, so megakernel
  trajectories are their own numerical lineage: parity is tested against
  the float64 oracle (<1e-3 RMS), and segment boundaries round-trip the
  state losslessly, so resumed runs are bit-identical to uninterrupted
  ones.
* **Single f32 output array** (r, C, 16): correlators, discriminators,
  filter states, boundary fraction, block length, and frame offset — the
  round-3 i32 output array and its dead zero lanes are gone.

State layout (VMEM scratch, both (C, 16)):
  stf f32: 0 code_nco, 1 code_err, 2 carr_nco, 3 carr_err, 4..9 pdi acc,
           10 static aiding, 11/12 FLL prompt memory
  sti i32: 0 P_rel (ptr - buffer start), 1 carr_phase, 2..5 rem digits,
           6 ms
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.signals.nco import CODE_FRAC_BITS, CODE_ONE
from softgnss_tpu.track.tables import (
    MEGA_ALIGN_W,
    MEGA_PACK,
    MEGA_PHASE_BIAS,
    mega_grid,
    mega_n_words,
    mega_o_cov,
    mega_split,
    mega_window,
    subdivision,
)

_M16 = (1 << 16) - 1
_ND = 4

# minimax odd polynomial for atan(z), z in [-1, 1]: max err ~1.05e-7 rad
# evaluated in f32 (fit: least-squares with Lawson reweighting on 20k
# Chebyshev nodes; ~1 f32 ulp at pi/4)
_ATAN_CS = (0.9999998807907104, -0.33332598209381104, 0.19985906779766083,
            -0.14161226153373718, 0.10498934984207153, -0.07234836369752884,
            0.03978099301457405, -0.014401225373148918, 0.0024566929787397385)

# minimax polynomials for sin(2 pi f) (odd, deg 9) and cos(2 pi f) (even,
# deg 8) on f in [-0.25, 0.25]; max err ~2e-7 in f32 (Lawson-reweighted
# least squares)
_SIN_CS = (6.283185005187988, -41.34165573120117, 81.60100555419922,
           -76.5498275756836, 39.53703689575195)
_COS_CS = (0.9999999403953552, -19.739171981811523, 64.9345932006836,
           -85.24040222167969, 56.24303436279297)


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


def _sincos_counts(counts):
    """(sin, cos) of a uint32-turns carrier NCO phase held in int32.

    Quadrant folding in the exact integer domain: ``qp = counts + 2^30``
    wraps mod 2^32; its sign bit is the half-turn parity and its low 31
    bits (re-centered) are the residual phase in [-0.25, 0.25) turns —
    sin(2 pi t) = (-1)^q sin(2 pi f), cos likewise.  One int->f32
    convert feeds both polynomials.
    """
    qp = counts + jnp.int32(0x40000000)
    fc = (qp & jnp.int32(0x7FFFFFFF)) - jnp.int32(0x40000000)
    f = fc.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    t2 = f * f
    s = jnp.float32(_SIN_CS[-1])
    for c in _SIN_CS[-2::-1]:
        s = s * t2 + jnp.float32(c)
    s = s * f
    co = jnp.float32(_COS_CS[-1])
    for c in _COS_CS[-2::-1]:
        co = co * t2 + jnp.float32(c)
    sgn = jnp.where(qp < 0, jnp.float32(-1.0), jnp.float32(1.0))
    return s * sgn, co * sgn


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


def _split_row_pieces(c, base, n_out, half_w, c_dim):
    """Static pieces mapping window words [base, base+n_out) of channel
    ``c`` to the q-major split-row frame layout: word w lives at row
    (w // half_w)*c_dim + c, column w % half_w (S=1 collapses to the
    plain per-channel row).  Shared by the separate frames builder and
    the fused-kernel prologue so their layouts stay provably identical.
    Yields (row, col, n, off)."""
    off = 0
    while off < n_out:
        q = (base + off) // half_w
        col = (base + off) % half_w
        n = min(n_out - off, half_w - col)
        yield q * c_dim + c, col, n, off
        off += n


def _kernel(frames_ref, *rest, config: ReceiverConfig, r: int,
            fused: bool = False, c_real: int | None = None):
    """One grid step = one millisecond, all channels, all chunks statically
    unrolled.  See module docstring for the state layout.

    ``fused=False``: per-ms frames arrive as a pipelined BlockSpec input
    (pre-built in HBM by :func:`build_frames`).  ``fused=True``: the
    builder's slab-DMA + sliding-roll prologue runs INSIDE this kernel
    (``frames_ref`` is then the scalar-prefetched frame word offsets and
    ``rest[0]`` the (1, L) int32 capture slice in ANY memory space);
    frames live only in a VMEM scratch and the (r, C, win/4) HBM frames
    array plus its write+read round-trip disappear."""
    n_tab = mega_n_words(config)
    if fused:
        starts_ref = frames_ref
        cap_ref = rest[0]
        tab_refs = rest[1:1 + n_tab]
        (hb0_ref, ci_ref, sf_ref, si_ref, ys_ref, sfo_ref, sio_ref,
         stf, sti, exs, slab, sems, fr) = rest[1 + n_tab:]
    else:
        tab_refs = rest[:n_tab]
        (hb0_ref, ci_ref, sf_ref, si_ref,
         ys_ref, sfo_ref, sio_ref, stf, sti, exs) = rest[n_tab:]
    pack = MEGA_PACK
    tile = config.track_tile
    spc = config.samples_per_code
    k_tiles, t_groups = mega_grid(config)
    span = k_tiles * tile
    fs = config.sampling_freq
    s_div = subdivision(config)
    ds = int(round(config.dll_correlator_spacing * s_div))
    K = config.pdi_ms
    tau1c, tau2c = config.pll_taus
    tau1d, tau2d = config.dll_taus
    pdi = config.pdi_s
    k1 = float(CODE_ONE) / fs                       # Hz -> Q40 step delta
    k2 = float(2**32) / fs                          # Hz -> u32 step delta
    sb = _dconst(int(round(config.code_freq_basis / fs * CODE_ONE)))
    len_q = _dconst(config.code_length * CODE_ONE)
    # ceil bias + the phase bias matching hb0 = base + MEGA_PHASE_BIAS
    a_const = _dconst((CODE_ONE - 1) + (MEGA_PHASE_BIAS << CODE_FRAC_BITS))
    two_pi = jnp.float32(2.0 * np.pi)

    j = pl.program_id(0)

    active = ci_ref[:, 1:2] != 0                    # (C, 1) bool
    activef = active.astype(jnp.float32)

    @pl.when(j == 0)
    def _init():
        stf[...] = sf_ref[...]
        sti[...] = si_ref[...]

    s_split = mega_split(config)
    half_w = mega_window(config) // pack // s_split
    if fused:
        # --- in-kernel frames: slab DMA + sliding-roll residual shift ------
        # (the _builder_kernel prologue, writing the VMEM frame scratch
        # ``fr`` instead of an HBM frames array; next-ms copies issued per
        # channel right after its rolls, hiding them behind the correlator)
        win_w = mega_window(config) // pack
        w_slab = win_w + MEGA_ALIGN_W
        spc_w = spc // pack
        c_dim = c_real if c_real is not None else ci_ref.shape[0]
        W = min(2048, 1 << (w_slab.bit_length() - 1))
        fresh = W - MEGA_ALIGN_W
        assert fresh > 0, f"slab too narrow for the roll window ({w_slab})"

        def _start(jj, c):
            al = pl.multiple_of(
                jnp.int32((starts_ref[c] + jj * spc_w >> 7) << 7),
                MEGA_ALIGN_W)
            pltpu.make_async_copy(cap_ref.at[:, pl.ds(al, w_slab)],
                                  slab.at[jnp.int32(c)],
                                  sems.at[jnp.int32(c)]).start()

        @pl.when(j == 0)
        def _prime():
            for c in range(c_dim):
                _start(0, c)

        for c in range(c_dim):
            f = starts_ref[c] + j * spc_w
            al = pl.multiple_of(jnp.int32((f >> 7) << 7), MEGA_ALIGN_W)
            pltpu.make_async_copy(cap_ref.at[:, pl.ds(al, w_slab)],
                                  slab.at[jnp.int32(c)],
                                  sems.at[jnp.int32(c)]).wait()
            res = f - ((f >> 7) << 7)
            slab_c = slab[c]                             # (1, w_slab)
            base = 0
            while base < win_w:
                n_out = min(fresh, win_w - base)
                base_r = min(base, w_slab - W)
                rw = pltpu.roll(slab_c[:, base_r:base_r + W],
                                -(res + (base - base_r)), 1)
                for row, col, n_q, off in _split_row_pieces(
                        c, base, n_out, half_w, c_dim):
                    fr[row, col:col + n_q] = rw[0, off:off + n_q]
                base += n_out

            @pl.when(j + 1 < r)
            def _pre(c=c):
                _start(j + 1, c)

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

    o = sti[:, 0:1]                                  # frame sample offset
    rem_eff = _dsub(rem, _dmul_small(step, o))
    a0 = _dadd(_dmul_small(rem_eff, s_div), a_const)
    # fold the per-channel table base (hb00 + PHASE_BIAS) into the digits
    # once per ms, at the 2^40 scale (h_local = ramp>>40 - per-lane offset)
    beta = hb0_ref[:, 0:1]                           # (C, 1)
    zb = beta * 0
    a0 = _dsub(a0, [zb, zb, (beta * 256) & _M16, beta >> 8])
    s_q = _dmul_small(step, s_div)
    sp = _dmul_small(s_q, pack)
    d_grp = _dmul_u16(s_q, pack * span)              # phase per span group
    sp0, sp1 = sp[0], sp[1]
    # NB: digit pairing uses * 65536, NOT << 16 — Mosaic (2026-08 libtpu)
    # miscompiles the constant left-shift to 0 inside this kernel's
    # unrolled chunk loop (measured: a_g[3] << 16 == 0 on hardware while
    # a_g[3] * 65536 is correct; interpret mode agrees with the multiply).
    # Multiply and shift are identical mod 2^32.
    sp2 = sp[2] + sp[3] * 65536
    phase_eff = sti[:, 1:2] - w_carr * o

    # --- correlate: static loops over (byte plane, span chunk).  The code
    # lookup is a per-lane funnel shift of the static joint word sequence
    # (tables.mega_lane_tables) + three bit tests — no repeats, no
    # per-tile temporaries.
    #
    # Everything lane-dependent but chunk-INdependent is computed once per
    # millisecond and reused by all pack*t_groups chunks: the carrier
    # lane table (sin/cos of the per-lane NCO ramp, combined per chunk by
    # the angle-addition identity from a per-channel scalar rotation) and
    # the Q40 digit-ramp lane products.  The identity is exact in phase
    # (integer turns split mod 2^32); the only cost is ~1e-7 of f32
    # rounding in the 2-term combination, far under the correlator parity
    # budget.
    #
    # Row split (tables.mega_split): with S > 1 each channel's window is
    # S packed sublane rows (row q*c_real + c = window piece q of channel
    # c) and the per-channel (cp, 1) scalars expand to q-major (rows, 1)
    # vectors — the piece's sample offset folds into o/phase/a0, so the
    # chunk-loop body below is IDENTICAL for any S; the six correlator
    # sums fold the S pieces back per channel after the loop.
    rows = tab_refs[0].shape[0]
    cp = stf.shape[0]
    if s_split == 1:
        w_r, phase_r, o_r, blk_r = w_carr, phase_eff, o, blk
        a0_r, sq_r, dgrp_r = a0, s_q, d_grp
        sp0_r, sp1_r, sp2_r = sp0, sp1, sp2
    else:
        c_r = c_real
        assert c_r is not None, "row-split kernel needs the real channel count"
        q_off = pack * half_w                        # samples per row piece

        # the q-major (rows, 1) expansion goes through a VMEM scratch:
        # tpu.concatenate requires uniform non-concat-dim layout offsets,
        # which state-column slices don't have — a store/load round-trip
        # normalizes them, and pad rows stay zero (mask-safe: blk=0).
        # The real rows are overwritten every step, so only the static
        # pad rows need the one-time zeroing.
        @pl.when(j == 0)
        def _zero_exs():
            exs[...] = jnp.zeros_like(exs)

        d_half = _dmul_u16(s_q, q_off)
        a_q = a0
        for q in range(s_split):
            if q:
                a_q = _dadd(a_q, d_half)
            sl_q = slice(q * c_r, (q + 1) * c_r)
            exs[sl_q, 0:1] = w_carr[:c_r]
            exs[sl_q, 1:2] = (phase_eff + w_carr * jnp.int32(q * q_off))[:c_r]
            exs[sl_q, 2:3] = (o - jnp.int32(q * q_off))[:c_r]
            exs[sl_q, 3:4] = blk[:c_r]
            for i in range(_ND):
                exs[sl_q, 4 + i:5 + i] = s_q[i][:c_r]
                exs[sl_q, 8 + i:9 + i] = a_q[i][:c_r]
        w_r = exs[:, 0:1]
        phase_r = exs[:, 1:2]
        o_r = exs[:, 2:3]
        blk_r = exs[:, 3:4]
        sq_r = _read_d(exs, 4)
        a0_r = _read_d(exs, 8)
        sp_r = _dmul_small(sq_r, pack)
        dgrp_r = _dmul_u16(sq_r, pack * span)
        sp0_r, sp1_r = sp_r[0], sp_r[1]
        sp2_r = sp_r[2] + sp_r[3] * 65536

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
    sl_lane, cl_lane = _sincos_counts((w_r * pack) * lane)    # (rows, span)
    r_0 = sp0_r * lane                                        # (rows, span)
    r_1 = sp1_r * lane
    r_2 = sp2_r * lane
    pl_lane = pack * lane                                     # (1, span)
    acc_sp = [None] * 6
    a_b = a0_r
    for b in range(pack):
        if b:
            a_b = _dadd(a_b, sq_r)                   # plane phase base
        a_g = a_b
        for g in range(t_groups):
            if g:
                a_g = _dadd(a_g, dgrp_r)
            cb = b * t_groups + g
            if fused:
                x32 = fr[:, g * span:(g + 1) * span]
            else:
                x32 = frames_ref[0, :, g * span:(g + 1) * span]
            v = ((x32 << (24 - 8 * b)) >> 24).astype(jnp.float32)
            k_base = b + pack * span * g
            kk = k_base + pl_lane
            mask = jnp.logical_and(kk >= o_r, kk < o_r + blk_r)
            raw = jnp.where(mask, v, jnp.float32(0.0))

            # carrier: per-channel scalar rotation x shared lane table
            s0, c0 = _sincos_counts(phase_r + w_r * k_base)   # (rows, 1)
            sn = s0 * cl_lane + c0 * sl_lane
            cs = c0 * cl_lane - s0 * sl_lane
            bb_i = sn * raw                          # (C, span)
            bb_q = cs * raw
            nb_i = -bb_i
            nb_q = -bb_q

            # exact Q40 digit phase ramp (chunk base carried
            # incrementally; per-channel table base folded in a0;
            # digit-lane products shared across chunks)
            a0l, a1l = a_g[0], a_g[1]
            a2l = a_g[2] + a_g[3] * 65536  # * not <<: see sp2 note
            t0 = a0l + r_0                           # (C, span)
            t1 = a1l + r_1 + (t0 >> 16)
            t2 = a2l + r_2 + (t1 >> 16)

            sl = slice(cb * span, (cb + 1) * span)
            ws = [pltpu.bitcast(t_ref[:, sl], jnp.uint32)
                  for t_ref in tab_refs]
            h_local = (t2 >> 8) - (tab_refs[-1][:, sl] >> 16)
            # No in-window gate: any sample whose h_local leaves the table
            # window is masked (raw == 0 -> bb == 0), so its tap products
            # are 0 for ANY bit pattern — the overflow check
            # (mega_track_segment) guarantees unmasked samples stay in
            # coverage.  Only the shift amount needs clamping.
            hc = jnp.minimum(jnp.maximum(h_local, jnp.int32(0)),
                             jnp.int32(32 * n_tab - 1))
            hcu = pltpu.bitcast(hc, jnp.uint32)
            # n_tab == 1: the clamp already bounds hc <= 31, no & needed
            hs = hcu if n_tab == 1 else hcu & jnp.uint32(31)
            # funnel: 32-bit window of the joint word sequence at bit hc.
            # Valid lanes read bits hc..hc+2ds, which never reach the last
            # word's non-code bits (mega_lane_tables reserves them), so
            # the missing high word of the last pair can be anything.
            # n_tab == 1 (the reference front end: joint width 15 bits):
            # valid lanes' window fits the single word's low 16 bits, so
            # one logical shift IS the funnel.
            if n_tab == 1:
                sh = ws[0] >> hs
            else:
                sh = None
                for u in range(n_tab):
                    whi = ws[u + 1] if u + 1 < n_tab else ws[u]
                    sh_u = (ws[u] >> hs) | ((whi << (jnp.uint32(31) - hs))
                                            << jnp.uint32(1))
                    if sh is None:
                        sh = sh_u
                    else:
                        sh = jnp.where((hc >> 5) == u, sh_u, sh)
            for x, bit in enumerate((1, 1 << ds, 1 << (2 * ds))):
                up = (sh & jnp.uint32(bit)) != 0
                ti = jnp.where(up, bb_i, nb_i)
                tq = jnp.where(up, bb_q, nb_q)
                acc_sp[x] = ti if acc_sp[x] is None else acc_sp[x] + ti
                acc_sp[3 + x] = (tq if acc_sp[3 + x] is None
                                 else acc_sp[3 + x] + tq)

    corr = [jnp.sum(a, axis=1, keepdims=True) for a in acc_sp]
    if s_split > 1:
        # fold the S window-piece rows back to per-channel sums (cp rows)
        def _fold(t):
            tot = t[:c_r]
            for q in range(1, s_split):
                tot = tot + t[q * c_r:(q + 1) * c_r]
            out = [tot]
            need = cp - c_r
            # pad rows are zeroed SLICES of tot, not fresh jnp.zeros:
            # Mosaic's concatenate requires every operand to share the
            # non-concat-dim layout offsets, and a literal zeros tensor
            # materializes at canonical offsets while tot may not
            while need > 0:
                take = min(need, c_r)
                out.append(tot[:take] * 0)
                need -= take
            return jnp.concatenate(out, axis=0) if len(out) > 1 else tot

        corr = [_fold(t) for t in corr]

    # --- loop filters + state update + outputs -------------------------------
    ms = sti[:, 6:7]
    if K > 1:
        acc6 = [stf[:, 4 + i:5 + i] + corr[i] for i in range(6)]
        # typed constants: a weak Python int under x64 sends the promote/
        # convert path into unbounded recursion at trace time (same class
        # as the _round_f32_to_i32 clip-bounds note)
        upd = (ms % jnp.int32(K)) == jnp.int32(K - 1)
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
    # lane (each store is a cheap masked (C, 16) op).  Lanes 13..15 are
    # never stored and undefined.
    for i in range(6):
        ys_ref[0, :, i:i + 1] = corr[i] * activef
    ys_ref[0, :, 6:7] = code_err * activef
    ys_ref[0, :, 7:8] = code_nco_n * activef
    ys_ref[0, :, 8:9] = carr_err * activef
    ys_ref[0, :, 9:10] = carr_nco_n * activef
    ys_ref[0, :, 10:11] = frac * activef
    ys_ref[0, :, 11:12] = blk.astype(jnp.float32) * activef
    ys_ref[0, :, 12:13] = o.astype(jnp.float32) * activef

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


def _check_kernel_ranges(config: ReceiverConfig) -> None:
    """Static range guards for the in-kernel integer arithmetic:
    blk rides a 16-bit quotient estimate (est clipped to _M16), so one
    code period per millisecond must fit 16 bits; the per-lane Q40 digit
    ramp t0 = a0l + sp0*lane multiplies a <2^16 digit by the lane index,
    so the chunk span must keep the partial inside int32."""
    assert config.samples_per_code + 64 < (1 << 16), (
        "megakernel blk arithmetic needs samples_per_code + 64 < 2^16 "
        f"(one code period per ms in 16 bits); got {config.samples_per_code}"
        " — use the onehot/pallas correlators for this front end")
    kt, _tg = mega_grid(config)
    span = kt * config.track_tile
    assert span * _M16 < (1 << 31), (
        f"megakernel chunk span {span} (k_tiles={kt} x tile="
        f"{config.track_tile}) overflows the int32 digit ramp "
        "(span * 65535 must stay below 2^31) — lower config.pallas_k_tiles")
    if mega_split(config) > 1:
        q_off = mega_window(config) // mega_split(config)
        assert q_off < (1 << 16), (
            f"megakernel row-piece sample offset {q_off} overflows the "
            "16-bit digit multiplier (window too wide for the row split)")


def _mega_call(config: ReceiverConfig, r: int, c_real: int, frames, tabs,
               hb0, consts_i, state_f, state_i):
    """Invoke the megakernel on pre-built per-ms frames
    (r, rows, win/(S*4)) i32 (rows = mega_split x c_real, channel-packed
    and padded to the sublane tile).  Returns (ys (r,cp,16) f32,
    state_f' (cp,16), state_i' (cp,16))."""
    _check_kernel_ranges(config)
    rows = tabs.shape[0]
    cp = state_f.shape[0]
    n_tab = tabs.shape[1]
    win_cols = tabs.shape[2]
    win_w = mega_window(config) // MEGA_PACK // mega_split(config)
    n_chunks = hb0.shape[1]
    kernel = functools.partial(_kernel, config=config, r=r, c_real=c_real)
    zmap2 = lambda j: (j * 0, j * 0)                 # noqa: E731
    ys, sfo, sio = pl.pallas_call(
        kernel,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, rows, win_w), lambda j: (j, j * 0, j * 0)),
        ] + [pl.BlockSpec((rows, win_cols), zmap2)] * n_tab + [
            pl.BlockSpec((cp, n_chunks), zmap2),
            pl.BlockSpec((cp, 8), zmap2),
            pl.BlockSpec((cp, 16), zmap2),
            pl.BlockSpec((cp, 16), zmap2),
        ],
        out_specs=(
            pl.BlockSpec((1, cp, 16), lambda j: (j, j * 0, j * 0)),
            pl.BlockSpec((cp, 16), zmap2),
            pl.BlockSpec((cp, 16), zmap2),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, cp, 16), jnp.float32),
            jax.ShapeDtypeStruct((cp, 16), jnp.float32),
            jax.ShapeDtypeStruct((cp, 16), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((cp, 16), jnp.float32),        # stf
            pltpu.VMEM((cp, 16), jnp.int32),          # sti
            pltpu.VMEM((rows, 16), jnp.int32),        # exs (row expansion)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Mosaic stacks the statically-unrolled per-chunk temporaries
            # without reuse; the default 16 MB scoped-VMEM budget is a
            # compiler reserve, not the physical VMEM (128 MB on v5e)
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(frames, *(tabs[:, u] for u in range(n_tab)), hb0,
      consts_i, state_f, state_i)
    return ys, sfo, sio


def _mega_call_fused(config: ReceiverConfig, r: int, c_real: int,
                     cap2, starts_w, tabs,
                     hb0, consts_i, state_f, state_i):
    """Invoke the megakernel with the frames builder fused in: per-ms
    frames are cut from the (1, L) int32 capture slice ``cap2`` at word
    offsets ``starts_w[c] + j*spc/4`` by in-kernel DMA + rolls (see
    ``_kernel(fused=True)``); no HBM frames array exists.
    Returns (ys (r,cp,16) f32, state_f' (cp,16), state_i' (cp,16))."""
    _check_kernel_ranges(config)
    rows = tabs.shape[0]
    cp = state_f.shape[0]
    n_tab = tabs.shape[1]
    win_cols = tabs.shape[2]
    win_w = mega_window(config) // MEGA_PACK
    half_w = win_w // mega_split(config)
    w_slab = win_w + MEGA_ALIGN_W
    n_chunks = hb0.shape[1]
    kernel = functools.partial(_kernel, config=config, r=r, fused=True,
                               c_real=c_real)
    zmap2 = lambda j, s: (j * 0, j * 0)              # noqa: E731
    ys, sfo, sio = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec((rows, win_cols), zmap2)] * n_tab + [
                pl.BlockSpec((cp, n_chunks), zmap2),
                pl.BlockSpec((cp, 8), zmap2),
                pl.BlockSpec((cp, 16), zmap2),
                pl.BlockSpec((cp, 16), zmap2),
            ],
            out_specs=(
                pl.BlockSpec((1, cp, 16), lambda j, s: (j, j * 0, j * 0)),
                pl.BlockSpec((cp, 16), zmap2),
                pl.BlockSpec((cp, 16), zmap2),
            ),
            scratch_shapes=[
                pltpu.VMEM((cp, 16), jnp.float32),    # stf
                pltpu.VMEM((cp, 16), jnp.int32),      # sti
                pltpu.VMEM((rows, 16), jnp.int32),    # exs (row expansion)
                pltpu.VMEM((c_real, 1, w_slab), jnp.int32),  # slab
                pltpu.SemaphoreType.DMA((c_real,)),   # sems
                pltpu.VMEM((rows, half_w), jnp.int32),  # fr
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, cp, 16), jnp.float32),
            jax.ShapeDtypeStruct((cp, 16), jnp.float32),
            jax.ShapeDtypeStruct((cp, 16), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(starts_w, cap2, *(tabs[:, u] for u in range(n_tab)), hb0,
      consts_i, state_f, state_i)
    return ys, sfo, sio


def _pad_rows(x, c_pad: int):
    """Pad axis 0 (channels) with zero rows up to ``c_pad``."""
    c = x.shape[0]
    if c == c_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((c_pad - c,) + x.shape[1:], x.dtype)], axis=0)


def _builder_kernel(starts_ref, cap_ref, out_ref, scratch, sems, *,
                    config: ReceiverConfig, r: int, c_dim: int):
    """Frames builder: grid step j writes frames for millisecond j of all
    channels — (1, rows, win/(S*4)) i32, channel c's window stored as
    S = tables.mega_split row pieces at rows q*c_dim + c — gathered from
    the (1, L) int32 capture slice at EXACT per-channel word offsets
    ``starts_ref[c] + j*spc/4``.

    Each channel's window is fetched as a 128-word-aligned slab (the DMA
    alignment unit) into its own scratch slot — one DMA in flight per
    channel, next-millisecond copies issued as each slot is consumed —
    then shifted down by the <=127-word residual.  tpu.dynamic_rotate
    mis-rotates non-power-of-two widths (measured: off by a constant
    tile count), so the shift is applied by SLIDING power-of-two-width
    rolls: window [base_r, base_r+W) of the slab, rolled down by
    ``res + (base - base_r)``, yields output words [base, base+W-128)
    wrap-free (proof in scripts/builder_time.py; measured ~10% faster
    than the earlier two-roll stitch and valid for ANY window geometry,
    where the stitch required win/4 to sit on the 128-word lane tile).
    """
    pack = MEGA_PACK
    win_w = mega_window(config) // pack
    half_w = win_w // mega_split(config)
    w_slab = win_w + MEGA_ALIGN_W
    spc_w = config.samples_per_code // pack
    j = pl.program_id(0)

    # roll-window width (static): fixed 2048 keeps the unroll short; the
    # largest pow2 <= w_slab for small front ends.  fresh = W - 128 output
    # words per window is a lane-tile multiple, so stores stay aligned.
    W = min(2048, 1 << (w_slab.bit_length() - 1))
    fresh = W - MEGA_ALIGN_W
    assert fresh > 0, f"slab too narrow for the roll window (w_slab={w_slab})"

    def _start(jj, c):
        al = pl.multiple_of(
            jnp.int32((starts_ref[c] + jj * spc_w >> 7) << 7), MEGA_ALIGN_W)
        pltpu.make_async_copy(cap_ref.at[:, pl.ds(al, w_slab)],
                              scratch.at[jnp.int32(c)],
                              sems.at[jnp.int32(c)]).start()

    @pl.when(j == 0)
    def _prime():
        for c in range(c_dim):
            _start(0, c)

    for c in range(c_dim):
        f = starts_ref[c] + j * spc_w
        al = pl.multiple_of(jnp.int32((f >> 7) << 7), MEGA_ALIGN_W)
        pltpu.make_async_copy(cap_ref.at[:, pl.ds(al, w_slab)],
                              scratch.at[jnp.int32(c)],
                              sems.at[jnp.int32(c)]).wait()
        res = f - ((f >> 7) << 7)
        slab = scratch[c]                                 # (1, w_slab)
        base = 0
        while base < win_w:
            n_out = min(fresh, win_w - base)
            # keep the W-wide window inside the slab; fold the overhang
            # into the roll amount.  Wrap-free: with base_r = base the
            # shift is res <= 127 and n_out <= W - 128; with the clamped
            # base_r = w_slab - W the highest read index is
            # win_w - base + res + base - base_r - 1 <= W - 1.
            base_r = min(base, w_slab - W)
            rw = pltpu.roll(slab[:, base_r:base_r + W],
                            -(res + (base - base_r)), 1)
            for row, col, n_q, off in _split_row_pieces(
                    c, base, n_out, half_w, c_dim):
                out_ref[0, row, col:col + n_q] = rw[0, off:off + n_q]
            base += n_out

        @pl.when(j + 1 < r)
        def _pre(c=c):
            _start(j + 1, c)


def mega_c_pad(c: int) -> int:
    """Kernel channel-row count: channels padded up to a multiple of 8
    (the f32/i32 sublane tile).  A (12, span) tensor is not merely padded
    to 16 rows by Mosaic — the misaligned sublane dim costs MORE than
    running 16 aligned rows (measured on v5e: 17.8 us/ms at C=12 vs
    14.5 at C=16), so every per-sample kernel tensor rides a padded
    channel axis and outputs are sliced back."""
    return max(8, (c + 7) // 8 * 8)


def mega_rows(config: ReceiverConfig, c: int) -> int:
    """Total kernel channel-row count: mega_split row pieces per channel,
    packed q-major, padded once as a whole to the sublane tile."""
    from softgnss_tpu.track.tables import mega_split

    return mega_c_pad(mega_split(config) * c)


def build_frames(config: ReceiverConfig, r: int, c_dim: int, cap2, starts_w,
                 rows_pad: int | None = None):
    """Gather (r, rows, win/(S*4)) i32 per-ms frames from a (1, L) int32
    capture slice, channel c's window stored as S = tables.mega_split row
    pieces at rows q*c_dim + c.  ``starts_w``: (C,) i32 frame word
    offsets of millisecond 0 relative to the slice; frame (j, c) covers
    words [starts_w[c] + j*spc/4, + win/4) — exact bases, no alignment
    residue, at DMA-copy speed (the XLA batched dynamic-slice gather for
    the same job measured ~7 us per tracked millisecond; this builder
    ~2 us).  ``rows_pad``: output row count (>= S*c_dim; see
    :func:`mega_rows`) — rows past S*c_dim are never written (the
    tracking kernel masks them)."""
    from softgnss_tpu.track.tables import mega_split

    pack = MEGA_PACK
    win_w = mega_window(config) // pack
    half_w = win_w // mega_split(config)
    w_slab = win_w + MEGA_ALIGN_W
    if rows_pad is None:
        rows_pad = mega_split(config) * c_dim
    kernel = functools.partial(_builder_kernel, config=config, r=r,
                               c_dim=c_dim)
    # scalar prefetch (not a plain SMEM operand: SMEM refs + a grid under
    # jax_enable_x64 hit a Mosaic legalization failure — and index-map
    # zeros must be j*0, not literal 0, for the same reason)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, rows_pad, half_w),
                                   lambda j, s: (j, j * 0, j * 0)),
            scratch_shapes=[
                pltpu.VMEM((c_dim, 1, w_slab), jnp.int32),
                pltpu.SemaphoreType.DMA((c_dim,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((r, rows_pad, half_w), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(starts_w, cap2)


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


def _mega_overflow(config: ReceiverConfig, active, o, blk):
    """>0 when a frame cannot represent its millisecond: the true span
    [o, o+blk) leaves the static slab, or the frame offset exceeds the
    per-lane table coverage (tables.mega_o_cov) — beyond it, in-window
    samples' h_local falls outside the joint-word window and would
    silently corrupt the correlators."""
    bad = jnp.maximum(-o, o + blk - mega_window(config))
    bad = jnp.maximum(bad, o - mega_o_cov(config))
    return jnp.where(active, jnp.maximum(bad, 0), jnp.int64(0))


def mega_track_segment(config: ReceiverConfig, r: int, frames, fb0,
                       tables, carr_basis, active, st,
                       cap2=None, starts_w=None):
    """Track ``r`` consecutive milliseconds for all channels in one fused
    kernel call, returning RAW kernel outputs.

    ``frames``: (r, C, win/4) int32 per-ms windows from
    :func:`build_frames`; element 0 of frame (0, c) is absolute capture
    sample ``fb0[c]`` ((C,) int64, a multiple of 4), and frame bases
    advance exactly samples_per_code per millisecond.  Alternatively
    pass ``frames=None`` with ``cap2`` ((1, L) int32 capture slice) and
    ``starts_w`` ((C,) int32 ms-0 frame word offsets into it): the
    frames builder then runs fused inside the kernel
    (config.mega_fused_frames) and no frames array is materialized.

    Returns (new_state, ys (r, C, 16) f32).  The per-ms observables are
    decoded from the stacked raw outputs ONCE per tracking call by
    :func:`mega_finalize` — building the 14-leaf MsOutputs pytree (8 of
    them f64) inside the block scan cost ~15 us/step of f64
    dynamic-update-slice stacking (measured, jax.profiler).
    """
    from softgnss_tpu.signals.nco import carrier_step_u32
    from softgnss_tpu.track.scan import TrackState

    fs = config.sampling_freq

    o0 = (st.ptr - fb0).astype(jnp.int32)            # P_rel at entry
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

    # channel rows padded to the sublane tile for every per-sample kernel
    # tensor (see mega_c_pad / mega_rows); outputs slice back to the real
    # channels
    c = int(active.shape[0])
    cp = mega_c_pad(c)
    tabs_p = _pad_rows(jnp.asarray(tables.mega_tabs), mega_rows(config, c))
    hb0_p = _pad_rows(jnp.asarray(tables.mega_hb0), cp)
    consts_i = _pad_rows(consts_i, cp)
    state_f = _pad_rows(state_f, cp)
    state_i = _pad_rows(state_i, cp)
    if frames is None:
        ys, sfo, sio = _mega_call_fused(config, r, c, cap2, starts_w,
                                        tabs_p, hb0_p,
                                        consts_i, state_f, state_i)
    else:
        ys, sfo, sio = _mega_call(config, r, c, frames, tabs_p, hb0_p,
                                  consts_i, state_f, state_i)
    ys = ys[:, :c]
    sfo = sfo[:c]
    sio = sio[:c]

    # blk is stored 0 for inactive channels, so the unmasked sum freezes
    # their pointers exactly like the masked per-ms update
    blk_sum = jnp.sum(ys[:, :, 11].astype(jnp.int64), axis=0)

    basis = jnp.float64(config.code_freq_basis)
    if config.carrier_aided_dll:
        aid_final = (aid0.astype(jnp.float64)
                     + ratio * sfo[:, 2].astype(jnp.float64))
    else:
        aid_final = jnp.float64(0.0)
    new = TrackState(
        ptr=st.ptr + blk_sum,
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
    return new, ys


def mega_finalize(config: ReceiverConfig, ptr0, ys, carr_basis, active):
    """Decode stacked raw kernel outputs into per-ms observables.

    ``ptr0``: (C,) absolute sample pointers at the first millisecond of
    ``ys`` (n_ms, C, 16).  Returns (MsOutputs with (n_ms, C) leaves,
    overflow) — run ONCE per tracking call, outside the block scan.
    """
    from softgnss_tpu.track.scan import MsOutputs

    blk = ys[:, :, 11].astype(jnp.int64)                     # (n_ms, C)
    ptr_series = ptr0[None, :] + jnp.cumsum(blk, axis=0)
    o_entry = ys[:, :, 12].astype(jnp.int64)
    ovf = jax.vmap(lambda o, bl: _mega_overflow(config, active, o, bl))(
        o_entry, blk).max()

    basis = jnp.float64(config.code_freq_basis)
    code_nco = ys[:, :, 7].astype(jnp.float64)
    carr_nco = ys[:, :, 9].astype(jnp.float64)
    if config.carrier_aided_dll:
        ratio = config.code_freq_basis / config.l1_freq
        aid0 = ratio * (carr_basis - config.intermediate_freq)
        aid_series = aid0[None, :] + ratio * carr_nco
    else:
        aid_series = jnp.float64(0.0)
    zf = jnp.float64(0.0)
    outs = MsOutputs(
        absolute_sample=jnp.where(active[None, :], ptr_series, jnp.int64(0)),
        sample_frac=ys[:, :, 10].astype(jnp.float64),
        code_freq=jnp.where(active[None, :],
                            basis - code_nco + aid_series, zf),
        carr_freq=jnp.where(active[None, :],
                            carr_basis[None, :] + carr_nco, zf),
        i_p=ys[:, :, 1], i_e=ys[:, :, 0], i_l=ys[:, :, 2],
        q_e=ys[:, :, 3], q_p=ys[:, :, 4], q_l=ys[:, :, 5],
        dll_discr=ys[:, :, 6].astype(jnp.float64),
        dll_discr_filt=code_nco,
        pll_discr=ys[:, :, 8].astype(jnp.float64),
        pll_discr_filt=carr_nco,
    )
    return outs, ovf
