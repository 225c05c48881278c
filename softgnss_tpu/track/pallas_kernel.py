"""Fused Pallas TPU correlator: carrier NCO + mix + E/P/L sums in one kernel.

The XLA 'onehot' path (track.scan._correlate_onehot) is compute-light but
HBM-heavy: the (T, tile, w) one-hot and the (2, T, tile) baseband are
materialized between fusions every millisecond (~20 MB/ms at the reference
workload), so the step runs at a fraction of the VPU's rate.  This kernel
keeps the whole per-tile pipeline — byte-plane unpack, integer carrier NCO
(mod-2^32 counts -> f32-mantissa turns -> polynomial sine), exact code
phase, one-hot build, and both correlator contractions — in VMEM/registers,
writing only the six sums per channel.

Measured (v5e via axon, 12 ch @ fs=38.192 MHz, bench.py): ~30 us/kernel
call and 47.5 us full tracking step => **~804 Msps**, vs ~475-522 Msps for
the XLA onehot block path and 299.5 Msps for the round-1 per-ms path —
so this is the TPU default (config.correlator_impl='auto').  The ablation
(scripts/pallas_ablate.py) attributes the win to keeping the one-hot and
baseband intermediates in VMEM (the XLA path round-trips ~20 MB/ms
through HBM).

Design (round 2; the round-1 Mosaic legalization bugs are gone, see
scripts/pallas_probe.py):

* **Gridded** ``pallas_call`` over ``(tile groups, pack)``: grid step
  (g, b) processes byte plane ``b`` of ``k_tiles`` packed-frame tiles —
  the same tile decomposition and byte-plane sample order as the XLA path
  (track.tables.tile_starts), so the integer phase sequences are
  bit-identical and parity is limited only by f32 summation order.
* **Channel-batched**: every op is (C, ...) with channels on sublanes —
  one kernel invocation per millisecond covers all channels.
* **Span-wide everything except the contraction.**  Profiling
  (scripts/pallas_ablate.py) showed per-tile work on small (C, 1) /
  (C, tile) operands dominates the kernel (~62 of 94 us/ms went to
  per-tile phase-digit slices + arithmetic; the wide baseband was ~free).
  So the code phase is computed for the whole (C, k_tiles*tile) span in
  one shot — an exact 16-bit-digit linear accumulation (below) minus a
  *precomputed static* table-base span map (``hb_span_map``) — and only
  the one-hot + code contraction remain per-tile (their tables differ).
* The six sums accumulate across grid steps into a revisited (C, 8)
  output block (first grid step zeroes it).
* Contraction variants (``config.pallas_contraction``):
  - ``'mxu'``: code tables are contracted against the one-hot FIRST with a
    channel-batched dot_general (MXU), giving per-sample E/P/L code values
    cv (C, 3, tile); the correlator sums are then masked reductions of
    cv * baseband.  VPU work per sample ~ w (one-hot build) + mix.
  - ``'vpu'``: classic one-hot masked sums u (C, w) then a small in-kernel
    codes @ u contraction — ~3w VPU ops per sample, no MXU dependency.

Exact in-kernel code phase without int64 (Mosaic is 32-bit): the Q40
sub-chip phase at packed lane j of grid step (g, b) is
``a(c; g, b) + sp(c) * j`` with ``a = rem_eff*S + (2^40 - 1) +
(bias << 40) + s_q*(pack*span*g + b)`` and ``sp = s_q*pack``; both are
decomposed OUTSIDE the kernel (int64 is exact in XLA) into base-2^16
digits (:func:`phase_digits`).  In-kernel, the digit accumulation
  t0 = a0 + sp0*j;  t1 = a1 + sp1*j + (t0 >> 16);
  t2 = a2 + sp2*j + (t1 >> 16);  h = t2 >> 8
is exact int32 arithmetic (no truncation anywhere; overflow bounds
asserted in :func:`fused_correlate_ms`), identical to the XLA path's
``h = (a + sp*j) >> 40``.

Matches reference tracking.py:132-219 (carrier wipeoff + E/P/L correlators)
through the same equations as the XLA paths; see track/scan.py.
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
from softgnss_tpu.track.tables import onehot_width

#: sub-chip bias keeping every tile-start phase positive (same bound as
#: the XLA path; asserted there against track_frame_pre)
PHASE_BIAS = 1 << 10

_MASK16 = (1 << 16) - 1


def grid_shape(config: ReceiverConfig, default_cap: int = 32) -> tuple[int, int]:
    """(k_tiles, t_groups): tiles per grid step/chunk and steps per plane.

    ``default_cap`` applies when config.pallas_k_tiles is 0: 32 tuned for
    this per-ms kernel's grid steps; the megakernel passes 75 (bigger
    span chunks amortize its per-chunk fixed work — measured optimum on
    v5e, scripts/mega_ablate.py)."""
    t_pp = (config.track_window // config.track_pack) // config.track_tile
    cap = config.pallas_k_tiles or default_cap
    k_tiles = max(d for d in range(1, min(cap + 1, t_pp + 1)) if t_pp % d == 0)
    return k_tiles, t_pp // k_tiles


def _kernel(scal_ref, frame_ref, digs_ref, hb_ref, codes_ref,
            out_ref, *, pack: int, tile: int, k_tiles: int,
            w: int, contraction: str):
    """One grid step: byte plane ``b`` of ``k_tiles`` packed tiles, all
    channels.  Baseband (unpack + mask + carrier NCO + mix) and code phase
    are computed across the whole (C, k_tiles*tile) span — wide VPU work —
    and only the one-hot contraction loops over the k_tiles static slices
    (per-tile code tables).

    scal rows per channel (int32): [phase_eff, carr_w, sp0, sp1, sp2, o,
    blk, 0]; digs block (C, 1, 1, 4): this grid step's [a0, a1, a2, 0]
    phase digits; hb block (C, 1, span): static h_base + bias per lane.
    """
    g = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(jnp.logical_and(g == 0, b == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    span = k_tiles * tile
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)

    phase_eff = scal_ref[:, 0:1]
    carr_w = scal_ref[:, 1:2]
    sp0 = scal_ref[:, 2:3]
    sp1 = scal_ref[:, 3:4]
    sp2 = scal_ref[:, 4:5]
    o = scal_ref[:, 5:6]
    blk = scal_ref[:, 6:7]

    # --- byte-plane unpack: sample pack*(tile-group sample i) + b -----------
    x32 = frame_ref[...].astype(jnp.int32)                   # (C, span)
    v = ((x32 << (24 - 8 * b)) >> 24).astype(jnp.float32)

    k_base = pack * span * g + b                             # scalar i32
    kk = k_base + pack * lane                                # (1, span)
    mask = jnp.logical_and(kk >= o, kk < o + blk)            # (C, span)
    raw = jnp.where(mask, v, jnp.float32(0.0))

    # --- carrier NCO: mod-2^32 counts -> turns -> polynomial sine -----------
    counts = (phase_eff + carr_w * k_base) + (carr_w * pack) * lane
    u32 = pltpu.bitcast(counts, jnp.uint32)
    mant = (u32 >> 9) | jnp.uint32(0x3F800000)
    turns = pltpu.bitcast(mant, jnp.float32) - jnp.float32(1.0)
    bb_i = sin_turns(turns) * raw                            # (C, span)
    bb_q = sin_turns(turns + jnp.float32(0.25)) * raw

    # --- span-wide exact code phase: base-2^16 digit accumulation -----------
    digs = digs_ref[...]                                     # (C, 1, 1, 4)
    a0 = digs[:, 0, :, 0]                                    # (C, 1)
    a1 = digs[:, 0, :, 1]
    a2 = digs[:, 0, :, 2]
    t0 = a0 + sp0 * lane                                     # (C, span)
    t1 = a1 + sp1 * lane + (t0 >> 16)
    t2 = a2 + sp2 * lane + (t1 >> 16)
    hrel = (t2 >> 8) - hb_ref[:, 0, 0, :]                    # (C, span)

    # tables are stored int8 (+-1 chips): the (C, T, 3, w) stream is the
    # kernel's dominant HBM traffic, and i8 quarters it; convert the whole
    # grid-step block in ONE op (per-tile converts pay a relayout each)
    codes_f = codes_ref[...].astype(jnp.float32)             # (C, k, 3, w)
    acc_i = jnp.zeros((out_ref.shape[0], 3), jnp.float32)
    acc_q = jnp.zeros((out_ref.shape[0], 3), jnp.float32)
    for k in range(k_tiles):
        h_local = hrel[:, k * tile:(k + 1) * tile]           # (C, tile)
        oh = h_local[:, None, :] == iota_w                   # (C, w, tile)
        codes = codes_f[:, k]                                # (C, 3, w)
        bi = bb_i[:, k * tile:(k + 1) * tile]
        bq = bb_q[:, k * tile:(k + 1) * tile]

        if contraction == "mxu":
            cv = jax.lax.dot_general(
                codes, oh.astype(jnp.float32),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # (C, 3, tile)
            acc_i += jnp.sum(cv * bi[:, None, :], axis=2)    # (C, 3)
            acc_q += jnp.sum(cv * bq[:, None, :], axis=2)
        else:  # 'vpu'
            u_i = jnp.sum(jnp.where(oh, bi[:, None, :], jnp.float32(0.0)),
                          axis=2)                            # (C, w)
            u_q = jnp.sum(jnp.where(oh, bq[:, None, :], jnp.float32(0.0)),
                          axis=2)
            acc_i += jnp.sum(codes * u_i[:, None, :], axis=2)
            acc_q += jnp.sum(codes * u_q[:, None, :], axis=2)

    pad = jnp.zeros((acc_i.shape[0], 1), jnp.float32)
    out_ref[...] += jnp.concatenate([acc_i, acc_q, pad, pad], axis=1)


@functools.partial(jax.jit, static_argnums=(0,))
def fused_correlate_ms(config: ReceiverConfig, frame_pk, scal, digs, hb_span,
                       codes_t):
    """Six correlator sums for one millisecond, all channels.

    frame_pk: (C, win/pack) int16/int32 packed frame; scal: (C, 8) i32;
    digs: (C, G, 1, 4) i32 per-grid-step phase digits (:func:`phase_digits`);
    hb_span: (C, G, 1, span) i32 (:func:`hb_span_map`); codes_t:
    (C, T, 3, w) i8 (+-1 chips).  Returns (C, 6) f32
    [i_e i_p i_l q_e q_p q_l].
    """
    c = frame_pk.shape[0]
    pack = config.track_pack
    tile = config.track_tile
    w = onehot_width(config)
    k_tiles, t_groups = grid_shape(config)
    span = k_tiles * tile
    # in-kernel int32 digit-accumulation overflow bounds (module docstring)
    assert span <= 1 << 15, "track window too large for 16-bit phase digits"

    kernel = functools.partial(_kernel, pack=pack, tile=tile, k_tiles=k_tiles,
                               w=w, contraction=config.pallas_contraction)
    out = pl.pallas_call(
        kernel,
        grid=(t_groups, pack),
        # NB: with jax_enable_x64 (package-wide), bare-int index_map
        # returns become i64 constants, which Mosaic cannot legalize —
        # zeros are derived from the (i32) program ids instead (captured
        # jnp constants are rejected outright).
        in_specs=[
            pl.BlockSpec((c, 8), lambda g, b: (g * 0, g * 0)),        # scal
            pl.BlockSpec((c, span), lambda g, b: (g * 0, g)),
            pl.BlockSpec((c, 1, 1, 4),
                         lambda g, b: (g * 0, b * t_groups + g, g * 0, g * 0)),
            pl.BlockSpec((c, 1, 1, span),
                         lambda g, b: (g * 0, b * t_groups + g, g * 0, g * 0)),
            pl.BlockSpec((c, k_tiles, 3, w),
                         lambda g, b: (g * 0, b * t_groups + g, g * 0, g * 0)),
        ],
        out_specs=pl.BlockSpec((c, 8), lambda g, b: (g * 0, g * 0)),
        out_shape=jax.ShapeDtypeStruct((c, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        # run interpreted off-TPU so the impl stays testable on CPU
        interpret=jax.default_backend() != "tpu",
    )(scal, frame_pk, digs, hb_span, codes_t)
    return out[:, :6]


def phase_digits(config: ReceiverConfig, rem_eff, step_q):
    """Base-2^16 digits of the Q40 phase — exact int64 XLA precompute.

    rem_eff/step_q: (C,) i64 Q40 chips (code phase at frame sample 0 and
    per-sample step).  Returns digs (C, G, 1, 4) i32 [a0, a1, a2, 0] — the
    digits of ``a(c; g, b)`` at each grid step, laid out gb = b*t_groups+g
    — and sp0/sp1/sp2 (C,) i32, the digits of the per-lane step s_q*pack.
    """
    from softgnss_tpu.track.tables import subdivision

    s_div = subdivision(config)
    pack = config.track_pack
    k_tiles, t_groups = grid_shape(config)
    span = k_tiles * config.track_tile
    s_q = step_q * s_div                                     # (C,) i64
    a = (rem_eff * s_div + (CODE_ONE - 1)
         + (jnp.int64(PHASE_BIAS) << CODE_FRAC_BITS))        # (C,) > 0
    # first sample of grid step (g, b), b-major to match the index maps
    gs, bs = np.arange(t_groups), np.arange(pack)
    samp0 = jnp.asarray(
        (pack * span * gs[None, :] + bs[:, None]).reshape(-1), jnp.int64)
    a_gb = a[:, None] + s_q[:, None] * samp0[None, :]        # (C, G) i64
    d0 = (a_gb & _MASK16).astype(jnp.int32)
    d1 = ((a_gb >> 16) & _MASK16).astype(jnp.int32)
    d2 = (a_gb >> 32).astype(jnp.int32)
    digs = jnp.stack([d0, d1, d2, jnp.zeros_like(d0)],
                     axis=-1)[:, :, None, :]                 # (C, G, 1, 4)
    sp = s_q * pack
    sp0 = (sp & _MASK16).astype(jnp.int32)
    sp1 = ((sp >> 16) & _MASK16).astype(jnp.int32)
    sp2 = (sp >> 32).astype(jnp.int32)
    return digs, sp0, sp1, sp2


def hb_span_map(config: ReceiverConfig, h_base) -> jnp.ndarray:
    """Static (C, G, 1, span) i32 map: h_base + PHASE_BIAS at every packed
    lane of every grid step (tile t = b*t_pp + g*k_tiles + k covers lanes
    [k*tile, (k+1)*tile) of grid step gb = b*t_groups + g).  Computed once
    per channel set; subtracted span-wide in-kernel."""
    tile = config.track_tile
    pack = config.track_pack
    k_tiles, t_groups = grid_shape(config)
    hb = jnp.asarray(h_base) + PHASE_BIAS                    # (C, T)
    c = hb.shape[0]
    hb = hb.reshape(c, pack, t_groups, k_tiles)
    hb = jnp.repeat(hb[..., None], tile, axis=-1)
    return hb.reshape(c, pack * t_groups, 1, k_tiles * tile).astype(jnp.int32)
