"""Fused Pallas TPU correlator: NCO + carrier mix + E/P/L sums in one kernel.

The XLA 'onehot' path (track.scan._correlate_onehot) runs the per-ms math
as ~10 separate fusions (slice, mix, one-hot materialization, two einsums,
reductions).  This kernel fuses the whole per-ms, all-channel correlation
into ONE Mosaic program: the carrier NCO (int32 wraparound counts ->
polynomial sine via an f32-mantissa bit trick), code-phase decomposition
(tile base + Q24 fraction -> tile-local half-chip index), masking, one-hot
and both contractions all happen in VMEM without materializing
intermediates to HBM, emitting the six correlator sums per channel.

Status: EXPERIMENTAL (config.correlator_impl='pallas').  Correct (tested
against the onehot/gather paths) but currently ~3x slower than the XLA
onehot path on v5e: the environment's Mosaic fails to legalize *gridded*
kernels entirely, forcing a grid-free fori_loop over (channels x 300
tiles) whose small-vector iterations underutilize the VPU.  Revisit with
supertile (8, 128) layouts once gridded kernels compile.

The Q40 code phase is decomposed OUTSIDE the kernel (int64 is exact in
XLA, free when fused) into per-tile int32 pieces:
  - ``h_int (T,)``: table-relative half-chip integer at each tile start,
  - ``frac24 (T,)``: Q24 fractional half-chips at each tile start,
  - ``step24``: Q24 half-chips per sample,
so in-kernel phase is pure int32: h_local(t, j) = h_int[t] +
((frac24[t] + step24*j) >> 24).  The Q40->Q24 truncation moves a
half-chip boundary only when the true phase is within 2^-24 half-chips of
an edge (<1 sample per ~400 windows) — far below the 1e-3 correlator
parity budget (verified against the gather/onehot paths in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.signals.nco import CODE_FRAC_BITS, sin_turns
from softgnss_tpu.track.tables import onehot_width, subdivision

_OUT_LANES = 128  # padded output row per channel (first 6 lanes used)


def _kernel(scal_ref, win_ref, h_int_ref, frac_ref, codes_ref, out_ref, *,
            n_ch: int, tile: int, t_count: int, w: int):
    """All channels, one ms: fori over channels, fori over sample tiles.

    Grid-free (this environment's Mosaic fails to legalize gridded
    kernels); every array op is 2D with samples on the lane axis and the
    one-hot rows on the sublane axis.  scal rows are
    [step24, carr_phase, carr_step, blk] int32 per channel.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, _OUT_LANES), 1)

    def channel(c, carry):
        step24 = scal_ref[c, 0]
        phase0 = scal_ref[c, 1]
        carr_w = scal_ref[c, 2]
        blk = scal_ref[c, 3]

        def body(t, acc):
            win_t = win_ref[c, pl.ds(t, 1), :]              # (1, tile) f32
            k = t * tile + lane
            counts = phase0 + carr_w * k
            # turns in [0, 1) from the top 23 NCO bits, built directly as
            # an f32 mantissa (avoids the i32->f32 convert, which recurses
            # in this Mosaic): 0x3F800000 | (u >> 9) is 1.0 + u/2^32.
            u32 = pltpu.bitcast(counts, jnp.uint32)
            mant = (u32 >> 9) | jnp.uint32(0x3F800000)
            turns = pltpu.bitcast(mant, jnp.float32) - 1.0
            raw = jnp.where(k < blk, win_t, jnp.float32(0.0))
            bb_i = sin_turns(turns) * raw                   # (1, tile)
            bb_q = sin_turns(turns + 0.25) * raw

            s = frac_ref[c, t] + step24 * lane              # (1, tile) Q24
            h_local = h_int_ref[c, t] + (s >> 24)           # (1, tile)
            oh = h_local == iota_w                          # (w, tile)
            u_i = jnp.sum(jnp.where(oh, bb_i, jnp.float32(0.0)), axis=1,
                          keepdims=True)
            u_q = jnp.sum(jnp.where(oh, bb_q, jnp.float32(0.0)), axis=1,
                          keepdims=True)
            u = jnp.concatenate([u_i, u_q], axis=1)         # (w, 2)
            codes_t = codes_ref[c, pl.ds(t, 1), :, :][0]    # (3, w)
            d = jnp.dot(codes_t, u, preferred_element_type=jnp.float32)
            upd = jnp.zeros((1, _OUT_LANES), jnp.float32)
            for x in range(3):
                for cc in range(2):
                    upd = jnp.where(out_lane == (cc * 3 + x), d[x, cc], upd)
            return acc + upd

        # i32 loop bounds: with jax_enable_x64, Python-int bounds would
        # make the index (and all derived ints) int64, which Mosaic
        # cannot lower
        acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(t_count), body,
                                jnp.zeros((1, _OUT_LANES), jnp.float32))
        out_ref[pl.ds(c, 1), :] = acc
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_ch), channel, jnp.int32(0))


@functools.partial(jax.jit, static_argnums=(0,))
def fused_correlate(config: ReceiverConfig, windows_f32, h_int, frac24,
                    codes_static, scalars):
    """Correlate one ms for all channels.

    windows_f32: (C, T, tile) f32 raw sample windows (unmasked);
    h_int/frac24: (C, T) i32; codes_static: (C, T, 3, w) f32;
    scalars: (C, 4) i32 = [step24, carr_phase, carr_step, blk].
    Returns (C, 6) f32 correlators [i_e i_p i_l q_e q_p q_l].
    """
    c = windows_f32.shape[0]
    tile = config.track_tile
    t_count = config.track_window // tile
    w = onehot_width(config)

    kernel = functools.partial(_kernel, n_ch=c, tile=tile, t_count=t_count, w=w)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),          # windows
            pl.BlockSpec(memory_space=pltpu.SMEM),          # h_int
            pl.BlockSpec(memory_space=pltpu.SMEM),          # frac24
            pl.BlockSpec(memory_space=pltpu.VMEM),          # codes
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, _OUT_LANES), jnp.float32),
        # run interpreted off-TPU so the impl stays testable on CPU
        interpret=jax.default_backend() != "tpu",
    )(scalars, windows_f32, h_int, frac24, codes_static)
    return out[:, :6]


def phase_decomposition(config: ReceiverConfig, code_rem_q, step_q, h_base):
    """Split the Q40 code phase into per-tile int32 pieces (exact int64 XLA).

    code_rem_q/step_q: (C,) i64; h_base: (C, T) i64 table bases.
    Returns h_int (C, T) i32, frac24 (C, T) i32, step24 (C,) i32.
    """
    tile = config.track_tile
    t_count = config.track_window // tile
    s_div = subdivision(config)
    two_step = step_q * s_div                                # sub-chips Q40
    t_idx = jnp.arange(t_count, dtype=jnp.int64)
    # phase at tile starts, in sub-chip Q40, with the ceil offset folded in:
    # h(k) = ceil(x/2^40) = (x + 2^40 - 1) >> 40 with x = S*tq
    p = ((code_rem_q[:, None] * s_div) + two_step[:, None] * (t_idx * tile)[None, :]
         + ((1 << CODE_FRAC_BITS) - 1))
    h_int = ((p >> CODE_FRAC_BITS) - h_base).astype(jnp.int32)
    frac24 = ((p & ((1 << CODE_FRAC_BITS) - 1)) >> 16).astype(jnp.int32)
    step24 = (two_step >> 16).astype(jnp.int32)
    return h_int, frac24, step24
