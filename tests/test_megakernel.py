"""Multi-ms fused tracking kernel (track.megakernel) — parity + resume.

Off-TPU the kernel runs in Pallas interpret mode (same code path the TPU
compiles), so these tests exercise the real in-kernel digit arithmetic,
f32 loop filters, and polynomial atan against the f64 XLA paths.
"""

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu.acquire.search import Channels
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
from softgnss_tpu.track import track


@pytest.fixture(scope="module")
def setup():
    cfg = sg.fast_config(number_of_channels=3, track_block_ms=16)
    rng = np.random.default_rng(7)
    params = [(5, 1200.0, 333, 0.4), (11, -2500.0, 1777, 2.1),
              (20, 400.0, 40, 5.0)]
    sats = [SatelliteSignal(prn=p, doppler_hz=d, delay_samples=float(s),
                            phase0=ph,
                            nav_bits=tuple(rng.choice([-1, 1], size=8)))
            for p, d, s, ph in params]
    signal = synthesize_signal(cfg, sats, 100, noise_std=0.8, seed=4)
    channels = Channels(
        prn=np.asarray([p for p, *_ in params]),
        acquired_freq=np.asarray(
            [cfg.intermediate_freq + d for _, d, _, _ in params]),
        code_phase=np.asarray([s for _, _, s, _ in params], np.int64),
        status=["T"] * 3)
    return cfg, signal, channels


class TestMegakernelParity:
    """Megakernel vs the f64-filter onehot path on the same capture.

    The megakernel's f32 filters + split NCO roundings make it its own
    numerical lineage (module docstring), so tolerances are physical:
    correlator sums well under the 1e-3 RMS oracle budget, sample
    counters exact, frequencies within the u32-NCO quantization scale.
    """

    def test_tracks_match_f64_path(self, setup):
        cfg, signal, channels = setup
        res_oh = track(cfg.with_options(correlator_impl="onehot"),
                       signal, channels, n_ms=96)
        res_mk = track(cfg.with_options(correlator_impl="megakernel"),
                       signal, channels, n_ms=96)

        # sample counters: the pseudorange backbone — bit-exact here
        np.testing.assert_array_equal(res_mk.absolute_sample,
                                      res_oh.absolute_sample)
        for f in ("i_p", "i_e", "i_l", "q_e", "q_p", "q_l"):
            a = np.asarray(getattr(res_oh, f), np.float64)
            b = np.asarray(getattr(res_mk, f), np.float64)
            scale = np.sqrt(np.mean(a**2))
            assert np.sqrt(np.mean((a - b) ** 2)) / scale < 1e-3, f
        assert np.max(np.abs(res_mk.carr_freq - res_oh.carr_freq)) < 0.1
        assert np.max(np.abs(res_mk.code_freq - res_oh.code_freq)) < 0.05
        assert np.max(np.abs(res_mk.sample_frac - res_oh.sample_frac)) < 1e-3

    def test_pdi_accumulation(self, setup):
        cfg, signal, channels = setup
        c2 = cfg.with_options(pdi_ms=2)
        res_oh = track(c2.with_options(correlator_impl="onehot"),
                       signal, channels, n_ms=64)
        res_mk = track(c2.with_options(correlator_impl="megakernel"),
                       signal, channels, n_ms=64)
        np.testing.assert_array_equal(res_mk.absolute_sample,
                                      res_oh.absolute_sample)
        a, b = res_oh.pll_discr_filt, res_mk.pll_discr_filt
        assert np.max(np.abs(a - b)) < 1e-3 * max(1.0, np.max(np.abs(a)))
        # filters hold between the every-K updates (K=2: ms 0 keeps the
        # initial zero filter state, ms 1 is the first update)
        assert (res_mk.pll_discr[:, 0] == 0).all()
        assert not (res_mk.pll_discr[:, 1] == 0).all()

    def test_split_rows_match_f64_path(self, setup):
        """mega_split=2 (q-major split-row frames/tables, expanded
        per-row scalars, per-channel fold of the piece sums) must match
        the f64 onehot path exactly like the S=1 layout does.
        track_tile=12 resolves S=2 on the fast front end."""
        from softgnss_tpu.track.tables import mega_split

        cfg, signal, channels = setup
        c12 = cfg.with_options(track_tile=12)
        assert mega_split(c12) == 2
        res_oh = track(c12.with_options(correlator_impl="onehot"),
                       signal, channels, n_ms=64)
        res_mk = track(c12.with_options(correlator_impl="megakernel"),
                       signal, channels, n_ms=64)
        np.testing.assert_array_equal(res_mk.absolute_sample,
                                      res_oh.absolute_sample)
        for f in ("i_p", "i_e", "i_l", "q_e", "q_p", "q_l"):
            a = np.asarray(getattr(res_oh, f), np.float64)
            b = np.asarray(getattr(res_mk, f), np.float64)
            scale = np.sqrt(np.mean(a**2))
            assert np.sqrt(np.mean((a - b) ** 2)) / scale < 1e-3, f
        assert np.max(np.abs(res_mk.carr_freq - res_oh.carr_freq)) < 0.1
        assert np.max(np.abs(res_mk.code_freq - res_oh.code_freq)) < 0.05

    def test_inactive_channel_frozen(self, setup):
        cfg, signal, channels = setup
        ch = Channels(prn=channels.prn.copy(),
                      acquired_freq=channels.acquired_freq.copy(),
                      code_phase=channels.code_phase.copy(),
                      status=["T", "-", "T"])
        res = track(cfg.with_options(correlator_impl="megakernel"),
                    signal, ch, n_ms=48)
        assert (res.i_p[1] == 0).all()
        assert (res.absolute_sample[1] == 0).all()
        st = res.final_state
        assert int(st.ms[1]) == 0
        assert float(st.carr_nco[1]) == 0.0


class TestMegakernelResume:
    def test_resume_bit_exact(self, setup):
        """A split run (two track() calls through the saved state) must be
        bit-identical to the uninterrupted run — state crosses the segment
        boundary through exact digit/f32 round-trips."""
        cfg = setup[0].with_options(correlator_impl="megakernel")
        _, signal, channels = setup
        full = track(cfg, signal, channels, n_ms=80)
        first = track(cfg, signal, channels, n_ms=40)
        second = track(cfg, signal, channels, n_ms=40,
                       state=first.final_state)
        for f in ("i_p", "q_p", "absolute_sample", "carr_freq", "code_freq",
                  "sample_frac", "dll_discr_filt", "pll_discr_filt"):
            a = np.asarray(getattr(full, f))
            b = np.concatenate([np.asarray(getattr(first, f)),
                                np.asarray(getattr(second, f))], axis=1)
            np.testing.assert_array_equal(a, b, err_msg=f)
        # split at a non-block-aligned millisecond too (lead-segment path)
        first = track(cfg, signal, channels, n_ms=37)
        second = track(cfg, signal, channels, n_ms=43,
                       state=first.final_state)
        for f in ("i_p", "absolute_sample"):
            a = np.asarray(getattr(full, f))
            b = np.concatenate([np.asarray(getattr(first, f)),
                                np.asarray(getattr(second, f))], axis=1)
            np.testing.assert_array_equal(a, b, err_msg=f)


class TestMegakernelOracle:
    def test_oracle_parity(self, setup):
        """<1e-3 RMS correlator deviation vs the float64 NumPy oracle —
        the same budget every correlator implementation meets
        (BASELINE.md north-star)."""
        from softgnss_tpu.oracle import oracle_track_channel

        cfg, signal, channels = setup
        res = track(cfg.with_options(correlator_impl="megakernel"),
                    signal, channels, n_ms=60)
        orc = oracle_track_channel(
            cfg, signal, int(channels.prn[0]),
            float(channels.acquired_freq[0]),
            int(channels.code_phase[0]), 60)
        i_p = np.asarray(res.i_p[0], np.float64)
        scale = np.sqrt(np.mean(orc["i_p"] ** 2))
        assert np.sqrt(np.mean((i_p - orc["i_p"]) ** 2)) / scale < 1e-3
        assert np.max(np.abs(np.asarray(res.absolute_sample[0])
                             - orc["absolute_sample"])) <= 1


class TestMegaGeometryGuards:
    """The frames builder's sliding-roll residual shift must be exact for
    ANY window geometry (megakernel._builder_kernel wrap-free bound), and
    the kernel's static range asserts must reject out-of-range front
    ends instead of silently corrupting correlators."""

    def test_default_config_stays_mega_capable(self):
        assert sg.default_config()._mega_capable
        assert sg.fast_config(track_block_ms=16)._mega_capable

    @pytest.mark.parametrize("tile", [12, 64, 128])
    def test_builder_frames_exact_odd_geometries(self, tile):
        # compare build_frames (interpret mode off-TPU) against a plain
        # numpy gather at the exact per-channel word bases, including
        # window widths that do NOT sit on the 128-word DMA lane tile.
        # tile=12 resolves mega_split=2 on the fast front end, so the
        # q-major split-row layout is covered here too.
        import jax.numpy as jnp

        from softgnss_tpu.track.megakernel import build_frames
        from softgnss_tpu.track.tables import (MEGA_ALIGN_W, MEGA_PACK,
                                               mega_split, mega_window)

        cfg = sg.fast_config(track_tile=tile, track_block_ms=8)
        if not cfg._mega_capable:
            pytest.skip("front end not mega-capable")
        r, c_dim = 4, 3
        s_split = mega_split(cfg)
        win_w = mega_window(cfg) // MEGA_PACK
        half_w = win_w // s_split
        spc_w = cfg.samples_per_code // MEGA_PACK
        rng = np.random.default_rng(tile)
        cap = rng.integers(-2**30, 2**30,
                           (1, r * spc_w + win_w + 4 * MEGA_ALIGN_W),
                           np.int64).astype(np.int32)
        starts = rng.integers(0, 2 * MEGA_ALIGN_W, c_dim).astype(np.int32)
        frames = np.asarray(build_frames(cfg, r, c_dim,
                                         jnp.asarray(cap),
                                         jnp.asarray(starts)))
        assert frames.shape == (r, s_split * c_dim, half_w)
        for j in range(r):
            for c in range(c_dim):
                b = int(starts[c]) + j * spc_w
                for q in range(s_split):
                    np.testing.assert_array_equal(
                        frames[j, q * c_dim + c],
                        cap[0, b + q * half_w:b + (q + 1) * half_w])

    def test_out_of_range_front_end_rejected(self):
        # one code period per millisecond must fit the kernel's 16-bit
        # block-length estimate: a >=~65.5 MHz front end (spc >= 2^16-64)
        # must trip the static guard, not clamp blk and walk o negative.
        # (The companion span/digit-ramp assert is defense-in-depth only:
        # mega_grid caps span <= win/4, which the spc guard already keeps
        # below the int32 ramp bound.)
        from softgnss_tpu.track.megakernel import _check_kernel_ranges

        cfg = sg.default_config(sampling_freq=70e6,
                                intermediate_freq=17.5e6)
        assert cfg.samples_per_code + 64 >= (1 << 16)
        # 'auto' must degrade gracefully (pallas/onehot), not crash later
        assert not cfg._mega_capable
        # an explicit 'megakernel' choice stays loud
        with pytest.raises(ValueError, match="2\\^16"):
            _ = cfg.with_options(correlator_impl="megakernel").track_pack
        with pytest.raises(AssertionError, match="2\\^16"):
            _check_kernel_ranges(cfg)

    def test_high_subdivision_hb_span_rejected(self):
        # spacing 5/32: subdivision 32 passes the funnel (2*ds=10) and
        # word-count checks, but the per-lane sub-chip spread over the
        # window overflows the 15-bit hb_rel packing — 'auto' must not
        # pick the megakernel (the table builder raises for it).
        from softgnss_tpu.track.tables import mega_hb_span, mega_lane_tables

        cfg = sg.default_config(dll_correlator_spacing=5 / 32)
        assert mega_hb_span(cfg) >= (1 << 15) - 8
        assert not cfg._mega_capable
        with pytest.raises(ValueError, match="15-bit"):
            mega_lane_tables(cfg, np.array([1]), None)

    def test_wide_spacing_rejected(self):
        # the joint-word taps are read at bits hc, hc+ds, hc+2*ds of ONE
        # 32-bit funnel window: spacing 17/32 (subdivision 32, ds=17)
        # would build a 1<<34 tap mask — 'auto' must not pick the
        # megakernel, and building its tables must raise, not wrap.
        from softgnss_tpu.track.tables import mega_lane_tables, subdivision

        cfg = sg.default_config(dll_correlator_spacing=17 / 32)
        assert subdivision(cfg) == 32
        assert not cfg._mega_capable
        with pytest.raises(ValueError, match="funnel"):
            mega_lane_tables(cfg, np.array([1]), None)
        with pytest.raises(ValueError, match="funnel"):
            _ = cfg.with_options(correlator_impl="megakernel").track_pack


class TestMegaFusedFrames:
    def test_fused_matches_separate_bitwise(self, setup):
        """config.mega_fused_frames=True (builder DMA+rolls inside the
        kernel, no HBM frames array) must be BIT-IDENTICAL to the
        separate-builder path: same frames, same kernel arithmetic."""
        cfg, signal, channels = setup
        base = cfg.with_options(correlator_impl="megakernel")
        r1 = track(base, signal, channels, n_ms=48)
        r2 = track(base.with_options(mega_fused_frames=True),
                   signal, channels, n_ms=48)
        for f in ("i_p", "i_e", "i_l", "q_e", "q_p", "q_l",
                  "absolute_sample", "carr_freq", "code_freq"):
            np.testing.assert_array_equal(
                np.asarray(getattr(r1, f)), np.asarray(getattr(r2, f)),
                err_msg=f)
