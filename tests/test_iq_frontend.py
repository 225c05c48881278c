"""Complex I/Q front-end support (io.load_capture / upconvert_iq).

SDR front ends record interleaved complex I/Q at (near-)zero IF; the
reference reads one real int8 stream only (initialize.py:102).  Here the
complex capture is digitally upconverted to a real stream at fs/4 above
the recorded center — exact sign-flip/interleave picks — and the whole
real-IF engine applies unchanged.
"""

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu import io as sio
from softgnss_tpu.pipeline import run_receiver
from softgnss_tpu.signals.synth import (SatelliteSignal, synthesize_iq,
                                        synthesize_signal)

SATS = [SatelliteSignal(prn=9, doppler_hz=2300.0, delay_samples=777.0,
                        phase0=0.7),
        SatelliteSignal(prn=27, doppler_hz=-3400.0, delay_samples=2501.0,
                        phase0=3.9)]


class TestUpconversion:
    def test_exact_pick_pattern(self):
        cfg = sg.fast_config(intermediate_freq=0.0)
        iq = np.asarray(
            np.random.default_rng(0).integers(-127, 128, (64, 2)), np.int8)
        real, cfg2 = sio.upconvert_iq(cfg, iq[:, 0], iq[:, 1])
        assert cfg2.intermediate_freq == cfg.sampling_freq / 4.0
        np.testing.assert_array_equal(real[0::4], iq[0::4, 0])
        np.testing.assert_array_equal(real[1::4], -iq[1::4, 1])
        np.testing.assert_array_equal(real[2::4], -iq[2::4, 0])
        np.testing.assert_array_equal(real[3::4], iq[3::4, 1])

    def test_matches_direct_real_synthesis(self):
        """Upconverted complex synthesis == the real capture synthesized
        directly at fs/4 + baseband (same NCO quantization lineage up to
        the int8 rounding of two independently generated streams)."""
        cfg = sg.fast_config(intermediate_freq=0.0)
        iq = synthesize_iq(cfg, [SATS[0]], 20, noise_std=0.0, seed=1)
        real, cfg2 = sio.upconvert_iq(cfg, iq[:, 0], iq[:, 1])
        direct = synthesize_signal(cfg2, [SATS[0]], 20, noise_std=0.0,
                                   seed=1)
        n = len(real)
        # amplitude-1 signals quantize to {-1, 0, 1}: agreement up to the
        # independent rounding of the two lineages
        agree = np.mean(real[:n] == direct[:n])
        assert agree > 0.95, agree
        corr = np.corrcoef(real[:n].astype(float),
                           direct[:n].astype(float))[0, 1]
        assert corr > 0.97, corr


class TestIqEndToEnd:
    @pytest.fixture(scope="class")
    def iq_file(self, tmp_path_factory):
        cfg = sg.fast_config(intermediate_freq=0.0, number_of_channels=3)
        iq = synthesize_iq(cfg, SATS, 400, noise_std=1.5, seed=6)
        path = tmp_path_factory.mktemp("iq") / "capture_iq8.bin"
        np.asarray(iq, np.int8).tofile(path)
        return cfg, str(path)

    def test_iq8_receiver_chain(self, iq_file):
        cfg, path = iq_file
        c = cfg.with_options(data_format="iq8")
        results = run_receiver(c, file_name=path, n_ms=300, navigate=False)
        # the effective config carries the fs/4-shifted IF
        eff = results.config
        assert eff.intermediate_freq == cfg.sampling_freq / 4.0
        acq = results.acquisition
        for s in SATS:
            idx = s.prn - 1
            assert acq.peak_metric[idx] > c.acq_threshold
            spc = c.samples_per_code
            assert (abs(acq.code_phase[idx] - s.delay_samples % spc) <= 1
                    or abs(abs(acq.code_phase[idx] - s.delay_samples % spc)
                           - spc) <= 1)
            assert abs(acq.carr_freq[idx]
                       - (eff.intermediate_freq + s.doppler_hz)) < 10.0
        # tracking locks: data on I, carrier recovered
        tr = results.tracking
        tail = slice(150, None)
        # only the two live channels: idle rows are all-zero (0/0)
        lock = (np.abs(np.asarray(tr.i_p)[:2, tail]).mean(axis=1)
                / np.abs(np.asarray(tr.q_p)[:2, tail]).mean(axis=1))
        assert (lock > 5.0).all()

    def test_iq16_loads_like_iq8(self, iq_file):
        cfg, path = iq_file
        iq8 = np.fromfile(path, np.int8)
        (np.asarray(iq8, np.int16) << 8).tofile(path + "16")
        sig8, c8 = sio.load_capture(path, cfg.with_options(data_format="iq8"))
        sig16, c16 = sio.load_capture(
            path + "16", cfg.with_options(data_format="iq16"))
        np.testing.assert_array_equal(sig8, sig16)
        assert c8.intermediate_freq == c16.intermediate_freq
        assert c16.data_format == "int8"

    def test_offset_and_count(self, iq_file):
        cfg, path = iq_file
        c = cfg.with_options(data_format="iq8")
        full, _ = sio.load_capture(path, c)
        part, _ = sio.load_capture(path, c, count=1000, offset_samples=0)
        np.testing.assert_array_equal(part, full[:1000])
