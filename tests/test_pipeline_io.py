"""IO readers, probe, pipeline orchestration, CLI plumbing."""

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu import io as sio
from softgnss_tpu.cli import build_config, main
from softgnss_tpu.pipeline import load_tracking, run_receiver, save_tracking
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal


class TestIO:
    def test_int8_round_trip(self, tmp_path, rng):
        data = rng.integers(-128, 128, size=10000).astype(np.int8)
        path = str(tmp_path / "cap.bin")
        sio.write_if_samples(path, data)
        cfg = sg.fast_config()
        out = sio.read_if_samples(path, cfg)
        np.testing.assert_array_equal(out, data)
        out = sio.read_if_samples(path, cfg, count=100, offset_samples=50)
        np.testing.assert_array_equal(out, data[50:150])

    def test_int16(self, tmp_path, rng):
        data = (rng.integers(-128, 128, size=1000) * 256).astype(np.int16)
        path = str(tmp_path / "cap16.bin")
        data.tofile(path)
        cfg = sg.fast_config(data_format="int16")
        out = sio.read_if_samples(path, cfg)
        np.testing.assert_array_equal(out, (data >> 8).astype(np.int8))

    def test_uint8(self, tmp_path):
        data = np.asarray([0, 128, 255, 130], np.uint8)
        path = str(tmp_path / "capu8.bin")
        data.tofile(path)
        cfg = sg.fast_config(data_format="uint8")
        out = sio.read_if_samples(path, cfg)
        np.testing.assert_array_equal(out, [-128, 0, 127, 2])

    def test_int4_packing(self, tmp_path):
        # byte 0x2F: low nibble 0xF = -1, high nibble 0x2 = +2
        np.asarray([0x2F, 0x81], np.uint8).tofile(tmp_path / "cap4.bin")
        cfg = sg.fast_config(data_format="int4")
        out = sio.read_if_samples(str(tmp_path / "cap4.bin"), cfg)
        np.testing.assert_array_equal(out, [-1, 2, 1, -8])
        out = sio.read_if_samples(str(tmp_path / "cap4.bin"), cfg, count=2,
                                  offset_samples=1)
        np.testing.assert_array_equal(out, [2, 1])

    def test_int2_and_int1(self, tmp_path):
        np.asarray([0b11100100], np.uint8).tofile(tmp_path / "cap2.bin")
        cfg = sg.fast_config(data_format="int2")
        out = sio.read_if_samples(str(tmp_path / "cap2.bin"), cfg)
        np.testing.assert_array_equal(out, [1, 3, -1, -3])
        cfg = sg.fast_config(data_format="int1")
        np.asarray([0b00000101], np.uint8).tofile(tmp_path / "cap1.bin")
        out = sio.read_if_samples(str(tmp_path / "cap1.bin"), cfg)
        np.testing.assert_array_equal(out, [-1, 1, -1, 1, 1, 1, 1, 1])

    def test_bad_format(self, tmp_path):
        np.zeros(4, np.uint8).tofile(tmp_path / "x.bin")
        with pytest.raises(ValueError, match="data_format"):
            sio.read_if_samples(str(tmp_path / "x.bin"),
                                sg.fast_config(data_format="float99"))

    def test_probe(self, rng):
        cfg = sg.fast_config()
        sig = rng.integers(-20, 21, size=12 * cfg.samples_per_code).astype(np.int8)
        stats = sio.probe_data(cfg, sig)
        assert stats["n_samples"] == 10 * cfg.samples_per_code
        assert abs(stats["mean"]) < 1.0
        assert 10 < stats["std"] < 14
        assert stats["clipped_fraction"] == 0.0
        assert stats["psd"].shape == stats["psd_freqs_hz"].shape
        with pytest.raises(ValueError):
            sio.probe_data(cfg, sig[:100])


@pytest.fixture(scope="module")
def small_capture():
    cfg = sg.fast_config(number_of_channels=4)
    sats = [SatelliteSignal(prn=7, doppler_hz=1500.0, delay_samples=1234.0),
            SatelliteSignal(prn=21, doppler_hz=-2500.0, delay_samples=3000.0)]
    sig = synthesize_signal(cfg, sats, 600, noise_std=1.5, seed=5)
    return cfg, sats, sig


class TestPipeline:
    def test_acquire_track_stages(self, small_capture):
        cfg, sats, sig = small_capture
        res = run_receiver(cfg, signal=sig, n_ms=500, navigate=False, probe=True)
        assert res.probe is not None
        assert set(np.flatnonzero(res.acquisition.acquired) + 1) == {7, 21}
        assert res.tracking.n_ms == 500
        assert "acquire" in res.timings_s and "track" in res.timings_s
        assert not res.has_fix
        text = res.summary()
        assert "Acquired 2 satellites" in text and "PRN" in text

    def test_checkpoint_round_trip(self, small_capture, tmp_path):
        cfg, sats, sig = small_capture
        ckpt = str(tmp_path / "track.npz")
        res1 = run_receiver(cfg, signal=sig, n_ms=300, navigate=False, checkpoint=ckpt)
        res2 = run_receiver(cfg, signal=sig, n_ms=300, navigate=False, checkpoint=ckpt)
        np.testing.assert_array_equal(res1.tracking.i_p, res2.tracking.i_p)
        tr = load_tracking(ckpt)
        np.testing.assert_array_equal(tr.absolute_sample, res1.tracking.absolute_sample)
        assert tr.status == res1.tracking.status

    def test_file_input(self, small_capture, tmp_path):
        cfg, sats, sig = small_capture
        path = str(tmp_path / "cap.bin")
        sio.write_if_samples(path, sig)
        res = run_receiver(cfg, signal=None, file_name=path, n_ms=200, navigate=False)
        assert res.acquisition.acquired.sum() == 2
        assert "read" in res.timings_s

    def test_channels_override_skips_acquisition(self, small_capture):
        """Pre-assigned channels (the reference's skipAcquisition path)."""
        from softgnss_tpu.acquire import acquire, assign_channels

        cfg, sats, sig = small_capture
        ch = assign_channels(cfg, acquire(cfg, sig))
        res = run_receiver(cfg.with_options(skip_acquisition=True),
                           signal=sig, n_ms=200, navigate=False, channels=ch)
        assert res.acquisition is None
        assert "acquire" not in res.timings_s
        base = run_receiver(cfg, signal=sig, n_ms=200, navigate=False)
        np.testing.assert_array_equal(res.tracking.i_p, base.tracking.i_p)
        with pytest.raises(ValueError, match="skip_acquisition"):
            run_receiver(cfg.with_options(skip_acquisition=True),
                         signal=sig, n_ms=100)

    def test_skip_samples(self, small_capture):
        """A skipped prefix shifts acquisition but absolute bookkeeping holds
        (reference skipNumberOfBytes, initialize.py:94)."""
        cfg, sats, sig = small_capture
        skip = 2 * cfg.samples_per_code
        cfg_skip = cfg.with_options(skip_samples=skip)
        padded = np.concatenate([np.zeros(skip, np.int8), sig])
        res = run_receiver(cfg_skip, signal=padded, n_ms=200, navigate=False)
        base = run_receiver(cfg, signal=sig, n_ms=200, navigate=False)
        np.testing.assert_array_equal(res.acquisition.code_phase,
                                      base.acquisition.code_phase)
        active = [c for c, s in enumerate(base.tracking.status) if s == "T"]
        np.testing.assert_array_equal(
            res.tracking.absolute_sample[active] - skip,
            base.tracking.absolute_sample[active])
        np.testing.assert_array_equal(res.tracking.i_p, base.tracking.i_p)

    def test_too_short_capture(self):
        cfg = sg.fast_config()
        with pytest.raises(ValueError, match="too short"):
            run_receiver(cfg, signal=np.zeros(100, np.int8))

    def test_noise_only_no_channels(self, rng):
        cfg = sg.fast_config()
        sig = rng.integers(-3, 4, size=15 * cfg.samples_per_code).astype(np.int8)
        res = run_receiver(cfg, signal=sig, n_ms=10)
        assert res.channels is None and res.tracking is None
        assert not res.has_fix


class TestPlots:
    def test_probe_acquisition_tracking_plots(self, small_capture, tmp_path):
        import os

        from softgnss_tpu import plots

        cfg, sats, sig = small_capture
        res = run_receiver(cfg, signal=sig, n_ms=200, navigate=False, probe=True)
        paths = [plots.plot_probe(cfg, res.probe, str(tmp_path)),
                 plots.plot_acquisition(cfg, res.acquisition, str(tmp_path)),
                 plots.plot_tracking(cfg, res.tracking, 0, str(tmp_path)),
                 plots.plot_lock(cfg, res.tracking, str(tmp_path))]
        for p in paths:
            assert os.path.getsize(p) > 10000
        all_paths = plots.plot_all(cfg.with_options(plot_tracking=True), res,
                                   out_dir=str(tmp_path))
        # probe + acquisition + per-live-channel tracking + lock dashboard
        assert len(all_paths) == 3 + sum(1 for s in res.tracking.status if s != "-")


class TestCLI:
    def test_build_config_overrides(self):
        class Args:
            fast = True
            set = ["number_of_channels=6", "acq_threshold=3.5", "plot_tracking=true"]
            file = "x.bin"
            ms = 123
        cfg = build_config(Args())
        assert cfg.number_of_channels == 6
        assert cfg.acq_threshold == 3.5
        assert cfg.plot_tracking is True
        assert cfg.file_name == "x.bin"
        assert cfg.ms_to_process == 123

    def test_build_config_rejects_unknown(self):
        class Args:
            fast = False
            set = ["not_a_field=1"]
            file = None
            ms = None
        with pytest.raises(SystemExit):
            build_config(Args())

    def test_cli_probe_only(self, small_capture, tmp_path, capsys):
        cfg, sats, sig = small_capture
        path = str(tmp_path / "cap.bin")
        sio.write_if_samples(path, sig)
        rc = main(["--fast", "--file", path, "--probe-only", "--cpu"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Probed" in out

    def test_cli_stream(self, small_capture, tmp_path, capsys):
        cfg, sats, sig = small_capture
        path = str(tmp_path / "cap.bin")
        sio.write_if_samples(path, sig)
        rc = main(["--fast", "--file", path, "--stream", "--no-nav", "--cpu",
                   "--ms", "300", "--set", "track_stream_chunk_ms=128"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Tracked 300 ms" in out

    def test_cli_stream_mesh_conflict(self):
        with pytest.raises(SystemExit):
            main(["--fast", "--synthetic", "--stream", "--mesh", "1x1", "--cpu"])

    def test_cli_requires_input(self):
        with pytest.raises(SystemExit):
            main(["--fast"])
