"""Float64 NumPy oracle of the receiver math, for parity tests and baselines.

This is a freshly written, vectorized re-derivation of the reference's
*mathematics* (the equations in SURVEY.md §2/§3, cited per function below) in
NumPy float64.  It exists because the reference itself is Python 2 and cannot
run here (SURVEY.md, preamble): tests compare the TPU receiver's correlator
time series and acquisition grids against this oracle (<1e-3 RMS target,
BASELINE.md), and bench.py uses it as the self-measured CPU baseline.

It is *not* part of the receiver — nothing imports it outside tests/bench.
"""

from __future__ import annotations

import numpy as np

from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.signals.ca import ca_table, padded_code


def oracle_acquire_grid(config: ReceiverConfig, long_signal: np.ndarray, prn: int):
    """Acquisition correlation grid + peak metric for one PRN, float64.

    Math per reference acquisition.py:55-164: two 1-ms coherent FFT
    correlations per Doppler bin, keep the stronger row, peak / second-peak
    with a +/-1 chip exclusion zone.
    Returns (grid (bins, spc), code_phase, bin_index, metric).
    """
    spc = config.samples_per_code
    fs = config.sampling_freq
    sig1 = long_signal[:spc].astype(np.float64)
    sig2 = long_signal[spc:2 * spc].astype(np.float64)
    t = np.arange(spc) / fs

    code_fd = np.conj(np.fft.fft(ca_table(config)[prn - 1].astype(np.float64)))
    freqs = np.asarray(config.doppler_bin_freqs)
    # sin(th) + 1j*cos(th) mixing, as in the reference (acquisition.py:103-117)
    theta = 2.0 * np.pi * freqs[:, None] * t[None, :]
    mixer = np.sin(theta) + 1j * np.cos(theta)
    r1 = np.abs(np.fft.ifft(np.fft.fft(mixer * sig1) * code_fd)) ** 2
    r2 = np.abs(np.fft.ifft(np.fft.fft(mixer * sig2) * code_fd)) ** 2
    take1 = r1.max(axis=1, keepdims=True) > r2.max(axis=1, keepdims=True)
    grid = np.where(take1, r1, r2)

    flat = int(np.argmax(grid))
    bin_index, code_phase = divmod(flat, spc)
    peak = grid[bin_index, code_phase]
    pos = np.arange(spc)
    dist = np.abs(pos - code_phase)
    circ = np.minimum(dist, spc - dist)
    second = grid[bin_index, circ >= config.samples_per_chip].max()
    return grid, code_phase, bin_index, peak / second


def oracle_track_channel(config: ReceiverConfig, signal: np.ndarray, prn: int,
                         acq_freq: float, code_phase: int, n_ms: int):
    """Track one channel for n_ms milliseconds in float64.

    Implements the loop equations of reference tracking.py:107-275 with the
    reference's float64 linspace/ceil code-phase formulation (not the integer
    NCO) so it is an independent formulation of the same math.
    Returns a dict of per-ms arrays.
    """
    fs = config.sampling_freq
    spacing = config.dll_correlator_spacing
    tau1c, tau2c = config.pll_taus
    tau1d, tau2d = config.dll_taus
    pdi = config.pdi_s

    code = padded_code(prn).astype(np.float64)
    ptr = config.skip_samples + int(code_phase)
    code_freq = config.code_freq_basis
    rem_code = 0.0
    carr_freq = float(acq_freq)
    rem_carr = 0.0
    nco_carr = err_carr = nco_code = err_code = 0.0
    K = config.pdi_ms
    acc = [0.0] * 6

    log = {k: np.zeros(n_ms) for k in (
        "absolute_sample", "code_freq", "carr_freq", "i_p", "i_e", "i_l",
        "q_e", "q_p", "q_l", "dll_discr", "dll_discr_filt", "pll_discr",
        "pll_discr_filt")}

    for ms in range(n_ms):
        step = code_freq / fs
        blk = int(np.ceil((config.code_length - rem_code) / step))
        raw = signal[ptr:ptr + blk].astype(np.float64)
        if raw.shape[0] != blk:
            raise ValueError("oracle ran out of samples")
        ptr += blk

        tcode = rem_code + step * np.arange(blk)
        early = code[np.ceil(tcode - spacing).astype(np.int64)]
        prompt = code[np.ceil(tcode).astype(np.int64)]
        late = code[np.ceil(tcode + spacing).astype(np.int64)]
        rem_code = tcode[blk - 1] + step - config.code_length

        trig = carr_freq * 2.0 * np.pi * np.arange(blk + 1) / fs + rem_carr
        rem_carr = trig[blk] % (2.0 * np.pi)
        i_bb = np.sin(trig[:blk]) * raw
        q_bb = np.cos(trig[:blk]) * raw

        i_e, q_e = early @ i_bb, early @ q_bb
        i_p, q_p = prompt @ i_bb, prompt @ q_bb
        i_l, q_l = late @ i_bb, late @ q_bb

        # coherent accumulation over config.pdi_ms code periods (K == 1 is
        # the reference cadence); filters update on the K-period totals
        acc = [a + v for a, v in zip(acc, (i_e, i_p, i_l, q_e, q_p, q_l))]
        if ms % K == K - 1:
            a_ie, a_ip, a_il, a_qe, a_qp, a_ql = acc
            c_err = np.arctan(a_qp / a_ip) / (2.0 * np.pi)
            nco_carr += tau2c / tau1c * (c_err - err_carr) + c_err * (pdi / tau1c)
            err_carr = c_err
            carr_freq = acq_freq + nco_carr

            e_mag, l_mag = np.hypot(a_ie, a_qe), np.hypot(a_il, a_ql)
            d_err = (e_mag - l_mag) / (e_mag + l_mag)
            nco_code += tau2d / tau1d * (d_err - err_code) + d_err * (pdi / tau1d)
            err_code = d_err
            code_freq = config.code_freq_basis - nco_code
            acc = [0.0] * 6
        d_err, c_err = err_code, err_carr

        log["absolute_sample"][ms] = ptr
        log["code_freq"][ms] = code_freq
        log["carr_freq"][ms] = carr_freq
        log["i_p"][ms], log["i_e"][ms], log["i_l"][ms] = i_p, i_e, i_l
        log["q_e"][ms], log["q_p"][ms], log["q_l"][ms] = q_e, q_p, q_l
        log["dll_discr"][ms], log["dll_discr_filt"][ms] = d_err, nco_code
        log["pll_discr"][ms], log["pll_discr_filt"][ms] = c_err, nco_carr
    return log
