"""Frequency-drift correction for FT8 beacons through a satellite channel.

Re-derivation of the reference's 4-stage corrector
(src/ft8_tools/ft8_beacon_receiver/frequency_correction.py:118):

  1. coarse detect — per-column argmax of the waterfall; sliding-window
     linear-regression residual variance as a continuity metric; the longest
     continuous segment wins,
  2. degree-1 fit of the argmax-frequency track -> linear drift rate;
     chirp de-rotation exp(-j 2 pi k t^2 / 2),
  3. fine time sync — correlate the de-rotated argmax track against a
     GFSK-shaped template of all three Costas sequences,
  4. degree-2 fit over only the three sync windows; phase-integral
     compensation exp(-j 2 pi (k t^2/2 + a t^3/3)).

The per-window sklearn LinearRegression loop (frequency_correction.py:65-81)
collapses into three sliding-sum convolutions; polynomial fits are closed-
form least squares on a handful of points; the heavy per-sample work (two
STFTs, chirp multiplies) runs as jitted device ops.  sklearn is not used.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gfsk import gauss_window
from ..ops.waterfall import waterfall_complex, waterfall_params
from ..protocol import constants as C

logger = logging.getLogger(__name__)

__all__ = ["detect_signal_continuity", "correct_frequency_drift",
           "apply_polynomial_drift"]

DEFAULT_PARAMS: dict = {
    "nsync_sym": 7,
    "ndata_sym": 58,
    "debug_plots": False,
    "window_size_factor": 4,      # window = factor * steps_per_symbol
    "max_variance_factor": 0.0001,  # threshold = factor * freq_bins^2
    "fit_middle_percent": 100,
    "bins_per_tone": 2,
    "steps_per_symbol": 2,
    "poly_degree": 2,
    "precise_sync": True,
}


# ---------------------------------------------------------------------------
# stage 1: continuity detection
# ---------------------------------------------------------------------------

def _sliding_residual_variance(y: np.ndarray, window: int) -> np.ndarray:
    """Residual variance of a per-window linear fit, all windows at once.

    For fixed x = 0..W-1:  var = (Syy_c - Sxy_c^2 / Sxx) / W  with centred
    sliding sums — equivalent to fitting sklearn's LinearRegression in every
    window and taking np.var of its residuals.
    """
    w = window
    x = np.arange(w, dtype=np.float64)
    sxx = np.sum((x - x.mean()) ** 2)
    ones = np.ones(w)
    s_y = np.convolve(y, ones, mode="valid")
    s_yy = np.convolve(y * y, ones, mode="valid")
    # sliding dot with x requires the kernel reversed for convolve
    s_xy = np.convolve(y, x[::-1], mode="valid")
    syy_c = s_yy - s_y * s_y / w
    sxy_c = s_xy - x.mean() * s_y
    var = (syy_c - sxy_c * sxy_c / sxx) / w
    return np.maximum(var, 0.0)


def detect_signal_continuity(max_freq_indices: np.ndarray, window_size: int = 8,
                             max_variance: float = 10.0):
    """(segments, continuity_metric) — reference semantics
    (frequency_correction.py:42-116): metric[i] = -variance of the linear
    fit over indices [i, i+window); segments are maximal runs where the
    metric exceeds -max_variance."""
    y = np.asarray(max_freq_indices, dtype=np.float64)
    if len(y) < window_size:
        return [], np.zeros(len(y))
    metric = -_sliding_residual_variance(y, window_size)
    is_signal = metric > -max_variance

    segments = []
    in_seg = False
    start = 0
    for i, flag in enumerate(is_signal):
        if flag and not in_seg:
            in_seg, start = True, i
        elif not flag and in_seg:
            in_seg = False
            if i - start >= 1:
                segments.append((start, i))
    if in_seg:
        segments.append((start, len(max_freq_indices) - 1))
    logger.debug("Detected signal segments: %s", segments)
    return segments, metric


# ---------------------------------------------------------------------------
# device ops
# ---------------------------------------------------------------------------

@jax.jit
def _apply_phase_cycles(wave_ri: jnp.ndarray, cyc: jnp.ndarray) -> jnp.ndarray:
    """x * exp(-j 2 pi cyc) on stacked (n, 2) [re, im] samples."""
    z = (wave_ri[..., 0] + 1j * wave_ri[..., 1]) * jnp.exp(-2j * jnp.pi * cyc)
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)


def apply_polynomial_drift(wave_ri, rate_hz_per_s: float,
                           acc_hz_per_s2: float, fs: float) -> jnp.ndarray:
    """y = x * exp(-j 2 pi (k t^2/2 + a t^3/3)) — the drift phase integral
    (frequency_correction.py:352-355, :604-611).  Set acc=0 for the linear
    stage.

    The cumulative phase reaches ~1e6 cycles for long/high-rate captures
    (900 Hz/s x 60 s = 1.62e6 cycles), where float32 quantisation is a
    sizeable fraction of a cycle; the cycle count is therefore computed in
    float64 on the host and reduced mod 1 before the float32 device rotate
    (drift rate and acceleration are host scalars here — the corrector fits
    them host-side — so nothing device-resident is lost).
    """
    n = np.shape(wave_ri)[-2]
    t = np.arange(n, dtype=np.float64) / float(fs)
    phase = (float(rate_hz_per_s) * t * t / 2.0
             + float(acc_hz_per_s2) * t * t * t / 3.0)
    cyc = (phase - np.floor(phase)).astype(np.float32)
    return _apply_phase_cycles(jnp.asarray(wave_ri), jnp.asarray(cyc))


def _argmax_track(wave_ri: np.ndarray, fs: float, bins_per_tone: int,
                  steps_per_symbol: int):
    """Waterfall argmax track of the positive-frequency spectrogram."""
    p = waterfall_params(fs, bins_per_tone, steps_per_symbol)
    num_frames = p.num_frames(wave_ri.shape[-2])
    mag = np.asarray(waterfall_complex(jnp.asarray(wave_ri), p, num_frames))
    return np.argmax(mag, axis=0), mag.shape[0], p


# ---------------------------------------------------------------------------
# the corrector
# ---------------------------------------------------------------------------

def _polyfit(x: np.ndarray, y: np.ndarray, degree: int) -> np.ndarray:
    """Least-squares polynomial fit; returns coefficients [c0, c1, ...]."""
    v = np.vander(x, degree + 1, increasing=True)
    coefs, *_ = np.linalg.lstsq(v, y, rcond=None)
    return coefs


def correct_frequency_drift(wave_complex, fs: float,
                            sym_bin: float = C.TONE_SPACING_HZ,
                            sym_t: float = C.SYMBOL_PERIOD_S,
                            params: dict | None = None,
                            return_model: bool = False):
    """Estimate and remove frequency drift from a complex capture.

    Returns (corrected_wave, drift_rate_per_sample) like the reference
    (frequency_correction.py:118-659).  Input may be numpy complex or
    stacked (n, 2) [re, im]; output matches the input convention.

    return_model=True appends the fitted frequency model as a third
    element: a dict with ``f_center_hz`` (mean frequency of the detected
    track after the linear stage — a beacon repeat's carrier estimate,
    used to align repeats before cross-transmission stacking),
    ``sync_time_s`` (stage-3 fine time sync, None before that stage),
    ``rate_hz_per_s``/``acc_hz_per_s2`` (stage-4 polynomial), and
    ``segment_s`` (detected signal span).  All fields are None on the
    failure paths that fall back to earlier stages.
    """
    merged = dict(DEFAULT_PARAMS)
    if params:
        merged.update(params)
    p = merged

    wave_in = np.asarray(wave_complex)
    complex_in = np.iscomplexobj(wave_in)
    if complex_in:
        ri = np.stack([wave_in.real, wave_in.imag], -1).astype(np.float32)
    else:
        ri = wave_in.astype(np.float32)

    model: dict = {"f_center_hz": None, "sync_time_s": None,
                   "rate_hz_per_s": None, "acc_hz_per_s2": None,
                   "segment_s": None}

    def out(r, rate):
        if complex_in:
            r = r[..., 0] + 1j * r[..., 1]
        return (r, rate, model) if return_model else (r, rate)

    bins_per_tone = p["bins_per_tone"]
    steps_per_symbol = p["steps_per_symbol"]
    window_size = p["window_size_factor"] * steps_per_symbol

    # ---- stage 1: coarse detection on the argmax track
    track, freq_bins, wfp = _argmax_track(ri, fs, bins_per_tone,
                                          steps_per_symbol)
    max_variance = p["max_variance_factor"] * freq_bins ** 2
    segments, _metric = detect_signal_continuity(track, window_size,
                                                 max_variance)
    if not segments:
        logger.warning("No continuous signal segments detected, "
                       "returning original signal")
        return out(ri, 0.0)

    start_idx, end_idx = max(segments, key=lambda s: s[1] - s[0])

    freq_step = sym_bin / wfp.freq_osr
    time_step = sym_t / wfp.time_osr
    model["segment_s"] = (start_idx * time_step, end_idx * time_step)
    max_freqs = track.astype(np.float64) * freq_step
    time_axis = np.arange(len(max_freqs)) * time_step

    # ---- stage 2: linear drift fit + first chirp compensation
    seg_t = time_axis[start_idx:end_idx]
    seg_f = max_freqs[start_idx:end_idx]
    if p["fit_middle_percent"] < 100:
        trim = int(len(seg_t) * (100 - p["fit_middle_percent"]) / 2 / 100)
        if trim > 0 and 2 * trim < len(seg_t):
            seg_t, seg_f = seg_t[trim:-trim], seg_f[trim:-trim]
    coefs = _polyfit(seg_t, seg_f, 1)
    f_shift_rate = float(coefs[1]) if len(coefs) > 1 else 0.0

    ri_linear = np.asarray(apply_polynomial_drift(
        jnp.asarray(ri), f_shift_rate, 0.0, float(fs)))

    if not p["precise_sync"]:
        return out(ri_linear, f_shift_rate / fs)

    # ---- stage 3: fine time sync on the de-rotated track
    track2, _, _ = _argmax_track(ri_linear, fs, bins_per_tone,
                                 steps_per_symbol)
    max_freqs2 = track2.astype(np.float64) * freq_step

    time_osr = wfp.time_osr
    nsync = p["nsync_sym"]
    ndata = p["ndata_sym"]
    sync_seq = (C.COSTAS_PATTERN.astype(np.float64) + 1)
    sync_seq = sync_seq - sync_seq.mean()
    samples_per_sym = time_osr * 2
    t_pulse = np.linspace(-1.0, 1.0, samples_per_sym + 1)
    gfsk_shape = np.asarray(gauss_window(2.0, jnp.asarray(t_pulse)))

    one_seq = np.zeros((nsync - 1) * time_osr + samples_per_sym + 1)
    for s in range(nsync):
        one_seq[s * time_osr: s * time_osr + samples_per_sym + 1] += \
            gfsk_shape * sync_seq[s]
    template = np.zeros((3 * nsync + ndata - 1) * time_osr + 1
                        + samples_per_sym)
    for i in range(3):
        o = i * (nsync + ndata // 2) * time_osr
        template[o: o + len(one_seq)] = one_seq

    # mask the track to the detected segment (reference end fix-up :368)
    seg_end = end_idx + window_size - 2
    masked = np.zeros_like(max_freqs2)
    masked[start_idx:seg_end] = max_freqs2[start_idx:seg_end]
    model["f_center_hz"] = float(masked[start_idx:seg_end].mean())
    masked[start_idx:seg_end] -= masked[start_idx:seg_end].mean()

    corr = np.correlate(masked, template, mode="full")
    peak = int(np.argmax(corr))
    sync_block = peak - (len(template) - 1) + samples_per_sym // 2
    model["sync_time_s"] = sync_block * time_step
    model["rate_hz_per_s"] = f_shift_rate   # refined below if stage 4 runs

    # ---- stage 4: high-order fit over the three sync windows only
    # sync_block can be NEGATIVE when the correlation peak sits at the
    # very start of the capture (weak signal, partial first sync group);
    # a negative python slice start wraps around, so clamp both ends or
    # reg_x/reg_y lengths diverge and the lstsq below raises.
    reg_x, reg_y = [], []
    for i in range(3):
        s = i * (nsync + ndata // 2) * time_osr + sync_block
        e = min(s + (nsync - 1) * time_osr, len(masked))
        s = max(s, 0)
        if s < e:
            reg_x.append(np.arange(s, e) * time_step)
            reg_y.append(masked[s:e])
    reg_x = np.concatenate(reg_x) if reg_x else np.array([])
    reg_y = np.concatenate(reg_y) if reg_y else np.array([])

    if len(reg_x) < 10:
        logger.warning("Not enough sync points found, using linear fit")
        return out(ri_linear, f_shift_rate / fs)

    degree = p["poly_degree"]
    if len(reg_x) <= degree + 1:
        logger.warning("Not enough data for high-order fitting")
        return out(ri_linear, f_shift_rate / fs)
    if degree not in (1, 2):
        logger.warning("poly_degree must be 1 or 2, using linear fit")
        return out(ri_linear, f_shift_rate / fs)

    cf = _polyfit(reg_x, reg_y, degree)
    rate_final = float(cf[1]) if len(cf) > 1 else 0.0
    acc_final = float(cf[2]) if len(cf) > 2 else 0.0
    model["rate_hz_per_s"] = rate_final + f_shift_rate
    model["acc_hz_per_s2"] = acc_final

    ri_final = np.asarray(apply_polynomial_drift(
        jnp.asarray(ri_linear), rate_final, acc_final, float(fs)))

    logger.info("Final drift parameters: rate=%.4f Hz/s acc=%.4e Hz/s^2 "
                "sync_time=%.3f s", rate_final, acc_final,
                sync_block * time_step)

    # reference's reported rate: secant slope of the final fit plus the
    # linear stage (frequency_correction.py:645-655)
    first = np.polyval(cf[::-1], reg_x[0])
    last = np.polyval(cf[::-1], reg_x[-1])
    rate_real = (first - last) / (reg_x[0] - reg_x[-1]) + f_shift_rate
    return out(ri_final, rate_real / fs)
