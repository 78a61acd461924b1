"""Known-payload beacon detection: full-track energy correlation.

The reference exists to receive a KNOWN beacon through a satellite channel
(its channel fixtures carry one fixed payload end-to-end,
src/tests/channel/test_signal_after_channel.py:34, and the beacon receiver
src/ft8_tools/ft8_beacon_receiver/ tracks that one transmitter) — yet its
only detector is the 21-cell Costas sync score.  When the payload is known
a priori, all 79 symbols of the tone track are usable sync: this module
correlates the waterfall's LINEAR power against the full known track,
which buys ~10·log10(79/21) ≈ 5.8 dB of detection SNR over Costas-only
sync and needs no decode at all — presence, time and frequency of the
beacon are established far below the decode threshold.

Statistic.  At grid point (t, f), with per-cell linear powers P:

    D(t, f) = sum_s [ P(f + track[s]·phi, t + s·tau)
                      - (1/8) sum_j P(f + j·phi, t + s·tau) ]

Under noise-only, each cell's contrast is zero-mean with variance
(7/8)·var(P) (exponentially-distributed P gives var(P) = mu^2; an R-repeat
average gives mu^2/R), so

    z(t, f) = D / sqrt(0.875 * count * var(P))

is a unit-variance detection score with var(P) estimated empirically from
the grid (count = number of in-bounds cells).  Repeats of the transmission
(a beacon transmits every 15-s cycle) average their linear power grids
first — noise variance drops by R, z grows ~sqrt(R).

Caveat: the track shares its 21 Costas cells with every FT8 signal, so a
strong UNRELATED transmission at the same grid point scores ~21/79 + the
chance data-tone matches of a true hit; detection confirms the known
track, it does not decode.  Pair with decode_ft8_stacked when bits must
be confirmed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sync import SearchGrid, search_grid
from ..ops.waterfall import waterfall_params
from ..protocol import constants as C
from ..protocol.encode import encode_tones

__all__ = ["KnownDetection", "TrackFix", "known_track_scores",
           "detect_known_payload", "track_known_payload"]


class KnownDetection(NamedTuple):
    """One detection of the known track."""

    time_sec: float
    freq_hz: float
    z: float          # unit-variance detection score (noise-only: ~N(0,1))


def _track_masks(g: SearchGrid) -> tuple[np.ndarray, np.ndarray]:
    """(79, num_times) per-cell validity + (num_times,) counts (host)."""
    t = g.t_start + np.arange(g.num_times)
    base = np.floor_divide(t, g.time_osr)
    s = np.arange(C.NUM_SYMBOLS)[:, None]
    valid = (base[None, :] + s >= 0) & (base[None, :] + s < g.num_blocks)
    return valid, valid.sum(axis=0)


@functools.partial(jax.jit, static_argnames=("g",))
def known_track_scores(linpow: jnp.ndarray, track: jnp.ndarray,
                       g: SearchGrid) -> jnp.ndarray:
    """Linear power grid (F, T) + known track (79,) -> z grid (nF, nT).

    Same stencil structure as ops/sync.py sync_scores (statically-offset
    slices over a padded grid, validity masks zeroing out-of-bounds
    cells), but per-cell tone offsets come from the traced track (the
    payload is a runtime argument — one compilation serves every beacon)
    and the contrast baseline is the exact 8-tone mean, evaluated via a
    precomputed 8-shift row sum.  The padding/row-sum machinery and the
    (7/8)·var(P)·count noise normalisation are shared with the
    unknown-payload stacked search statistic (ops/sync.py sync_scores_z).
    """
    from ..ops.sync import _pad_and_tone_sum, _z_normalise

    padded, s8, left = _pad_and_tone_sum(linpow, g)
    valid, count = _track_masks(g)
    total = jnp.zeros((g.num_freqs, g.num_times), jnp.float32)
    for s in range(C.NUM_SYMBOLS):
        start = left + g.t_start + s * g.time_osr
        on = jax.lax.dynamic_slice(
            padded, (track[s] * g.freq_osr, start),
            (g.num_freqs, g.num_times))
        mean8 = jax.lax.dynamic_slice_in_dim(
            s8, start, g.num_times, axis=-1) * 0.125
        total = total + jnp.asarray(valid[s], jnp.float32) * (on - mean8)
    return _z_normalise(total, linpow, count)


@functools.partial(jax.jit, static_argnames=("p", "num_frames",
                                             "is_complex", "top_k"))
def _detect_grid(waves: jnp.ndarray, track: jnp.ndarray, p, num_frames: int,
                 is_complex: bool, top_k: int):
    from ..demod.stack import _stacked_power_and_spec

    # R > 1 repeats are noise-floor-equalised (receiver gain varies across
    # cycles; see demod/stack.py) so the averaged grid keeps the full
    # sqrt(R) detection gain under AGC steps
    linpow, _, _ = _stacked_power_and_spec(waves, p, num_frames, is_complex,
                                           equalize=waves.shape[0] > 1)
    g = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)
    z = known_track_scores(linpow, track, g)
    vals, idx = jax.lax.top_k(z.reshape(-1), top_k)
    return vals, g.t_start + idx % g.num_times, idx // g.num_times


def detect_known_payload(waves, sample_rate: float, payload,
                         bins_per_tone: int = 2, steps_per_symbol: int = 2,
                         top_k: int = 4,
                         min_z: float = 6.0) -> list[KnownDetection]:
    """Find a KNOWN transmission's (time, frequency) without decoding.

    waves: (n,) or (R, n) real or complex — R slot-aligned repeats average
    their linear power grids (z grows ~sqrt(R)).  payload: the known
    10-byte FT8 payload.  Returns detections with z >= min_z, strongest
    first.  min_z=6 measures 0 false alarms over 200 noise-only slots
    (~2e7 grid points) while a single slot at fs 2 kHz detects to ~-20 dB
    and an 8-repeat stack to ~-25 dB (tests/test_known_detect.py,
    docs/DESIGN_NOTES.md).
    """
    from ..demod.stack import as_device_stack

    wave_d, is_complex = as_device_stack(waves)
    p = waterfall_params(sample_rate, bins_per_tone, steps_per_symbol)
    if wave_d.shape[1] < p.nperseg:
        return []
    num_frames = p.num_frames(wave_d.shape[1])
    g = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)
    if g.num_times <= 0 or g.num_freqs <= 0:
        # capture too short for even one full-window score column (the
        # decode paths guard this inside find_candidates; top_k needs a
        # non-empty grid at trace time)
        return []
    track = encode_tones(jnp.asarray(np.asarray(payload, np.uint8)))
    top_k = min(top_k, g.num_times * g.num_freqs)
    zs, ts, fs_ = _detect_grid(wave_d, track.astype(jnp.int32), p,
                               num_frames, is_complex, top_k)
    hop_seconds = C.SYMBOL_PERIOD_S / p.time_osr
    freq_step = C.TONE_SPACING_HZ / p.freq_osr
    out = []
    for z, t, f in zip(np.asarray(zs), np.asarray(ts), np.asarray(fs_)):
        if float(z) >= min_z:
            out.append(KnownDetection(
                time_sec=float(t) * hop_seconds,
                freq_hz=float(f) * freq_step,
                z=float(z)))
    return out


# ---------------------------------------------------------------------------
# coherent tracking with a position prior

class TrackFix(NamedTuple):
    """One coherent verification of the known track at a predicted spot."""

    detected: bool
    stat: float       # normalised coherent energy (noise-only mean ~6.5,
                      # measured 30-slot noise max ~10; threshold def. 15)
    time_sec: float   # refined start time
    freq_hz: float    # refined base-tone frequency (incl. sub-bin df)


@functools.partial(jax.jit, static_argnames=("sps", "is_complex",
                                             "df_half_cps"))
def _track_stat(wave: jnp.ndarray, track: jnp.ndarray, start0, f0_cps,
                sps: int, is_complex: bool, df_half_cps: float = 0.096):
    """Max over (dt, df) of the normalised coherent track energy.

    wave: (n[, 2]); track (79,) tone ids; start0: sample index of symbol
    0; f0_cps: base tone frequency in cycles/sample.  Fully coherent
    integration of all 79 symbols — ~5 log10(79) dB more detection reach
    than noncoherent energy summing, usable when a PRIOR localises the
    search (satellite model prediction, previous cycle's fix).
    """
    if not is_complex:
        n = wave.shape[0]
        spec = jnp.fft.fft(wave.astype(jnp.complex64))
        weight = jnp.zeros(n, jnp.float32).at[0].set(1.0)
        weight = weight.at[1:(n + 1) // 2].set(2.0)
        if n % 2 == 0:
            weight = weight.at[n // 2].set(1.0)
        a = jnp.fft.ifft(spec * weight)
        wave = jnp.stack([jnp.real(a), jnp.imag(a)], -1)

    n_sig = C.NUM_SYMBOLS * sps
    xp = jnp.pad(wave.astype(jnp.float32), ((n_sig, n_sig), (0, 0)))
    # per-symbol on-track mix e^{-2pi i (f0 + track_s * 1/sps) n}
    ns = jnp.arange(sps).astype(jnp.float32)
    freqs = f0_cps + track.astype(jnp.float32) / sps         # (79,)
    ang = -2.0 * jnp.pi * freqs[:, None] * ns[None, :]       # (79, sps)
    mxc, mxs = jnp.cos(ang), jnp.sin(ang)

    dts = jnp.arange(-(sps // 8) * 4, (sps // 8) * 4 + 1, sps // 16)
    T_sym = jnp.arange(C.NUM_SYMBOLS).astype(jnp.float32)
    # the mix restarts phase at each window, so the HINT frequency
    # leaves a deterministic residual step of frac(f0 * sps) cycles per
    # symbol — remove it up front so the df search is centred on the
    # hint, not on the absolute 6.25-Hz tone grid (a Doppler-shifted
    # beacon lands off that grid ~80% of the time, and without this the
    # tracker only locked for hints at exact tone multiples)
    step0 = jnp.mod(f0_cps * sps, 1.0)
    ang_hint = -2.0 * jnp.pi * step0 * T_sym                 # (79,)
    hc, hs = jnp.cos(ang_hint), jnp.sin(ang_hint)
    # df grid at ~4 samples per coherence lobe; the range is the caller's
    # frequency tolerance — a tight prior keeps the noise-max small
    n_df = int(np.ceil(2 * df_half_cps * 4 * C.NUM_SYMBOLS)) | 1
    dfs = jnp.linspace(-df_half_cps, df_half_cps, n_df)
    ramp = -2.0 * jnp.pi * dfs[:, None] * T_sym[None, :]     # (D, 79)
    rc, rs = jnp.cos(ramp), jnp.sin(ramp)

    def per_dt(dt):
        start = jnp.clip(start0 + n_sig + dt, 0, xp.shape[0] - n_sig)
        win = jax.lax.dynamic_slice_in_dim(xp, start, n_sig, 0)
        win = win.reshape(C.NUM_SYMBOLS, sps, 2)
        zr0 = jnp.sum(win[..., 0] * mxc - win[..., 1] * mxs, axis=-1)
        zi0 = jnp.sum(win[..., 0] * mxs + win[..., 1] * mxc, axis=-1)
        zr = zr0 * hc - zi0 * hs       # remove the hint's phase step
        zi = zr0 * hs + zi0 * hc
        noise = jnp.median(zr * zr + zi * zi) / 0.6931
        sr = zr @ rc.T - zi @ rs.T                           # (D,)
        si = zr @ rs.T + zi @ rc.T
        e = sr * sr + si * si
        i = jnp.argmax(e)
        return e[i] / (C.NUM_SYMBOLS * jnp.maximum(noise, 1e-30)), dfs[i]

    stats, best_df = jax.vmap(per_dt)(dts)
    j = jnp.argmax(stats)
    return stats[j], dts[j], best_df[j]


def track_known_payload(wave, sample_rate: float, payload,
                        time_hint_s: float, freq_hint_hz: float,
                        threshold: float = 15.0,
                        freq_tolerance_hz: float = 0.6) -> TrackFix:
    """Coherent beacon tracking at a PREDICTED position (host API).

    With the payload known AND a position prior — the satellite model's
    predicted frequency and the slot timing, or the previous cycle's fix
    — all 79 track symbols integrate fully coherently over the local
    (+-half symbol, +-freq_tolerance_hz, default 0.6 Hz) search box:
    50 %-detection at ~-29 dB
    single-slot at fs 2 kHz (measured; the global noncoherent scan
    reaches -21).  Returns the refined (time, frequency) fix.

    threshold: normalised coherent energy; noise-only measures mean ~6.5,
    max ~10 over the default search box in 30 slots — 15 leaves a solid
    false-alarm margin.  freq_tolerance_hz sizes the df search box (a
    tight prior keeps the noise maximum small; widen it if the model
    frequency is rougher).  A wrong payload shares only the Costas
    cells (~(21/79)^2 of the coherent energy) and stays silent.
    """
    wave = np.asarray(wave)
    is_complex = bool(np.iscomplexobj(wave))
    if is_complex:
        wave_d = jnp.asarray(
            np.stack([wave.real, wave.imag], -1).astype(np.float32))
    elif wave.ndim == 2 and wave.shape[-1] == 2:
        wave_d, is_complex = jnp.asarray(wave.astype(np.float32)), True
    else:
        wave_d = jnp.asarray(wave.astype(np.float32))   # (n,) real
    p = waterfall_params(sample_rate, 2, 2)
    sps = p.nperseg
    track = encode_tones(jnp.asarray(np.asarray(payload, np.uint8)))
    start0 = int(round(time_hint_s * sample_rate))
    f0_cps = float(freq_hint_hz) / sample_rate
    stat, dt, df = _track_stat(
        wave_d, track.astype(jnp.int32), jnp.int32(start0),
        jnp.float32(f0_cps), sps, is_complex,
        df_half_cps=float(freq_tolerance_hz) * C.SYMBOL_PERIOD_S)
    stat = float(stat)
    t_fix = (start0 + int(dt)) / sample_rate
    f_fix = freq_hint_hz + float(df) / C.SYMBOL_PERIOD_S
    return TrackFix(detected=stat >= threshold, stat=round(stat, 2),
                    time_sec=round(t_fix, 4), freq_hz=round(f_fix, 2))
