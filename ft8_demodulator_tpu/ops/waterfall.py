"""Waterfall front-end: windowed STFT -> dB power grid.

Numerically equivalent to the reference's scipy spectrogram call
(src/ft8_tools/ft8_demodulator/spectrogram_analyse.py:19-64): periodic Hann
window of nperseg = 0.16*fs samples, hop = nperseg//steps_per_symbol,
nfft = fs/6.25 * bins_per_tone, 'spectrum' scaling (|X|^2 / sum(win)^2),
10*log10(1e-12 + .) dB, positive-frequency half.

TPU-first design: the transform is expressed as two real matmuls against
constant cos/sin DFT matrices of shape (nperseg, nfft//2).  This

* runs on the MXU (the FFT op lowers to scalar-ish code on TPU),
* needs no zero-padding of frames to nfft (the DFT matrix already encodes
  the oversampled bin spacing), and
* fuses the Hann window into the matrix for free.

For very large configurations where the DFT matrices would not pay off,
``backend="fft"`` switches to jnp.fft.  Complex input (drift-correction
path) is carried as stacked (..., n, 2) float32 [real, imag] — complex
arrays cannot cross the host<->device boundary on this TPU backend.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol import constants as C

__all__ = [
    "WaterfallParams",
    "waterfall_params",
    "frame_signal",
    "waterfall_real",
    "waterfall_complex",
    "calculate_spectrogram",
]

_DB_FLOOR = 1e-12
# Above this nperseg the (nperseg x nfft/2) DFT matrices stop being the
# right trade (memory ~ nperseg*nfft*4 bytes); fall back to jnp.fft.
_MATMUL_MAX_NPERSEG = 4608


class WaterfallParams(NamedTuple):
    """Static STFT geometry for one (fs, osr) configuration."""

    fs: float
    nperseg: int
    hop: int
    nfft: int
    time_osr: int          # steps_per_symbol
    freq_osr: int          # bins_per_tone
    num_freq_bins: int     # positive-frequency bins = nfft // 2

    def num_frames(self, num_samples: int) -> int:
        return max(0, (num_samples - self.nperseg) // self.hop + 1)

    def num_blocks(self, num_samples: int) -> int:
        """Whole FT8 symbols in the waterfall (reference ftx_types.py:32)."""
        return self.num_frames(num_samples) // self.time_osr


def waterfall_params(fs: float, bins_per_tone: int = 2,
                     steps_per_symbol: int = 2) -> WaterfallParams:
    nperseg = int(C.SYMBOL_PERIOD_S * fs)
    hop = nperseg // steps_per_symbol
    nfft = int(fs / C.TONE_SPACING_HZ * bins_per_tone)
    return WaterfallParams(
        fs=float(fs), nperseg=nperseg, hop=hop, nfft=nfft,
        time_osr=steps_per_symbol, freq_osr=bins_per_tone,
        num_freq_bins=nfft // 2,
    )


def _hann_periodic(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


@functools.lru_cache(maxsize=16)
def _dft_matrices(nperseg: int, nfft: int) -> tuple[np.ndarray, np.ndarray]:
    """Window-fused (nperseg, nfft//2) cos/sin DFT matrices (host constants)."""
    win = _hann_periodic(nperseg)
    n = np.arange(nperseg)[:, None]
    k = np.arange(nfft // 2)[None, :]
    ang = -2.0 * np.pi * (n * k % nfft) / nfft
    cos_m = (np.cos(ang) * win[:, None]).astype(np.float32)
    sin_m = (np.sin(ang) * win[:, None]).astype(np.float32)
    return cos_m, sin_m


def frame_signal(wave: jnp.ndarray, nperseg: int, hop: int,
                 num_frames: int) -> jnp.ndarray:
    """(..., n) -> (..., num_frames, nperseg) overlapping frames (gather)."""
    idx = (jnp.arange(num_frames)[:, None] * hop
           + jnp.arange(nperseg)[None, :])
    return jnp.take(wave, idx, axis=-1)


def _power_spectrum(frames_r: jnp.ndarray, frames_i, p: WaterfallParams,
                    backend: str) -> jnp.ndarray:
    """frames (..., T, nperseg) -> positive-freq power (..., T, nfft//2).

    For complex input x = r + j*i:  X = (R_r - I_i) + j(R_i + I_r) where
    R_* / I_* are cos/sin DFT projections of the real and imaginary parts.
    """
    if backend == "matmul":
        cos_m, sin_m = _dft_matrices(p.nperseg, p.nfft)
        cos_m = jnp.asarray(cos_m)
        sin_m = jnp.asarray(sin_m)

        # HIGHEST precision is required: the default lowering computes f32
        # matmuls through bf16 passes, which puts ~0.1 amplitude error on
        # spectral nulls — several dB once in log space.
        def mm(a, b):
            return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)

        rr = mm(frames_r, cos_m)
        ri = mm(frames_r, sin_m)
        if frames_i is None:
            return rr * rr + ri * ri
        ir = mm(frames_i, cos_m)
        ii = mm(frames_i, sin_m)
        return (rr - ii) ** 2 + (ri + ir) ** 2
    # fft backend: complex compute is fine inside jit on this TPU
    win = jnp.asarray(_hann_periodic(p.nperseg).astype(np.float32))
    if frames_i is None:
        spec = jnp.fft.rfft(frames_r * win, n=p.nfft, axis=-1)
        spec = spec[..., : p.num_freq_bins]
    else:
        z = (frames_r + 1j * frames_i) * win
        spec = jnp.fft.fft(z, n=p.nfft, axis=-1)[..., : p.num_freq_bins]
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def _waterfall(frames_r, frames_i, p: WaterfallParams, backend: str):
    power = _power_spectrum(frames_r, frames_i, p, backend)
    scale = 1.0 / float(np.sum(_hann_periodic(p.nperseg)) ** 2)
    mag_db = 10.0 * jnp.log10(_DB_FLOOR + power * scale)
    # waterfall layout is (freq, time) to match the reference indexing
    return jnp.swapaxes(mag_db, -1, -2)


def _pick_backend(p: WaterfallParams, backend: str | None) -> str:
    if backend is not None:
        return backend
    return "matmul" if p.nperseg <= _MATMUL_MAX_NPERSEG else "fft"


@functools.partial(jax.jit, static_argnames=("p", "num_frames", "backend"))
def waterfall_real(wave: jnp.ndarray, p: WaterfallParams, num_frames: int,
                   backend: str | None = None) -> jnp.ndarray:
    """Real audio (..., n) -> dB waterfall (..., nfft//2, num_frames)."""
    frames = frame_signal(wave, p.nperseg, p.hop, num_frames)
    return _waterfall(frames, None, p, _pick_backend(p, backend))


@functools.partial(jax.jit, static_argnames=("p", "num_frames", "backend"))
def waterfall_complex(wave_ri: jnp.ndarray, p: WaterfallParams,
                      num_frames: int,
                      backend: str | None = None) -> jnp.ndarray:
    """Complex signal (..., n, 2) [re, im] -> dB waterfall (..., F, T)."""
    frames_r = frame_signal(wave_ri[..., 0], p.nperseg, p.hop, num_frames)
    frames_i = frame_signal(wave_ri[..., 1], p.nperseg, p.hop, num_frames)
    return _waterfall(frames_r, frames_i, p, _pick_backend(p, backend))


def calculate_spectrogram(wave_data: np.ndarray, sample_rate: float,
                          bins_per_tone: int = 2, steps_per_symbol: int = 2):
    """Reference-API-compatible host wrapper.

    Returns (mag_db, freqs, times) with the full two-sided fftshifted
    spectrum like the reference's calculate_spectrogram
    (spectrogram_analyse.py:19); too-short input yields empty arrays.
    """
    wave = np.asarray(wave_data)
    p = waterfall_params(sample_rate, bins_per_tone, steps_per_symbol)
    if wave.shape[-1] < p.nperseg:
        return np.array([[]]), np.array([]), np.array([])
    t_frames = p.num_frames(wave.shape[-1])
    if np.iscomplexobj(wave):
        ri = np.stack([wave.real, wave.imag], axis=-1).astype(np.float32)
        frames_r = frame_signal(jnp.asarray(ri[..., 0]), p.nperseg, p.hop, t_frames)
        frames_i = frame_signal(jnp.asarray(ri[..., 1]), p.nperseg, p.hop, t_frames)
    else:
        frames_r = frame_signal(jnp.asarray(wave.astype(np.float32)),
                                p.nperseg, p.hop, t_frames)
        frames_i = None

    @functools.partial(jax.jit, static_argnames=("backend",))
    def _full(fr, fi, backend="fft"):
        win = jnp.asarray(_hann_periodic(p.nperseg).astype(np.float32))
        z = fr * win if fi is None else (fr + 1j * fi) * win
        spec = jnp.fft.fft(z.astype(jnp.complex64), n=p.nfft, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        scale = 1.0 / float(np.sum(_hann_periodic(p.nperseg)) ** 2)
        mag_db = 10.0 * jnp.log10(_DB_FLOOR + power * scale)
        return jnp.swapaxes(mag_db, -1, -2)

    mag = np.fft.fftshift(np.asarray(_full(frames_r, frames_i)), axes=0)
    freqs = np.fft.fftshift(np.fft.fftfreq(p.nfft, 1.0 / sample_rate))
    times = (np.arange(t_frames) * p.hop + p.nperseg / 2) / sample_rate
    return mag, freqs, times
