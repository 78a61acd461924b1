"""Decoded-signal reconstruction and subtraction (multi-pass decoding).

The reference decoder is single-pass: a strong transmission hides weaker
ones underneath (its candidate list simply returns the strong signal many
times).  This module implements the classic subtraction pass — possible
here because the TX chain (protocol.encode + ops.gfsk) lives on-device:

1. re-encode each successfully decoded payload to its exact GFSK baseband,
2. refine the carrier frequency from the phase slope of per-symbol
   correlations (the candidate grid is only tone_spacing/freq_osr deep),
3. least-squares fit amplitude and phase of the reconstruction against the
   received audio, and
4. subtract, masked by decode success.

Everything is fixed-shape and vmappable: the frequency refinement is an
argmax over a static grid of offsets, the LS fit is two inner products,
and candidates that failed to decode subtract nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol import constants as C
from ..protocol.encode import encode_tones
from .gfsk import _baseband_complex
from .waterfall import WaterfallParams

__all__ = ["subtract_decoded", "NUM_FREQ_REFINE"]

# frequency-refinement grid: +-(grid bin)/2 around the candidate frequency
NUM_FREQ_REFINE = 33


def _refine_and_fit(x_ext, bb, sps, fs, df_span, half):
    """Refine time offset + carrier offset and LS-fit one reconstruction.

    x_ext: (79*sps + 2*half,) real received window centred on the
    candidate's grid-quantised start; bb: (79*sps,) complex64 unit
    reconstruction at the candidate's grid frequency.  Returns the real
    waveform to subtract from x_ext (zero outside the aligned span).

    The candidate grid quantises start time to the STFT hop (half a
    symbol at osr 2), so the raw reconstruction can be misaligned by up
    to a quarter symbol — enough to leave tens of percent of the signal
    power behind.  A two-stage search over integer sample lags (coarse
    grid, then +-1-coarse-step at single-sample resolution) aligns it
    first; per-symbol correlation MAGNITUDES make the time metric
    insensitive to the not-yet-refined carrier offset (<2 Hz drifts only
    rotate each 0.16 s symbol's correlation by a fraction of a turn).
    """
    n = C.NUM_SYMBOLS * sps
    t = jnp.arange(n, dtype=jnp.float32) / fs

    def sym_corr(lag):
        xw = jax.lax.dynamic_slice(x_ext, (lag,), (n,))
        return jnp.sum((xw * jnp.conj(bb)).reshape(C.NUM_SYMBOLS, sps),
                       axis=-1)                            # (79,) complex

    def noncoh(lag):
        return jnp.sum(jnp.abs(sym_corr(lag)))

    coarse_step = max(1, (2 * half) // 16)
    coarse = jnp.arange(0, 2 * half + 1, coarse_step)
    lag = coarse[jnp.argmax(jax.vmap(noncoh)(coarse))]
    fine = jnp.clip(lag - coarse_step + jnp.arange(2 * coarse_step + 1),
                    0, 2 * half)
    lag = fine[jnp.argmax(jax.vmap(noncoh)(fine))]

    x_win = jax.lax.dynamic_slice(x_ext, (lag,), (n,))
    c_s = sym_corr(lag)                                    # (79,) complex
    t_s = (jnp.arange(C.NUM_SYMBOLS, dtype=jnp.float32) + 0.5) \
        * (sps / fs)

    # coherent power over a static grid of frequency offsets, twice:
    # coarse over +-df_span, then fine around the coarse peak (final
    # resolution ~df_span/256 keeps residual phase drift < 1 rad over 12.6 s)
    def grid_peak(center, span):
        dfs = center + jnp.linspace(-span, span, NUM_FREQ_REFINE)
        rot = jnp.exp(-2j * jnp.pi * dfs[:, None] * t_s[None, :])
        power = jnp.abs(jnp.sum(c_s[None, :] * rot, axis=-1))
        return dfs[jnp.argmax(power)]

    step = 2.0 * df_span / (NUM_FREQ_REFINE - 1)
    df_hat = grid_peak(jnp.float32(0.0), df_span)
    df_hat = grid_peak(df_hat, step)

    # re-center the reconstruction at the refined frequency
    bb_f = bb * jnp.exp(2j * jnp.pi * df_hat * t)

    # x ~ alpha*Re(bb_f) + beta*Im(bb_f); the two are orthogonal to ~1e-3
    rc = jnp.real(bb_f)
    rs = jnp.imag(bb_f)
    alpha = jnp.sum(x_win * rc) / jnp.maximum(jnp.sum(rc * rc), 1e-12)
    beta = jnp.sum(x_win * rs) / jnp.maximum(jnp.sum(rs * rs), 1e-12)
    sub = alpha * rc + beta * rs
    return jax.lax.dynamic_update_slice(jnp.zeros_like(x_ext), sub, (lag,))


@functools.partial(jax.jit, static_argnames=("p",))
def subtract_decoded(wave: jnp.ndarray, p: WaterfallParams,
                     payloads: jnp.ndarray, abs_time: jnp.ndarray,
                     abs_freq: jnp.ndarray,
                     success: jnp.ndarray) -> jnp.ndarray:
    """Subtract every successfully decoded transmission from real audio.

    wave (n,) float32; payloads (K, 10) uint8; abs_time/abs_freq (K,) int32
    waterfall indices from SlotDecodeResult; success (K,) bool.  Returns
    the residual audio (n,).
    """
    sps = p.nperseg
    n_sig = C.NUM_SYMBOLS * sps
    num = payloads.shape[0]
    freq_step = C.TONE_SPACING_HZ / p.freq_osr
    df_span = 0.6 * freq_step

    tones = encode_tones(payloads)                       # (K, 79)
    f0 = abs_freq.astype(jnp.float32) * jnp.float32(freq_step)
    bb = jax.vmap(
        lambda tns, f: _baseband_complex(tns, sps, float(p.fs), f)
    )(tones, f0)                                         # (K, n_sig) c64

    half = p.hop // 2             # grid time quantisation is +-hop/2
    n_ext = n_sig + 2 * half
    pad = n_ext
    xp = jnp.pad(wave.astype(jnp.float32), (pad, pad))
    # abs_time indexes the first symbol's frame and the (fixed-alignment)
    # GFSK synth puts symbol 0 at the waveform start (ops/gfsk.py), so the
    # reconstruction sits at abs_time*hop; the half-hop margin feeds the
    # sample-level time alignment.
    offsets = pad + abs_time * p.hop - half              # (K,) sample index

    def body(k, xp):
        start = jnp.clip(offsets[k], 0, xp.shape[0] - n_ext)
        x_ext = jax.lax.dynamic_slice(xp, (start,), (n_ext,))
        sub = _refine_and_fit(x_ext, bb[k], sps, float(p.fs), df_span, half)
        sub = jnp.where(success[k], sub, 0.0)
        return jax.lax.dynamic_update_slice(xp, x_ext - sub, (start,))

    xp = jax.lax.fori_loop(0, num, body, xp)
    return xp[pad: pad + wave.shape[-1]]
