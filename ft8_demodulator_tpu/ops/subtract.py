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


def _refine_and_fit(x_win, bb, sps, fs, df_span):
    """Refine carrier offset and LS-fit one reconstruction.

    x_win: (79*sps,) real received window; bb: (79*sps,) complex64 unit
    reconstruction at the candidate's grid frequency.  Returns the real
    waveform to subtract from x_win.
    """
    n = C.NUM_SYMBOLS * sps
    t = jnp.arange(n, dtype=jnp.float32) / fs

    # per-symbol complex correlations c_s = <x, bb_s>
    prod = (x_win * jnp.conj(bb)).reshape(C.NUM_SYMBOLS, sps)
    c_s = jnp.sum(prod, axis=-1)                           # (79,) complex
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
    return alpha * rc + beta * rs


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

    pad = n_sig
    xp = jnp.pad(wave.astype(jnp.float32), (pad, pad))
    # the GFSK waveform's symbol content is delayed one full symbol from
    # the waveform start (Gaussian-pulse spill, modulator convention shared
    # with the reference), and abs_time indexes the symbol content — so the
    # reconstruction is placed one symbol (nperseg samples) earlier.
    offsets = pad + abs_time * p.hop - p.nperseg         # (K,) sample index

    def body(k, xp):
        start = jnp.clip(offsets[k], 0, xp.shape[0] - n_sig)
        x_win = jax.lax.dynamic_slice(xp, (start,), (n_sig,))
        sub = _refine_and_fit(x_win, bb[k], sps, float(p.fs), df_span)
        sub = jnp.where(success[k], sub, 0.0)
        return jax.lax.dynamic_update_slice(xp, x_win - sub, (start,))

    xp = jax.lax.fori_loop(0, num, body, xp)
    return xp[pad: pad + wave.shape[-1]]
