"""Soft-symbol log-likelihood extraction, vmapped over candidates.

Per candidate: gather the (58 data symbols x 8 tones) power window from the
waterfall, reorder through the Gray map and emit 174 max-of-4 LLRs, then
normalise the vector to variance 24 (reference ft8_extract_likelihood /
ftx_normalize_logl, src/ft8_tools/ft8_demodulator/ft8_decode.py:151-198).
Out-of-range symbols contribute zero LLRs, matching the reference's boundary
handling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol import constants as C

__all__ = ["extract_llrs", "normalize_llrs"]

# Tone order after Gray reordering: s2[j] = powers[GRAY_MAP[j]].
_GRAY = jnp.asarray(C.GRAY_MAP)
# Bit b of symbol value j (MSB first) — selects the max-of-4 groups.
_BIT_SET = np.array(
    [[(j >> (2 - b)) & 1 for j in range(8)] for b in range(3)], dtype=bool
)


def _llr_from_powers(s2: jnp.ndarray) -> jnp.ndarray:
    """(..., 8) Gray-ordered powers -> (..., 3) bit LLRs (max-of-4 contrast)."""
    out = []
    for b in range(3):
        set_mask = jnp.asarray(_BIT_SET[b])
        pos = jnp.max(jnp.where(set_mask, s2, -jnp.inf), axis=-1)
        neg = jnp.max(jnp.where(set_mask, -jnp.inf, s2), axis=-1)
        out.append(pos - neg)
    return jnp.stack(out, axis=-1)


@functools.partial(jax.jit, static_argnames=("time_osr", "freq_osr",
                                             "num_blocks"))
def extract_llrs(mag: jnp.ndarray, abs_time: jnp.ndarray,
                 abs_freq: jnp.ndarray, time_osr: int, freq_osr: int,
                 num_blocks: int) -> jnp.ndarray:
    """Waterfall (F, T) + candidates (K,) -> LLRs (K, 174), normalised.

    abs_time may be negative (pre-roll); symbols falling outside the
    waterfall get LLR 0.  TPU notes: the frequency reads collapse into ONE
    one-hot matmul with a merged (K*8) M-dimension (per-candidate batched
    matmuls with M=8 waste >90% of the MXU and measure ~5x slower); the
    time reads are a static-shaped take_along_axis on the minor axis of the
    small (K, 8, T) row block, which lowers well — unlike scattered (58, 8)
    2-D index-pair gathers, which measure ~100x slower.
    """
    tau, phi = time_osr, freq_osr
    num_freqs, num_frames = mag.shape
    k = abs_freq.shape[0]
    sym = jnp.asarray(C.DATA_SYMBOL_POSITIONS)            # (58,)

    # frequency select: one (K*8, F) one-hot matmul against the waterfall.
    # The routing is exact in any precision (one nonzero per row); HIGH
    # (bf16x3) carries ~16 mantissa bits of the dB values through the MXU —
    # a <2e-3 dB perturbation, far below the noise floor, at half the
    # passes of HIGHEST (measured ~12x faster at this shape on v5e).
    f_idx = (abs_freq[:, None] + jnp.arange(8) * phi).reshape(k * 8)
    f_hot = (f_idx[:, None] == jnp.arange(num_freqs)).astype(jnp.float32)
    rows = jnp.matmul(f_hot, mag,
                      precision=jax.lax.Precision.HIGH)     # (K*8, T)
    rows = rows.reshape(k, 8, num_frames)

    # time select: static-shape gather along the minor axis
    t_idx = abs_time[:, None] + sym[None, :] * tau        # (K, 58)
    t_clip = jnp.clip(t_idx, 0, num_frames - 1)
    powers = jnp.take_along_axis(
        rows, t_clip[:, None, :], axis=-1)                # (K, 8, 58)
    powers = jnp.swapaxes(powers, -1, -2)                 # (K, 58, 8)

    base = jnp.floor_divide(abs_time, tau)                # (K,)
    block_idx = base[:, None] + sym[None, :]
    valid = (block_idx >= 0) & (block_idx < num_blocks)

    s2 = jnp.take(powers, _GRAY, axis=-1)                 # Gray reorder
    llr = _llr_from_powers(s2)                            # (K, 58, 3)
    llr = jnp.where(valid[:, :, None], llr, 0.0)
    return normalize_llrs(llr.reshape(llr.shape[0], C.LDPC_N))


def normalize_llrs(llr: jnp.ndarray) -> jnp.ndarray:
    """Scale each 174-vector to variance 24 (reference ft8_decode.py:190)."""
    mean = jnp.mean(llr, axis=-1, keepdims=True)
    var = jnp.mean((llr - mean) ** 2, axis=-1, keepdims=True)
    return llr * jnp.sqrt(24.0 / jnp.maximum(var, 1e-30))
