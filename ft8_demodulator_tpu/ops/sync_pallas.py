"""Pallas TPU kernel: the Costas sync-score stencil in one VMEM pass.

The jnp formulation in ops/sync.py materialises the score grid through
~100 shifted-slice accumulations that XLA executes as several HBM passes.
This kernel loads one slot's padded waterfall into VMEM once (~2 MB) and
accumulates all <=105 stencil terms on the VPU, writing the score grid in
a single pass.  Semantics are identical to ops.sync.sync_scores (itself
the exact batched form of the reference's ft8_sync_score,
src/ft8_tools/ft8_demodulator/ft8_decode.py:47-100): per-(cell, t)
validity masks become precomputed coefficient rows, and the final
sum/num_comparisons normalisation becomes a precomputed reciprocal row
(zero count -> -inf score).

Layout notes (TPU): the score grid's time axis is padded to a multiple of
128 lanes and the frequency axis to a multiple of 8 sublanes; padded rows
and columns are forced to -inf so downstream top-k can run directly on the
padded grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol import constants as C
from .sync import SearchGrid, _cell_masks

__all__ = ["sync_scores_padded", "sync_scores_pallas", "padded_times"]

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def padded_times(g: SearchGrid) -> int:
    """Lane-padded time extent of the padded score grid."""
    return _round_up(max(g.num_times, 1), _LANE)


@functools.lru_cache(maxsize=32)
def _build_terms(g: SearchGrid):
    """Host constants: term offsets, coefficient rows, inverse-count row.

    Each term j contributes coeff[j, t] * mag_padded[f + df_j, t + dt_j]
    to the un-normalised score total at (f, t).  Terms with an all-zero
    coefficient row are dropped.
    """
    cell_m, prev_m, next_m = _cell_masks(g)
    t_out = padded_times(g)

    def pad_row(row):
        out = np.zeros(t_out, np.float32)
        out[: g.num_times] = row
        return out

    tau, phi = g.time_osr, g.freq_osr
    offsets: list[tuple[int, int]] = []
    coeffs: list[np.ndarray] = []
    count = np.zeros(g.num_times, np.float64)

    def add(df, dt, row):
        if not row.any():
            return
        offsets.append((df, dt))
        coeffs.append(pad_row(row))

    # dt is relative to the padded waterfall start: padded left edge is
    # max(0, -t_start) frames before frame 0, and scores start at t_start.
    left = max(0, -g.t_start)
    t0 = left + g.t_start
    for m in range(C.NUM_COSTAS_SEQS):
        for k in range(C.COSTAS_LEN):
            i = m * C.COSTAS_LEN + k
            b = m * C.SYNC_SEQ_STRIDE + k
            tone = int(C.COSTAS_PATTERN[k])
            cm = cell_m[i].astype(np.float64)
            pm = prev_m[i].astype(np.float64)
            nm = next_m[i].astype(np.float64)
            n_freq = int(tone > 0) + int(tone < 7)

            cur_coeff = n_freq * cm + pm + nm
            add(tone * phi, t0 + b * tau, cur_coeff.astype(np.float32))
            if tone > 0:
                add((tone - 1) * phi, t0 + b * tau, (-cm).astype(np.float32))
            if tone < 7:
                add((tone + 1) * phi, t0 + b * tau, (-cm).astype(np.float32))
            if k > 0:
                add(tone * phi, t0 + (b - 1) * tau, (-pm).astype(np.float32))
            if k < C.COSTAS_LEN - 1:
                add(tone * phi, t0 + (b + 1) * tau, (-nm).astype(np.float32))

            count += n_freq * cm + pm + nm

    inv = np.zeros(t_out, np.float32)
    inv[: g.num_times] = np.where(count > 0, 1.0 / np.maximum(count, 1.0),
                                  0.0)
    return tuple(offsets), np.stack(coeffs), inv


_TILE_F = 128


def _sync_kernel(coeff_ref, inv_ref, mag_ref, out_ref, *, offsets,
                 t_out, num_freqs):
    """One (TILE_F, t_out) output tile; mag block stays resident across
    the f-tile grid axis (its index map is constant in that axis)."""
    import jax.experimental.pallas as pl

    base = pl.program_id(1) * _TILE_F
    total = jnp.zeros((_TILE_F, t_out), jnp.float32)
    for j, (df, dt) in enumerate(offsets):
        total = total + coeff_ref[j, :][None, :] \
            * mag_ref[0, pl.ds(base + df, _TILE_F), dt: dt + t_out]
    inv = inv_ref[0, :][None, :]
    row = base + jax.lax.broadcasted_iota(jnp.int32, (_TILE_F, t_out), 0)
    ok = (inv > 0.0) & (row < num_freqs)
    out_ref[0, :, :] = jnp.where(ok, total * inv, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("g", "interpret"))
def sync_scores_padded(mag: jnp.ndarray, g: SearchGrid,
                       interpret: bool = False) -> jnp.ndarray:
    """Batched waterfall (B, F, T) -> padded score grid (B, F_out, T_out).

    F_out/T_out are num_freqs/num_times rounded up to TPU tile multiples;
    padding cells are -inf.  Slice [:, :g.num_freqs, :g.num_times] for the
    exact batched sync_scores result.  One grid step per slot keeps the
    VMEM footprint to one slot's padded waterfall (~2 MB) regardless of
    batch size.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, coeffs, inv = _build_terms(g)
    t_out = padded_times(g)
    f_out = _round_up(g.num_freqs, _TILE_F)
    f_tiles = f_out // _TILE_F

    left = max(0, -g.t_start)
    max_dt = max(dt for _, dt in offsets)
    max_df = max(df for df, _ in offsets)
    t_pad_need = max_dt + t_out
    f_pad_need = max_df + f_out

    squeeze = mag.ndim == 2
    if squeeze:
        mag = mag[None]
    batch, num_freq_bins, num_frames = mag.shape
    mag_p = jnp.pad(mag, ((0, 0),
                          (0, max(0, f_pad_need - num_freq_bins)),
                          (left, max(0, t_pad_need - left - num_frames))))
    mag_p = mag_p[:, : f_pad_need, : t_pad_need]

    kernel = functools.partial(_sync_kernel, offsets=offsets,
                               t_out=t_out, num_freqs=g.num_freqs)
    out = pl.pallas_call(
        kernel,
        grid=(batch, f_tiles),
        out_shape=jax.ShapeDtypeStruct((batch, f_out, t_out), jnp.float32),
        in_specs=[
            pl.BlockSpec((coeffs.shape[0], t_out), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_out), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            # constant in i: the slot's padded waterfall stays resident in
            # VMEM across all of its f-tiles
            pl.BlockSpec((1, f_pad_need, t_pad_need), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE_F, t_out), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(coeffs), jnp.asarray(inv)[None, :], mag_p)
    return out[0] if squeeze else out


def sync_scores_pallas(mag: jnp.ndarray, g: SearchGrid,
                       interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.sync.sync_scores via the Pallas kernel."""
    padded = sync_scores_padded(mag, g, interpret=interpret)
    return padded[..., : g.num_freqs, : g.num_times]
