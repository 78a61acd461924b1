"""Pallas TPU kernel: the Costas sync-score stencil in one VMEM pass.

The jnp formulation in ops/sync.py materialises the score grid through
~100 shifted-slice accumulations that XLA executes as a large multi-pass
fusion.  This kernel keeps one slot's padded waterfall resident in VMEM and
accumulates all stencil terms on the VPU tile by tile.

Mosaic constraint: dynamic sublane (frequency-axis) slice starts must be
provably multiples of 8.  The stencil's frequency offsets are arbitrary
small integers, so each f-tile first rolls its (TILE_F + headroom)-row read
window by every distinct (offset mod 8) into small VMEM scratch buffers
(pltpu.roll), after which every term read is an aligned slice of the right
rolled window.

Semantics are identical to ops.sync.sync_scores (itself the exact batched
form of the reference's ft8_sync_score,
src/ft8_tools/ft8_demodulator/ft8_decode.py:47-100): per-(cell, t) validity
masks become precomputed coefficient rows, and the final
sum/num_comparisons normalisation becomes a precomputed reciprocal row
(zero count -> -inf score).  Gated by sync_pallas_ok(); the jnp path is the
fallback and the parity reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol import constants as C
from .sync import SearchGrid, _cell_masks

__all__ = ["sync_scores_padded", "sync_scores_pallas", "padded_times",
           "sync_pallas_ok"]

_LANE = 128
_TILE_F = 128
_VMEM_LIMIT = 13 * 1024 * 1024


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


@functools.lru_cache(maxsize=32)
def _geometry(g: SearchGrid, num_freq_bins: int, num_frames: int):
    """Static kernel geometry derived from the search grid."""
    offsets, coeffs, inv = _build_terms(g)
    t_out = padded_times(g)
    f_out = _round_up(g.num_freqs, _TILE_F)
    left = max(0, -g.t_start)
    max_dt = max(dt for _, dt in offsets)
    max_df = max(df for df, _ in offsets)
    t_pad = max_dt + t_out
    # per-tile windows need headroom so the last tile's window fits
    f_pad = _round_up(f_out + _round_up(max_df + 1, 8), 8)
    rolls = tuple(sorted({df % 8 for df, _ in offsets}))
    return offsets, coeffs, inv, t_out, f_out, left, t_pad, f_pad, rolls


def sync_pallas_ok(g: SearchGrid, num_freq_bins: int,
                   num_frames: int) -> bool:
    """True iff the kernel's VMEM plan fits and the platform is a TPU."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    if g.num_times <= 0 or g.num_freqs <= 0:
        return False
    (offsets, _, _, t_out, f_out, left, t_pad, f_pad, rolls) = _geometry(
        g, num_freq_bins, num_frames)
    n_scratch = len([r for r in rolls if r])
    max_df = max(df for df, _ in offsets)
    vmem = 4 * f_pad * t_pad * 2                          # dbl-buf block
    vmem += 4 * n_scratch * _window_rows(max_df) * t_pad  # window scratch
    vmem += 4 * 4 * _TILE_F * t_out                       # out + temps
    return vmem <= _VMEM_LIMIT


def _window_rows(max_df: int) -> int:
    """Per-tile read window: TILE_F plus 8-aligned headroom for max_df."""
    return _TILE_F + _round_up(max_df + 1, 8)


def _sync_kernel(coeff_ref, inv_ref, mag_ref, out_ref, scratch_ref, *,
                 offsets, rolls, t_out, num_freqs, f_pad):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    roll_slot = {r: j for j, r in enumerate(r for r in rolls if r)}
    max_df = max(df for df, _ in offsets)
    win = _window_rows(max_df)
    base = pl.program_id(1) * _TILE_F

    # Per-tile window rolls: rolled_r[x, t] == mag[base + x + r, t], so the
    # unaligned frequency offset df = 8q + r becomes the ALIGNED static
    # slice rolled_r[8q : 8q + TILE_F] (Mosaic requires sublane starts to
    # be provable multiples of 8; base and 8q are, r is not).
    for r, j in roll_slot.items():
        scratch_ref[j] = pltpu.roll(
            mag_ref[0, pl.ds(base, win), :], shift=win - r, axis=0)

    total = jnp.zeros((_TILE_F, t_out), jnp.float32)
    for j, (df, dt) in enumerate(offsets):
        q, r = divmod(df, 8)
        if r:
            src = scratch_ref[roll_slot[r], 8 * q: 8 * q + _TILE_F,
                              dt: dt + t_out]
        else:
            row0 = pl.multiple_of(base + 8 * q, 8)
            src = mag_ref[0, pl.ds(row0, _TILE_F), dt: dt + t_out]
        total = total + coeff_ref[j, :][None, :] * src
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
    exact batched sync_scores result.  One slot's padded waterfall (plus
    its rolled copies) stays resident in VMEM across its f-tiles.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = mag.ndim == 2
    if squeeze:
        mag = mag[None]
    batch, num_freq_bins, num_frames = mag.shape
    (offsets, coeffs, inv, t_out, f_out, left, t_pad, f_pad,
     rolls) = _geometry(g, num_freq_bins, num_frames)
    f_tiles = f_out // _TILE_F

    mag_p = jnp.pad(mag, ((0, 0),
                          (0, max(0, f_pad - num_freq_bins)),
                          (left, max(0, t_pad - left - num_frames))))
    mag_p = mag_p[:, : f_pad, : t_pad]

    kernel = functools.partial(_sync_kernel, offsets=offsets, rolls=rolls,
                               t_out=t_out, num_freqs=g.num_freqs,
                               f_pad=f_pad)
    out = pl.pallas_call(
        kernel,
        grid=(batch, f_tiles),
        out_shape=jax.ShapeDtypeStruct((batch, f_out, t_out), jnp.float32),
        in_specs=[
            pl.BlockSpec((coeffs.shape[0], t_out), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_out), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            # constant in i: the slot's padded waterfall stays resident
            pl.BlockSpec((1, f_pad, t_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE_F, t_out), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(
            (max(1, len([r for r in rolls if r])),
             _window_rows(max(df for df, _ in offsets)), t_pad),
            jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(coeffs), jnp.asarray(inv)[None, :], mag_p)
    return out[0] if squeeze else out


def sync_scores_pallas(mag: jnp.ndarray, g: SearchGrid,
                       interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.sync.sync_scores via the Pallas kernel."""
    padded = sync_scores_padded(mag, g, interpret=interpret)
    return padded[..., : g.num_freqs, : g.num_times]
