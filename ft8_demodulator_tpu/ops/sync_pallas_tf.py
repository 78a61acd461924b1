"""Pallas TPU kernel: the time-major Costas sync stencil — a MEASURED
NEGATIVE RESULT, kept as the record of why XLA keeps this stage.

The decode hot path's dominant stage (roofline r4: ~30 us/slot of a
~72 us split-BP pipeline) is the sync-score stencil — ~90
coefficient-weighted shifted reads of the dB grid.  This kernel keeps
one slot's padded (T, F) grid VMEM-resident and accumulates every read
on the VPU, one 128-lane frequency tile at a time, fixing both design
flaws of the earlier (F, T) attempt (ops/sync_pallas.py): frequency on
the lane axis (15 full 128-lane tiles instead of an 88-padded-to-128
minor axis) and only three sublane-roll classes (time_osr=2 makes
every time offset even) instead of seven lane-roll classes.

It is still ~6x SLOWER than the jnp/XLA formulation on v5e
(standalone, batch 256, resident inputs; 2026-08-20):

    pallas full kernel (rolls + lane shifts)   183.8 us/slot
    ... without the 3 sublane rolls            161.9
    ... without per-read lane shifts            55.4   <- the smoking gun
    ... without either (90 aligned FMAs)        57.8
    ... 10 aligned reads only                   30.2   <- fixed overhead
    jnp sync_scores_tf under the same harness   49.6

Diagnosis: Mosaic lowers each unaligned LANE slice (the stencil's
tone*freq_osr column offsets) to a vector-rotate costing ~3x the FMA it
feeds (~1.2 us/slot per shifted read x 90), and the (batch x 15-tile)
grid carries ~27 us/slot of per-invocation overhead (window
re-materialisation per tile) before any stencil work happens.  XLA's
fusion of the identical read set — lane rotations included — is 3.7x
cheaper than the best Pallas schedule found, and 6 schedules were
tried (this file, per-tile windows, full-height rolls, XLA-level
128/256-lane manual tiling, regrouped-read jnp forms).  The stencil's
demonstrated-reachable floor on this toolchain is therefore XLA's own
~30 us/slot in-pipeline, not the ~7 us VPU-peak model bound
(benchmarks/results/roofline_v5e.json).

Semantics (verified, tests/test_sync_pallas_tf.py): same scores as
ops.sync.sync_scores_tf (the exact batched form of the reference's
ft8_sync_score, src/ft8_tools/ft8_demodulator/ft8_decode.py:47-100) up
to float32 regrouping order (<= ~3e-6 on-chip), identical candidate
sets through find_candidates_tf including the -inf lane padding.
Opt-in only; ops/sync.py is the production path and parity reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol import constants as C
from .sync import SearchGrid, _cell_masks

__all__ = ["sync_scores_tf_pallas", "sync_tf_pallas_ok"]

_LANE = 128
_VMEM_LIMIT = 13 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=32)
def _build_reads(g: SearchGrid):
    """Host constants: per-read offsets, coefficient rows, inverse counts.

    Read j contributes coeffs[j, t] * padded[t + dt_j, f + df_j] to the
    un-normalised score total at (t, f); dt is relative to the padded
    grid start (left pad = max(0, -t_start) frames before frame 0).
    Reads are keyed by (dt, df) and aggregated, so e.g. a Costas cell
    that is both some term's "current" cell and a neighbour term's
    comparison cell costs ONE read.
    """
    cell_m, prev_m, next_m = _cell_masks(g)
    tau, phi = g.time_osr, g.freq_osr
    left = max(0, -g.t_start)
    t0 = left + g.t_start
    reads: dict[tuple[int, int], np.ndarray] = {}
    count = np.zeros(g.num_times, np.float64)

    def add(dt: int, df: int, row: np.ndarray) -> None:
        if not row.any():
            return
        key = (dt, df)
        reads[key] = reads.get(key, np.zeros(g.num_times, np.float64)) + row

    for m in range(C.NUM_COSTAS_SEQS):
        for k in range(C.COSTAS_LEN):
            i = m * C.COSTAS_LEN + k
            b = m * C.SYNC_SEQ_STRIDE + k
            tone = int(C.COSTAS_PATTERN[k])
            cm = cell_m[i].astype(np.float64)
            pm = prev_m[i].astype(np.float64)
            nm = next_m[i].astype(np.float64)
            n_freq = int(tone > 0) + int(tone < 7)

            add(t0 + b * tau, tone * phi, n_freq * cm + pm + nm)
            if tone > 0:
                add(t0 + b * tau, (tone - 1) * phi, -cm)
            if tone < 7:
                add(t0 + b * tau, (tone + 1) * phi, -cm)
            if k > 0:
                add(t0 + (b - 1) * tau, tone * phi, -pm)
            if k < C.COSTAS_LEN - 1:
                add(t0 + (b + 1) * tau, tone * phi, -nm)
            count += n_freq * cm + pm + nm

    items = sorted(reads.items())
    offsets = tuple(k for k, _ in items)
    t_out = _round_up(max(g.num_times, 1), 8)
    coeffs = np.zeros((t_out, len(items) + 1), np.float32)
    for j, (_, row) in enumerate(items):
        coeffs[: g.num_times, j] = row.astype(np.float32)
    # last column: 1/num_comparisons (0 where no comparison is in bounds
    # or in the t_out padding -> the kernel writes -inf there)
    coeffs[: g.num_times, len(items)] = np.where(
        count > 0, 1.0 / np.maximum(count, 1.0), 0.0).astype(np.float32)
    return offsets, coeffs


@functools.lru_cache(maxsize=32)
def _geometry(g: SearchGrid):
    offsets, coeffs = _build_reads(g)
    t_out = coeffs.shape[0]
    f_out = _round_up(g.num_freqs, _LANE)
    left = max(0, -g.t_start)
    max_dt = max(dt for dt, _ in offsets)
    max_df = max(df for _, df in offsets)
    t_pad = max_dt + t_out
    # per-tile window is 2 lanes-tiles wide; the last tile's window must
    # fit: (f_out - LANE) + 2*LANE <= f_pad, and every read df < LANE
    f_pad = _round_up(f_out + _LANE, _LANE)
    rolls = tuple(sorted({dt % 8 for dt, _ in offsets} - {0}))
    j_pad = _round_up(coeffs.shape[1], _LANE)
    coeffs = np.pad(coeffs, ((0, 0), (0, j_pad - coeffs.shape[1])))
    return offsets, coeffs, t_out, f_out, t_pad, f_pad, rolls


def sync_tf_pallas_ok(g: SearchGrid) -> bool:
    """True iff the kernel applies: TPU platform, VMEM plan fits, and the
    stencil's frequency offsets stay inside one extra lane tile."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    if g.num_times <= 0 or g.num_freqs <= 0 or g.num_blocks <= 0:
        return False
    offsets, coeffs, t_out, f_out, t_pad, f_pad, rolls = _geometry(g)
    if max(df for _, df in offsets) >= _LANE:
        return False
    # input block (double-buffered) + 4 per-tile windows + coeffs + out
    vmem = 2 * 4 * t_pad * f_pad + 4 * 4 * t_pad * 2 * _LANE \
        + 4 * coeffs.size + 2 * 4 * t_out * _LANE
    return vmem <= _VMEM_LIMIT


def _kernel(coef_ref, mag_ref, out_ref, *, offsets, rolls, t_out, t_pad,
            num_freqs, j_inv):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(1)
    base = pl.multiple_of(i * _LANE, _LANE)
    win = mag_ref[0, :, pl.ds(base, 2 * _LANE)]          # (t_pad, 256)
    wins = {0: win}
    for r in rolls:
        # wins[r][u] == win[u + r]: unaligned sublane starts dt (dt % 8
        # = r) become the aligned static slice wins[r][dt - r : ...]
        wins[r] = pltpu.roll(win, shift=t_pad - r, axis=0)

    total = jnp.zeros((t_out, _LANE), jnp.float32)
    for j, (dt, df) in enumerate(offsets):
        r = dt % 8
        src = jax.lax.slice(wins[r], (dt - r, df), (dt - r + t_out,
                                                    df + _LANE))
        total = total + coef_ref[:, j: j + 1] * src

    inv = coef_ref[:, j_inv: j_inv + 1]
    lane = base + jax.lax.broadcasted_iota(jnp.int32, (t_out, _LANE), 1)
    ok = (inv > 0.0) & (lane < num_freqs)
    out_ref[0] = jnp.where(ok, total * inv, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("g", "interpret"))
def sync_scores_tf_pallas(mag_tf: jnp.ndarray, g: SearchGrid,
                          interpret: bool = False) -> jnp.ndarray:
    """TIME-MAJOR waterfall (..., T, F) -> scores (..., num_times, f_out).

    Rows match sync_scores_tf exactly in count (num_times); columns are
    padded from num_freqs up to the next 128 multiple with -inf, which
    find_candidates_tf treats identically to the unpadded grid (the
    padded columns are -inf = below every min_score; candidate indices
    are global row indices either way).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = mag_tf.ndim == 2
    if squeeze:
        mag_tf = mag_tf[None]
    batch = mag_tf.shape[0]
    num_frames = mag_tf.shape[-2]
    offsets, coeffs, t_out, f_out, t_pad, f_pad, rolls = _geometry(g)
    left = max(0, -g.t_start)

    mag_p = jnp.pad(mag_tf,
                    ((0, 0),
                     (left, max(0, t_pad - left - num_frames)),
                     (0, f_pad - mag_tf.shape[-1])))[:, :t_pad, :]

    kernel = functools.partial(
        _kernel, offsets=offsets, rolls=rolls, t_out=t_out, t_pad=t_pad,
        num_freqs=g.num_freqs, j_inv=len(offsets))
    out = pl.pallas_call(
        kernel,
        grid=(batch, f_out // _LANE),
        out_shape=jax.ShapeDtypeStruct((batch, t_out, f_out), jnp.float32),
        in_specs=[
            pl.BlockSpec((t_out, coeffs.shape[1]), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            # constant in i: the slot's padded grid stays VMEM-resident
            pl.BlockSpec((1, t_pad, f_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_out, _LANE), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * (f_out // _LANE) * len(offsets)
            * t_out * _LANE,
            bytes_accessed=4 * batch * (t_pad * f_pad + t_out * f_out),
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(coeffs), mag_p)
    out = out[:, : g.num_times, :]
    return out[0] if squeeze else out
