"""Fused block-DFT -> dB-waterfall Pallas kernel (time-major output).

The XLA pipeline computes the two block-DFT matmuls (ops/waterfall.py
`_block_spectrum`) and then the epilogue (`_block_waterfall_tf`:
per-block phase combine -> 3-tap Hann frequency stencil -> |.|^2 ->
log10) as separate fusions, materialising the raw block spectra
(~2.9 MB/slot written + read back) in between — the roofline's dominant
stage pair (`benchmarks/results/roofline_v5e.json`).

This kernel keeps the whole chain in VMEM per slot: the two DFT
matrices are pre-cast to bf16 once (identical rounding to the
production DEFAULT one-pass matmul's operand cast) and stay
VMEM-resident across the slot grid (~7.1 MB of the ~16 MB scoped
budget); each grid step DMAs one slot's blocks in (0.35 MB bf16),
runs the matmuls in K-splits sized to the remaining VMEM, applies the
combine/Hann/log10 epilogue on the VPU (measured fully hidden under
the MXU), and writes only the final dB grid (1.4 MB).  The raw
spectra never leave the chip.

Measured on v5e (batch 256, chip experiments exp_j/l/m): 23.7 us/slot
vs 30.4 for the XLA spectra+epilogue pair standalone — the epilogue
and the spectra round-trip are both eliminated; the residual is the
DFT matmul itself, which Mosaic and XLA both run at ~60 TFLOP/s for
this (192, 960) @ (960, 3848) bf16 shape (kernel stage attribution:
one matmul 19.4 us, both 23.8, epilogue +0.0).

Numerics: same bf16 operand rounding as the XLA DEFAULT path (on-chip
max deviation vs the XLA grid measured 1.5e-5 dB); acceptance follows
the sync-MXU pattern — CPU tests assert parity against a
bf16-operand reference + identical decode sets, and the chip-side
certificate is a precision-mask arm (benchmarks/precision_masks.py,
dft_pallas).

This kernel IS the TPU default since round 4 (the in-pipeline A/B in
bench.py decided it; resolved lazily per platform in demod/decode.py
_dft_backend).  FT8_DFT_BACKEND=xla opts back out; on CPU the XLA
pair stays the default (interpret-mode pallas there is for tests).

Reference semantics anchor: spectrogram_analyse.py (scipy STFT) via the
block-DFT decomposition documented in ops/waterfall.py:142-210.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .waterfall import (WaterfallParams, _block_combine_phases,
                        _block_dft_matrices, _DB_FLOOR, _hann_periodic)

__all__ = ["block_waterfall_tf_fused_batch", "block_waterfall_tf_fused",
           "fused_waterfall_ok"]

_ROW_PAD = 8          # pad nb block rows up to a multiple of this

# The two bf16 DFT matrices stay VMEM-resident for the whole grid; the
# chip's scoped VMEM budget caps how big they may be.  Measured on v5e:
# 7.4 MB resident (12 kHz @ osr 4x4) compiles and runs; 20.5 MB
# (20 kHz @ 2x2) fails Mosaic compilation.  12 MB leaves headroom for
# the per-program blocks/out/scratch buffers.
_MAX_RESIDENT_BYTES = 12 * 1024 * 1024


def fused_waterfall_ok(p: WaterfallParams, platform: str | None = None
                       ) -> bool:
    """Can the fused kernel serve this geometry on this platform?

    False on CPU (interpret mode is for tests only) and on any platform
    other than TPU (the kernel uses pltpu memory spaces), and for
    geometries whose resident DFT matrices exceed the measured VMEM
    budget (e.g. fs >= 20 kHz at osr 2x2) — callers fall back to the
    XLA spectra+epilogue pair there.  `platform` overrides the live
    backend probe (for tests)."""
    if platform is None:
        try:
            import jax as _jax
            platform = _jax.default_backend()
        except Exception:
            return False
    if platform not in ("tpu", "axon"):
        return False
    kx = p.num_freq_bins + 2 * p.freq_osr
    return 2 * p.hop * kx * 2 <= _MAX_RESIDENT_BYTES


def _splits(nbins: int) -> int:
    """K-split factor: VMEM scratch per split is ~4 arrays of
    (rows, nbins/splits + halo) f32; 4 splits keeps a 1920-bin geometry
    well inside the ~16 MB scoped-VMEM limit (2 splits measured equal
    within noise; 4 is the safer default for larger geometries)."""
    for k in (4, 2, 1):
        if nbins % k == 0:
            return k
    return 1


@functools.lru_cache(maxsize=8)
def _fused_constants(p: WaterfallParams):
    """(cos, sin) bf16 (hop, kx) and (wc, ws) f32 (time_osr, kx) host
    constants plus the dB scale, cached per geometry."""
    import ml_dtypes

    cos_m, sin_m = _block_dft_matrices(p.hop, p.nfft, p.num_freq_bins,
                                       p.freq_osr)
    wc, ws = _block_combine_phases(p)
    scale = 1.0 / float(np.sum(_hann_periodic(p.nperseg)) ** 2)
    # pre-bf16 matrices: identical rounding to the DEFAULT one-pass MXU
    # matmul's operand cast, and half the VMEM (they stay resident).
    # HOST arrays (ml_dtypes), never jnp: this cache is populated inside
    # jit traces and device arrays would leak tracers.
    to_bf16 = lambda a: a.astype(ml_dtypes.bfloat16)
    return to_bf16(cos_m), to_bf16(sin_m), wc, ws, scale


def _kernel(p: WaterfallParams, num_frames: int, nbins: int, rows: int,
            blocks_ref, cos_ref, sin_ref, wc_ref, ws_ref, out_ref):
    tau, phi = p.time_osr, p.freq_osr
    splits = _splits(nbins)
    part = nbins // splits
    ext_w = part + 2 * phi
    scale = _fused_constants(p)[4]

    bl = blocks_ref[0]
    for h in range(splits):
        e0 = h * part
        pr = jnp.dot(bl, cos_ref[:, e0: e0 + ext_w],
                     preferred_element_type=jnp.float32)
        pi = jnp.dot(bl, sin_ref[:, e0: e0 + ext_w],
                     preferred_element_type=jnp.float32)

        ur = jnp.zeros((num_frames, ext_w), jnp.float32)
        ui = ur
        for s in range(tau):
            prs = pr[s: s + num_frames]
            pis = pi[s: s + num_frames]
            c = wc_ref[s, e0: e0 + ext_w]
            d = ws_ref[s, e0: e0 + ext_w]
            ur = ur + prs * c - pis * d
            ui = ui + prs * d + pis * c

        def hann(u):
            return (0.5 * u[:, phi: phi + part]
                    - 0.25 * u[:, : part]
                    - 0.25 * u[:, 2 * phi: 2 * phi + part])

        xr = hann(ur)
        xi = hann(ui)
        power = xr * xr + xi * xi
        out_ref[0, :num_frames, e0: e0 + part] = \
            10.0 * jnp.log10(_DB_FLOOR + power * scale)
        # rows >= num_frames exist only for sublane alignment; a defined
        # finite value means downstream reductions can never see NaNs
        if rows > num_frames:
            out_ref[0, num_frames:, e0: e0 + part] = jnp.full(
                (rows - num_frames, part), 10.0 * np.log10(_DB_FLOOR),
                jnp.float32)


@functools.partial(jax.jit, static_argnames=("p", "num_frames",
                                             "interpret"))
def block_waterfall_tf_fused_batch(waves: jnp.ndarray, p: WaterfallParams,
                                   num_frames: int,
                                   interpret: bool = False) -> jnp.ndarray:
    """Real audio (B, n) -> time-major dB waterfalls (B, num_frames, nbins).

    Value-equivalent to ``vmap(_block_waterfall_tf(_block_spectrum(.)))``
    up to MXU accumulation split order (~1.5e-5 dB measured on v5e;
    bit-level bf16 operand rounding identical).  Requires the block
    geometry (hop * time_osr == nperseg, nfft == freq_osr * nperseg).
    """
    nbins = p.num_freq_bins
    nb = num_frames + p.time_osr - 1
    rows = -(-nb // _ROW_PAD) * _ROW_PAD
    b = waves.shape[0]

    cos_m, sin_m, wc, ws, _ = _fused_constants(p)

    blocks = waves[..., : nb * p.hop].reshape(b, nb, p.hop)
    blocks = jnp.pad(blocks, ((0, 0), (0, rows - nb), (0, 0))) \
        .astype(jnp.bfloat16)

    kernel = functools.partial(_kernel, p, num_frames, nbins, rows)
    grid_out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, rows, nbins), jnp.float32),
        in_specs=[pl.BlockSpec((1, rows, p.hop), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, rows, nbins), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        grid=(b,),
        interpret=interpret,
    )(blocks, cos_m, sin_m, jnp.asarray(wc), jnp.asarray(ws))
    return grid_out[:, :num_frames]


def block_waterfall_tf_fused(wave: jnp.ndarray, p: WaterfallParams,
                             num_frames: int,
                             interpret: bool = False) -> jnp.ndarray:
    """Single-slot convenience wrapper: (n,) -> (num_frames, nbins)."""
    return block_waterfall_tf_fused_batch(wave[None], p, num_frames,
                                          interpret=interpret)[0]


# ---------------------------------------------------------------------------
# waterfall + sync in ONE kernel
# ---------------------------------------------------------------------------
# The MXU sync recast (ops/sync.py sync_scores_tf_mxu) consumes the dB
# grid the waterfall kernel just wrote to HBM.  Fusing it into the same
# kernel reads the grid straight from the VMEM out block — the sync
# stage's HBM grid re-read and its separate XLA dispatch disappear; the
# stencil-as-matmul weights are re-based to frame indices
# (ops/sync.py _sync_mxu_weights_frames) so no padded copy is needed.


def _kernel_with_sync(p: WaterfallParams, num_frames: int, nbins: int,
                      rows: int, g, n_res: int, *refs):
    (blocks_ref, cos_ref, sin_ref, wc_ref, ws_ref, count_ref,
     *rest) = refs
    w_refs = rest[:n_res]
    grid_ref, scores_ref = rest[n_res], rest[n_res + 1]

    _kernel(p, num_frames, nbins, rows,
            blocks_ref, cos_ref, sin_ref, wc_ref, ws_ref, grid_ref)

    from .sync import _sync_mxu_weights_frames
    per_res, _count = _sync_mxu_weights_frames(g, num_frames)
    tau, phi = g.time_osr, g.freq_osr
    neg_inf = jnp.float32(-jnp.inf)
    for s, ((w_np, frame0, n_out), w_ref) in enumerate(zip(per_res,
                                                           w_refs)):
        if n_out == 0:
            continue
        p_s = grid_ref[0, frame0::tau][:w_np.shape[1]] \
            .astype(jnp.bfloat16)                      # (n_in, nbins)
        m = jnp.dot(w_ref[...], p_s,
                    preferred_element_type=jnp.float32)  # (8*n_out, nbins)
        s_s = jnp.zeros((n_out, g.num_freqs), jnp.float32)
        for df in range(8):
            s_s = s_s + m[df * n_out: (df + 1) * n_out,
                          df * phi: df * phi + g.num_freqs]
        cnt = count_ref[s::tau][:n_out]                 # (n_out, 1)
        s_s = jnp.where(cnt > 0, s_s / jnp.maximum(cnt, 1.0), neg_inf)
        scores_ref[0, s::tau] = s_s


@functools.partial(jax.jit, static_argnames=("p", "num_frames", "g",
                                             "interpret"))
def block_waterfall_sync_tf_fused_batch(waves: jnp.ndarray,
                                        p: WaterfallParams,
                                        num_frames: int, g,
                                        interpret: bool = False):
    """Real audio (B, n) -> (dB grids (B, num_frames, nbins),
    sync scores (B, num_times, num_freqs)) in one kernel.

    The grids equal :func:`block_waterfall_tf_fused_batch`; the scores
    equal ``sync_scores_tf_mxu`` on those grids up to MXU accumulation
    split order (same bf16 operand rounding).  Requires
    ``g.num_times % 8 == 0`` sublane alignment (true for the standard
    15-s geometries) — callers fall back otherwise.
    """
    nbins = p.num_freq_bins
    nb = num_frames + p.time_osr - 1
    rows = -(-nb // _ROW_PAD) * _ROW_PAD
    b = waves.shape[0]

    from .sync import _sync_mxu_weights_frames
    per_res, count = _sync_mxu_weights_frames(g, num_frames)
    cos_m, sin_m, wc, ws, _ = _fused_constants(p)

    blocks = waves[..., : nb * p.hop].reshape(b, nb, p.hop)
    blocks = jnp.pad(blocks, ((0, 0), (0, rows - nb), (0, 0))) \
        .astype(jnp.bfloat16)
    w_arrays = [np.ascontiguousarray(w_np, dtype=np.float32)
                for (w_np, _f0, _no) in per_res]
    import ml_dtypes
    w_arrays = [w.astype(ml_dtypes.bfloat16) for w in w_arrays]
    count_col = count.reshape(-1, 1).astype(np.float32)

    kernel = functools.partial(_kernel_with_sync, p, num_frames, nbins,
                               rows, g, len(per_res))
    grid_out, scores_out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b, rows, nbins), jnp.float32),
                   jax.ShapeDtypeStruct((b, g.num_times, g.num_freqs),
                                        jnp.float32)),
        in_specs=[pl.BlockSpec((1, rows, p.hop), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (4 + 1 + len(per_res)),
        out_specs=(pl.BlockSpec((1, rows, nbins), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, g.num_times, g.num_freqs),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        grid=(b,),
        interpret=interpret,
    )(blocks, cos_m, sin_m, jnp.asarray(wc), jnp.asarray(ws),
      count_col, *w_arrays)
    return grid_out[:, :num_frames], scores_out


def fused_waterfall_sync_ok(p: WaterfallParams, g,
                            platform: str | None = None) -> bool:
    """Applicability of the combined waterfall+sync kernel: the base
    kernel's geometry/platform gate plus sublane-aligned score rows."""
    return (fused_waterfall_ok(p, platform=platform)
            and g.num_times > 0 and g.num_times % _ROW_PAD == 0)
