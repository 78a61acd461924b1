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
           "block_waterfall_mf_tf_fused_batch", "fused_waterfall_ok",
           "fused_mf_waterfall_ok"]

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
    if _base_strip_part(p) is not None:     # strip schedule: streamed
        return True                         # weights, no resident cap
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
            s_slots: int, out_dtype,
            blocks_ref, cos_ref, sin_ref, wc_ref, ws_ref, out_ref):
    tau, phi = p.time_osr, p.freq_osr
    splits = _splits(nbins)
    part = nbins // splits
    ext_w = part + 2 * phi
    scale = _fused_constants(p)[4]

    for si in range(s_slots):
        bl = blocks_ref[si]
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
            out_ref[si, :num_frames, e0: e0 + part] = (
                10.0 * jnp.log10(_DB_FLOOR + power * scale)
            ).astype(out_dtype)
            # rows >= num_frames exist only for sublane alignment; a
            # defined finite value means downstream reductions can never
            # see NaNs
            if rows > num_frames:
                out_ref[si, num_frames:, e0: e0 + part] = jnp.full(
                    (rows - num_frames, part), 10.0 * np.log10(_DB_FLOOR),
                    out_dtype)


def _base_strip_part(p: WaterfallParams) -> int | None:
    """Column-strip width for the strip-scheduled BASE kernel: the
    largest 128-multiple dividing nbins whose double-buffered cos|sin
    strip pair stays under ~4 MB of VMEM (bigger hops force narrower
    strips).  None -> no usable width.

    The floor is 256, not 128: each strip step costs ~2-3 us of
    per-grid-step overhead, and at width 128 the step count makes the
    schedule LOSE to the plain XLA spectra+epilogue pair (measured at
    20 kHz osr 2x2, batch 64: strip-128 51.3 vs XLA 45.6 us/slot; at
    12 kHz, where widths >= 384 exist, strips beat XLA ~2x) — below
    256 the XLA fallback is the better fused-less path."""
    ext_bytes = lambda part: 2 * 2 * p.hop * (part + 2 * p.freq_osr) * 2
    for part in (640, 512, 384, 256):
        if p.num_freq_bins % part == 0 \
                and ext_bytes(part) <= 4 * 1024 * 1024:
            return part
    return None


def _kernel_strips(p: WaterfallParams, num_frames: int, part: int,
                   rows: int, s_slots: int,
                   blocks_ref, cos_ref, sin_ref, wc_ref, ws_ref, out_ref):
    """Strip-scheduled base kernel body: s_slots slots x one column strip
    per grid step.  The DFT matmuls see M = s_slots * rows against the
    strip's weight slice.  Round-5 chip A/B: the strip schedule LOSES to
    the resident kernel at every strip width (16.1/14.3/22.7 us/slot at
    part 384/640/128 vs 12.7 resident, standalone batch 256) — the
    ~2-3 us per-grid-step overhead of the extra strip steps outweighs
    the M=384 matmul amortisation.  Kept only as the fallback for
    geometries whose resident matrices exceed VMEM (fs >= 20 kHz at
    osr 2x2), which previously had NO fused path at all."""
    tau, phi = p.time_osr, p.freq_osr
    ext = part + 2 * phi
    scale = _fused_constants(p)[4]

    bl = blocks_ref[...]                    # (s_slots*rows, hop) bf16
    pr = jnp.dot(bl, cos_ref[0], preferred_element_type=jnp.float32)
    pi = jnp.dot(bl, sin_ref[0], preferred_element_type=jnp.float32)

    for si in range(s_slots):
        prs_all = pr[si * rows: (si + 1) * rows]
        pis_all = pi[si * rows: (si + 1) * rows]

        ur = jnp.zeros((num_frames, ext), jnp.float32)
        ui = ur
        for s in range(tau):
            c = wc_ref[0, s]
            d = ws_ref[0, s]
            prs = prs_all[s: s + num_frames]
            pis = pis_all[s: s + num_frames]
            ur = ur + prs * c - pis * d
            ui = ui + prs * d + pis * c

        def hann(u):
            return (0.5 * u[:, phi: phi + part]
                    - 0.25 * u[:, : part]
                    - 0.25 * u[:, 2 * phi: 2 * phi + part])

        xr = hann(ur)
        xi = hann(ui)
        power = xr * xr + xi * xi
        out_ref[si, :num_frames, :] = \
            10.0 * jnp.log10(_DB_FLOOR + power * scale)
        if rows > num_frames:
            out_ref[si, num_frames:, :] = jnp.full(
                (rows - num_frames, part), 10.0 * np.log10(_DB_FLOOR),
                jnp.float32)


@functools.partial(jax.jit, static_argnames=("p", "num_frames",
                                             "interpret", "_s_slots",
                                             "_out_dtype"))
def block_waterfall_tf_fused_batch(waves: jnp.ndarray, p: WaterfallParams,
                                   num_frames: int,
                                   interpret: bool = False,
                                   _s_slots: int = 1,
                                   _out_dtype: str = "f32") -> jnp.ndarray:
    """Real audio (B, n) -> time-major dB waterfalls (B, num_frames, nbins).

    Value-equivalent to ``vmap(_block_waterfall_tf(_block_spectrum(.)))``
    up to MXU accumulation split order (~1.5e-5 dB measured on v5e;
    bit-level bf16 operand rounding identical).  Requires the block
    geometry (hop * time_osr == nperseg, nfft == freq_osr * nperseg).

    Two schedules, identical outputs (same matmul operands per strip,
    strip boundaries only split the N axis — no accumulation change):

    * RESIDENT (default whenever both full-width bf16 DFT matrices fit
      the VMEM budget): one (b,) grid over slots, weights loaded once.
    * STRIP (fallback for bigger geometries, e.g. fs >= 20 kHz at
      osr 2x2, which previously had no fused path): weight column
      strips streamed over a second grid axis.  Chip A/B (round 5,
      batch 256 standalone): 16.1/14.3/22.7 us/slot at part
      384/640/128 vs 12.7 resident — the extra per-grid-step overhead
      outweighs the M=384 matmul amortisation, so strips are never
      chosen when resident fits.

    _s_slots / _out_dtype ("f32"|"bf16") are experiment knobs for the
    resident schedule (slots per grid step / output grid precision);
    defaults are the shipped configuration.
    """
    nbins = p.num_freq_bins
    nb = num_frames + p.time_osr - 1
    rows = -(-nb // _ROW_PAD) * _ROW_PAD
    b = waves.shape[0]

    kx = nbins + 2 * p.freq_osr
    resident_fits = 2 * p.hop * kx * 2 <= _MAX_RESIDENT_BYTES
    part = None if resident_fits else _base_strip_part(p)
    if part is not None:
        s_slots = 2 if b % 2 == 0 else 1
        splits = nbins // part
        cos_e, sin_e, wc_e, ws_e = _fused_strip_constants(p, part)

        blocks = waves[..., : nb * p.hop].reshape(b, nb, p.hop)
        blocks = jnp.pad(blocks, ((0, 0), (0, rows - nb), (0, 0))) \
            .astype(jnp.bfloat16).reshape(b * rows, p.hop)

        kernel = functools.partial(_kernel_strips, p, num_frames, part,
                                   rows, s_slots)
        grid_out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, rows, nbins), jnp.float32),
            in_specs=[
                pl.BlockSpec((s_slots * rows, p.hop), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p.hop, part + 2 * p.freq_osr),
                             lambda j, i: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p.hop, part + 2 * p.freq_osr),
                             lambda j, i: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p.time_osr, part + 2 * p.freq_osr),
                             lambda j, i: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p.time_osr, part + 2 * p.freq_osr),
                             lambda j, i: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((s_slots, rows, part),
                                   lambda j, i: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            grid=(splits, b // s_slots),
            interpret=interpret,
        )(blocks, jnp.asarray(cos_e), jnp.asarray(sin_e),
          jnp.asarray(wc_e), jnp.asarray(ws_e))
        return grid_out[:, :num_frames]

    cos_m, sin_m, wc, ws, _ = _fused_constants(p)

    s_slots = _s_slots if b % _s_slots == 0 else 1
    out_dt = jnp.bfloat16 if _out_dtype == "bf16" else jnp.float32
    blocks = waves[..., : nb * p.hop].reshape(b, nb, p.hop)
    blocks = jnp.pad(blocks, ((0, 0), (0, rows - nb), (0, 0))) \
        .astype(jnp.bfloat16)

    kernel = functools.partial(_kernel, p, num_frames, nbins, rows,
                               s_slots, out_dt)
    grid_out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, rows, nbins), out_dt),
        in_specs=[pl.BlockSpec((s_slots, rows, p.hop), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((s_slots, rows, nbins), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        grid=(b // s_slots,),
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
# waterfall + boxcar MF grid in ONE kernel (round 5: the DEEP front)
# ---------------------------------------------------------------------------
# The mf_first pipeline needs two things per slot: the Hann dB grid
# (sync/search) and matched-filter symbol powers (LLRs).  Round 4
# materialised f32 block spectra and derived both from them — measured
# at the DEEP geometry: the XLA phase-combine epilogue alone runs at
# ~16 % of its HBM bound (197 us/slot standalone: XLA materialises the
# combine intermediates and re-reads with 4x amplification at tau=4),
# and the per-candidate spectra column gathers cost another 130 us.
# The fix falls out of the math: the boxcar one-symbol DFT at window
# start t0 equals the Hann combine's pre-stencil value u[t0 + tau -1]
# — the kernel already computes it.  So this kernel emits BOTH grids
# (Hann dB + boxcar |u|^2) from one combine, the spectra never touch
# HBM, and LLR extraction becomes two small routing matmuls on the
# boxcar grid (ops/llr.py extract_llrs_matched_grid).
#
# Schedule: one slot per grid row, DFT-matrix column STRIPS streamed
# over a second grid axis (part 128-aligned; halo columns duplicated
# into each strip so blocks never overlap), block rows revisited
# across strips.  VMEM ~7 MB at the deep geometry — the two full-width
# out grids would not fit resident.


def _strip_part(nbins: int, out_dtype: str = "f32") -> int | None:
    """Column-strip width: Mosaic requires the out-block minor dim be a
    multiple of 128 (or the full array width), so pick a 128-multiple
    dividing nbins.  None -> no clean division (small grids fall back).

    Width by output dtype (round-5 chip A/B at the DEEP geometry,
    standalone us/slot): f32 prefers 384 (640 overflows scoped VMEM);
    bf16 prefers 640 (47.0) — halving the out buffers makes the wider
    strip fit, and FEWER grid steps beat narrower ones (the ~2-3 us
    per-step overhead measured on the base kernel), while bf16 at 384
    REGRESSES (70.1 vs 63.7 f32: 768-byte strided HBM write runs
    combine poorly; 640's 1280-byte runs do)."""
    prefs = (640, 384, 256, 512, 128) if out_dtype == "bf16" \
        else (384, 256, 512, 640, 128)
    for part in prefs:
        if nbins % part == 0:
            return part
    return None


@functools.lru_cache(maxsize=8)
def _fused_strip_constants(p: WaterfallParams, part: int):
    """Per-strip expanded constants: cos/sin (splits, hop, ext) bf16 and
    wc/ws (splits, time_osr, ext) f32; strip j duplicates its
    freq_osr-column halo so grid blocks never overlap."""
    cos_m, sin_m, wc, ws, _ = _fused_constants(p)
    splits = p.num_freq_bins // part
    ext = part + 2 * p.freq_osr
    stack = lambda a: np.stack(
        [np.ascontiguousarray(a[..., j * part: j * part + ext])
         for j in range(splits)])
    return stack(cos_m), stack(sin_m), stack(wc), stack(ws)


def fused_mf_waterfall_ok(p: WaterfallParams,
                          platform: str | None = None,
                          out_dtype: str = "f32") -> bool:
    """Applicability of the dual-output MF front kernel: platform, a
    128-aligned strip width, and the per-step strip VMEM estimate
    (double-buffered blocks/weights/outs + pr/pi scratch at a nominal
    15-s slot).  Streamed weight strips make the budget far smaller
    than the resident kernel's at production rates (~7 MB at 12 kHz
    4x4); very large hops (fs >= ~40 kHz) push the per-strip weight
    blocks over and fall back to the spectra path."""
    if platform is None:
        try:
            import jax as _jax
            platform = _jax.default_backend()
        except Exception:
            return False
    if platform not in ("tpu", "axon"):
        return False
    part = _strip_part(p.num_freq_bins, out_dtype)
    if part is None:
        return False
    tau = p.time_osr
    ext = part + 2 * p.freq_osr
    out_b = 2 if out_dtype == "bf16" else 4
    nb = int(round(15.0 * p.fs / p.hop))            # nominal 15-s slot
    rows_in = -(-(nb + 2 * (tau - 1)) // _ROW_PAD) * _ROW_PAD
    est = (2 * rows_in * p.hop * 2                  # blocks bf16 x2 buf
           + 2 * 2 * p.hop * ext * 2                # cos/sin strips x2
           + 2 * rows_in * ext * 4                  # pr/pi scratch
           + 2 * 2 * rows_in * part * out_b         # both outs x2 buf
           + 4 * rows_in * ext * 4)                 # combine buffers
    return est <= 14 * 1024 * 1024


def _kernel_mf(p: WaterfallParams, num_frames: int, part: int,
               rows_in: int, rows_db: int, rows_box: int, nbrows: int,
               s_slots: int, out_dt,
               blocks_ref, cos_ref, sin_ref, wc_ref, ws_ref,
               db_ref, box_ref):
    tau, phi = p.time_osr, p.freq_osr
    ext = part + 2 * phi
    scale = _fused_constants(p)[4]

    # s_slots slots per grid step: the DFT matmuls see M = s_slots *
    # rows_in against the streamed weight strip (M=376 at s_slots=1 ran
    # ~25 % MXU efficiency at the DEEP geometry — weight loads dominate
    # small-M passes), then the epilogue runs per slot on static slices
    bl = blocks_ref[...]                    # (s_slots*rows_in, hop) bf16
    pr = jnp.dot(bl, cos_ref[0], preferred_element_type=jnp.float32)
    pi = jnp.dot(bl, sin_ref[0], preferred_element_type=jnp.float32)

    for si in range(s_slots):
        prs_all = pr[si * rows_in: (si + 1) * rows_in]
        pis_all = pi[si * rows_in: (si + 1) * rows_in]

        # ONE combine serves both outputs: boxcar row j (window start
        # t0 = j - (tau-1)) sums blocks j..j+tau-1 of the (tau-1)-top-
        # padded block rows; the Hann frame t is boxcar row t + tau - 1.
        ub = jnp.zeros((nbrows, ext), jnp.float32)
        vb = ub
        for s in range(tau):
            c = wc_ref[0, s]
            d = ws_ref[0, s]
            prs = prs_all[s: s + nbrows]
            pis = pis_all[s: s + nbrows]
            ub = ub + prs * c - pis * d
            vb = vb + prs * d + pis * c

        xb = ub[:, phi: phi + part]
        yb = vb[:, phi: phi + part]
        box_ref[si, :nbrows, :] = (xb * xb + yb * yb).astype(out_dt)
        if rows_box > nbrows:
            box_ref[si, nbrows:, :] = jnp.zeros((rows_box - nbrows, part),
                                                out_dt)

        ur = ub[tau - 1: tau - 1 + num_frames]
        ui = vb[tau - 1: tau - 1 + num_frames]

        def hann(u):
            return (0.5 * u[:, phi: phi + part]
                    - 0.25 * u[:, : part]
                    - 0.25 * u[:, 2 * phi: 2 * phi + part])

        xr = hann(ur)
        xi = hann(ui)
        power = xr * xr + xi * xi
        db_ref[si, :num_frames, :] = (
            10.0 * jnp.log10(_DB_FLOOR + power * scale)).astype(out_dt)
        if rows_db > num_frames:
            db_ref[si, num_frames:, :] = jnp.full(
                (rows_db - num_frames, part), 10.0 * np.log10(_DB_FLOOR),
                out_dt)


@functools.partial(jax.jit, static_argnames=("p", "num_frames",
                                             "interpret", "_s_slots",
                                             "_part", "_out_dtype"))
def block_waterfall_mf_tf_fused_batch(waves: jnp.ndarray,
                                      p: WaterfallParams, num_frames: int,
                                      interpret: bool = False,
                                      _s_slots: int = 2,
                                      _part: int | None = None,
                                      _out_dtype: str = "f32"):
    """Real audio (B, n) -> (Hann dB grids (B, num_frames, nbins),
    boxcar power grids (B, num_frames + 2*(tau-1), nbins)).

    The dB grids equal :func:`block_waterfall_tf_fused_batch` and the
    boxcar grids equal ops/waterfall.py `_block_boxcar_tf` on the same
    slot, each up to MXU accumulation split order (the usual bf16
    operand rounding is identical).  Requires the block geometry and a
    128-aligned strip width (`fused_mf_waterfall_ok`).

    _s_slots / _part / _out_dtype ("f32"|"bf16") are experiment knobs
    (slots per grid step, strip width, output grid precision); defaults
    are the shipped configuration.
    """
    tau = p.time_osr
    nbins = p.num_freq_bins
    nb = num_frames + tau - 1
    nbrows = nb + tau - 1
    rows_in = -(-(nb + 2 * (tau - 1)) // _ROW_PAD) * _ROW_PAD
    rows_db = -(-num_frames // _ROW_PAD) * _ROW_PAD
    rows_box = -(-nbrows // _ROW_PAD) * _ROW_PAD
    b = waves.shape[0]
    part = _part if _part is not None else _strip_part(nbins, _out_dtype)
    splits = nbins // part
    ext = part + 2 * p.freq_osr

    cos_e, sin_e, wc_e, ws_e = _fused_strip_constants(p, part)

    # slots per grid step: S=2 doubles the DFT matmul's M (weight loads
    # amortise over twice the rows); the strip VMEM stays well inside
    # budget at production geometries.  S must divide b.
    s_slots = _s_slots if b % _s_slots == 0 else 1
    out_dt = jnp.bfloat16 if _out_dtype == "bf16" else jnp.float32

    blocks = waves[..., : nb * p.hop].reshape(b, nb, p.hop)
    blocks = jnp.pad(blocks, ((0, 0), (tau - 1,
                                       rows_in - nb - (tau - 1)), (0, 0))) \
        .astype(jnp.bfloat16).reshape(b * rows_in, p.hop)

    kernel = functools.partial(_kernel_mf, p, num_frames, part, rows_in,
                               rows_db, rows_box, nbrows, s_slots, out_dt)
    db, box = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, rows_db, nbins), out_dt),
            jax.ShapeDtypeStruct((b, rows_box, nbins), out_dt),
        ),
        in_specs=[
            pl.BlockSpec((s_slots * rows_in, p.hop), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p.hop, ext), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p.hop, ext), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p.time_osr, ext), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p.time_osr, ext), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((s_slots, rows_db, part), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_slots, rows_box, part), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        grid=(b // s_slots, splits),
        interpret=interpret,
    )(blocks, jnp.asarray(cos_e), jnp.asarray(sin_e), jnp.asarray(wc_e),
      jnp.asarray(ws_e))
    return db[:, :num_frames], box[:, :nbrows]
