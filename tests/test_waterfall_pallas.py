"""Fused DFT->dB Pallas kernel parity (interpret mode on CPU).

The kernel (ops/waterfall_pallas.py) must reproduce the XLA
spectra+epilogue pair with identical bf16 operand rounding: tested
against a reference that applies the SAME bf16 cast to the operands but
accumulates in exact f32, plus a decode-set identity through the full
front half.  Chip-side certificate: benchmarks/precision_masks.py
dft_pallas arm.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ft8_demodulator_tpu.ops.waterfall import (_block_dft_matrices,
                                               _block_waterfall_tf,
                                               waterfall_params)
from ft8_demodulator_tpu.ops.waterfall_pallas import (
    block_waterfall_tf_fused, block_waterfall_tf_fused_batch)

FS = 2000.0


def _bf16(a):
    return np.asarray(jnp.asarray(a).astype(jnp.bfloat16)
                      .astype(jnp.float32))


def _reference_bf16(wave, p, num_frames):
    """XLA epilogue on bf16-operand (exact-f32-accumulated) spectra."""
    nb = num_frames + p.time_osr - 1
    cos_m, sin_m = _block_dft_matrices(p.hop, p.nfft, p.num_freq_bins,
                                       p.freq_osr)
    bl = np.asarray(wave)[: nb * p.hop].reshape(nb, p.hop)
    pr = _bf16(bl) @ _bf16(cos_m)
    pi = _bf16(bl) @ _bf16(sin_m)
    return np.asarray(_block_waterfall_tf(
        (jnp.asarray(pr), jnp.asarray(pi)), p, num_frames))


@pytest.mark.parametrize("osr", [(2, 2), (4, 4)])
def test_fused_kernel_matches_bf16_reference(rng, osr):
    p = waterfall_params(FS, *osr)
    n = int(FS * 15)
    num_frames = p.num_frames(n)
    w = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ref = _reference_bf16(w, p, num_frames)
    got = np.asarray(block_waterfall_tf_fused(w, p, num_frames,
                                              interpret=True))
    assert got.shape == ref.shape
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_fused_batch_matches_single(rng):
    p = waterfall_params(FS, 2, 2)
    n = int(FS * 15)
    num_frames = p.num_frames(n)
    waves = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    batch = np.asarray(block_waterfall_tf_fused_batch(
        waves, p, num_frames, interpret=True))
    for i in range(3):
        one = np.asarray(block_waterfall_tf_fused(
            waves[i], p, num_frames, interpret=True))
        np.testing.assert_array_equal(batch[i], one)


def test_fused_front_decode_set_identical(rng):
    """Planted signals decode to the same payload set through the fused
    kernel front as through the XLA pair (CPU interpret)."""
    from ft8_demodulator_tpu.demod.decode import (_front_from_mag_tf,
                                                  _front_slot_tf,
                                                  finish_decode)
    from ft8_demodulator_tpu.ops.gfsk import ft8_passband
    from ft8_demodulator_tpu.ops.sync import search_grid

    p = waterfall_params(FS, 2, 2)
    n = int(FS * 15)
    num_frames = p.num_frames(n)
    g = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)

    decoded = {"xla": set(), "pallas": set()}
    for trial in range(3):
        payload = np.asarray(rng.integers(0, 256, 10), np.uint8)
        payload[9] &= 0xF8
        w = np.zeros(n, np.float32)
        sig = np.asarray(ft8_passband(payload, FS, 350.0 + 70.0 * trial,
                                      0.0))
        w[500: 500 + len(sig)] = sig
        w += 0.3 * rng.standard_normal(n).astype(np.float32)
        wd = jnp.asarray(w)

        outs = _front_slot_tf(wd, p, num_frames, g, 10, 1.0)
        res = finish_decode(*outs, 20, False)
        for row in np.asarray(res.payload)[np.asarray(res.success)]:
            decoded["xla"].add(bytes(row))

        mag = block_waterfall_tf_fused(wd, p, num_frames, interpret=True)
        outs = _front_from_mag_tf(mag, g, 10, 1.0)
        res = finish_decode(*outs, 20, False)
        for row in np.asarray(res.payload)[np.asarray(res.success)]:
            decoded["pallas"].add(bytes(row))
        assert bytes(payload) in decoded["xla"], f"trial {trial}"
    assert decoded["xla"] == decoded["pallas"]


def test_fused_waterfall_applicability_guard():
    """Geometry/platform gate (code-review r4 finding): the fused kernel
    keeps both bf16 DFT matrices VMEM-resident, and fs >= 20 kHz at
    osr 2x2 exceeds the measured budget (20.5 MB resident fails Mosaic
    compilation on v5e; 7.4 MB at 12 kHz 4x4 compiles) — decode must
    fall back to the XLA pair there instead of failing to compile."""
    from ft8_demodulator_tpu.ops.waterfall_pallas import fused_waterfall_ok

    ok = lambda fs, osr: fused_waterfall_ok(
        waterfall_params(fs, *osr), platform="tpu")
    assert ok(12000.0, (2, 2))
    assert ok(12000.0, (4, 4))
    assert ok(2000.0, (2, 2))
    assert not ok(20000.0, (2, 2))     # the off-air WAV capture rate
    assert not ok(24000.0, (2, 2))
    assert not ok(20000.0, (4, 4))
    # never on CPU (interpret mode is test-only) or GPU (pltpu spaces)
    assert not fused_waterfall_ok(waterfall_params(12000.0, 2, 2),
                                  platform="cpu")
    assert not fused_waterfall_ok(waterfall_params(12000.0, 2, 2),
                                  platform="cuda")


def test_combined_waterfall_sync_kernel_interpret(rng):
    """The combined waterfall+sync kernel (experimental, off by default:
    Mosaic cannot lower its stride-tau sublane grid read on chip —
    DESIGN_NOTES r4) stays correct in interpret mode: grids identical
    to the waterfall kernel, scores matching sync_scores_tf_mxu to the
    bf16-grid-operand tolerance with identical -inf masks."""
    from ft8_demodulator_tpu.ops.sync import (search_grid,
                                              sync_scores_tf_mxu)
    from ft8_demodulator_tpu.ops.waterfall_pallas import (
        block_waterfall_sync_tf_fused_batch, fused_waterfall_sync_ok)

    p = waterfall_params(FS, 2, 2)
    n = int(FS * 15)
    num_frames = p.num_frames(n)
    g = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)
    assert fused_waterfall_sync_ok(p, g, platform="tpu")
    waves = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    grids, scores = block_waterfall_sync_tf_fused_batch(
        waves, p, num_frames, g, interpret=True)
    ref_grids = block_waterfall_tf_fused_batch(waves, p, num_frames,
                                               interpret=True)
    np.testing.assert_array_equal(np.asarray(grids),
                                  np.asarray(ref_grids))
    for i in range(2):
        ref = np.asarray(sync_scores_tf_mxu(ref_grids[i], g))
        got = np.asarray(scores[i])
        np.testing.assert_array_equal(np.isneginf(ref), np.isneginf(got))
        fin = np.isfinite(ref)
        np.testing.assert_allclose(got[fin], ref[fin], atol=0.15)
