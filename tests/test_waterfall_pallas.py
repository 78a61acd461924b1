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
    keeps both bf16 DFT matrices VMEM-resident when they fit (20.5 MB
    resident fails Mosaic compilation on v5e; 7.4 MB at 12 kHz 4x4
    compiles).  Since round 5 geometries past the resident budget are
    served by the STRIP schedule (streamed weight columns) whenever
    nbins has a >=256 divisor that is a 128 multiple and whose strip
    pair fits VMEM; geometries where only width-128 strips would fit
    (e.g. the 20 kHz off-air capture rate: strip-128 measured SLOWER
    than the XLA pair, 51.3 vs 45.6 us/slot) still fall back to XLA."""
    from ft8_demodulator_tpu.ops.waterfall_pallas import (
        _base_strip_part, fused_waterfall_ok)

    ok = lambda fs, osr: fused_waterfall_ok(
        waterfall_params(fs, *osr), platform="tpu")
    assert ok(12000.0, (2, 2))
    assert ok(12000.0, (4, 4))
    assert ok(2000.0, (2, 2))
    # 20 kHz 2x2: resident exceeds VMEM and only width-128 strips
    # divide nbins=3200 -> XLA pair stays (measured faster there)
    assert _base_strip_part(waterfall_params(20000.0, 2, 2)) is None
    assert not ok(20000.0, (2, 2))
    # 24 kHz 2x2: nbins=3840 admits width-256 strips -> the fused strip
    # path serves a geometry the resident kernel never could
    assert _base_strip_part(waterfall_params(24000.0, 2, 2)) == 256
    assert ok(24000.0, (2, 2))
    assert not ok(50000.0, (2, 2))     # neither schedule fits
    # never on CPU (interpret mode is test-only) or GPU (pltpu spaces)
    assert not fused_waterfall_ok(waterfall_params(12000.0, 2, 2),
                                  platform="cpu")
    assert not fused_waterfall_ok(waterfall_params(12000.0, 2, 2),
                                  platform="cuda")
def test_mf_fused_kernel_grids_match_references(rng):
    """The dual-output MF front kernel: dB grid == the single-output
    kernel; boxcar grid == _block_boxcar_tf on bf16-operand spectra
    (interpret mode; same operands, same combine order)."""
    from ft8_demodulator_tpu.ops.waterfall import (_block_boxcar_tf,
                                                   _block_spectrum)
    from ft8_demodulator_tpu.ops.waterfall_pallas import (
        block_waterfall_mf_tf_fused_batch, fused_mf_waterfall_ok)

    for fs, osr in ((12000.0, (4, 4)), (12000.0, (2, 2))):
        p = waterfall_params(fs, *osr)
        assert fused_mf_waterfall_ok(p, platform="tpu")
        n = int(fs * 15)
        nf = p.num_frames(n)
        waves = jnp.asarray((rng.standard_normal((2, n)) * 0.3)
                            .astype(np.float32))
        db, box = block_waterfall_mf_tf_fused_batch(waves, p, nf,
                                                    interpret=True)
        ref_db = block_waterfall_tf_fused_batch(waves, p, nf,
                                                interpret=True)
        np.testing.assert_allclose(np.asarray(db), np.asarray(ref_db),
                                   atol=1e-3)

        # boxcar reference from bf16-operand spectra (the kernel's own
        # rounding), exact f32 combine
        nb = nf + p.time_osr - 1
        bl = np.asarray(waves)[:, : nb * p.hop].reshape(2, nb, p.hop)
        bl16 = jnp.asarray(bl).astype(jnp.bfloat16)
        from ft8_demodulator_tpu.ops.waterfall_pallas import \
            _fused_constants
        cos_m, sin_m, _, _, _ = _fused_constants(p)
        pr = jnp.matmul(bl16, jnp.asarray(cos_m),
                        preferred_element_type=jnp.float32)
        pi = jnp.matmul(bl16, jnp.asarray(sin_m),
                        preferred_element_type=jnp.float32)
        ref_box = _block_boxcar_tf((pr, pi), p, nf)
        assert box.shape == ref_box.shape
        np.testing.assert_allclose(np.asarray(box), np.asarray(ref_box),
                                   rtol=2e-5, atol=1e-5)


def test_extract_llrs_matched_grid_matches_blocks(rng):
    """Grid-gathered MF LLRs == spectra-gathered MF LLRs (within the
    routing matmuls' operand tolerance), including pre-roll and
    end-clipped candidate times."""
    from ft8_demodulator_tpu.ops.llr import (extract_llrs_matched_blocks,
                                             extract_llrs_matched_grid)
    from ft8_demodulator_tpu.ops.waterfall import (_block_boxcar_tf,
                                                   _block_spectrum)

    fs = 2000.0
    p = waterfall_params(fs, 2, 2)
    n = int(fs * 15)
    nf = p.num_frames(n)
    tau, phi = p.time_osr, p.freq_osr
    wave = jnp.asarray((rng.standard_normal(n) * 0.3).astype(np.float32))
    spec = _block_spectrum(wave, p, nf)
    box = _block_boxcar_tf(spec, p, nf)

    nb = nf + tau - 1
    abs_time = jnp.asarray(
        np.concatenate([[-20, -1, 0, 1, nb - 79 * tau, nb - 40 * tau,
                         nb - 2],
                        rng.integers(0, nb - 79 * tau, 9)]).astype(np.int32))
    abs_freq = jnp.asarray(rng.integers(
        0, p.num_freq_bins - 7 * phi, len(abs_time)).astype(np.int32))

    a = extract_llrs_matched_blocks(spec[0], spec[1], abs_time, abs_freq,
                                    tau, phi)
    b = extract_llrs_matched_grid(box, abs_time, abs_freq, tau, phi)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.06,
                               rtol=0.02)
    # and the decode-relevant statistic: LLR signs agree on confident bits
    an, bn = np.asarray(a), np.asarray(b)
    strong = np.abs(an) > 1.0
    assert (np.sign(an[strong]) == np.sign(bn[strong])).mean() > 0.999


def test_mf_grid_front_decode_set_identical(rng):
    """Planted signals decode to the same payload set through the
    round-5 grid MF front (dual-output kernel + grid LLR gather) as
    through the round-4 spectra front (CPU interpret)."""
    from ft8_demodulator_tpu.demod.decode import finish_decode
    from ft8_demodulator_tpu.ops.gfsk import ft8_passband
    from ft8_demodulator_tpu.ops.llr import (extract_llrs_matched_blocks,
                                             extract_llrs_matched_grid)
    from ft8_demodulator_tpu.ops.sync import (find_candidates_tf,
                                              search_grid, sync_scores_tf)
    from ft8_demodulator_tpu.ops.waterfall import (_block_spectrum,
                                                   _block_waterfall_tf)
    from ft8_demodulator_tpu.ops.waterfall_pallas import \
        block_waterfall_mf_tf_fused_batch

    fs = 12000.0
    p = waterfall_params(fs, 2, 2)
    n = int(fs * 15)
    nf = p.num_frames(n)
    g = search_grid(p.num_freq_bins, nf, p.time_osr, p.freq_osr)

    decoded = {"spectra": set(), "grid": set()}
    for trial in range(2):
        payload = np.asarray(rng.integers(0, 256, 10), np.uint8)
        payload[9] &= 0xF8
        w = np.zeros(n, np.float32)
        sig = np.asarray(ft8_passband(payload, fs, 900.0 + 400.0 * trial,
                                      0.0))
        w[3000: 3000 + len(sig)] = sig
        w += 0.3 * rng.standard_normal(n).astype(np.float32)
        wd = jnp.asarray(w)

        spec = _block_spectrum(wd, p, nf)
        mag = _block_waterfall_tf(spec, p, nf)
        t, f, sc, ok = find_candidates_tf(sync_scores_tf(mag, g), g, 10,
                                          1.0)
        llr = extract_llrs_matched_blocks(spec[0], spec[1], t, f,
                                          p.time_osr, p.freq_osr)
        res = finish_decode(llr, t, f, sc, ok, 20, False)
        for row in np.asarray(res.payload)[np.asarray(res.success)]:
            decoded["spectra"].add(bytes(row))

        mag2, box = block_waterfall_mf_tf_fused_batch(wd[None], p, nf,
                                                      interpret=True)
        t2, f2, sc2, ok2 = find_candidates_tf(
            sync_scores_tf(mag2[0], g), g, 10, 1.0)
        llr2 = extract_llrs_matched_grid(box[0], t2, f2, p.time_osr,
                                         p.freq_osr)
        res2 = finish_decode(llr2, t2, f2, sc2, ok2, 20, False)
        for row in np.asarray(res2.payload)[np.asarray(res2.success)]:
            decoded["grid"].add(bytes(row))
        assert bytes(payload) in decoded["spectra"], f"trial {trial}"
    assert decoded["spectra"] == decoded["grid"]
