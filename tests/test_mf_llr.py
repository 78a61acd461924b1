"""Matched-filter LLR retry tests (beyond-reference sensitivity layer)."""

import jax
import jax.numpy as jnp
import numpy as np

from ft8_demodulator_tpu.demod import decode_ft8_message
from ft8_demodulator_tpu.demod.decode import decode_slot, finish_decode
from ft8_demodulator_tpu.ops.gfsk import ft8_passband, ft8_baseband
from ft8_demodulator_tpu.ops.llr import extract_llrs_matched
from ft8_demodulator_tpu.ops.waterfall import waterfall_params
from ft8_demodulator_tpu.protocol import constants as C
from ft8_demodulator_tpu.protocol import encode_codeword, payload_to_bits

PAYLOAD = np.array([0x1C, 0x3F, 0x8A, 0x6A, 0xE2, 0x07, 0xA1, 0xE3, 0x94, 0x51],
                   dtype=np.uint8)
FS = 2000.0


def _expected(payload):
    out = payload.copy()
    out[9] &= 0xF8
    return bytes(out.tolist())


def _noisy(seed, snr_db, f0=400.0):
    w = np.asarray(ft8_passband(PAYLOAD, FS, f0, 0.0))
    sig = np.zeros(int(FS * 15), np.float32)
    sig[500: 500 + len(w)] = w
    sp = float(np.mean(w ** 2))
    rng = np.random.default_rng(seed)
    sig += rng.standard_normal(len(sig)).astype(np.float32) \
        * np.sqrt(sp / 10 ** (snr_db / 10))
    return sig


def test_mf_llrs_clean_signal_exact_bits():
    """On a clean signal the matched-filter LLR signs ARE the codeword."""
    p = waterfall_params(FS, 2, 2)
    w = np.asarray(ft8_passband(PAYLOAD, FS, 400.0, 0.0))
    sig = np.zeros(int(FS * 15), np.float32)
    sig[640: 640 + len(w)] = w                      # 640 = 4 hops exactly
    # symbol 0 sits at the waveform start (WSJT-X alignment, ops/gfsk.py)
    abs_time = jnp.int32([640 // p.hop])
    abs_freq = jnp.int32([int(400.0 / (C.TONE_SPACING_HZ / p.freq_osr))])
    llr = np.asarray(extract_llrs_matched(
        jnp.asarray(sig), abs_time, abs_freq, p.nperseg, p.hop, p.freq_osr))
    cw = np.asarray(encode_codeword(payload_to_bits(jnp.asarray(PAYLOAD))))
    np.testing.assert_array_equal((llr[0] > 0).astype(int), cw)


def test_mf_retry_decodes_below_the_bp_osd_cliff(rng):
    """-15 dB @ fs 2 kHz: BP+OSD alone fails, the matched-filter retry
    decodes (measured 9/12 seeds vs 0/12 pre-TX-alignment-fix, 4/6 vs
    1/6 after; seed 1 committed)."""
    sig = _noisy(1, -15.0)
    plain = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True)
    withmf = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True,
                                use_mf=True)
    assert not any(r.message.payload == _expected(PAYLOAD) for r in plain)
    assert any(r.message.payload == _expected(PAYLOAD) for r in withmf)


def test_mf_retry_is_a_superset(rng):
    """At easy SNR the MF retry changes nothing (first pass wins rows)."""
    sig = _noisy(1, 0.0)
    a = decode_ft8_message(sig, FS, min_score=5.0)
    b = decode_ft8_message(sig, FS, min_score=5.0, use_mf=True)
    assert [(r.message.payload, round(r.freq_hz)) for r in a] == \
        [(r.message.payload, round(r.freq_hz)) for r in b]


def test_mf_rejects_pure_noise(rng):
    """MF LLRs from noise-only candidates accept nothing through
    BP + OSD + CRC (false-accept control for the retry path)."""
    p = waterfall_params(FS, 2, 2)
    sig = jnp.asarray(rng.standard_normal(int(FS * 15)).astype(np.float32))
    k = 64
    abs_time = jnp.int32(rng.integers(0, 100, k))
    abs_freq = jnp.int32(rng.integers(0, 900, k))
    llrs = extract_llrs_matched(sig, abs_time, abs_freq, p.nperseg, p.hop,
                                p.freq_osr)
    res = finish_decode(llrs, abs_time, abs_freq,
                        jnp.ones((k,)), jnp.ones((k,), bool),
                        use_osd=True)
    assert not np.asarray(res.success).any()


def test_mf_complex_input_decodes(rng):
    """The complex (drift-corrected) path supports the MF retry."""
    bb = np.asarray(ft8_baseband(PAYLOAD, FS, 350.0))
    sig = np.zeros(int(FS * 15), np.complex64)
    sig[500: 500 + len(bb)] = bb
    sp = float(np.mean(np.abs(bb) ** 2))
    noise = (rng.standard_normal(len(sig)) + 1j * rng.standard_normal(len(sig)))
    sig += (noise * np.sqrt(sp / 10 ** (-12.0 / 10) / 2)).astype(np.complex64)
    res = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True,
                             use_mf=True)
    assert any(r.message.payload == _expected(PAYLOAD) for r in res)


def test_mf_with_frequency_crop(rng):
    """Crop offsets translate candidate indices back to absolute audio
    coordinates for the MF windows."""
    sig = _noisy(2, -10.0, f0=600.0)
    res = decode_ft8_message(sig, FS, min_score=1.0, use_mf=True,
                             freq_min=450.0, freq_max=750.0)
    ok = [r for r in res if r.message.payload == _expected(PAYLOAD)]
    assert ok and abs(ok[0].freq_hz - 600.0) < 7.0


def test_mf_block_decomposition_matches_direct(rng):
    """The hop-block decomposition of the boxcar symbol DFT equals the
    direct form (same sums, different grouping) — incl. pre-roll and
    past-the-end candidates reading zeros."""
    from ft8_demodulator_tpu.ops.llr import extract_llrs_matched_blocks
    from ft8_demodulator_tpu.ops.waterfall import _block_spectrum

    p = waterfall_params(FS, 2, 2)
    # whole number of hop blocks: the direct form reads the last
    # (n mod hop) samples that fall outside any block — the only place
    # the two formulations legitimately differ (a sub-hop sliver of one
    # trailing symbol, invisible to the rest of the decoder too)
    n = ((int(FS * 15) - p.nperseg) // p.hop) * p.hop + p.nperseg
    wave = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    nf = p.num_frames(n)
    abs_time = jnp.int32([-8, 0, 5, 50, nf - 30, nf - 4])
    abs_freq = jnp.int32([3, 100, 200, 305, 250, 120])   # < num_freqs

    direct = np.asarray(extract_llrs_matched(
        wave, abs_time, abs_freq, p.nperseg, p.hop, p.freq_osr))
    sr, si = _block_spectrum(wave, p, nf)
    blocks = np.asarray(extract_llrs_matched_blocks(
        sr, si, abs_time, abs_freq, p.time_osr, p.freq_osr))
    np.testing.assert_allclose(blocks, direct, rtol=0, atol=0.05)


def test_mf_first_decodes_at_the_cliff(rng):
    """mf_first decodes the same -15 dB signal the retry path decodes
    (measured yield-identical at the cliff over 50 trials x 4 SNRs)."""
    sig = _noisy(0, -15.0)
    res = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True,
                             use_mf=True, mf_first=True)
    assert any(r.message.payload == _expected(PAYLOAD) for r in res)


def test_mf_first_matches_retry_on_clean_signal(rng):
    """At easy SNR mf_first reports the same messages as the retry path."""
    sig = _noisy(3, -5.0)
    a = decode_ft8_message(sig, FS, min_score=5.0, use_osd=True,
                           use_mf=True)
    b = decode_ft8_message(sig, FS, min_score=5.0, use_osd=True,
                           use_mf=True, mf_first=True)
    assert [(r.message.payload, round(r.freq_hz)) for r in a] == \
        [(r.message.payload, round(r.freq_hz)) for r in b]


def test_mf_first_slot_path_matches_host_path(rng):
    """decode_slot(mf_first=True) — the fused spectra fast path — agrees
    with the host API's decode_waterfall_mf composition."""
    from ft8_demodulator_tpu.demod.decode import decode_waterfall_mf
    from ft8_demodulator_tpu.ops.sync import search_grid
    from ft8_demodulator_tpu.ops.waterfall import waterfall_real

    sig = jnp.asarray(_noisy(4, -13.0))
    p = waterfall_params(FS, 2, 2)
    nf = p.num_frames(sig.shape[0])
    fast = decode_slot(sig, p, nf, min_score=1.0, use_osd=True,
                       use_mf=True, mf_first=True)
    mag = waterfall_real(sig, p, nf)
    g = search_grid(p.num_freq_bins, nf, p.time_osr, p.freq_osr)
    ref = decode_waterfall_mf(mag, sig, p, g, 0, 0, 20, 1.0, 20, True)
    np.testing.assert_array_equal(np.asarray(fast.success),
                                  np.asarray(ref.success))
    np.testing.assert_array_equal(np.asarray(fast.payload),
                                  np.asarray(ref.payload))


def test_mf_first_complex_input_decodes(rng):
    """Complex input routes through the true MF-first path in both the
    host API and decode_slot (no silent fallback divergence)."""
    bb = np.asarray(ft8_baseband(PAYLOAD, FS, 350.0))
    sig = np.zeros(int(FS * 15), np.complex64)
    sig[500: 500 + len(bb)] = bb
    sp = float(np.mean(np.abs(bb) ** 2))
    noise = (rng.standard_normal(len(sig)) + 1j * rng.standard_normal(len(sig)))
    sig += (noise * np.sqrt(sp / 10 ** (-12.0 / 10) / 2)).astype(np.complex64)
    res = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True,
                             mf_first=True)
    assert any(r.message.payload == _expected(PAYLOAD) for r in res)

    p = waterfall_params(FS, 2, 2)
    w2 = jnp.asarray(np.stack([sig.real, sig.imag], -1).astype(np.float32))
    slot = decode_slot(w2, p, p.num_frames(len(sig)), min_score=1.0,
                       is_complex=True, use_osd=True, mf_first=True)
    got = {bytes(r.tolist()) for r, s in
           zip(np.asarray(slot.payload), np.asarray(slot.success)) if s}
    assert _expected(PAYLOAD) in got


def test_mf_first_implies_mf():
    """mf_first without use_mf is the MF-first decode, not a silent no-op."""
    sig = _noisy(0, -15.0)
    res = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True,
                             mf_first=True)
    assert any(r.message.payload == _expected(PAYLOAD) for r in res)


# ---------------------------------------------------------------------------
# sub-grid (dt, df) refinement
# ---------------------------------------------------------------------------

def _noisy_offgrid_corner(seed, snr_db):
    """Worst-case off-grid placement: half a search-grid hop in time and
    half a grid row in frequency — the corner of one quantisation cell."""
    p = waterfall_params(FS, 2, 2)
    f0 = FS / 8.0 + (C.TONE_SPACING_HZ / p.freq_osr) / 2.0
    w = np.asarray(ft8_passband(PAYLOAD, FS, f0, 0.0))
    sps = int(C.SYMBOL_PERIOD_S * FS)
    sig = np.zeros(int(FS * 15), np.float32)
    t_off = sps // 2 + p.hop // 2
    sig[t_off: t_off + len(w)] = w
    sp = float(np.mean(w ** 2))
    r = np.random.default_rng(seed)
    sig += r.standard_normal(len(sig)).astype(np.float32) \
        * np.sqrt(sp / 10 ** (snr_db / 10))
    return sig


def test_mf_refine_decodes_the_offgrid_corner(rng):
    """-13 dB at the grid-cell corner: the boxcar's quantisation loss
    (~1/4 symbol + ~1/2 bin) defeats plain MF-first (measured 0/10 seeds);
    the sub-grid offset search decodes (10/10 at -14; seed 100 committed)."""
    sig = _noisy_offgrid_corner(100, -13.0)
    plain = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True,
                               mf_first=True)
    refined = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True,
                                 mf_first=True, mf_refine=True)
    assert not any(r.message.payload == _expected(PAYLOAD) for r in plain)
    ok = [r for r in refined if r.message.payload == _expected(PAYLOAD)]
    assert ok


def test_mf_refine_retry_path_decodes_the_offgrid_corner(rng):
    """The Hann-decode + MF-retry composition gains the same offset search
    (use_mf + mf_refine)."""
    sig = _noisy_offgrid_corner(100, -13.0)
    res = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True,
                             use_mf=True, mf_refine=True)
    assert any(r.message.payload == _expected(PAYLOAD) for r in res)


def test_mf_refine_is_a_superset_on_grid(rng):
    """On-grid signals decode identically with refinement: the base
    offset-(0, 0) LLRs decode first and refined LLRs only retry failures."""
    sig = _noisy(0, -15.0)
    a = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True,
                           mf_first=True)
    b = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True,
                           mf_first=True, mf_refine=True)
    rows_a = {(r.message.payload, round(r.freq_hz)) for r in a}
    rows_b = {(r.message.payload, round(r.freq_hz)) for r in b}
    assert rows_a <= rows_b
    assert any(p == _expected(PAYLOAD) for p, _ in rows_b)


def test_mf_refine_base_llrs_match_unrefined(rng):
    """The refined extractor's base output IS the plain direct-form MF
    extraction (offset (0, 0) is the first grid point)."""
    from ft8_demodulator_tpu.ops.llr import extract_llrs_matched_refined

    p = waterfall_params(FS, 2, 2)
    sig = jnp.asarray(rng.standard_normal(int(FS * 15)).astype(np.float32))
    abs_time = jnp.int32([-5, 0, 40, 100])
    abs_freq = jnp.int32([10, 100, 250, 300])
    base, refined = extract_llrs_matched_refined(
        sig, abs_time, abs_freq, p.nperseg, p.hop, p.freq_osr)
    plain = extract_llrs_matched(sig, abs_time, abs_freq, p.nperseg, p.hop,
                                 p.freq_osr)
    np.testing.assert_allclose(np.asarray(base), np.asarray(plain),
                               rtol=0, atol=1e-4)
    assert refined.shape == plain.shape


def test_mf_refine_complex_offgrid_decodes(rng):
    """The refined extractor's complex branch: an off-grid-corner complex
    (drift-corrected-style) signal decodes with mf_first + mf_refine."""
    p = waterfall_params(FS, 2, 2)
    f0 = FS / 8.0 + (C.TONE_SPACING_HZ / p.freq_osr) / 2.0
    bb = np.asarray(ft8_baseband(PAYLOAD, FS, f0))
    sps = int(C.SYMBOL_PERIOD_S * FS)
    sig = np.zeros(int(FS * 15), np.complex64)
    t_off = sps // 2 + p.hop // 2
    sig[t_off: t_off + len(bb)] = bb
    sp = float(np.mean(np.abs(bb) ** 2))
    noise = (rng.standard_normal(len(sig))
             + 1j * rng.standard_normal(len(sig)))
    sig += (noise * np.sqrt(sp / 10 ** (-13.0 / 10) / 2)).astype(np.complex64)
    res = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True,
                             mf_first=True, mf_refine=True)
    assert any(r.message.payload == _expected(PAYLOAD) for r in res)


def test_mf_refine_rejects_pure_noise(rng):
    """The best-offset selection maximises over noise too — the
    refined LLRs must still accept nothing from noise-only candidates
    through BP + OSD + CRC."""
    from ft8_demodulator_tpu.ops.llr import extract_llrs_matched_refined

    p = waterfall_params(FS, 2, 2)
    sig = jnp.asarray(rng.standard_normal(int(FS * 15)).astype(np.float32))
    k = 64
    abs_time = jnp.int32(rng.integers(0, 100, k))
    abs_freq = jnp.int32(rng.integers(0, 900, k))
    base, refined = extract_llrs_matched_refined(
        sig, abs_time, abs_freq, p.nperseg, p.hop, p.freq_osr)
    for llrs in (base, refined):
        res = finish_decode(llrs, abs_time, abs_freq,
                            jnp.ones((k,)), jnp.ones((k,), bool),
                            use_osd=True)
        assert not np.asarray(res.success).any()
