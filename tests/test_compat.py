"""Compatibility-layer tests: reference API names, shapes and goldens."""

import numpy as np

from ft8_demodulator_tpu import compat


def test_compat_encode_chain_matches_goldens(goldens):
    payload = goldens["p1_payload"]
    a91 = compat.crc_generator(payload)
    np.testing.assert_array_equal(a91, goldens["p1_a91"])
    assert compat.check_crc(a91)
    cw = compat.ldpc_generator(a91)
    np.testing.assert_array_equal(cw, goldens["p1_codeword"])
    tones = compat.ft8_encode(payload)
    np.testing.assert_array_equal(tones, goldens["p1_tones"])


def test_compat_generator_matches_goldens(goldens):
    bb = compat.ft8_baseband_generator(goldens["p1_payload"], 2000.0, 300.0)
    assert np.iscomplexobj(bb)
    np.testing.assert_allclose(bb, goldens["bb_fs2000_f0300"], atol=2e-3)
    pb = compat.ft8_generator(goldens["p1_payload"], 4000.0, 550.0, 600.0)
    np.testing.assert_allclose(pb, goldens["pb_fs4000_f0550_fc600"], atol=2e-3)


def test_compat_decode_returns_reference_tuples(goldens, rng):
    fs, f0 = 2000.0, 300.0
    wave = np.asarray(compat.ft8_generator(goldens["p1_payload"], fs, f0, 0.0))
    wave = np.concatenate([np.zeros(1000, np.float32), wave,
                           np.zeros(1000, np.float32)])
    wave = wave + rng.standard_normal(len(wave)).astype(np.float32) * 0.03
    rows = compat.decode_ft8_message(wave, fs, min_score=1.0)
    assert rows
    msg, status, time_sec, freq_hz, score = rows[0]
    assert isinstance(msg.payload, bytearray) and len(msg.payload) == 10
    assert msg.payload[:9] == bytes(goldens["p1_payload"][:9].tolist())
    assert status.ldpc_errors == 0
    assert status.crc_calculated == status.crc_extracted == msg.hash
    assert abs(freq_hz - f0) < 7.0
    # reference semantics: duplicates preserved (one row per candidate)
    hashes = [r[0].hash for r in rows]
    assert len(hashes) >= 1


def test_compat_bp_and_ldpc_check(goldens):
    from ft8_demodulator_tpu.protocol import constants as C
    cw = C.bytes_to_bits(goldens["p1_codeword"], 174)
    assert compat.ldpc_check(cw) == 0
    plain, errors = compat.bp_decode((2.0 * cw - 1.0) * 4.0, 20)
    assert errors == 0
    np.testing.assert_array_equal(plain, cw)


def test_compat_spectrogram_and_band_select(rng):
    wave = rng.standard_normal(4000)
    mag, f, t = compat.calculate_spectrogram(wave, 2000.0)
    sub, fsub = compat.select_frequency_band(mag, f, 0.0, 500.0)
    assert fsub.min() >= 0.0 and fsub.max() <= 500.0
    assert sub.shape[0] == fsub.shape[0]
