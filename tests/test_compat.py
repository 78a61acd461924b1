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


def test_compat_crc_helpers_round_trip(goldens):
    payload = goldens["p1_payload"]
    a91 = compat.crc_generator(payload)

    # embedded checksum == checksum over the zero-padded first 82 bits
    msg = a91.copy()
    msg[9] &= 0xF8
    msg[10] = 0
    msg[11] = 0
    crc = int(compat.calc_crc(msg, 82))
    assert crc == int(compat.get_crc_from_a91(a91))
    assert crc == compat.compute_crc(bytearray(msg), 82)
    assert compat.extract_crc(bytearray(a91)) == crc

    out = bytearray(12)
    compat.add_crc(bytearray(payload.tolist()) + bytearray(2), out)
    assert bytes(out) == bytes(a91.tolist())


def test_compat_symbol_and_framing_chain(goldens):
    a91 = compat.crc_generator(goldens["p1_payload"])
    cw = compat.ldpc_generator(a91)
    syms = compat.symbolIdSequence_generator(cw)
    assert syms.shape == (58,) and syms.max() <= 7
    itones = compat.itones_generator(syms)
    np.testing.assert_array_equal(itones, goldens["p1_tones"])
    np.testing.assert_array_equal(itones[:7], [3, 1, 4, 0, 6, 5, 2])


def test_compat_modulator_chain_matches_baseband(goldens):
    fs, f0 = 2000.0, 300.0
    itones = compat.ft8_encode(goldens["p1_payload"])
    track = compat.gfsk_modulation_waveform_generator(itones, fs)
    sps = int(0.16 * fs)
    assert track.shape == ((79 + 2) * sps,)
    # track edges settle on the first/last tone's frequency
    assert abs(track[sps + sps // 2] - 6.25 * itones[0]) < 0.3
    wave = compat.ft8_modulation_waveform_generator(track, fs, f0)
    ref = compat.ft8_baseband_generator(goldens["p1_payload"], fs, f0)
    np.testing.assert_allclose(wave, ref, atol=2e-3)
