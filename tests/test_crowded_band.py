"""Crowded-band decode: many simultaneous signals in one slot, with dedup.

BASELINE config 2: a single 15 s slot carrying many FT8 transmissions at
different frequencies must yield every payload in one decode pass, and
duplicate decodes of one transmission (the same message surviving through
several near-identical candidates) must merge under the default dedup.
"""

import jax.numpy as jnp
import numpy as np

from ft8_demodulator_tpu.demod.decode import decode_ft8_message
from ft8_demodulator_tpu.ops.gfsk import _baseband_complex
from ft8_demodulator_tpu.protocol import constants as C
from ft8_demodulator_tpu.protocol.encode import encode_tones

FS = 4000.0


def _slot_with_signals(payloads, f0s, rng, snr_db=10.0):
    sps = int(C.SYMBOL_PERIOD_S * FS)
    n = int(FS * 15)
    tones = np.asarray(encode_tones(jnp.asarray(payloads)))
    sig = np.zeros(n, np.float64)
    for t, f0 in zip(tones, f0s):
        wave = np.real(np.asarray(_baseband_complex(
            jnp.asarray(t), sps, FS, float(f0)))).astype(np.float64)
        sig[sps: sps + wave.shape[0]] += wave
    power = np.mean(sig ** 2)
    noise = rng.standard_normal(n) * np.sqrt(power / 10 ** (snr_db / 10))
    return (sig + noise).astype(np.float32)


def test_decodes_eight_simultaneous_signals():
    rng = np.random.default_rng(11)
    k = 8
    payloads = rng.integers(0, 256, size=(k, 10), dtype=np.uint8)
    payloads[:, 9] &= 0xF8
    f0s = 300.0 + 200.0 * np.arange(k)          # 300..1700 Hz, 200 Hz apart

    wave = _slot_with_signals(payloads, f0s, rng)
    results = decode_ft8_message(wave, FS, max_candidates=40, min_score=5.0)

    got = {r.message.payload.hex() for r in results}
    want = {p.tobytes().hex() for p in payloads}
    assert want <= got, f"missing {want - got}"
    # frequencies must map back to the transmitted carriers
    freqs = sorted(r.freq_hz for r in results
                   if r.message.payload.hex() in want)
    for f_est, f_true in zip(freqs, sorted(f0s)):
        assert abs(f_est - f_true) < 2 * C.TONE_SPACING_HZ


def test_duplicate_candidates_merge_under_dedup():
    rng = np.random.default_rng(12)
    payload = rng.integers(0, 256, size=(1, 10), dtype=np.uint8)
    payload[0, 9] &= 0xF8
    # the same message transmitted at two frequencies: dedup keeps one row
    # (the reference returns one row per surviving candidate)
    f0s = [500.0, 1200.0]
    wave = _slot_with_signals(np.repeat(payload, 2, axis=0), f0s, rng)

    merged = decode_ft8_message(wave, FS, max_candidates=30, min_score=5.0)
    raw = decode_ft8_message(wave, FS, max_candidates=30, min_score=5.0,
                             deduplicate=False)
    hexes = [r.message.payload.hex() for r in merged]
    assert hexes.count(payload[0].tobytes().hex()) == 1
    assert len(raw) > len(merged)
