"""Known-payload beacon detection tests (beyond-reference layer).

The reference tracks a known beacon but only ever detects via the 21-cell
Costas sync; beacon/detect.py correlates all 79 known symbols
(~+5.8 dB of detection reach) and stacks repeats (~sqrt(R) more).
"""

import numpy as np

from ft8_demodulator_tpu.beacon import detect_known_payload
from ft8_demodulator_tpu.ops.gfsk import ft8_baseband, ft8_passband

PAYLOAD = np.array([0x1C, 0x3F, 0x8A, 0x6A, 0xE2, 0x07, 0xA1, 0xE3, 0x94, 0x51],
                   dtype=np.uint8)
OTHER = np.array([0x2B, 0x14, 0x9C, 0x33, 0x71, 0xE0, 0x55, 0xAA, 0x06, 0x18],
                 dtype=np.uint8)
FS = 2000.0


def _repeats(seed, snr_db, r, f0=400.0):
    w = np.asarray(ft8_passband(PAYLOAD, FS, f0, 0.0))
    sig = np.zeros((r, int(FS * 15)), np.float32)
    sig[:, 500: 500 + len(w)] = w
    sp = float(np.mean(w ** 2))
    rng = np.random.default_rng(seed)
    sig += rng.standard_normal(sig.shape).astype(np.float32) \
        * np.sqrt(sp / 10 ** (snr_db / 10))
    return sig


def _hit(dets, f0=400.0, t0=0.25):
    return any(abs(d.freq_hz - f0) < 7.0 and abs(d.time_sec - t0) < 0.6
               for d in dets)


def test_detects_far_below_the_decode_cliff():
    """-20 dB single slot: 4.5 dB below the best decode cliff (-15.5),
    the full-track detector still localises the beacon (measured 10/10
    seeds at -20 pre-TX-alignment-fix, 4/5 after; seed 201 committed)."""
    sig = _repeats(201, -20.0, 1)[0]
    assert _hit(detect_known_payload(sig, FS, PAYLOAD))


def test_wrong_payload_does_not_detect():
    """A different payload's track only shares the 21 Costas cells —
    at -20 dB the wrong-track score stays below threshold."""
    sig = _repeats(200, -20.0, 1)[0]
    assert detect_known_payload(sig, FS, OTHER) == []


def test_stacked_detection_reaches_minus_24():
    """8 stacked repeats at -24 dB: 8.5 dB below the single-slot decode
    cliff and 2.5 dB below the 8-repeat STACKED DECODE floor (-21.5) —
    detection-only tracking reaches where no decode can (measured 10/10
    at -24, 9/10 at -25; seed 201 committed)."""
    sig = _repeats(201, -24.0, 8)
    assert _hit(detect_known_payload(sig, FS, PAYLOAD))


def test_noise_only_never_detects():
    """min_z=6 sits ~1.4 sigma above the measured noise-only max over 20
    slots (4.66); a handful of fresh noise slots must stay silent for
    both single and stacked grids."""
    rng = np.random.default_rng(5)
    for r in (1, 8):
        noise = rng.standard_normal((r, int(FS * 15))).astype(np.float32)
        assert detect_known_payload(noise, FS, PAYLOAD) == []


def test_complex_input_detects():
    """Complex (drift-corrected-style) captures detect the same way."""
    bb = np.asarray(ft8_baseband(PAYLOAD, FS, 350.0))
    sig = np.zeros(int(FS * 15), np.complex64)
    sig[500: 500 + len(bb)] = bb
    sp = float(np.mean(np.abs(bb) ** 2))
    rng = np.random.default_rng(7)
    nz = rng.standard_normal(len(sig)) + 1j * rng.standard_normal(len(sig))
    sig = sig + (nz * np.sqrt(sp / 10 ** (-20.0 / 10) / 2)).astype(np.complex64)
    dets = detect_known_payload(sig, FS, PAYLOAD)
    assert _hit(dets, f0=350.0)


def test_short_input_returns_empty():
    assert detect_known_payload(np.zeros(8, np.float32), FS, PAYLOAD) == []


def test_one_window_but_empty_grid_returns_empty():
    """A capture long enough for a few STFT frames but shorter than one
    full 79-symbol score column must return [] (not fail building an
    empty top_k grid)."""
    n = int(FS * 2.0)     # 2 s: frames exist, num_times <= 0
    assert detect_known_payload(np.zeros(n, np.float32), FS, PAYLOAD) == []


def test_coherent_tracking_reaches_minus_28():
    """With a position prior (satellite model / previous cycle) the
    coherent track statistic integrates all 79 symbols: 50 %-detection
    ~-29 dB single slot (measured 8/10 at -28; committed seed), ~8 dB
    past the global noncoherent scan."""
    from ft8_demodulator_tpu.beacon import track_known_payload

    w = np.asarray(ft8_passband(PAYLOAD, FS, 400.3, 0.0))
    sp = float(np.mean(w ** 2))
    rng = np.random.default_rng(0)
    sig = np.zeros(int(FS * 15), np.float32)
    sig[500: 500 + len(w)] = w
    sig += rng.standard_normal(len(sig)).astype(np.float32) \
        * np.sqrt(sp / 10 ** (-28.0 / 10))
    fix = track_known_payload(sig, FS, PAYLOAD, time_hint_s=500 / FS,
                              freq_hint_hz=400.0)
    assert fix.detected
    assert abs(fix.freq_hz - 400.3) < 0.2     # sub-bin frequency fix


def test_coherent_tracking_controls():
    """Noise-only and wrong-payload inputs stay silent."""
    from ft8_demodulator_tpu.beacon import track_known_payload

    for seed in range(3):
        rng = np.random.default_rng(7100 + seed)
        noise = rng.standard_normal(int(FS * 15)).astype(np.float32)
        assert not track_known_payload(noise, FS, PAYLOAD, 500 / FS,
                                       400.0).detected
    w = np.asarray(ft8_passband(PAYLOAD, FS, 400.0, 0.0))
    sp = float(np.mean(w ** 2))
    rng = np.random.default_rng(4)
    sig = np.zeros(int(FS * 15), np.float32)
    sig[500: 500 + len(w)] = w
    sig += rng.standard_normal(len(sig)).astype(np.float32) \
        * np.sqrt(sp / 10 ** (-20.0 / 10))
    assert not track_known_payload(sig, FS, OTHER, 500 / FS,
                                   400.0).detected


def test_coherent_tracking_off_tone_grid():
    """A Doppler-shifted beacon rarely sits on a 6.25-Hz multiple; the
    tracker's df search must centre on the HINT, not the tone grid, and
    report the true frequency (review regression)."""
    from ft8_demodulator_tpu.beacon import track_known_payload

    w = np.asarray(ft8_passband(PAYLOAD, FS, 400.3, 0.0))
    sp = float(np.mean(w ** 2))
    rng = np.random.default_rng(0)
    sig = np.zeros(int(FS * 15), np.float32)
    sig[500: 500 + len(w)] = w
    sig += rng.standard_normal(len(sig)).astype(np.float32) \
        * np.sqrt(sp / 10 ** (-10.0 / 10))
    for hint in (400.5, 400.0, 401.7 - 1.4):
        fix = track_known_payload(sig, FS, PAYLOAD, 500 / FS, hint)
        assert fix.detected
        assert abs(fix.freq_hz - 400.3) < 0.15, (hint, fix)


def test_refine_fixes_reports_subhertz_frequency():
    """refine_fixes=True replaces the candidate-cell (time, freq) with a
    coherent known-payload fix seeded by the decode: the reported
    frequency lands within ~0.1 Hz of an off-grid truth (the raw grid
    quantises to 3.125 Hz and can sit ~2 cells off on stencil
    sidelobes), and time within a few ms."""
    from ft8_demodulator_tpu.demod import decode_ft8_message

    f0, start = 401.7, 583                     # off-grid in both axes
    w = np.asarray(ft8_passband(PAYLOAD, FS, f0, 0.0))
    sig = np.zeros(int(FS * 15), np.float32)
    sig[start: start + len(w)] = w
    sp = float(np.mean(w ** 2))
    rng = np.random.default_rng(9)
    sig += rng.standard_normal(len(sig)).astype(np.float32) \
        * np.sqrt(sp / 10 ** (-10.0 / 10))
    want = PAYLOAD.copy(); want[9] &= 0xF8
    rows = decode_ft8_message(sig, FS, min_score=1.0, use_osd=True,
                              mf_first=True, refine_fixes=True)
    hit = [r for r in rows if r.message.payload == bytes(want.tolist())]
    assert hit
    assert abs(hit[0].freq_hz - f0) < 0.15
    assert abs(hit[0].time_sec - start / FS) < 0.02


def test_refine_fixes_on_stacked_decode():
    """The stacked path refines against the newest live repeat."""
    from ft8_demodulator_tpu.demod import decode_ft8_stacked

    f0 = 400.55
    sig = _repeats(12, -18.0, 4, f0=f0)
    want = PAYLOAD.copy(); want[9] &= 0xF8
    rows = decode_ft8_stacked(sig, FS, use_osd=True, coherent=True,
                              refine_fixes=True)
    hit = [r for r in rows if r.message.payload == bytes(want.tolist())]
    assert hit
    assert abs(hit[0].freq_hz - f0) < 0.2
