"""Cross-transmission (beacon) stacking tests (beyond-reference layer).

The reference beacon receiver (src/ft8_tools/ft8_beacon_receiver/) decodes
each 15-s slot independently; stacking combines R slot-aligned repeats of
one transmission by averaging linear per-tone powers (demod/stack.py).
"""

import numpy as np

from ft8_demodulator_tpu.demod import decode_ft8_message, decode_ft8_stacked
from ft8_demodulator_tpu.ops.gfsk import ft8_baseband, ft8_passband

PAYLOAD = np.array([0x1C, 0x3F, 0x8A, 0x6A, 0xE2, 0x07, 0xA1, 0xE3, 0x94, 0x51],
                   dtype=np.uint8)
FS = 2000.0


def _expected(payload):
    out = payload.copy()
    out[9] &= 0xF8
    return bytes(out.tolist())


def _repeats(seed, snr_db, r, f0=400.0):
    """R slot-aligned repeats of one transmission under independent noise."""
    w = np.asarray(ft8_passband(PAYLOAD, FS, f0, 0.0))
    sig = np.zeros((r, int(FS * 15)), np.float32)
    sig[:, 500: 500 + len(w)] = w
    sp = float(np.mean(w ** 2))
    rng = np.random.default_rng(seed)
    sig += rng.standard_normal(sig.shape).astype(np.float32) \
        * np.sqrt(sp / 10 ** (snr_db / 10))
    return sig


def test_stack4_decodes_below_the_single_slot_cliff():
    """-18 dB @ fs 2 kHz: every repeat fails alone through the best
    single-slot path (OSD + MF-first; cliff -15.5 dB), the 4-repeat stack
    decodes (measured 6/6 seeds at -18, 5/6 at -19; seed 0 committed)."""
    sig = _repeats(0, -18.0, 4)
    for one in sig:
        single = decode_ft8_message(one, FS, min_score=1.0, use_osd=True,
                                    mf_first=True)
        assert not any(r.message.payload == _expected(PAYLOAD)
                       for r in single)
    res = decode_ft8_stacked(sig, FS, min_score=1.0, use_osd=True)
    assert any(r.message.payload == _expected(PAYLOAD) for r in res)


def test_stack_r1_matches_mf_first():
    """With one repeat the stack IS the single-slot MF-first decode: the
    mean over R=1 is the identity, so rows match exactly."""
    sig = _repeats(1, -13.0, 1)
    a = decode_ft8_message(sig[0], FS, min_score=1.0, use_osd=True,
                           mf_first=True)
    b = decode_ft8_stacked(sig, FS, min_score=1.0, use_osd=True)
    rows = lambda rs: [(r.message.payload, r.time_sec, r.freq_hz, r.score)
                       for r in rs]
    assert rows(a) == rows(b)
    assert any(p == _expected(PAYLOAD) for p, _, _, _ in rows(b))


def test_stack_rejects_pure_noise():
    """Averaging noise-only repeats must accept nothing through
    BP + OSD + CRC (false-accept control for the stacked path)."""
    rng = np.random.default_rng(2)
    noise = rng.standard_normal((4, int(FS * 15))).astype(np.float32)
    assert decode_ft8_stacked(noise, FS, min_score=1.0, use_osd=True) == []


def test_stack_complex_repeats_decode():
    """Complex (drift-corrected-style) repeats stack the same way:
    -20 dB, single complex slot fails, the 4-repeat stack decodes."""
    bb = np.asarray(ft8_baseband(PAYLOAD, FS, 350.0))
    sig = np.zeros((4, int(FS * 15)), np.complex64)
    sig[:, 500: 500 + len(bb)] = bb
    sp = float(np.mean(np.abs(bb) ** 2))
    rng = np.random.default_rng(3)
    nz = rng.standard_normal(sig.shape) + 1j * rng.standard_normal(sig.shape)
    sig += (nz * np.sqrt(sp / 10 ** (-20.0 / 10) / 2)).astype(np.complex64)
    single = decode_ft8_message(sig[0], FS, min_score=1.0, use_osd=True,
                                mf_first=True)
    assert not any(r.message.payload == _expected(PAYLOAD) for r in single)
    res = decode_ft8_stacked(sig, FS, min_score=1.0, use_osd=True)
    assert any(r.message.payload == _expected(PAYLOAD) for r in res)


def test_stack_hann_path_gains_too():
    """use_mf=False reads Hann LLRs from the stacked dB grid — the
    averaging already helps the reference-parity LLR path (here: -17 dB,
    below the plain single-slot cliff ~-13.5)."""
    sig = _repeats(4, -17.0, 4)
    single = decode_ft8_message(sig[0], FS, min_score=1.0, use_osd=True)
    assert not any(r.message.payload == _expected(PAYLOAD) for r in single)
    res = decode_ft8_stacked(sig, FS, min_score=1.0, use_osd=True,
                             use_mf=False)
    assert any(r.message.payload == _expected(PAYLOAD) for r in res)


def test_stack_short_input_returns_empty():
    assert decode_ft8_stacked(np.zeros((2, 8), np.float32), FS) == []


def test_as_device_stack_forms():
    """All accepted host shapes normalise to (R, n[, 2]) float32 with the
    same values; rejected shapes raise ValueError."""
    import pytest

    from ft8_demodulator_tpu.demod.stack import as_device_stack

    rng = np.random.default_rng(8)
    real = rng.standard_normal((3, 16)).astype(np.float32)
    cplx = (rng.standard_normal((3, 16))
            + 1j * rng.standard_normal((3, 16))).astype(np.complex64)

    d, c = as_device_stack(real)
    assert not c and d.shape == (3, 16) and np.allclose(d, real)
    d, c = as_device_stack(real[0])
    assert not c and d.shape == (1, 16) and np.allclose(d[0], real[0])
    d, c = as_device_stack(cplx)
    assert c and d.shape == (3, 16, 2)
    assert np.allclose(d[..., 0], cplx.real) and np.allclose(d[..., 1],
                                                             cplx.imag)
    d1, c1 = as_device_stack(cplx[0])
    assert c1 and d1.shape == (1, 16, 2) and np.allclose(d1[0], d[0])
    reim = np.stack([cplx.real, cplx.imag], axis=-1)
    d2, c2 = as_device_stack(reim)
    assert c2 and np.allclose(d2, d)
    d3, c3 = as_device_stack(reim[0])
    assert c3 and d3.shape == (1, 16, 2) and np.allclose(d3[0], d[0])

    with pytest.raises(ValueError):
        as_device_stack(np.zeros((2, 3, 4), np.complex64))
    with pytest.raises(ValueError):
        as_device_stack(np.zeros((2, 3, 4, 5), np.float32))
    with pytest.raises(ValueError):
        as_device_stack(np.zeros((2, 3, 5), np.float32))


def test_stack_reim_form_decodes_like_complex():
    """(R, n, 2) [re, im] input is the same decode as the complex form."""
    bb = np.asarray(ft8_baseband(PAYLOAD, FS, 350.0))
    sig = np.zeros((2, int(FS * 15)), np.complex64)
    sig[:, 500: 500 + len(bb)] = bb
    sp = float(np.mean(np.abs(bb) ** 2))
    rng = np.random.default_rng(9)
    nz = rng.standard_normal(sig.shape) + 1j * rng.standard_normal(sig.shape)
    sig += (nz * np.sqrt(sp / 10 ** (-13.0 / 10) / 2)).astype(np.complex64)
    a = decode_ft8_stacked(sig, FS, min_score=1.0, use_osd=True)
    b = decode_ft8_stacked(np.stack([sig.real, sig.imag], axis=-1), FS,
                           min_score=1.0, use_osd=True)
    rows = lambda rs: [(r.message.payload, r.time_sec, r.freq_hz, r.score)
                       for r in rs]
    assert rows(a) == rows(b)
    assert any(p == _expected(PAYLOAD) for p, _, _, _ in rows(a))


def test_stack_after_per_repeat_drift_correction():
    """The satellite-beacon flow: each repeat passes through the channel
    with a DIFFERENT drift rate, is drift-corrected independently
    (beacon.correct_frequency_drift), and the complex corrected waves
    stack into one decode."""
    from ft8_demodulator_tpu.beacon import correct_frequency_drift

    fs = 4096.0
    bb = np.asarray(ft8_baseband(PAYLOAD, fs, 500.0)).astype(np.complex128)
    pad = int(1.0 * fs)
    n = 2 * pad + len(bb)
    t = np.arange(n) / fs
    es = np.mean(np.abs(bb) ** 2)
    rng = np.random.default_rng(5)
    corrected = []
    for drift in (80.0, 120.0, 160.0):
        sig = np.concatenate([np.zeros(pad, np.complex128), bb,
                              np.zeros(pad, np.complex128)])
        sig = sig * np.exp(2j * np.pi * drift * t * t / 2.0)
        n0 = es / 10 ** (30.0 / 10)         # Es/N0 30 dB per repeat
        sig += (rng.standard_normal(n)
                + 1j * rng.standard_normal(n)) * np.sqrt(n0 / 2)
        corrected.append(correct_frequency_drift(sig, fs)[0])
    res = decode_ft8_stacked(np.stack(corrected), fs, min_score=4.0,
                             use_osd=True)
    assert any(r.message.payload == _expected(PAYLOAD) for r in res)


def test_sync_z_clean_peak_and_noise_calibration():
    """sync_scores_z: the z grid peaks at the truth cell for a clean
    stacked signal, and under noise-only input it is calibrated to
    ~N(0, 1) (that calibration is what makes min_z a portable threshold)."""
    import jax.numpy as jnp

    from ft8_demodulator_tpu.demod.stack import _stacked_power_and_spec
    from ft8_demodulator_tpu.ops.sync import search_grid, sync_scores_z
    from ft8_demodulator_tpu.ops.waterfall import waterfall_params

    p = waterfall_params(FS, 2, 2)
    n = int(FS * 15)
    num_frames = p.num_frames(n)
    g = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)

    sig = _repeats(7, 10.0, 2)          # essentially clean
    power, _, _ = _stacked_power_and_spec(jnp.asarray(sig), p,
                                          num_frames, False)
    z = np.asarray(sync_scores_z(power, g))
    fi, ti = np.unravel_index(np.argmax(z), z.shape)
    # truth: start sample 500 -> hop 500/160; f0 400 Hz -> 128 sub-bins
    assert abs((g.t_start + ti) - round(500 / p.hop)) <= 1
    assert abs(fi - 128) <= 1
    assert z[fi, ti] > 20.0

    rng = np.random.default_rng(11)
    noise = rng.standard_normal((4, n)).astype(np.float32)
    power_n, _, _ = _stacked_power_and_spec(jnp.asarray(noise), p,
                                            num_frames, False)
    zn = np.asarray(sync_scores_z(power_n, g))
    zn = zn[np.isfinite(zn)]
    assert abs(np.mean(zn)) < 0.3
    assert 0.6 < np.std(zn) < 1.4
    assert np.max(zn) < 7.0


def test_stack_z_search_outlives_the_db_stencil():
    """At the stacked coherent cliff the linear z search keeps the truth
    cell in the top-K after the dB stencil has lost it (the measured ~2x
    presence gain behind switching R > 1 search to sync_scores_z), and
    the stacked decode built on it cracks the trial."""
    import jax.numpy as jnp

    from ft8_demodulator_tpu.demod.stack import _stacked_power_and_spec
    from ft8_demodulator_tpu.ops.sync import (find_candidates, search_grid,
                                              sync_scores, sync_scores_z)
    from ft8_demodulator_tpu.ops.waterfall import _DB_FLOOR, waterfall_params

    p = waterfall_params(FS, 2, 2)
    n = int(FS * 15)
    num_frames = p.num_frames(n)
    g = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)
    truth_t, truth_f = round(500 / p.hop), 128

    def presence(scores, thresh):
        at, af, _, cv = find_candidates(scores, g, 20, thresh)
        at, af, cv = np.asarray(at), np.asarray(af), np.asarray(cv)
        return bool(np.any(cv & (np.abs(at - truth_t) <= 0)
                           & (np.abs(af - truth_f) <= 0)))

    z_hits = stencil_hits = 0
    decided = None
    for seed in range(6):
        sig = _repeats(20 + seed, -22.0, 4)
        power, _, _ = _stacked_power_and_spec(jnp.asarray(sig), p,
                                              num_frames, False)
        mag = 10.0 * np.log10(_DB_FLOOR + np.asarray(power))
        z_hit = presence(sync_scores_z(power, g), 2.0)
        s_hit = presence(sync_scores(jnp.asarray(mag), g), 1.0)
        z_hits += z_hit
        stencil_hits += s_hit
        if decided is None and z_hit and not s_hit:
            decided = sig
    assert z_hits > stencil_hits
    assert decided is not None
    res = decode_ft8_stacked(decided, FS, use_osd=True, coherent=True)
    assert any(r.message.payload == _expected(PAYLOAD) for r in res)


def test_stack_equalizes_per_repeat_gain():
    """Receiver gain is not constant across 15-s cycles (AGC steps): a raw
    power mean weights repeat r by gain(r)^2 and one hot cycle collapses
    the stack toward single-slot sensitivity.  Noise-floor equalisation
    (median of each repeat's linear grid) must make the decode
    gain-invariant: same trials, gains [1, 2, 0.5, 4] applied to whole
    repeats (signal AND noise — per-repeat SNR unchanged), decode must
    still succeed at a comfortably-stacked SNR."""
    gains = np.array([1.0, 2.0, 0.5, 4.0], np.float32)
    ok = 0
    for seed in range(3):
        sig = _repeats(100 + seed, -20.0, 4) * gains[:, None]
        res = decode_ft8_stacked(sig, FS, use_osd=True, coherent=True)
        ok += any(r.message.payload == _expected(PAYLOAD) for r in res)
    assert ok == 3      # pre-equalisation this measured 1/3 (and 0/6 at -21)


def test_stack_tolerates_a_dead_repeat():
    """A repeat recorded as silence (receiver dropout, gap-filled zeros)
    has noise ~0; a naive 1/noise weight would hand it essentially ALL
    the combining weight and crush the live repeats (measured 0/3 before
    the dead-repeat guard).  Dead repeats are excluded instead: the
    stack must decode as if the dropout never happened."""
    ok = 0
    for seed in range(3):
        sig = _repeats(200 + seed, -19.0, 4)
        sig[2] = 0.0                        # one dead cycle
        res = decode_ft8_stacked(sig, FS, use_osd=True, coherent=True)
        ok += any(r.message.payload == _expected(PAYLOAD) for r in res)
    assert ok == 3


def test_stack_snr_estimate_per_repeat():
    """Stacked decodes report the PER-REPEAT SNR: linear averaging leaves
    cell means unchanged, and the Wilson-Hilferty median correction keeps
    the noise floor calibrated for the Gamma(R)/R cell distribution."""
    sig = _repeats(6, -17.0, 4)
    rows = [r for r in decode_ft8_stacked(sig, FS, min_score=1.0,
                                          use_osd=True)
            if r.message.payload == _expected(PAYLOAD)]
    assert rows and rows[0].snr_db is not None
    expect = -17.0 + 10.0 * np.log10((FS / 2) / 2500.0)   # 2500-Hz conv.
    assert abs(rows[0].snr_db - expect) < 2.0


def test_stack_deep_geometry():
    """The z-statistic search and equalised combining are geometry-
    generic: a 4-repeat stack at the DEEP preset (osr 4x4) decodes below
    its single-slot cliff."""
    fs = 4000.0
    w = np.asarray(ft8_passband(PAYLOAD, fs, 800.0, 0.0))
    sig = np.zeros((4, int(fs * 15)), np.float32)
    sig[:, 700: 700 + len(w)] = w
    sp = float(np.mean(w ** 2))
    rng = np.random.default_rng(14)
    sig += rng.standard_normal(sig.shape).astype(np.float32) \
        * np.sqrt(sp / 10 ** (-21.0 / 10))
    res = decode_ft8_stacked(sig, fs, bins_per_tone=4, steps_per_symbol=4,
                             max_candidates=40, use_osd=True,
                             coherent=True)
    assert any(r.message.payload == _expected(PAYLOAD) for r in res)
