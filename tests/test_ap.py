"""A-priori (AP) decoding tests (beyond-reference, WSJT-X-style).

Clamping a hypothesis's known payload bits in the LDPC decoder
(demod.decode.ap_retry + protocol.message.ap_hypotheses) buys ~1-2 dB
past the plain cliff.  The CRC covers all 77 bits, so a wrong hypothesis
cannot validate — the controls below pin that.
"""

import numpy as np
import pytest

from ft8_demodulator_tpu.demod import decode_ft8_message
from ft8_demodulator_tpu.ops.gfsk import ft8_passband
from ft8_demodulator_tpu.protocol import ap_hypotheses, pack_message

FS = 2000.0
KW = dict(min_score=1.0, use_osd=True, mf_first=True)


def _signal(text, snr_db, seed, f0=400.0):
    payload = pack_message(text)
    w = np.asarray(ft8_passband(payload, FS, f0, 0.0))
    sig = np.zeros(int(FS * 15), np.float32)
    sig[500: 500 + len(w)] = w
    sp = float(np.mean(w ** 2))
    rng = np.random.default_rng(seed)
    sig += rng.standard_normal(len(sig)).astype(np.float32) \
        * np.sqrt(sp / 10 ** (snr_db / 10))
    return sig, bytes(payload.tolist())


def test_hypothesis_layout():
    """Field positions in the (values, mask) arrays match the type-1
    payload layout the codec packs."""
    vals, mask = ap_hypotheses("K1ABC", "W9XYZ")
    assert vals.shape == (6, 77) and mask.shape == (6, 77)
    # variant 0 = CQ: c28a bits 0..27 == 2, i3 bits 74..76 == 001
    assert list(vals[0, :28]) == [0] * 26 + [1, 0]
    assert mask[0, :28].all() and mask[0, 28] and not mask[0, 29:57].any()
    assert list(vals[0, 74:77]) == [0, 0, 1] and mask[0, 74:77].all()
    # variant 2 fixes both calls; variants 3..5 fix the exchange too
    assert mask[2, :58].sum() == 58
    assert mask[3, 58:74].all() and not mask[2, 58:74].any()
    # a clamped CQ hypothesis equals the bits pack_message produces
    p = pack_message("CQ K1ABC FN42")
    bits = np.unpackbits(p)[:77]
    assert (bits[mask[0]] == vals[0, mask[0]]).all()


def test_ap_cq_decodes_below_the_plain_cliff():
    """-16.5 dB @ fs 2 kHz: plain OSD+MF yields 0/20 (measured); the CQ
    hypothesis decodes (measured 7/20; committed seeds decode)."""
    hits = 0
    for seed in (2, 8, 11):
        sig, want = _signal("CQ K1ABC FN42", -16.5, seed)
        plain = decode_ft8_message(sig, FS, **KW)
        assert not any(r.message.payload == want for r in plain)
        rs = decode_ft8_message(sig, FS, ap=True, **KW)
        hits += any(r.message.payload == want for r in rs)
    assert hits >= 1


def test_ap_full_qso_hypothesis():
    """Both calls known: only R+g15 float (16 free payload bits) — the
    deepest hypothesis (measured 15/20 at -16.5 vs 2/20 plain)."""
    sig, want = _signal("K9XYZ K1ABC R-08", -16.5, 3)
    plain = decode_ft8_message(sig, FS, **KW)
    assert not any(r.message.payload == want for r in plain)
    rs = decode_ft8_message(sig, FS, ap="K9XYZ K1ABC", **KW)
    assert any(r.message.payload == want for r in rs)


def test_ap_never_corrupts_a_mismatched_signal():
    """A non-CQ transmission with the CQ hypothesis active must decode
    correctly or not at all — never as a wrong accepted payload."""
    for seed in range(6):
        sig, want = _signal("K9XYZ K1ABC R-08", -15.0, seed)
        for r in decode_ft8_message(sig, FS, ap=True, **KW):
            assert r.message.payload == want


def test_ap_rejects_pure_noise():
    """All six hypotheses over noise-only slots accept nothing (the CRC
    still covers every payload bit)."""
    for seed in range(5):
        rng = np.random.default_rng(500 + seed)
        noise = rng.standard_normal(int(FS * 15)).astype(np.float32)
        assert decode_ft8_message(noise, FS, ap="K1ABC W9XYZ", **KW) == []


def test_ap_rejects_bad_input():
    with pytest.raises(ValueError):
        decode_ft8_message(np.zeros(int(FS * 15), np.float32), FS,
                           ap="A B C", **KW)
    with pytest.raises(ValueError):
        ap_hypotheses("PJ4/K1ABC")      # not expressible in 28 bits


def test_ap_composes_with_stacking():
    """A beacon's call is known a priori: ap layers on the stacked
    combiner (R=4 at -20.5 dB, post-TX-alignment-fix: plain 1/10, ap
    5/10 measured; committed seed decodes with ap and not without)."""
    from ft8_demodulator_tpu.demod import decode_ft8_stacked

    payload = pack_message("CQ K1ABC FN42")
    want = bytes(payload.tolist())
    w = np.asarray(ft8_passband(payload, FS, 400.0, 0.0))
    sp = float(np.mean(w ** 2))
    rng = np.random.default_rng(0)
    sig = np.zeros((4, int(FS * 15)), np.float32)
    sig[:, 500: 500 + len(w)] = w
    sig += rng.standard_normal(sig.shape).astype(np.float32) \
        * np.sqrt(sp / 10 ** (-20.5 / 10))
    plain = decode_ft8_stacked(sig, FS, min_score=1.0, use_osd=True)
    assert not any(r.message.payload == want for r in plain)
    rs = decode_ft8_stacked(sig, FS, min_score=1.0, use_osd=True,
                            ap="K1ABC")
    assert any(r.message.payload == want for r in rs)


def test_ap_hypotheses_dx_requires_my():
    with pytest.raises(ValueError, match="my_call"):
        ap_hypotheses(None, "W9XYZ")
