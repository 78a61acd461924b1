"""BeaconSession: live stacked decoding over a continuous stream.

The streaming counterpart of decode_ft8_stacked (demod/beacon_session.py):
15-s cycles accumulate in a ring and each completed cycle decodes the
progressively deeper stack.
"""

import numpy as np

from ft8_demodulator_tpu.demod import BeaconSession
from ft8_demodulator_tpu.ops.gfsk import ft8_passband

PAYLOAD = np.array([0x1C, 0x3F, 0x8A, 0x6A, 0xE2, 0x07, 0xA1, 0xE3, 0x94,
                    0x51], dtype=np.uint8)
FS = 2000.0
CYCLE = int(FS * 15)


def _expected():
    out = PAYLOAD.copy()
    out[9] &= 0xF8
    return bytes(out.tolist())


def _stream(seed, snr_db, cycles, start=500):
    """cycles consecutive 15-s cycles, the beacon repeating in each."""
    w = np.asarray(ft8_passband(PAYLOAD, FS, 400.0, 0.0))
    sig = np.zeros(cycles * CYCLE, np.float32)
    for c in range(cycles):
        sig[c * CYCLE + start: c * CYCLE + start + len(w)] += w
    sp = float(np.mean(w ** 2))
    rng = np.random.default_rng(seed)
    sig += rng.standard_normal(len(sig)).astype(np.float32) \
        * np.sqrt(sp / 10 ** (snr_db / 10))
    return sig


def test_beacon_session_decodes_once_stack_is_deep_enough():
    """-19 dB: a single cycle fails (coherent single-slot cliff ~-17),
    the session surfaces the beacon once enough cycles accumulate, and
    the decode is reported exactly ONCE with ABSOLUTE time."""
    sig = _stream(0, -19.0, 3)
    s = BeaconSession(FS, max_repeats=3)
    rows, first_at = [], None
    # odd-sized feeds exercise the buffering
    for i in range(0, len(sig), 7001):
        got = s.feed(sig[i: i + 7001])
        if got and first_at is None:
            first_at = s.repeats_buffered
        rows.extend(got)
    hits = [r for r in rows if r.message.payload == _expected()]
    assert len(hits) == 1                     # session-level dedup
    assert first_at >= 2                      # single cycle could not
    # absolute time: the decode's cycle starts at (cycles_done-1)*15 s
    assert hits[0].time_sec >= 15.0
    assert abs((hits[0].time_sec % 15.0) - 500 / FS) < 0.3


def test_beacon_session_flush_decodes_the_partial_tail():
    """A strong transmission in a final PARTIAL cycle (stream ends before
    the cycle completes) is found by flush() as a single-slot decode."""
    w = np.asarray(ft8_passband(PAYLOAD, FS, 400.0, 0.0))
    tail = np.zeros(CYCLE - int(FS), np.float32)   # 14 s of a 15-s cycle
    tail[200: 200 + len(w)] = w
    rng = np.random.default_rng(3)
    noise = rng.standard_normal(CYCLE + len(tail)).astype(np.float32) * 0.05
    s = BeaconSession(FS, max_repeats=4)
    out = s.feed(noise[:CYCLE])                    # one noise-only cycle
    out += s.feed(tail + noise[CYCLE:])
    assert all(r.message.payload != _expected() for r in out)
    flushed = s.flush()
    assert any(r.message.payload == _expected() for r in flushed)
    # tail times are absolute too (the tail starts at 15 s)
    hit = [r for r in flushed if r.message.payload == _expected()][0]
    assert 15.0 <= hit.time_sec < 30.0
    assert s.flush() == []                         # buffer consumed


def test_beacon_session_t0_aligns_mid_cycle_start():
    """A stream that starts mid-cycle (t0_seconds) must still slice on
    TRUE cycle boundaries: the leading partial cycle is zero-padded, the
    repeats stay slot-aligned, and the decode reports boundary-relative
    time.  (Pre-fix, t0_seconds only relabeled times and every repeat
    straddled a slice boundary — nothing decoded.)"""
    t0 = 5.0                                     # start 5 s into a cycle
    sig = _stream(2, -19.0, 4)
    s = BeaconSession(FS, max_repeats=3, t0_seconds=t0)
    rows = s.feed(sig[int(t0 * FS):])            # receiver missed 0..5 s
    hits = [r for r in rows if r.message.payload == _expected()]
    assert hits
    assert abs((hits[0].time_sec % 15.0) - 500 / FS) < 0.3


def test_beacon_session_feed_after_flush_raises():
    """flush() consumes a partial cycle; feeding afterwards would
    silently misalign every later slice — it must raise."""
    import pytest

    s = BeaconSession(FS, max_repeats=2)
    s.feed(np.zeros(CYCLE + 100, np.float32))
    s.flush()
    with pytest.raises(RuntimeError, match="flush"):
        s.feed(np.zeros(10, np.float32))


def test_beacon_session_save_load_resumes_identically():
    """Snapshot mid-stream, resume, and get the same decode as an
    uninterrupted session (checkpoint/resume parity, SURVEY §5)."""
    import os
    import tempfile

    sig = _stream(1, -19.0, 3)
    cut = CYCLE + CYCLE // 2                       # mid-cycle-2
    a = BeaconSession(FS, max_repeats=3)
    direct = a.feed(sig)

    b = BeaconSession(FS, max_repeats=3)
    early = b.feed(sig[:cut])
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "beacon.npz")
        b.save(path)
        c = BeaconSession.load(path)
    late = c.feed(sig[cut:])
    rows = lambda rs: sorted((r.message.payload, round(r.time_sec, 3),
                              round(r.freq_hz, 1)) for r in rs)
    assert rows(early + late) == rows(direct)
    assert any(p == _expected() for p, _, _ in rows(direct))
