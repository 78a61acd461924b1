"""Composed (channel x stream x freq) mesh decode tests — VERDICT r2
next #4 (one program over all three axes) and #6 (production geometry),
on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from ft8_demodulator_tpu.ops.gfsk import ft8_passband
from ft8_demodulator_tpu.parallel import (decode_stream,
                                          decode_stream_composed,
                                          make_composed_mesh, make_mesh)

PAYLOAD_A = np.array([0x1C, 0x3F, 0x8A, 0x6A, 0xE2, 0x07, 0xA1, 0xE3,
                      0x94, 0x50], dtype=np.uint8)
PAYLOAD_B = np.array([0xAA, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08,
                      0x09, 0xF8], dtype=np.uint8)


def _rows(results):
    return sorted((r.message.payload.hex(), round(r.time_sec, 2),
                   round(r.freq_hz, 1)) for r in results)


def _make_audio(rng, fs, channels, seconds, placements):
    n = int(fs * seconds)
    audio = (rng.standard_normal((channels, n)) * 0.02).astype(np.float32)
    for ch, payload, t, f0 in placements:
        w = np.asarray(ft8_passband(payload, fs, f0, 0.0))
        i = int(t * fs)
        audio[ch, i: i + len(w)] += w
    return audio


def test_composed_mesh_equals_stream_mesh(rng):
    """(2 channel x 2 stream x 2 freq) one-program decode returns the
    EXACT row set of the (channel x stream) sharded decoder — TP inside
    the sharded stream changes nothing observable."""
    fs = 2000.0
    placements = [
        (0, PAYLOAD_A, 2.0, 400.0),
        (1, PAYLOAD_B, 23.0, 700.0),     # straddles the 15 s block edge
        (1, PAYLOAD_A, 6.0, 900.0),
    ]
    audio = _make_audio(rng, fs, 2, 60.0, placements)

    mesh3 = make_composed_mesh(channel=2, stream=2, freq=2)
    got = decode_stream_composed(audio, fs, mesh3, min_score=4.0)

    mesh2 = make_mesh(stream=2, channel=2)
    want = decode_stream(audio, fs, mesh=mesh2, min_score=4.0)

    assert _rows(got) == _rows(want)
    assert len(got) == 3


def test_composed_mesh_full_freq_axis(rng):
    """All 8 devices on one (1 x 1 x 8) mesh: pure TP through the
    composed path still equals the unsharded stream decode."""
    fs = 2000.0
    audio = _make_audio(rng, fs, 1, 16.0, [(0, PAYLOAD_A, 1.0, 650.0)])
    mesh3 = make_composed_mesh(channel=1, stream=1, freq=8)
    got = decode_stream_composed(audio, fs, mesh3, min_score=4.0)
    want = decode_stream(audio, fs, mesh=make_mesh(stream=1, channel=1),
                         min_score=4.0)
    assert _rows(got) == _rows(want)
    assert len(got) == 1


@pytest.mark.slow
def test_composed_mesh_production_geometry(rng):
    """PRODUCTION shapes (VERDICT r2 weak #5/next #6): fs 12 kHz, 15 s
    blocks, osr 2x2 — the geometry bench.py runs on the chip — through
    the full (2 x 2 x 2) composed mesh, against the (2 x 2) stream mesh.

    Catches padding/layout bugs the fs-500 toys cannot (the 1920-row
    grid does not divide evenly by 2 after the 14-row scan crop, so the
    band slicing, halo rows and row masking are all exercised at their
    real sizes)."""
    fs = 12000.0
    placements = [
        (0, PAYLOAD_A, 2.0, 1500.0),
        (1, PAYLOAD_B, 16.0, 2600.0),    # second stream block
        (1, PAYLOAD_A, 14.0, 800.0),     # straddles the 15 s block edge
    ]
    audio = _make_audio(rng, fs, 2, 30.0, placements)

    mesh3 = make_composed_mesh(channel=2, stream=2, freq=2)
    got = decode_stream_composed(audio, fs, mesh3, min_score=4.0)
    want = decode_stream(audio, fs, mesh=make_mesh(stream=2, channel=2),
                         min_score=4.0)
    assert _rows(got) == _rows(want)
    payloads = {r.message.payload.hex() for r in got}
    assert PAYLOAD_A.tobytes().hex() in payloads
    assert PAYLOAD_B.tobytes().hex() in payloads
    assert len(got) == 3


@pytest.mark.slow
def test_stream_mesh_production_geometry(rng):
    """The plain (channel x stream) sharded decoder at the production
    12 kHz geometry equals the single-device slot decoder's messages."""
    from ft8_demodulator_tpu.demod import decode_ft8_message

    fs = 12000.0
    audio = _make_audio(rng, fs, 1, 15.0, [(0, PAYLOAD_A, 1.0, 1500.0)])
    got = decode_stream(audio, fs, mesh=make_mesh(stream=2, channel=1),
                        min_score=4.0)
    want = decode_ft8_message(audio[0], fs, min_score=4.0)
    assert {r.message.payload.hex() for r in got} \
        == {r.message.payload.hex() for r in want} \
        == {PAYLOAD_A.tobytes().hex()}
