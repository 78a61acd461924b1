"""Mesh-sharded streaming decode tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from ft8_demodulator_tpu.ops.gfsk import ft8_passband
from ft8_demodulator_tpu.parallel.mesh import make_mesh
from ft8_demodulator_tpu.parallel.streaming import decode_stream

PAYLOAD_A = np.array([0x1C, 0x3F, 0x8A, 0x6A, 0xE2, 0x07, 0xA1, 0xE3, 0x94, 0x50],
                     dtype=np.uint8)
PAYLOAD_B = np.array([0xAA, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08, 0x09, 0xF8],
                     dtype=np.uint8)

FS = 2000.0


def _place(stream, wave, t_sec):
    i = int(t_sec * FS)
    stream[i: i + len(wave)] += wave


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_stream_decode_finds_messages_across_boundaries(rng):
    # 8 stream shards x 15 s = 120 s of audio; block boundaries at 15 s
    # multiples.  The 23 s message straddles the 30 s boundary only if long;
    # 12.64 s frame from t=23 s crosses the 30 s boundary.
    n = int(FS * 120)
    stream = (rng.standard_normal(n) * 0.02).astype(np.float32)
    wa = ft8_passband(PAYLOAD_A, FS, 400.0, 0.0)
    wb = ft8_passband(PAYLOAD_B, FS, 700.0, 0.0)
    _place(stream, wa, 2.0)          # inside shard 0
    _place(stream, wb, 23.0)         # straddles the 30 s boundary
    _place(stream, wa, 61.0)         # shard 4, different time slot

    mesh = make_mesh(stream=8, channel=1)
    results = decode_stream(stream, FS, mesh=mesh, min_score=4.0)

    rows = [(r.message.payload.hex(), round(r.time_sec), round(r.freq_hz))
            for r in results]
    assert (PAYLOAD_A.tobytes().hex(), 2, 400) in rows
    assert (PAYLOAD_B.tobytes().hex(), 23, 700) in rows
    assert (PAYLOAD_A.tobytes().hex(), 61, 400) in rows
    # each transmission decodes exactly once (ownership + dedup)
    assert len(rows) == len(set(rows)) == 3


def test_stream_decode_multi_channel(rng):
    n = int(FS * 30)  # 2 stream shards x 15 s with channel axis 4
    audio = (rng.standard_normal((4, n)) * 0.02).astype(np.float32)
    wa = ft8_passband(PAYLOAD_A, FS, 500.0, 0.0)
    audio[1, int(1.0 * FS): int(1.0 * FS) + len(wa)] += wa
    audio[3, int(16.0 * FS): int(16.0 * FS) + len(wa)] += wa

    mesh = make_mesh(stream=2, channel=4)
    results = decode_stream(audio, FS, mesh=mesh, min_score=4.0)
    assert len(results) == 2
    payloads = {r.message.payload.hex() for r in results}
    assert payloads == {PAYLOAD_A.tobytes().hex()}


def test_stream_decode_chunked_channel_rows(rng):
    """16 channel rows on one shard triggers the narrow-chunk decode path
    (lax.map over vmap-8); results must match the plain-vmap semantics."""
    n = int(FS * 15)
    audio = (rng.standard_normal((16, n)) * 0.02).astype(np.float32)
    wa = ft8_passband(PAYLOAD_A, FS, 500.0, 0.0)
    wb = ft8_passband(PAYLOAD_B, FS, 800.0, 0.0)
    audio[3, int(1.0 * FS): int(1.0 * FS) + len(wa)] += wa
    audio[11, int(0.5 * FS): int(0.5 * FS) + len(wb)] += wb

    mesh = make_mesh(stream=1, channel=1)
    results = decode_stream(audio, FS, mesh=mesh, min_score=4.0)
    payloads = {r.message.payload.hex() for r in results}
    assert payloads == {PAYLOAD_A.tobytes().hex(), PAYLOAD_B.tobytes().hex()}


def test_stream_decodes_transmission_clipped_at_capture_start(rng):
    """A transmission whose first second happened before the capture began
    must decode via the sharded stream path exactly like the slot decoder
    (pre-roll search window, reference ft8_decode.py:108), exactly once."""
    from ft8_demodulator_tpu.demod import decode_ft8_message

    wa = np.asarray(ft8_passband(PAYLOAD_A, FS, 400.0, 0.0))
    clipped = wa[int(1.0 * FS):]               # first 1 s lost
    n = int(FS * 120)
    stream = (rng.standard_normal(n) * 0.02).astype(np.float32)
    stream[: len(clipped)] += clipped

    # the slot decoder finds it at t ~ -1 s
    direct = decode_ft8_message(stream[: int(15 * FS)], FS, min_score=4.0)
    d_rows = [(r.message.payload.hex(), round(r.time_sec)) for r in direct]
    assert (PAYLOAD_A.tobytes().hex(), -1) in d_rows

    mesh = make_mesh(stream=8, channel=1)
    results = decode_stream(stream, FS, mesh=mesh, min_score=4.0)
    rows = [(r.message.payload.hex(), round(r.time_sec)) for r in results]
    assert rows == [(PAYLOAD_A.tobytes().hex(), -1)]


def test_stream_decode_with_osd_and_mf_first(rng):
    """The sharded stream supports the beyond-reference decoders: a weak
    (-13 dB) transmission mid-stream decodes with use_osd + mf_first.
    (16.96 s is a whole hop: without mf_refine the plain MF path pays up
    to ~2.5 dB at the half-hop worst case, which -13 dB does not cover.)"""
    n = int(FS * 60)                       # 8 shards x 7.5 s
    stream = np.zeros(n, np.float32)
    wa = np.asarray(ft8_passband(PAYLOAD_A, FS, 400.0, 0.0))
    sp = float(np.mean(wa ** 2))
    _place(stream, wa, 16.96)
    stream += (rng.standard_normal(n).astype(np.float32)
               * np.sqrt(sp / 10 ** (-13.0 / 10)))

    mesh = make_mesh(stream=8, channel=1)
    deep = decode_stream(stream, FS, mesh=mesh, min_score=1.0,
                         use_osd=True, mf_first=True)
    rows = [(r.message.payload.hex(), round(r.time_sec)) for r in deep]
    assert (PAYLOAD_A.tobytes().hex(), 17) in rows
