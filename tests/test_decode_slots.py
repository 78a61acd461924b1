"""decode_slots (batched split-BP pipeline) must match vmap(decode_slot).

The batched entry point restructures execution (chunked front half, one
flat BP tail over all B*K rows) without changing any per-slot value:
LLRs are bit-identical (tests/test_tf_layout.py pins the front half) and
BP is row-independent, so every result field must agree exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ft8_demodulator_tpu.demod.decode import decode_slot, decode_slots
from ft8_demodulator_tpu.ops.gfsk import ft8_passband
from ft8_demodulator_tpu.ops.waterfall import waterfall_params

FS = 2000.0


def _batch(rng, b=4):
    p = waterfall_params(FS, 2, 2)
    n = int(FS * 15)
    waves = 0.2 * rng.standard_normal((b, n)).astype(np.float32)
    payloads = rng.integers(0, 256, size=(b, 10), dtype=np.uint8)
    payloads[:, 9] &= 0xF8
    for i in range(b - 1):          # leave the last slot noise-only
        sig = np.asarray(ft8_passband(payloads[i], FS,
                                      400.0 + 90.0 * i, 0.0))
        waves[i, 500: 500 + len(sig)] += sig
    return jnp.asarray(waves), payloads, p, p.num_frames(n)


@pytest.mark.parametrize("chunk", [1, 2, 4])
def test_decode_slots_matches_vmap_decode_slot(rng, chunk):
    waves, payloads, p, num_frames = _batch(rng)
    ref = jax.vmap(lambda w: decode_slot(w, p, num_frames,
                                         max_candidates=8,
                                         min_score=1.0))(waves)
    got = decode_slots(waves, p, num_frames, max_candidates=8,
                       min_score=1.0, chunk=chunk)
    for name in ref._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            err_msg=name)
    # and the planted payloads actually decode
    ok = np.asarray(got.success)
    dec = np.asarray(got.payload)
    for i in range(3):
        rows = dec[i][ok[i]]
        assert any((row == payloads[i]).all() for row in rows)


def test_decode_slots_osd_path(rng):
    waves, _, p, num_frames = _batch(rng, b=2)
    ref = jax.vmap(lambda w: decode_slot(w, p, num_frames, max_candidates=6,
                                         min_score=1.0, use_osd=True))(waves)
    got = decode_slots(waves, p, num_frames, max_candidates=6,
                       min_score=1.0, use_osd=True, chunk=2)
    for name in ref._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            err_msg=name)


def test_decode_slots_rejects_ragged_chunk(rng):
    waves, _, p, num_frames = _batch(rng, b=3)
    with pytest.raises(ValueError):
        decode_slots(waves, p, num_frames, chunk=2)


def test_decode_slots_mf_first_osd_matches_vmap(rng):
    """The DEEP production form (mf_first + OSD) through the batched
    split-BP tail must equal per-slot decode_slot exactly."""
    waves, payloads, p, num_frames = _batch(rng)
    ref = jax.vmap(lambda w: decode_slot(
        w, p, num_frames, max_candidates=6, min_score=1.0,
        use_osd=True, mf_first=True))(waves)
    got = decode_slots(waves, p, num_frames, max_candidates=6,
                       min_score=1.0, use_osd=True, mf_first=True,
                       chunk=2)
    for name in ref._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            err_msg=name)
    ok = np.asarray(got.success)
    dec = np.asarray(got.payload)
    for i in range(3):
        rows = dec[i][ok[i]]
        assert any((row == payloads[i]).all() for row in rows)


def test_decode_slots_mf_first_deep_geometry(rng):
    """osr 4x4 (the DEEP preset geometry) through the batched mf_first
    path."""
    p = waterfall_params(FS, 4, 4)
    n = int(FS * 15)
    num_frames = p.num_frames(n)
    waves = 0.2 * np.random.default_rng(5).standard_normal(
        (2, n)).astype(np.float32)
    payload = np.array([0x1C, 0x3F, 0x8A, 0x6A, 0xE2, 0x07, 0xA1, 0xE3,
                        0x94, 0x50], np.uint8)
    sig = np.asarray(ft8_passband(payload, FS, 420.0, 0.0))
    waves[0, 300: 300 + len(sig)] += sig
    waves = jnp.asarray(waves)
    ref = jax.vmap(lambda w: decode_slot(
        w, p, num_frames, max_candidates=6, min_score=1.0,
        use_osd=True, mf_first=True))(waves)
    got = decode_slots(waves, p, num_frames, max_candidates=6,
                       min_score=1.0, use_osd=True, mf_first=True,
                       chunk=2)
    for name in ref._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            err_msg=name)
    ok = np.asarray(got.success[0])
    rows = np.asarray(got.payload[0])[ok]
    assert any((row == payload).all() for row in rows)
