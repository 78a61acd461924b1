"""Pipelined (2-stage) decode tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from ft8_demodulator_tpu.demod.decode import decode_slot
from ft8_demodulator_tpu.ops.gfsk import ft8_passband
from ft8_demodulator_tpu.ops.waterfall import waterfall_params
from ft8_demodulator_tpu.parallel import (decode_slots_pipelined,
                                          make_stage_mesh)

PAYLOAD_A = np.array([0x1C, 0x3F, 0x8A, 0x6A, 0xE2, 0x07, 0xA1, 0xE3, 0x94, 0x50],
                     dtype=np.uint8)
PAYLOAD_B = np.array([0xAA, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08, 0x09, 0xF8],
                     dtype=np.uint8)
FS = 2000.0


def test_pipelined_decode_matches_per_slot(rng):
    n = int(FS * 15)
    waves = (rng.standard_normal((4, n)) * 0.02).astype(np.float32)
    for m, (payload, t, f0) in enumerate([(PAYLOAD_A, 1.0, 400.0),
                                          (PAYLOAD_B, 0.5, 700.0),
                                          (PAYLOAD_A, 2.0, 550.0),
                                          (PAYLOAD_B, 1.5, 900.0)]):
        w = np.asarray(ft8_passband(payload, FS, f0, 0.0))
        i = int(t * FS)
        waves[m, i: i + len(w)] += w

    p = waterfall_params(FS, 2, 2)
    nf = p.num_frames(n)
    mesh = make_stage_mesh(2)
    piped = decode_slots_pipelined(jnp.asarray(waves), p, nf, mesh,
                                   max_candidates=8, min_score=4.0)
    ref = jax.vmap(lambda w: decode_slot(w, p, nf, max_candidates=8,
                                         min_score=4.0))(jnp.asarray(waves))

    piped = jax.tree_util.tree_map(np.asarray, piped)
    ref = jax.tree_util.tree_map(np.asarray, ref)
    np.testing.assert_array_equal(piped.success, ref.success)
    np.testing.assert_array_equal(piped.payload, ref.payload)
    np.testing.assert_array_equal(piped.abs_time, ref.abs_time)
    np.testing.assert_array_equal(piped.abs_freq, ref.abs_freq)
    np.testing.assert_allclose(piped.score[piped.candidate_valid],
                               ref.score[ref.candidate_valid],
                               rtol=0, atol=1e-4)
    assert piped.success.any()
    got = {bytes(row) for m in range(4)
           for row, ok in zip(piped.payload[m], piped.success[m]) if ok}
    assert {bytes(PAYLOAD_A.tolist()), bytes(PAYLOAD_B.tolist())} <= got


def test_pipelined_decode_with_osd(rng):
    """OSD composes with the 2-stage pipeline (runs in the back stage)."""
    n = int(FS * 15)
    waves = (rng.standard_normal((2, n)) * 0.02).astype(np.float32)
    w = np.asarray(ft8_passband(PAYLOAD_A, FS, 500.0, 0.0))
    waves[0, 2000: 2000 + len(w)] += w
    waves[1, 1000: 1000 + len(w)] += w

    p = waterfall_params(FS, 2, 2)
    nf = p.num_frames(n)
    piped = decode_slots_pipelined(jnp.asarray(waves), p, nf,
                                   make_stage_mesh(2), max_candidates=8,
                                   min_score=4.0, use_osd=True)
    ref = jax.vmap(lambda w_: decode_slot(w_, p, nf, max_candidates=8,
                                          min_score=4.0, use_osd=True)
                   )(jnp.asarray(waves))
    piped = jax.tree_util.tree_map(np.asarray, piped)
    ref = jax.tree_util.tree_map(np.asarray, ref)
    np.testing.assert_array_equal(piped.success, ref.success)
    np.testing.assert_array_equal(piped.payload, ref.payload)
    assert piped.success.any()
