"""Subtraction (multi-pass) decoding: recover signals hidden under strong ones.

Beyond the reference (which is single-pass): a transmission 25 dB below a
co-channel neighbour is invisible to one decode pass but appears after the
strong signal is re-synthesised, fitted, and subtracted.
"""

import numpy as np

from ft8_demodulator_tpu.demod.decode import decode_ft8_message
from ft8_demodulator_tpu.ops.gfsk import ft8_passband
from ft8_demodulator_tpu.protocol import constants as C

FS = 2000.0


def _two_signal_slot(rng):
    payload_strong = rng.integers(0, 256, 10).astype(np.uint8)
    payload_strong[9] &= 0xF8
    payload_weak = rng.integers(0, 256, 10).astype(np.uint8)
    payload_weak[9] &= 0xF8

    sps = int(C.SYMBOL_PERIOD_S * FS)
    n = int(FS * 15)
    strong = np.asarray(ft8_passband(payload_strong, FS, 400.0, 0.0))
    weak = np.asarray(ft8_passband(payload_weak, FS, 430.0, 0.0))
    sig = np.zeros(n, np.float64)
    sig[sps: sps + len(strong)] += strong
    sig[2 * sps: 2 * sps + len(weak)] += 0.055 * weak   # ~25 dB down
    sig += 0.003 * rng.standard_normal(n)
    return sig.astype(np.float32), payload_strong, payload_weak


def test_second_pass_recovers_buried_signal():
    rng = np.random.default_rng(21)
    wave, p_strong, p_weak = _two_signal_slot(rng)

    one = decode_ft8_message(wave, FS, max_candidates=20, min_score=5.0)
    got_one = {r.message.payload.hex() for r in one}
    assert p_strong.tobytes().hex() in got_one
    assert p_weak.tobytes().hex() not in got_one, \
        "weak signal should be masked in a single pass for this fixture"

    two = decode_ft8_message(wave, FS, max_candidates=20, min_score=5.0,
                             passes=2)
    got_two = {r.message.payload.hex() for r in two}
    assert p_strong.tobytes().hex() in got_two
    assert p_weak.tobytes().hex() in got_two

    # pass-2 duplicates of pass-1 messages are merged
    assert len([r for r in two
                if r.message.payload.hex() == p_strong.tobytes().hex()]) == 1


def test_multipass_is_noop_without_decodes(rng):
    noise = rng.standard_normal(int(FS * 15)).astype(np.float32)
    assert decode_ft8_message(noise, FS, passes=3) == []


def test_subtraction_handles_off_grid_carrier():
    """The frequency refinement must work when the transmitter is between
    waterfall bins (grid resolution is tone_spacing/freq_osr = 3.125 Hz)."""
    import jax.numpy as jnp

    from ft8_demodulator_tpu.ops.gfsk import ft8_passband
    from ft8_demodulator_tpu.ops.subtract import subtract_decoded
    from ft8_demodulator_tpu.ops.waterfall import waterfall_params
    from ft8_demodulator_tpu.demod.decode import decode_slot

    rng = np.random.default_rng(31)
    payload = rng.integers(0, 256, 10).astype(np.uint8)
    payload[9] &= 0xF8
    sps = int(C.SYMBOL_PERIOD_S * FS)
    n = int(FS * 15)
    wave = np.asarray(ft8_passband(payload, FS, 401.3, 0.0))  # off-grid
    sig = np.zeros(n, np.float64)
    sig[sps: sps + len(wave)] += wave
    sig += 0.002 * rng.standard_normal(n)
    sig32 = sig.astype(np.float32)

    p = waterfall_params(FS, 2, 2)
    T = p.num_frames(n)
    res = decode_slot(jnp.asarray(sig32), p, T, max_candidates=10,
                      min_score=5.0)
    assert bool(np.asarray(res.success).any())
    resid = np.asarray(subtract_decoded(
        jnp.asarray(sig32), p, res.payload, res.abs_time, res.abs_freq,
        res.success))
    win = slice(sps, sps + len(wave))
    removal = np.mean(resid[win] ** 2) / np.mean(sig32[win] ** 2)
    assert removal < 0.05, f"subtraction removed only {1-removal:.1%}"
