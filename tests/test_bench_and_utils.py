"""Tests for the benchmark harness, metrics, and graft entry points."""

import json
import subprocess
import sys

import numpy as np

from ft8_demodulator_tpu.utils import SlotMetrics, summarize_slot


def test_snr_curve_tiny():
    sys.path.insert(0, "benchmarks")
    from snr_curve import run_curve

    snrs, rates, wall = run_curve(2000.0, [10.0, -35.0], trials=4, seed=1)
    assert rates[0] == 1.0, f"clean SNR should always decode, got {rates}"
    assert rates[1] == 0.0, f"-35 dB should never decode, got {rates}"


def test_summarize_slot(rng):
    import jax.numpy as jnp

    from ft8_demodulator_tpu.demod import decode_ft8_message
    from ft8_demodulator_tpu.demod.decode import decode_slot
    from ft8_demodulator_tpu.ops.gfsk import ft8_passband
    from ft8_demodulator_tpu.ops.waterfall import waterfall_params

    fs = 2000.0
    wave = ft8_passband(
        np.array([0x1C, 0x3F, 0x8A, 0x6A, 0xE2, 0x07, 0xA1, 0xE3, 0x94, 0x50],
                 dtype=np.uint8), fs, 300.0, 0.0)
    pad = np.zeros(int(fs), np.float32)
    wave = np.concatenate([pad, wave, pad])
    wave += rng.standard_normal(len(wave)).astype(np.float32) * 0.05

    p = waterfall_params(fs, 2, 2)
    res = decode_slot(jnp.asarray(wave), p, p.num_frames(len(wave)),
                      max_candidates=8, min_score=4.0)
    m = summarize_slot(res)
    assert isinstance(m, SlotMetrics)
    assert m.decodes >= 1
    assert m.unique_messages == 1
    assert m.candidates_found >= m.decodes
    assert np.isfinite(m.best_score)
    assert set(m.asdict()) == {
        "candidates_found", "decodes", "unique_messages", "best_score",
        "mean_score", "mean_ldpc_errors"}


def test_nan_debugging_toggles_and_raises():
    import jax
    import jax.numpy as jnp

    from ft8_demodulator_tpu.utils import nan_debugging

    assert not jax.config.jax_debug_nans
    with nan_debugging():
        assert jax.config.jax_debug_nans
        with np.testing.assert_raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)).block_until_ready()
    assert not jax.config.jax_debug_nans


def test_nan_debugging_env_init(monkeypatch):
    import jax

    from ft8_demodulator_tpu.utils.debug import (disable_nan_debugging,
                                                 init_from_env)

    monkeypatch.delenv("FT8_DEBUG_NANS", raising=False)
    assert not init_from_env()
    monkeypatch.setenv("FT8_DEBUG_NANS", "1")
    try:
        assert init_from_env()
        assert jax.config.jax_debug_nans
    finally:
        disable_nan_debugging()
