"""TX modulator parity tests against reference-generated waveforms."""

import jax
import jax.numpy as jnp
import numpy as np

from ft8_demodulator_tpu.ops.gfsk import (
    ft8_baseband,
    ft8_passband,
    gfsk_frequency_track,
    tones_to_baseband,
)
from ft8_demodulator_tpu.protocol import encode_tones
from ft8_demodulator_tpu.protocol import constants as C


def test_frequency_track_matches_reference(goldens):
    for fs in (2000.0, 4000.0):
        sps = int(C.SYMBOL_PERIOD_S * fs)
        tones = jax.jit(encode_tones)(jnp.asarray(goldens["p1_payload"]))
        track = np.asarray(
            jax.jit(gfsk_frequency_track, static_argnums=1)(tones, sps)
        ).reshape(-1) * C.TONE_SPACING_HZ
        golden = goldens[f"gfsk_fs{int(fs)}"]
        # reference track is (79+2)*sps long; only the first 79*sps samples
        # feed the modulator
        np.testing.assert_allclose(
            track, golden[: C.NUM_SYMBOLS * sps], atol=2e-4
        )


def test_baseband_matches_reference(goldens):
    for fs, f0 in [(2000.0, 300.0), (4000.0, 550.0)]:
        golden = goldens[f"bb_fs{int(fs)}_f0{int(f0)}"]
        bb = np.asarray(ft8_baseband(jnp.asarray(goldens["p1_payload"]), fs, f0))
        assert bb.shape == golden.shape
        err = np.abs(bb - golden)
        assert err.max() < 2e-3, f"max wave err {err.max()} at fs={fs}"
        # unit magnitude away from the edge ramps
        sps = int(C.SYMBOL_PERIOD_S * fs)
        core = np.abs(bb[sps // 8: -sps // 8])
        np.testing.assert_allclose(core, 1.0, atol=1e-4)


def test_passband_matches_reference(goldens):
    golden = goldens["pb_fs4000_f0550_fc600"]
    pb = np.asarray(
        ft8_passband(jnp.asarray(goldens["p1_payload"]), 4000.0, 550.0, 600.0)
    )
    assert np.abs(pb - golden).max() < 2e-3


def test_baseband_batched():
    payloads = np.zeros((3, 10), dtype=np.uint8)
    payloads[1, 0] = 0xAA
    payloads[2, 5] = 0x55
    fs, f0 = 2000.0, 300.0
    batched = np.asarray(ft8_baseband(jnp.asarray(payloads), fs, f0))
    single = np.asarray(ft8_baseband(jnp.asarray(payloads[1]), fs, f0))
    np.testing.assert_allclose(batched[1], single, atol=1e-6)


def test_edge_ramps():
    fs = 2000.0
    sps = int(C.SYMBOL_PERIOD_S * fs)
    bb = np.asarray(ft8_baseband(jnp.asarray(np.zeros(10, np.uint8)), fs, 300.0))
    assert abs(bb[0]) < 1e-6  # up-ramp starts at zero
    # the reference's down-ramp runs 0 -> 1 over the last sps/8 samples
    # (modulator.py:73: factor 0.5*(1+cos(8*pi*i/sps)) applied to sample
    # N-1-i is 1.0 at i=0), so the final sample is at full amplitude and the
    # dip sits nramp samples before the end; we reproduce that exactly.
    nramp = sps // 8
    assert abs(bb[-nramp]) < 0.01
    assert abs(abs(bb[-1]) - 1.0) < 1e-4
