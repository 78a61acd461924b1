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
    """The reference golden track is (79+2)*sps long; its first 79*sps
    samples are what the reference modulator integrates (the quirk path),
    and the SAME track read at offset sps is the WSJT-X alignment the
    native path emits — one golden validates both (ops/gfsk.py)."""
    for fs in (2000.0, 4000.0):
        sps = int(C.SYMBOL_PERIOD_S * fs)
        tones = jax.jit(encode_tones)(jnp.asarray(goldens["p1_payload"]))
        golden = goldens[f"gfsk_fs{int(fs)}"]
        fixed = np.asarray(
            gfsk_frequency_track(tones, sps)
        ).reshape(-1) * C.TONE_SPACING_HZ
        np.testing.assert_allclose(
            fixed, golden[sps: (C.NUM_SYMBOLS + 1) * sps], atol=2e-4
        )
        quirk = np.asarray(
            gfsk_frequency_track(tones, sps, reference_quirk=True)
        ).reshape(-1) * C.TONE_SPACING_HZ
        np.testing.assert_allclose(
            quirk, golden[: C.NUM_SYMBOLS * sps], atol=2e-4
        )


def test_baseband_matches_reference(goldens):
    """reference_quirk=True is bit-parity with the reference's waveform
    (compat.ft8_baseband_generator's contract)."""
    for fs, f0 in [(2000.0, 300.0), (4000.0, 550.0)]:
        golden = goldens[f"bb_fs{int(fs)}_f0{int(f0)}"]
        bb = np.asarray(ft8_baseband(jnp.asarray(goldens["p1_payload"]),
                                     fs, f0, reference_quirk=True))
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
        ft8_passband(jnp.asarray(goldens["p1_payload"]), 4000.0, 550.0,
                     600.0, reference_quirk=True)
    )
    assert np.abs(pb - golden).max() < 2e-3


def test_baseband_symbols_land_on_time():
    """The native (fixed) waveform puts symbol k's tone at
    [k*sps, (k+1)*sps) — the WSJT-X alignment.  The reference's own
    transmissions run one symbol late and truncate the final Costas
    symbol (ops/gfsk.py module docstring); this pins the fix."""
    fs, f0 = 2000.0, 250.0
    sps = int(C.SYMBOL_PERIOD_S * fs)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, size=10, dtype=np.uint8)
    payload[9] &= 0xF8
    tones = np.asarray(encode_tones(jnp.asarray(payload)))
    bb = np.asarray(ft8_baseband(payload, fs, f0))
    inst = np.diff(np.unwrap(np.angle(bb))) * fs / (2 * np.pi)
    for k in (0, 1, 5, 40, 77, 78):          # incl. the last Costas symbol
        c = int((k + 0.5) * sps)
        got = float(np.mean(inst[c - sps // 8: c + sps // 8]))
        want = f0 + float(tones[k]) * C.TONE_SPACING_HZ
        assert abs(got - want) < 0.35, (k, got, want)


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
