"""Full satellite-channel pipeline e2e, mirroring the reference's 3-script
chain (SURVEY §3.4): Doppler sequence -> apply to TX baseband + AWGN ->
linear compensation -> decimate -> residual drift correction -> decode.

The reference chains these stages through .npy files on disk
(src/tests/channel/test_doppler_shift.py -> test_signal_after_channel.py ->
test_signal_processing.py -> test_decode_after_channel.py); here it is one
in-memory pipeline on the same StarLink pass geometry.
"""

import datetime

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from ft8_demodulator_tpu.beacon import correct_frequency_drift
from ft8_demodulator_tpu.channel import (Channel, add_complex_awgn,
                                         apply_doppler,
                                         compensate_linear_doppler, decimate)
from ft8_demodulator_tpu.channel import geodesy as geo
from ft8_demodulator_tpu.demod import decode_ft8_message
from ft8_demodulator_tpu.ops.gfsk import ft8_baseband

from tests.test_channel import GOLDEN_START, STATION, TLE

PAYLOAD = np.array([0x1C, 0x3F, 0x8A, 0x6A, 0xE2, 0x07, 0xA1, 0xE3, 0x94, 0x50],
                   dtype=np.uint8)


def test_satellite_channel_pipeline_end_to_end():
    # 437 MHz (UHF cubesat beacon): after compensating the linear Doppler
    # model the residual curvature is a few Hz and the message decodes.
    # (At the reference's 2.45 GHz the residual is large enough that even
    # the reference cannot decode its own committed fixture — see
    # test_drift_rate_parity_on_committed_fixture.)
    fs = 10000.0
    f0 = 100.0
    fc = 437e6
    duration_s = 14.0

    # stage 1: Doppler sequence from the real pass geometry (vectorised SGP4)
    channel = Channel(STATION, TLE)
    n = int(duration_s * fs)
    jd0 = float(geo.datetime_to_jd(GOLDEN_START))
    jd = jd0 + np.arange(n) / fs / 86400.0
    doppler = channel.normalized_doppler_by_ecef_jd(jd) * fc
    slope, intercept, *_ = stats.linregress(np.arange(n), doppler)

    # stage 2: TX baseband through the channel + noise
    bb = ft8_baseband(PAYLOAD, fs, f0)
    sig = np.zeros(n, np.complex128)
    sig[: len(bb)] = bb
    ri = jnp.asarray(np.stack([sig.real, sig.imag], -1).astype(np.float32))
    shifted = apply_doppler(ri, jnp.asarray(doppler.astype(np.float32)), fs)
    noisy = add_complex_awgn(shifted, jax.random.PRNGKey(3), 10.0)

    # stage 3: compensate the linear Doppler model, decimate x5 -> 2 kHz
    comp = compensate_linear_doppler(noisy, float(slope), float(intercept), fs)
    down = np.asarray(decimate(comp, 5))
    fs2 = fs / 5

    # stage 4: decode the compensated, decimated signal
    z = down[..., 0] + 1j * down[..., 1]
    results = decode_ft8_message(z, fs2, min_score=4.0)
    payloads = {r.message.payload.hex() for r in results}
    assert PAYLOAD.tobytes().hex() in payloads, (
        f"pipeline decode failed; got {payloads}")


def test_drift_rate_parity_on_committed_fixture():
    """Our corrector must agree with the reference on real channel data.

    The reference's own pipeline cannot decode this committed fixture (we
    ran it: decode_ft8_message returns [] before and after its
    correct_frequency_drift), but its drift-rate estimate on the fixture is
    a deterministic output: 18.16995743 Hz/s.  Ours must match.
    """
    import os
    path = ("/root/reference/src/tests/channel/doppler_shift_test/"
            "down_sampled_signal.npy")
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference fixture not mounted")
    sig = np.load(path)
    _, rate = correct_frequency_drift(sig, 2000.0)
    assert abs(rate * 2000.0 - 18.16995743) < 1e-3
