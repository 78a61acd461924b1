"""Channel ops: Doppler application/compensation and AWGN.

Counterparts of the reference's channel test scripts
(src/tests/channel/test_signal_after_channel.py:49-59,
test_signal_processing.py:40-49).  Complex signals cross the host boundary
as stacked (..., n, 2) float32 [real, imag].

HOST-SIDE PHASE, by design: the Doppler/compensation ops compute their
phase in float64 numpy on the host and only the final rotate runs on
device (jit-compatible in the wave argument, NOT in doppler_hz/slope —
those must be concrete).  A float32 device phase accumulates ~0.1-cycle
staircase noise over a minutes-long capture (~1e5-1e6 cycles), which
measurably biases any receiver arm that relies on the compensation
(round-3 advisor finding; see _phase_to_cycles).  add_complex_awgn and
decimate remain pure jitted device ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["apply_doppler", "apply_doppler_physical",
           "compensate_linear_doppler",
           "compensate_linear_doppler_physical", "add_complex_awgn",
           "decimate"]


def _to_complex(ri: jnp.ndarray) -> jnp.ndarray:
    return ri[..., 0] + 1j * ri[..., 1]


def _to_ri(z: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)


@jax.jit
def _rotate_cycles(wave_ri: jnp.ndarray, cyc: jnp.ndarray) -> jnp.ndarray:
    """x * exp(-j 2 pi cyc) with cyc already reduced mod 1."""
    z = _to_complex(wave_ri) * jnp.exp(-2j * jnp.pi * cyc)
    return _to_ri(z)


def _require_concrete(value, name: str, fn: str):
    """Clear error for traced Doppler parameters (ADVICE r4: the round-4
    float64 host-phase rewrite made doppler_hz/slope concreteness a hard
    requirement; a raw TracerArrayConversionError does not say why)."""
    if isinstance(value, jax.core.Tracer):
        raise TypeError(
            f"{fn}: `{name}` must be a concrete (host) value, not a JAX "
            "tracer. Since round 4 the Doppler phase is computed in "
            "float64 on the host (float32 device phase accumulates "
            "~0.1-cycle staircase noise over minutes-long captures), so "
            f"this function cannot be jitted over `{name}`. Pass the "
            "wave as the traced argument and keep Doppler parameters "
            "static, or precompute the rotation outside jit.")


def _phase_to_cycles(phase_f64: np.ndarray) -> jnp.ndarray:
    """Host-side float64 cycle count reduced mod 1 for the float32 rotate.

    The cumulative phase f_d * t reaches ~1e6 cycles over a two-minute
    capture, where float32 quantisation (ulp ~0.125 cycle) adds staircase
    phase noise; the same precaution as beacon.drift.apply_polynomial_drift.
    """
    return jnp.asarray((phase_f64 - np.floor(phase_f64)).astype(np.float32))


def apply_doppler(wave_ri: jnp.ndarray, doppler_hz, fs: float) -> jnp.ndarray:
    """y[i] = x[i] * exp(-j 2 pi f_d[i] * t_i), the reference's channel
    convention (instantaneous shift times absolute time,
    test_signal_after_channel.py:55-58).  The phase is computed in float64
    on the host (see _phase_to_cycles); only the rotate runs on device."""
    _require_concrete(doppler_hz, "doppler_hz", "apply_doppler")
    n = np.shape(wave_ri)[-2]
    t = np.arange(n, dtype=np.float64) / float(fs)
    phase = np.asarray(doppler_hz, dtype=np.float64) * t
    return _rotate_cycles(jnp.asarray(wave_ri), _phase_to_cycles(phase))


def apply_doppler_physical(wave_ri: jnp.ndarray, doppler_hz,
                           fs: float) -> jnp.ndarray:
    """y[i] = x[i] * exp(-j phi_i), phi = 2 pi INTEGRAL of f_d dt — the
    PHYSICAL Doppler channel (instantaneous frequency offset = -f_d(t)).

    The reference's convention (:func:`apply_doppler`) writes the phase
    as f_d(t) * t (test_signal_after_channel.py:55-58), whose
    instantaneous frequency is f_d + t * f_d' — identical only for
    constant f_d.  Over a long multi-cycle capture the t * f_d' term
    amplifies any RESIDUAL after partial compensation by absolute
    capture time (hundreds of Hz by the late cycles of a 2-minute LEO
    pass), which makes composed experiments under that convention
    physically meaningless; benchmarks/satellite_e2e.py uses this
    integrated form for all arms.  Trapezoid-integrated float64
    host-side phase (exact for linear f_d, so
    :func:`compensate_linear_doppler_physical`'s closed form cancels it
    analytically); only the rotate runs on device."""
    _require_concrete(doppler_hz, "doppler_hz", "apply_doppler_physical")
    n = np.shape(wave_ri)[-2]
    f = np.broadcast_to(np.asarray(doppler_hz, np.float64), (n,))
    phase = np.empty(n, np.float64)
    phase[0] = 0.0
    np.cumsum((f[1:] + f[:-1]) * (0.5 / float(fs)), out=phase[1:])
    return _rotate_cycles(jnp.asarray(wave_ri), _phase_to_cycles(phase))


def compensate_linear_doppler_physical(wave_ri: jnp.ndarray,
                                       slope_hz_per_sample: float,
                                       intercept_hz: float,
                                       fs: float) -> jnp.ndarray:
    """Exact inverse of :func:`apply_doppler_physical` for a linear model
    f_d(k) = slope * k + intercept: phase = -2 pi (slope * fs * t^2 / 2
    + intercept * t) (the closed-form integral; the channel's trapezoid
    rule is exact for linear f_d, so the cancellation is analytic)."""
    for _nm, _v in (("slope_hz_per_sample", slope_hz_per_sample),
                    ("intercept_hz", intercept_hz)):
        _require_concrete(_v, _nm, "compensate_linear_doppler_physical")
    n = np.shape(wave_ri)[-2]
    t = np.arange(n, dtype=np.float64) / float(fs)
    phase = -(float(slope_hz_per_sample) * float(fs) * t * t * 0.5
              + float(intercept_hz) * t)
    return _rotate_cycles(jnp.asarray(wave_ri), _phase_to_cycles(phase))


def compensate_linear_doppler(wave_ri: jnp.ndarray, slope_hz_per_sample: float,
                              intercept_hz: float, fs: float) -> jnp.ndarray:
    """Undo a linear Doppler model: y = x * exp(+j 2 pi (a*t*fs + b) * t)
    (test_signal_processing.py:45-46).  Float64 host-side phase as in
    apply_doppler — float32 accumulation over a long capture would bias
    receiver arms that rely on this compensation by ~0.1-cycle staircase
    noise."""
    for _nm, _v in (("slope_hz_per_sample", slope_hz_per_sample),
                    ("intercept_hz", intercept_hz)):
        _require_concrete(_v, _nm, "compensate_linear_doppler")
    n = np.shape(wave_ri)[-2]
    t = np.arange(n, dtype=np.float64) / float(fs)
    phase = -(float(slope_hz_per_sample) * t * float(fs)
              + float(intercept_hz)) * t
    return _rotate_cycles(jnp.asarray(wave_ri), _phase_to_cycles(phase))


@functools.partial(jax.jit, static_argnames=("snr_db",))
def add_complex_awgn(wave_ri: jnp.ndarray, key: jax.Array,
                     snr_db: float) -> jnp.ndarray:
    """Add circular Gaussian noise at the given SNR relative to the signal's
    own mean power.  Matches the reference's per-quadrature sigma convention
    (noise std sqrt(noise_power) per real/imag component,
    test_signal_after_channel.py:42-43)."""
    power = jnp.mean(wave_ri[..., 0] ** 2 + wave_ri[..., 1] ** 2)
    sigma = jnp.sqrt(power / 10.0 ** (snr_db / 10.0))
    noise = jax.random.normal(key, wave_ri.shape, wave_ri.dtype) * sigma
    return wave_ri + noise


def decimate(wave_ri: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Plain stride decimation (the reference downsamples without an
    anti-alias filter, test_signal_processing.py:48-49)."""
    return wave_ri[..., ::factor, :]
