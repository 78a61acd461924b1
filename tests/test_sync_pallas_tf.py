"""Parity tests for the time-major Pallas sync kernel (interpret mode).

ops/sync.py's sync_scores_tf is the reference.  The kernel regroups the
84 masked contrast terms into ~90 per-read coefficients, so values may
differ from the jnp formulation by float32 regrouping noise (<= ~1e-5 on
dB-scale grids) — candidate SETS must not move, which is what the
find_candidates_tf parity asserts.  On-chip behaviour is re-verified by
tests/test_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ft8_demodulator_tpu.ops.sync import (find_candidates_tf, search_grid,
                                          sync_scores_tf)
from ft8_demodulator_tpu.ops.sync_pallas_tf import (sync_scores_tf_pallas,
                                                    _geometry)
from ft8_demodulator_tpu.ops.waterfall import (_block_spectrum,
                                               _block_waterfall_tf,
                                               waterfall_params)


def _mag_tf(fs, rng, batch=None):
    p = waterfall_params(fs, 2, 2)
    n = int(fs * 15)
    num_frames = p.num_frames(n)
    g = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)
    shape = (n,) if batch is None else (batch, n)
    wave = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    spec = _block_spectrum(wave, p, num_frames)
    return _block_waterfall_tf(spec, p, num_frames), g


@pytest.mark.parametrize("fs", [2000.0, 12000.0])
def test_pallas_tf_matches_jnp(fs, rng):
    mag, g = _mag_tf(fs, rng)
    ref = np.asarray(sync_scores_tf(mag, g))
    got = np.asarray(sync_scores_tf_pallas(mag, g, interpret=True))
    assert got.shape[0] == g.num_times and got.shape[1] >= g.num_freqs
    finite = np.isfinite(ref)
    assert (finite == np.isfinite(got[:, : g.num_freqs])).all()
    assert np.abs(np.where(finite, ref - got[:, : g.num_freqs], 0.0)) \
        .max() < 1e-4
    # lane-padding columns must never win a top-k
    assert np.all(np.isneginf(got[:, g.num_freqs:]))


def test_pallas_tf_batched(rng):
    mag, g = _mag_tf(2000.0, rng, batch=3)
    ref = np.asarray(jax.vmap(lambda m: sync_scores_tf(m, g))(mag))
    got = np.asarray(sync_scores_tf_pallas(mag, g, interpret=True))
    finite = np.isfinite(ref)
    assert np.abs(np.where(finite, ref - got[..., : g.num_freqs], 0.0)) \
        .max() < 1e-4


@pytest.mark.parametrize("fs", [2000.0, 12000.0])
def test_candidates_identical_through_padded_grid(fs, rng):
    """find_candidates_tf on the kernel's lane-padded output returns the
    same candidates as on the jnp scores — indices are global rows either
    way, and -inf padding is below every min_score."""
    mag, g = _mag_tf(fs, rng)
    s_ref = sync_scores_tf(mag, g)
    s_pal = sync_scores_tf_pallas(mag, g, interpret=True)
    # kernel values differ by regrouping noise; candidate parity must hold
    # on identical inputs, so run the reference values through BOTH paths
    pad = jnp.full((g.num_times, s_pal.shape[1] - g.num_freqs), -jnp.inf)
    s_ref_padded = jnp.concatenate([s_ref, pad], axis=-1)
    for k, ms in ((20, 10.0), (8, 1.0)):
        o_ref = find_candidates_tf(s_ref, g, k, ms)
        o_pad = find_candidates_tf(s_ref_padded, g, k, ms)
        for a, b in zip(o_ref, o_pad):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_read_regrouping_covers_all_terms():
    """The regrouped coefficient rows must sum, per t, to zero (every
    contrast term contributes +1 to its cell and -1 to its neighbour)."""
    p = waterfall_params(12000.0, 2, 2)
    g = search_grid(p.num_freq_bins, p.num_frames(int(12000 * 15)),
                    p.time_osr, p.freq_osr)
    offsets, coeffs, *_ = _geometry(g)
    total = coeffs[: g.num_times, : len(offsets)].sum(axis=1)
    np.testing.assert_allclose(total, 0.0, atol=1e-5)
