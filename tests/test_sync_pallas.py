"""Parity tests for the experimental Pallas sync-score kernel.

Runs in Pallas interpret mode on the CPU test mesh; the jnp formulation in
ops/sync.py is the reference.  On real TPU hardware the kernel compiles and
matches too (verified manually), but the default decode path keeps the XLA
formulation, which measured faster on v5e.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ft8_demodulator_tpu.ops.sync import search_grid, sync_scores
from ft8_demodulator_tpu.ops.sync_pallas import (
    padded_times, sync_scores_padded, sync_scores_pallas)
from ft8_demodulator_tpu.ops.waterfall import waterfall_params, waterfall_real


@pytest.mark.parametrize("fs", [2000.0, 12000.0])
def test_pallas_matches_jnp(fs):
    p = waterfall_params(fs, 2, 2)
    n = int(fs * 15)
    num_frames = p.num_frames(n)
    g = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)
    rng = np.random.default_rng(3)
    waves = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    mag = waterfall_real(waves, p, num_frames)

    ref = np.asarray(jax.vmap(lambda m: sync_scores(m, g))(mag))
    got = np.asarray(sync_scores_pallas(mag, g, interpret=True))

    finite = np.isfinite(ref)
    assert (finite == np.isfinite(got)).all()
    assert np.abs(ref[finite] - got[finite]).max() < 1e-4


def test_padded_grid_is_masked():
    fs = 2000.0
    p = waterfall_params(fs, 2, 2)
    n = int(fs * 15)
    num_frames = p.num_frames(n)
    g = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)
    rng = np.random.default_rng(4)
    mag = waterfall_real(
        jnp.asarray(rng.standard_normal(n).astype(np.float32)), p,
        num_frames)
    padded = np.asarray(sync_scores_padded(mag, g, interpret=True))
    t_out = padded_times(g)
    assert padded.shape[-1] == t_out
    # padding rows and columns must never win a top-k: they are -inf
    assert np.all(np.isneginf(padded[g.num_freqs:, :]))
    assert np.all(np.isneginf(padded[:, g.num_times:]))
