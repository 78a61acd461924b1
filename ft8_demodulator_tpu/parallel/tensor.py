"""Tensor parallelism: one slot's search grid sharded over the mesh.

SURVEY §2.3 TP row: when a single slot's (freq, time) grid exceeds one
chip's comfortable footprint (the DEEP preset — osr 4x4 at fs 10.5 kHz —
is a 6720x360 grid), the frequency axis is sharded across a ``freq`` mesh
axis:

* each shard materialises only ITS band of the waterfall (plus the 7-tone
  stencil halo) straight out of the block-DFT matmul — a column slice of
  the DFT matrix, so no full-grid array ever exists on any chip and no
  halo exchange is needed (halo rows are recomputed locally, ~2% extra
  matmul FLOPs, far cheaper than an ICI round-trip),
* sync scoring and candidate search run locally; each shard's top-K is
  exact for its band (any global top-K member in the band is in the band's
  local top-K),
* local top-Ks are gathered with a disjoint scatter + ``psum`` and merged
  by one more top-K — identical selection to the single-device decoder,
* LLR extraction runs on the shard owning each candidate's frequency row;
  the (K, 174) LLR matrix is ``psum``-combined (disjoint ownership), and
  the cheap tail (BP, CRC, pack — microseconds at K=20) runs replicated.

The decoded output is bit-identical to single-device ``decode_slot``
(payloads, times, freqs, masks; scores match to float round-off of the
band-sliced matmul).  Reference anchor: the grid this shards is the
reference's candidate scan (ft8_decode.py:102-149), which it can only run
single-threaded on one host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..demod.decode import finish_decode
from ..demod.types import SlotDecodeResult
from ..ops.llr import extract_llrs
from ..ops.sync import SearchGrid, find_candidates, search_grid, sync_scores
from ..ops.waterfall import WaterfallParams, waterfall_real_band

__all__ = ["decode_slot_tp"]


@functools.partial(
    jax.jit,
    static_argnames=("p", "num_frames", "mesh", "max_candidates",
                     "max_iterations", "use_osd", "use_mf", "mf_refine"),
)
def decode_slot_tp(wave: jnp.ndarray, p: WaterfallParams, num_frames: int,
                   mesh: Mesh, max_candidates: int = 20,
                   min_score: float = 10.0, max_iterations: int = 20,
                   use_osd: bool = False,
                   use_mf: bool = False,
                   mf_refine: bool = False) -> SlotDecodeResult:
    """Audio (n,) real -> SlotDecodeResult, frequency-sharded over
    ``mesh`` (one axis named ``freq``).

    Drop-in for :func:`..demod.decode.decode_slot` when one slot's grid
    should span several chips.  Results are replicated over the mesh.
    """
    n_f = mesh.shape["freq"]
    g_full = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)
    scan_freqs = g_full.num_freqs                 # global base-freq rows
    band = -(-scan_freqs // n_f)                  # owned rows per shard
    band_rows = band + 7 * p.freq_osr             # + stencil halo
    k = max_candidates

    g_local = SearchGrid(
        time_osr=g_full.time_osr, freq_osr=g_full.freq_osr,
        num_blocks=g_full.num_blocks, t_start=g_full.t_start,
        num_times=g_full.num_times, num_freqs=band,
    )

    def shard_fn(wave_rep):
        s = jax.lax.axis_index("freq")
        row0 = (s * band).astype(jnp.int32)
        mag = waterfall_real_band(wave_rep, p, num_frames, row0, band_rows)

        scores = sync_scores(mag, g_local)
        # rows past the global scan range are padding — never candidates
        row_ok = row0 + jnp.arange(band) < scan_freqs
        scores = jnp.where(row_ok[:, None], scores, -jnp.inf)
        t_loc, f_loc, v_loc, _ = find_candidates(scores, g_local, k,
                                                 min_score)
        f_glob = f_loc + row0

        def gather(x):
            full = jnp.zeros((n_f,) + x.shape, x.dtype)
            full = jax.lax.dynamic_update_slice(
                full, x[None], (s,) + (0,) * x.ndim)
            return jax.lax.psum(full, "freq")

        all_v = gather(v_loc).reshape(-1)             # (n_f * K,)
        all_t = gather(t_loc).reshape(-1)
        all_f = gather(f_glob).reshape(-1)
        vals, sel = jax.lax.top_k(all_v, k)           # merged global top-K
        abs_time = all_t[sel]
        abs_freq = all_f[sel]
        cand_valid = jnp.isfinite(vals)

        # LLRs come from the shard owning each candidate's frequency band
        owned = (abs_freq >= row0) & (abs_freq < row0 + band) & cand_valid
        f_local = jnp.clip(abs_freq - row0, 0, band - 1)
        llr_local = extract_llrs(mag, abs_time, f_local, g_local.time_osr,
                                 g_local.freq_osr, g_local.num_blocks)
        llrs = jax.lax.psum(
            jnp.where(owned[:, None], llr_local, 0.0), "freq")
        return llrs, abs_time, abs_freq, vals, cand_valid

    from jax import shard_map
    fn = shard_map(shard_fn, mesh=mesh, in_specs=P(),
                   out_specs=(P(), P(), P(), P(), P()))
    llrs, abs_time, abs_freq, vals, cand_valid = fn(wave)
    res = finish_decode(llrs, abs_time, abs_freq, vals, cand_valid,
                        max_iterations, use_osd)
    if use_mf:
        from ..demod.decode import mf_retry
        res = mf_retry(wave, p, res, 0, 0, max_iterations, use_osd,
                       mf_refine=mf_refine)
    return res
