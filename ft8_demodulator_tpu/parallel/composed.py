"""Composed (channel x stream x freq) decoding: TP inside the sharded
stream.

SURVEY §2.3 motivates tensor parallelism for "when a slot's grid exceeds
one chip" (SURVEY.md:117) and sequence parallelism for long audio
(SURVEY.md:119); this module composes the two with data parallelism over
channels in ONE program on ONE 3-axis mesh:

* ``channel`` — independent receivers (pure DP, no comms),
* ``stream``  — contiguous time blocks of each channel's audio, with the
  one-frame overlap-save halo travelling left by ``ppermute``
  (parallel/streaming.py semantics, unchanged),
* ``freq``    — each block's (freq, time) search grid band-sharded as in
  parallel/tensor.py: band-sliced DFT matmuls so no chip ever
  materialises a full grid, local top-K, disjoint-scatter + ``psum``
  merge, owner-shard LLR extraction.

The decoded output equals the (channel x stream) sharded decoder — and
therefore the single-device path — exactly (tests/test_composed.py).

Reference anchor: the reference runs one single-threaded scan per capture
(src/ft8_tools/ft8_demodulator/ft8_decode.py:102-149); this is its
pod-scale shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..demod.decode import finish_decode
from ..demod.types import FT8Decode, SlotDecodeResult
from ..ops.llr import extract_llrs
from ..ops.sync import SearchGrid, find_candidates, sync_scores
from ..ops.waterfall import WaterfallParams, waterfall_params, \
    waterfall_real_band
from ..protocol import constants as C
from .streaming import _local_grid, stream_halo_samples

__all__ = ["make_composed_mesh", "decode_stream_composed_sharded",
           "decode_stream_composed"]


def make_composed_mesh(channel: int = 1, stream: int = 1, freq: int = 1,
                       devices=None) -> Mesh:
    """Build the 3-axis (channel, stream, freq) mesh."""
    devices = list(jax.devices()) if devices is None else list(devices)
    need = channel * stream * freq
    if need > len(devices):
        raise ValueError(f"mesh {channel}x{stream}x{freq} needs {need} "
                         f"devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(channel, stream, freq)
    return Mesh(grid, axis_names=("channel", "stream", "freq"))


def _decode_block_tp(extended: jnp.ndarray, p: WaterfallParams,
                     block_frames: int, n_f: int,
                     max_candidates: int, min_score: float,
                     max_iterations: int) -> SlotDecodeResult:
    """One stream block, frequency-band-sharded over the ``freq`` axis.

    Same collective schedule as parallel/tensor.py decode_slot_tp, but the
    search grid is the streaming block grid (start times [0, block) against
    the halo-extended view) instead of the slot grid.  Runs INSIDE
    shard_map: uses axis_index/psum directly.
    """
    ext_frames = p.num_frames(extended.shape[-1])
    g_full = _local_grid(p, block_frames, ext_frames)
    scan_freqs = g_full.num_freqs
    band = -(-scan_freqs // n_f)
    band_rows = band + 7 * p.freq_osr
    k = max_candidates

    g_band = SearchGrid(
        time_osr=g_full.time_osr, freq_osr=g_full.freq_osr,
        num_blocks=g_full.num_blocks, t_start=g_full.t_start,
        num_times=g_full.num_times, num_freqs=band,
    )

    s = jax.lax.axis_index("freq")
    row0 = (s * band).astype(jnp.int32)
    mag = waterfall_real_band(extended, p, ext_frames, row0, band_rows)

    scores = sync_scores(mag, g_band)
    row_ok = row0 + jnp.arange(band) < scan_freqs
    scores = jnp.where(row_ok[:, None], scores, -jnp.inf)
    t_loc, f_loc, v_loc, _ = find_candidates(scores, g_band, k, min_score)
    f_glob = f_loc + row0

    def gather(x):
        full = jnp.zeros((n_f,) + x.shape, x.dtype)
        full = jax.lax.dynamic_update_slice(
            full, x[None], (s,) + (0,) * x.ndim)
        return jax.lax.psum(full, "freq")

    all_v = gather(v_loc).reshape(-1)
    all_t = gather(t_loc).reshape(-1)
    all_f = gather(f_glob).reshape(-1)
    vals, sel = jax.lax.top_k(all_v, k)
    abs_time = all_t[sel]
    abs_freq = all_f[sel]
    cand_valid = jnp.isfinite(vals)

    owned = (abs_freq >= row0) & (abs_freq < row0 + band) & cand_valid
    f_local = jnp.clip(abs_freq - row0, 0, band - 1)
    llr_local = extract_llrs(mag, abs_time, f_local, g_band.time_osr,
                             g_band.freq_osr, g_band.num_blocks)
    llrs = jax.lax.psum(jnp.where(owned[:, None], llr_local, 0.0), "freq")
    return finish_decode(llrs, abs_time, abs_freq, vals, cand_valid,
                         max_iterations)


@functools.partial(
    jax.jit,
    static_argnames=("p", "mesh", "max_candidates", "max_iterations"),
)
def decode_stream_composed_sharded(audio: jnp.ndarray, p: WaterfallParams,
                                   mesh: Mesh, max_candidates: int = 20,
                                   min_score: float = 10.0,
                                   max_iterations: int = 20
                                   ) -> tuple[SlotDecodeResult, jnp.ndarray]:
    """(channels, n_samples) -> (stacked SlotDecodeResult, yield count).

    One SPMD program over the 3-axis mesh.  audio shards over (channel,
    stream) and is replicated over freq; results come back fully
    replicated, shaped (channels, n_blocks, K, ...), identical to
    parallel/streaming.decode_stream_sharded's.
    """
    n_stream = mesh.shape["stream"]
    n_f = mesh.shape["freq"]
    channels, n_samples = audio.shape
    block_len = n_samples // n_stream
    assert block_len * n_stream == n_samples
    assert block_len % p.hop == 0
    halo_len = min(stream_halo_samples(p), block_len)
    block_frames = block_len // p.hop

    def shard_fn(local):
        """local: (channels / n_channel, block_len), replicated over freq."""
        head = local[:, :halo_len]
        perm = [(i, i - 1) for i in range(1, n_stream)]
        # the halo exchange runs along stream only; every freq shard holds
        # the identical block, so each sends/receives the identical head
        halo = jax.lax.ppermute(head, "stream", perm)
        extended = jnp.concatenate([local, halo], axis=-1)
        res = jax.vmap(lambda e: _decode_block_tp(
            e, p, block_frames, n_f, max_candidates, min_score,
            max_iterations))(extended)
        res = jax.tree_util.tree_map(lambda x: x[:, None], res)

        ch_idx = jax.lax.axis_index("channel")
        st_idx = jax.lax.axis_index("stream")
        n_channel = mesh.shape["channel"]

        def gather(x):
            dt = x.dtype
            xi = x if jnp.issubdtype(dt, jnp.floating) \
                else x.astype(jnp.int32)
            full = jnp.zeros((x.shape[0] * n_channel, n_stream)
                             + x.shape[2:], xi.dtype)
            start = (ch_idx * x.shape[0], st_idx) + (0,) * (x.ndim - 2)
            full = jax.lax.dynamic_update_slice(full, xi, start)
            # freq shards hold identical values — reduce over channel and
            # stream only, never over freq (a freq psum would scale by n_f)
            return jax.lax.psum(full, ("channel", "stream")).astype(dt)

        gathered = jax.tree_util.tree_map(gather, res)
        n_success = jax.lax.psum(
            jnp.sum(res.success.astype(jnp.int32)), ("channel", "stream"))
        return gathered, n_success

    from jax import shard_map
    z = 0
    spec_tree = SlotDecodeResult(z, z, z, z, z, z, z, z, z)
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=P("channel", "stream"),
        out_specs=(jax.tree_util.tree_map(lambda _: P(), spec_tree), P()),
    )
    return fn(audio)


def decode_stream_composed(audio: np.ndarray, sample_rate: float,
                           mesh: Mesh, bins_per_tone: int = 2,
                           steps_per_symbol: int = 2,
                           max_candidates: int = 20,
                           min_score: float = 10.0,
                           max_iterations: int = 20) -> list[FT8Decode]:
    """Host API over the composed mesh; result rows identical to
    parallel/streaming.decode_stream (same formatting/dedup path)."""
    from .streaming import _decode_preroll, decode_stream

    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    p = waterfall_params(sample_rate, bins_per_tone, steps_per_symbol)

    n_stream = mesh.shape["stream"]
    n_channel = mesh.shape["channel"]
    if audio.shape[0] % n_channel:
        reps = -(-audio.shape[0] // n_channel) * n_channel
        audio = np.pad(audio, ((0, reps - audio.shape[0]), (0, 0)))
    block = -(-audio.shape[1] // (n_stream * p.hop)) * p.hop
    audio = np.pad(audio, ((0, 0), (0, block * n_stream - audio.shape[1])))

    if jax.process_count() > 1:
        sharding = NamedSharding(mesh, P("channel", "stream"))
        audio_in = jax.make_array_from_callback(
            audio.shape, sharding, lambda idx: audio[idx])
    else:
        audio_in = jnp.asarray(audio)
    res, n_success = decode_stream_composed_sharded(
        audio_in, p, mesh, max_candidates, float(min_score), max_iterations)

    # reuse the streaming host formatter by round-tripping through its
    # module-level helpers: identical pre-roll handling and dedup keys
    pre_w = min(audio.shape[1], (C.NUM_SYMBOLS + 1) * p.nperseg)
    pre_res = None
    if pre_w >= p.nperseg:
        pre_res = jax.tree_util.tree_map(np.asarray, _decode_preroll(
            jnp.asarray(audio[:, :pre_w]), p, max_candidates,
            float(min_score), max_iterations))
    from .streaming import _format_stream_results
    return _format_stream_results(
        jax.tree_util.tree_map(np.asarray, res), pre_res, int(n_success),
        p, block // p.hop)
