"""Pipeline parallelism: the decode split into two stages over a ``stage``
mesh axis.

SURVEY §2.3 PP row.  The natural cut is the LLR boundary: stage 0 runs the
grid-heavy front (waterfall -> sync stencil -> top-K -> LLR extraction,
~2/3 of per-slot device time) and stage 1 the candidate-sized back
(BP -> CRC -> payload pack).  The inter-stage activation is only the
(K, 174) LLR matrix + 4 candidate vectors (~14 KB per slot at K=20), so the
``ppermute`` handoff is negligible against either stage's compute — unlike
a split at the waterfall boundary, whose (F, T) activation (~1.4 MB/slot)
would cost as much ICI time as the front stage's compute (measured numbers
in docs/DESIGN_NOTES.md).

Classic SPMD microbatch schedule: a ``lax.scan`` over M microbatches with
one in-flight buffer; each step every device runs its stage's work
(``lax.cond`` on ``axis_index``) and the LLR packet hops one stage right
via ``ppermute``.  M microbatches complete in M+1 steps.  For this
workload DP over slots is strictly better (zero comms, perfect scaling) —
this module exists for the axis-coverage and as the pattern to follow if a
future stage (e.g. a neural post-decoder) unbalances the pipeline; see the
measurement note in docs/DESIGN_NOTES.md.

Reference anchor: the reference has no parallelism of any kind (SURVEY
§2.3); its closest analog is the sequential per-candidate decode loop in
ft8_decode.py:384-391.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..demod.decode import finish_decode
from ..demod.types import SlotDecodeResult
from ..ops.llr import extract_llrs
from ..ops.sync import find_candidates, search_grid, sync_scores
from ..ops.waterfall import WaterfallParams, waterfall_real
from ..protocol import constants as C

__all__ = ["decode_slots_pipelined"]


@functools.partial(
    jax.jit,
    static_argnames=("p", "num_frames", "mesh", "max_candidates",
                     "max_iterations", "use_osd"),
)
def decode_slots_pipelined(waves: jnp.ndarray, p: WaterfallParams,
                           num_frames: int, mesh: Mesh,
                           max_candidates: int = 20, min_score: float = 10.0,
                           max_iterations: int = 20,
                           use_osd: bool = False) -> SlotDecodeResult:
    """(M, n) microbatches of slots -> stacked SlotDecodeResult (M, K, ...).

    mesh must have a 2-device ``stage`` axis.  Microbatch m's front runs on
    stage 0 at step m; its LLR packet hops to stage 1 and finishes at step
    m+1.  Results equal a plain per-slot decode exactly.
    """
    if mesh.shape["stage"] != 2:
        raise ValueError("decode_slots_pipelined wants a 2-stage mesh")
    k = max_candidates
    g = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)

    def front(wave):
        mag = waterfall_real(wave, p, num_frames)
        scores = sync_scores(mag, g)
        abs_time, abs_freq, score, valid = find_candidates(
            scores, g, k, min_score)
        llrs = extract_llrs(mag, abs_time, abs_freq, g.time_osr, g.freq_osr,
                            g.num_blocks)
        return (llrs, abs_time, abs_freq, score, valid)

    def back(packet):
        llrs, abs_time, abs_freq, score, valid = packet
        return finish_decode(llrs, abs_time, abs_freq, score, valid,
                             max_iterations, use_osd)

    def empty_packet():
        z = jnp.zeros((k,), jnp.float32)
        return (jnp.zeros((k, C.LDPC_N), jnp.float32),
                jnp.zeros((k,), jnp.int32), jnp.zeros((k,), jnp.int32),
                z, z > 1.0)

    def empty_result():
        return back(empty_packet())

    def shard_fn(local_waves):
        # local_waves: (M, n) replicated copy on each stage device
        stage = jax.lax.axis_index("stage")

        def pvary(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.lax.pcast(x, "stage", to="varying"), tree)

        def step(carry, wave_m):
            in_flight = carry
            # stage 0 computes the front for this step's microbatch; stage 1
            # finishes the packet it received last step (branch outputs are
            # stage-varying by construction: each device takes its own arm)
            packet = jax.lax.cond(
                stage == 0, lambda w: pvary(front(w)),
                lambda _: pvary(empty_packet()), wave_m)
            result = jax.lax.cond(
                stage == 1, back, lambda _: pvary(empty_result()), in_flight)
            # hop the packet one stage to the right
            moved = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, "stage", [(0, 1)]), packet)
            return moved, result

        pad = jnp.zeros((1,) + local_waves.shape[1:], local_waves.dtype)
        feed = jnp.concatenate([local_waves, pad])     # M+1 steps
        # the looped carry is stage-varying (ppermute output); the initial
        # empty packet must carry the same varying type
        carry0 = jax.tree_util.tree_map(
            lambda x: jax.lax.pcast(x, "stage", to="varying"),
            empty_packet())
        _, results = jax.lax.scan(step, carry0, feed)
        # step m+1 produced microbatch m's result (on stage 1); drop step 0
        results = jax.tree_util.tree_map(lambda x: x[1:], results)
        # replicate stage 1's results to every device so out_specs is P()
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(
                jnp.where(stage == 1, x.astype(jnp.float32), 0.0),
                "stage").astype(x.dtype),
            results)

    from jax import shard_map
    fn = shard_map(
        shard_fn, mesh=mesh, in_specs=P(),
        out_specs=jax.tree_util.tree_map(lambda _: P(),
                                         SlotDecodeResult(*([0] * 9))),
    )
    return fn(waves)
