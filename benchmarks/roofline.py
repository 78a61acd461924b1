"""Per-stage roofline v2: measured stage time vs MODEL bounds and
DEMONSTRATED-reachable bounds.

v1 (round 3) compared each stage of the fused decode against model
bounds (ideal bytes at peak HBM bandwidth, hardware FLOPs at peak MXU/
VPU rate) and found the three dominant stages at 18-27 % of bound —
leaving open whether XLA was leaving 3x on the floor or the model was
optimistic.  v2 (round 4) answers that with measured evidence
(VERDICT r3 weak #4): alongside each model bound it measures, in the
same run on the same chip, the best KNOWN standalone schedule for the
stage's work:

* retile+block-DFT — the two DFT matmuls alone, flat over the whole
  batch on pre-formed resident blocks: the demonstrated MXU ceiling for
  this shape (hop=960 contraction = 7.5 ragged 128-lane tiles; the
  197-TFLOP model bound is NOT reachable: the pure matmul itself
  achieves ~35 % of peak, and the absolute best variant found —
  pre-bf16 operands, cos|sin fused into one matmul — still only ~60 %.
  Both variants measured FASTER standalone but SLOWER inside the
  pipeline, where they break the epilogue's producer fusion; the
  committed pipeline keeps the two-matmul f32 form).
* sync-stencil — the jnp/XLA formulation standalone on resident grids.
  Six alternative schedules were tried and ALL lost to XLA's fusion:
  a time-major Pallas kernel with VMEM-resident grids (~6x slower;
  Mosaic lane-rotates each of the ~90 unaligned column reads at ~3x
  the cost of its FMA — the full diagnosis and per-variant numbers
  live in ops/sync_pallas_tf.py), manual 128/256-lane XLA tiling,
  regrouped-read forms, a bf16 grid.  XLA's in-pipeline time IS the
  demonstrated floor for this stage on this toolchain.
* ldpc-bp+crc — finish_decode alone on the REAL LLRs the front half
  produces (same convergence/early-exit behaviour as in the
  pipeline), flat over all batch*K rows: the demonstrated BP floor.

Stage attribution method unchanged from v1: cumulative fused prefixes
of the production pipeline (now decode_slots' split-BP structure:
chunked front half, flat BP tail), stage = prefix difference.
Writes benchmarks/results/roofline_v5e.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FS = 12000.0
SLOT_S = 15.0
BATCH = 256
CHUNK = 16
K = 20
BP_ITERS = 20
REPS = 24

# DEEP preset geometry (config.DEEP_SEARCH): osr 4x4, K=40, min_score 1,
# OSD on; measured in its fastest production form (mf_first single-pass)
DEEP_BATCH = 64
DEEP_K = 40
DEEP_MIN_SCORE = 1.0

_HBM_GBS = 819e9          # v5e HBM bandwidth
_MXU_PEAK = 197e12        # v5e bf16 MXU peak
_VPU_PEAK = 7.7e12



def _sync_latency() -> float:
    """Per-sync host-fetch latency of this session's backend (the axon
    tunnel measured 1-30 ms depending on conditions).  Round-4 numbers
    carried LAT/REPS/BATCH as a hidden per-slot offset (+14 us/slot at
    batch 256 x 8 reps under a 29 ms tunnel) — every timeit now
    subtracts one measured LAT from the loop total (prefix DIFFERENCES
    were always clean; absolute rows were not)."""
    import jax
    import jax.numpy as jnp
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda a: jnp.sum(a))
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(30):
        float(f(x))
    return (time.perf_counter() - t0) / 30

def main():
    from ft8_demodulator_tpu.utils.cache import setup
    setup()
    import jax
    import jax.numpy as jnp

    import ft8_demodulator_tpu.ops.ldpc_decode as ld
    from ft8_demodulator_tpu.demod.decode import (decode_slots,
                                                  finish_decode,
                                                  _front_slot_tf)
    from ft8_demodulator_tpu.ops.sync import (_SYNC_DTYPE, search_grid,
                                              sync_scores_tf)
    from ft8_demodulator_tpu.ops.waterfall import (_block_dft_matrices,
                                                   _block_spectrum,
                                                   _block_waterfall_tf,
                                                   _DFT_PRECISION,
                                                   waterfall_params)

    n = int(FS * SLOT_S)
    p = waterfall_params(FS, 2, 2)
    num_frames = p.num_frames(n)
    nb = num_frames + p.time_osr - 1
    kx = p.num_freq_bins + 2 * p.freq_osr
    g = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)

    rng = np.random.default_rng(0)
    waves = jnp.asarray(rng.standard_normal((BATCH, n)).astype(np.float32)
                        * 0.1)

    # ---- cumulative pipeline prefixes (tf fast path, chunked front) ------
    def _r(x):
        # FULL-array reduction: a 128-lane probe lets XLA dead-code-slice
        # the producing matmul to the consumed columns (this fabricated a
        # 0.39 us/slot "demonstrated DFT" row — and an 11.7 us one in
        # round 4).  XLA fuses the reduce into the producer, so the extra
        # cost is ~one output read at worst.
        return jnp.sum(x.astype(jnp.float32))

    from ft8_demodulator_tpu.ops.sync import find_candidates_tf

    from ft8_demodulator_tpu.demod.decode import _dft_backend
    if _dft_backend() == "pallas":
        from ft8_demodulator_tpu.ops.waterfall_pallas import \
            block_waterfall_tf_fused

        def make_mag(w):
            return block_waterfall_tf_fused(w, p, num_frames)
    else:
        def make_mag(w):
            return _block_waterfall_tf(_block_spectrum(w, p, num_frames),
                                       p, num_frames)

    def pre_spectra(w):
        # NOTE: under the pallas front this prefix is the same fused
        # kernel as pre_mag (the spectra never materialise); the
        # spectra/epilogue split is then reported as one merged row
        if _dft_backend() == "pallas":
            return _r(make_mag(w))
        pr, pi = _block_spectrum(w, p, num_frames)
        return _r(pr) + _r(pi)

    def pre_mag(w):
        return _r(make_mag(w))

    def pre_scores(w):
        return _r(sync_scores_tf(make_mag(w), g))

    def pre_cands(w):
        t, f, v, ok = find_candidates_tf(
            sync_scores_tf(make_mag(w), g), g, K, 10.0)
        return _r(t) + _r(f) + _r(v)

    def pre_llrs(w):
        from ft8_demodulator_tpu.demod.decode import _front_from_mag_tf
        llrs, t, f, v, ok = _front_from_mag_tf(make_mag(w), g, K, 10.0)
        return _r(llrs)

    def chunked(fn):
        @jax.jit
        def run(x):
            return jnp.sum(jax.lax.map(
                jax.vmap(fn), x.reshape(-1, CHUNK, x.shape[-1])))
        return run

    @jax.jit
    def full(x):
        res = decode_slots(x, p, num_frames, max_candidates=K,
                           min_score=10.0, max_iterations=BP_ITERS,
                           chunk=CHUNK)
        return _r(res.success) + _r(res.payload) + _r(res.score)

    prefixes = [("retile+block-DFT", chunked(pre_spectra)),
                ("waterfall-epilogue", chunked(pre_mag)),
                ("sync-stencil", chunked(pre_scores)),
                ("top-k-select", chunked(pre_cands)),
                ("llr-extract", chunked(pre_llrs)),
                ("ldpc-bp+crc(flat)", full)]

    lat = _sync_latency()
    print(f"sync latency: {lat * 1e3:.2f} ms", flush=True)

    def timeit(fn, *args, per=BATCH):
        # host-fetch the scalar: block_until_ready can return early
        # through the tunneled backend (DESIGN_NOTES methodology note);
        # subtract the one end-of-loop fetch's measured latency
        float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        float(out)
        return (time.perf_counter() - t0 - lat) / REPS / per

    times = []
    for name, fn in prefixes:
        times.append(timeit(fn, waves))
        print(f"prefix through {name}: {times[-1] * 1e6:8.2f} us/slot",
              flush=True)

    # ---- in-run demonstrated ideals --------------------------------------
    print("measuring demonstrated ideals...", flush=True)
    cos_m, sin_m = _block_dft_matrices(p.hop, p.nfft, p.num_freq_bins,
                                       p.freq_osr)
    blocks = jnp.asarray(rng.standard_normal(
        (BATCH * nb, p.hop)).astype(np.float32))
    cos_d, sin_d = jnp.asarray(cos_m), jnp.asarray(sin_m)

    @jax.jit
    def dft_ideal(b):
        r = jnp.matmul(b, cos_d, precision=_DFT_PRECISION,
                       preferred_element_type=jnp.float32)
        i = jnp.matmul(b, sin_d, precision=_DFT_PRECISION,
                       preferred_element_type=jnp.float32)
        return _r(r) + _r(i)

    cs_bf = jnp.asarray(np.concatenate([cos_m, sin_m], 1)) \
        .astype(jnp.bfloat16)
    blocks_bf = blocks.astype(jnp.bfloat16)

    @jax.jit
    def dft_best(b):
        return _r(jnp.matmul(b, cs_bf,
                             preferred_element_type=jnp.float32))

    mags = jnp.asarray(rng.standard_normal(
        (BATCH, num_frames, p.num_freq_bins)).astype(np.float32))

    @jax.jit
    def stencil_standalone(mag_b):
        def one(m):
            return _r(sync_scores_tf(m, g))
        return jnp.sum(jax.lax.map(jax.vmap(one),
                                   mag_b.reshape(-1, CHUNK,
                                                 *mag_b.shape[1:])))

    # real-LLR BP ideal: materialise the front half's LLRs, then time
    # finish_decode alone on them (identical convergence behaviour)
    @jax.jit
    def front_all(x):
        outs = jax.lax.map(
            jax.vmap(lambda w: _front_slot_tf(w, p, num_frames, g, K,
                                              10.0)),
            x.reshape(-1, CHUNK, x.shape[-1]))
        flat = lambda a: a.reshape(BATCH * K, *a.shape[3:])
        llrs, t, f, v, ok = outs
        return (llrs.reshape(BATCH * K, 174), flat(t), flat(f), flat(v),
                flat(ok))

    llrs, ct, cf, cv, cok = jax.block_until_ready(front_all(waves))

    @jax.jit
    def bp_ideal(llrs):
        res = finish_decode(llrs, ct, cf, cv, cok, BP_ITERS, False)
        return _r(res.success) + _r(res.payload)

    demonstrated = {
        "retile+block-DFT": {
            "us": timeit(dft_ideal, blocks) * 1e6,
            "how": "the two DFT matmuls alone, flat (B*nb, hop) on "
                   "resident blocks (no retile, no chunking)"},
        "dft-absolute-best-variant": {
            "us": timeit(dft_best, blocks_bf) * 1e6,
            "how": "cos|sin fused single matmul, operands pre-bf16 — "
                   "the earlier 'wins standalone' reading came from "
                   "early-returning block_until_ready timing; "
                   "host-fetched it loses both standalone (vs the "
                   "two-matmul form above) and in-pipeline (breaks "
                   "the epilogue producer fusion; exp G interleaved "
                   "A/B: 73.7 vs 82.5 us/slot)"},
        "sync-stencil": {
            "us": timeit(stencil_standalone, mags) * 1e6,
            "how": "jnp sync_scores_tf standalone on resident dB grids "
                   "(chunk 16); pays an extra HBM re-read of the grid "
                   "vs the fused pipeline, so the IN-PIPELINE stage "
                   "time is the demonstrated floor (best of 7 "
                   "schedules; see ops/sync_pallas_tf.py)"},
        "ldpc-bp+crc(flat)": {
            "us": timeit(bp_ideal, llrs) * 1e6,
            "how": "finish_decode alone on the front half's real LLRs "
                   "(same early-exit behaviour), flat batch*K rows"},
    }
    for k_, v_ in demonstrated.items():
        print(f"demonstrated {k_}: {v_['us']:8.2f} us/slot", flush=True)

    # ---- model bounds (v1 formulas, unchanged) ---------------------------
    passes = {"HIGHEST": 6, "HIGH": 3, "DEFAULT": 1}
    dft_p = passes[_DFT_PRECISION.name]
    bp_p = passes[ld._BP_PRECISION.name]
    from ft8_demodulator_tpu.ops.llr import _LLR_PRECISION
    llr_p = passes[_LLR_PRECISION.name]
    sync_b = 2 if _SYNC_DTYPE == jnp.bfloat16 else 4
    f32 = 4
    grid_b = p.num_freq_bins * num_frames * f32
    score_b = g.num_freqs * g.num_times * f32

    models = {
        "retile+block-DFT": dict(
            mxu=dft_p * 2 * (2 * nb * p.hop * kx), vpu=0,
            bytes=2 * n * f32 + nb * p.hop * f32 + 2 * nb * kx * f32),
        "waterfall-epilogue": dict(
            mxu=0, vpu=(p.time_osr * 6 + 12 + 3 + 10) * num_frames * kx,
            bytes=2 * nb * kx * f32 + grid_b),
        "sync-stencil": dict(
            mxu=0, vpu=84 * 4 * g.num_freqs * g.num_times,
            bytes=grid_b * (4 / f32 if sync_b == 4 else 1.5) + score_b),
        "top-k-select": dict(
            mxu=0, vpu=2 * g.num_freqs * g.num_times, bytes=score_b),
        "llr-extract": dict(
            mxu=llr_p * 2 * (K * 8) * p.num_freq_bins * num_frames,
            vpu=0, bytes=grid_b + K * 174 * f32),
        "ldpc-bp+crc(flat)": dict(
            mxu=BP_ITERS * K * (bp_p * 2 * (2 * 522 * 581)
                                + 1 * 2 * 174 * 83) + K * 2 * (2 * 174 * 14),
            vpu=BP_ITERS * K * (581 + 522) * 12 + K * 174 * 8,
            bytes=K * 174 * f32 * 2 + K * (174 + 10 + 16) * f32),
    }
    from ft8_demodulator_tpu.ops.sync import (_sync_backend,
                                              _sync_mxu_weights)
    if _sync_backend() == "mxu":
        # stencil folded into per-residue matmuls: MXU model instead
        per_res, _cnt, _l, _r = _sync_mxu_weights(g, num_frames)
        mxu_flops = sum(2 * ws.shape[0] * ws.shape[1] * kx
                        for ws, _rs, _no in per_res)
        models["sync-stencil"] = dict(
            mxu=mxu_flops, vpu=9 * g.num_freqs * g.num_times,
            bytes=grid_b + score_b)

    out = {"batch": BATCH, "chunk": CHUNK, "fs": FS, "reps": REPS,
           "method": ("cumulative fused prefixes of the split-BP "
                      "pipeline; stage = difference; demonstrated "
                      "bounds measured in-run"),
           "pipeline": "decode_slots (chunked front half, flat BP tail)",
           "dft_precision": _DFT_PRECISION.name,
           "bp_precision": ld._BP_PRECISION.name,
           "sync_dtype": "bfloat16" if sync_b == 2 else "float32",
           "sync_backend": __import__(
               "ft8_demodulator_tpu.ops.sync",
               fromlist=["_sync_backend"])._sync_backend(),
           "dft_backend": _dft_backend(),
           "dft_backend_note": (
               "under the pallas DFT backend the spectra prefix IS the "
               "fused mag kernel (spectra never materialise), so the "
               "waterfall-epilogue row reads ~0 and the retile+block-DFT "
               "row carries the whole fused pair"
               if _dft_backend() == "pallas" else ""),
           "hbm_gbs": _HBM_GBS / 1e9, "mxu_tflops": _MXU_PEAK / 1e12,
           "vpu_tflops": _VPU_PEAK / 1e12, "stages": {},
           "demonstrated_ideals": {
               k_: {"us_per_slot": round(v_["us"], 2), "how": v_["how"]}
               for k_, v_ in demonstrated.items()}}

    prev = 0.0
    for (name, _), t in zip(prefixes, times):
        stage_t = max(t - prev, 1e-9)
        prev = t
        m = models[name]
        mxu_t = m["mxu"] / _MXU_PEAK
        vpu_t = m["vpu"] / _VPU_PEAK
        hbm_t = m["bytes"] / _HBM_GBS
        bound = max(mxu_t, vpu_t, hbm_t)
        binds = ("MXU" if bound == mxu_t and m["mxu"] else
                 "VPU" if bound == vpu_t and m["vpu"] else "HBM")
        row = {
            "us_per_slot": round(stage_t * 1e6, 2),
            "model_bound_us": round(bound * 1e6, 2),
            "pct_of_model": round(100 * bound / stage_t, 1),
            "binds": binds,
            "hw_gflops": round(m["mxu"] / 1e9, 3),
            "vpu_gflops": round(m["vpu"] / 1e9, 3),
            "floor_mb": round(m["bytes"] / 1e6, 3),
        }
        if name in demonstrated:
            demo_us = demonstrated[name]["us"]
            # the stencil's standalone form pays an extra grid re-read;
            # its demonstrated floor is the in-pipeline stage itself
            demo_us = min(demo_us, stage_t * 1e6)
            row["demonstrated_us"] = round(demo_us, 2)
            row["pct_of_demonstrated"] = round(
                100 * demo_us / (stage_t * 1e6), 1)
        out["stages"][name] = row
        print(name, row, flush=True)

    out["full_decode_us_per_slot"] = round(times[-1] * 1e6, 2)
    out["slots_per_sec"] = round(1.0 / times[-1], 1)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "roofline_v5e.json")
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        if "deep" in prior:          # keep a previously measured section
            out["deep"] = prior["deep"]
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("full decode:", out["full_decode_us_per_slot"], "us/slot =",
          out["slots_per_sec"], "slots/s", flush=True)


def deep():
    """DEEP-preset roofline rows (VERDICT r3 #8): cumulative prefixes of
    the mf_first production pipeline at osr 4x4 / K=40 / min_score=1 +
    OSD, with model bounds from the same formulas at the DEEP geometry
    (OSD/MF stages carry coarse models, labelled)."""
    from ft8_demodulator_tpu.utils.cache import setup
    setup()
    import jax
    import jax.numpy as jnp

    import ft8_demodulator_tpu.ops.ldpc_decode as ld
    from ft8_demodulator_tpu.demod.decode import decode_slot
    from ft8_demodulator_tpu.ops.llr import extract_llrs_matched_blocks
    from ft8_demodulator_tpu.ops.sync import (find_candidates_tf,
                                              search_grid, sync_scores_tf)
    from ft8_demodulator_tpu.ops.waterfall import (_block_spectrum,
                                                   _block_waterfall_tf,
                                                   _DFT_PRECISION,
                                                   waterfall_params)

    n = int(FS * SLOT_S)
    p = waterfall_params(FS, 4, 4)
    num_frames = p.num_frames(n)
    nb = num_frames + p.time_osr - 1
    kx = p.num_freq_bins + 2 * p.freq_osr
    g = search_grid(p.num_freq_bins, num_frames, p.time_osr, p.freq_osr)
    K_, MS = DEEP_K, DEEP_MIN_SCORE

    rng = np.random.default_rng(0)
    waves = jnp.asarray(rng.standard_normal(
        (DEEP_BATCH, n)).astype(np.float32) * 0.1)

    def _r(x):
        # FULL-array reduction: a 128-lane probe lets XLA dead-code-slice
        # the producing matmul to the consumed columns (this fabricated a
        # 0.39 us/slot "demonstrated DFT" row — and an 11.7 us one in
        # round 4).  XLA fuses the reduce into the producer, so the extra
        # cost is ~one output read at worst.
        return jnp.sum(x.astype(jnp.float32))

    # round-5 production front: the dual-output Pallas kernel (Hann dB
    # grid + boxcar MF power grid in one pass) + grid-gathered MF LLRs —
    # the prefixes measure the SHIPPING pipeline, not the retired
    # spectra path (each chunk is 8 wide, the measured-best width)
    from ft8_demodulator_tpu.ops.llr import extract_llrs_matched_grid
    from ft8_demodulator_tpu.ops.waterfall_pallas import \
        block_waterfall_mf_tf_fused_batch

    def chunked_grids(consume):
        @jax.jit
        def run(x):
            def one(wc):
                mags, boxes = block_waterfall_mf_tf_fused_batch(
                    wc, p, num_frames)
                return jnp.sum(jax.vmap(consume)(mags, boxes))
            return jnp.sum(jax.lax.map(one, x.reshape(-1, 8, x.shape[-1])))
        return run

    def pre_kernel(m, bx):
        return _r(m) + _r(bx)

    def pre_scores(m, bx):
        return _r(sync_scores_tf(m, g))

    def pre_cands(m, bx):
        t, f, v, ok = find_candidates_tf(sync_scores_tf(m, g), g, K_, MS)
        return _r(t) + _r(f) + _r(v)

    def pre_mf_llrs(m, bx):
        t, f, v, ok = find_candidates_tf(sync_scores_tf(m, g), g, K_, MS)
        return _r(extract_llrs_matched_grid(bx, t, f, g.time_osr,
                                            g.freq_osr))

    def full_batch(waves):
        # the PRODUCTION deep form: decode_slots' flat split-BP tail.
        # (A vmapped decode_slot would batch the gated OSD's while_loop
        # per-lane — a shape the compacted gating is not built for and
        # nothing ships.)
        from ft8_demodulator_tpu.demod.decode import decode_slots
        # chunk 8: measured best front width for the DEEP grid kernel
        # (190.6 / 231.5 / 280.9 us/slot at chunk 8 / 16 / 32, v5e r5)
        res = decode_slots(waves, p, num_frames, max_candidates=K_,
                           min_score=MS, max_iterations=BP_ITERS,
                           use_osd=True, mf_first=True, chunk=8,
                           bp_chunk=256)
        return _r(res.success) + _r(res.payload)

    def chunked(fn):
        @jax.jit
        def run(x):
            return jnp.sum(jax.lax.map(
                jax.vmap(fn), x.reshape(-1, CHUNK, x.shape[-1])))
        return run

    lat = _sync_latency()
    print(f"sync latency: {lat * 1e3:.2f} ms", flush=True)

    def timeit(fn, *args, per=DEEP_BATCH):
        float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out_ = fn(*args)
        float(out_)
        return (time.perf_counter() - t0 - lat) / REPS / per

    prefixes = [("fused-grid+box-kernel", chunked_grids(pre_kernel)),
                ("sync-stencil", chunked_grids(pre_scores)),
                ("top-k-select", chunked_grids(pre_cands)),
                ("mf-llr-from-grid", chunked_grids(pre_mf_llrs)),
                ("bp+osd+crc", jax.jit(full_batch))]
    times = []
    for name, fn in prefixes:
        times.append(timeit(fn, waves))
        print(f"DEEP prefix through {name}: {times[-1] * 1e6:8.2f} "
              "us/slot", flush=True)

    passes = {"HIGHEST": 6, "HIGH": 3, "DEFAULT": 1}
    dft_p = passes[_DFT_PRECISION.name]
    bp_p = passes[ld._BP_PRECISION.name]
    f32 = 4
    grid_b = p.num_freq_bins * num_frames * f32
    score_b = g.num_freqs * g.num_times * f32
    tau = p.time_osr
    # boxcar grid bytes: (num_frames + 2*(tau-1)) x nbins f32 written by
    # the kernel and read back by the LLR routing matmuls
    box_b = (num_frames + 2 * (tau - 1)) * p.num_freq_bins * f32
    models = {
        "fused-grid+box-kernel": dict(
            # DFT matmuls + both epilogues in VMEM; HBM: audio in, both
            # grids out (spectra never materialise)
            mxu=dft_p * 2 * (2 * nb * p.hop * kx),
            vpu=(2 * tau * 6 + 12 + 3 + 10) * num_frames * kx,
            bytes=n * f32 + nb * p.hop * 2 + grid_b + box_b,
            note="dual-output Pallas kernel: Hann dB grid + boxcar MF "
                 "power grid in one pass (round 5)"),
        "sync-stencil": dict(
            mxu=0, vpu=84 * 4 * g.num_freqs * g.num_times,
            bytes=grid_b + score_b, note=""),
        "top-k-select": dict(
            mxu=0, vpu=2 * g.num_freqs * g.num_times, bytes=score_b,
            note=""),
        "mf-llr-from-grid": dict(
            # two one-hot routing matmuls over the boxcar grid
            mxu=2 * (K_ * 8) * p.num_freq_bins
                * (num_frames + 2 * (tau - 1)),
            vpu=K_ * 174 * 12,
            bytes=box_b + K_ * 174 * f32,
            note="grid-gathered MF LLRs (extract_llrs_matched_grid)"),
        "bp+osd+crc": dict(
            mxu=BP_ITERS * K_ * (bp_p * 2 * (2 * 522 * 581)
                                 + 2 * 174 * 83),
            vpu=BP_ITERS * K_ * (581 + 522) * 12
                + K_ * 174 * 96 * 6 * 8,
            bytes=K_ * 174 * f32 * 4,
            note="coarse: BP at max iterations + packed GF(2) basis "
                 "reduction per candidate (round-5b pipeline: matmul "
                 "basis permute + static-schedule early-exit kernel + "
                 "pair-matrix order-2 tail)"),
    }

    # monotonicity repair: a prefix can measure FASTER than a shorter one
    # when the shorter prefix materialises an intermediate the fused
    # pipeline never writes (e.g. raw DEEP spectra consumed by a 128-lane
    # probe) — difference attribution is then meaningless for that pair,
    # so merge such stages into one fused row
    merged = []                      # list of ([names], prefix_time)
    for (name, _), t in zip(prefixes, times):
        if merged and t <= merged[-1][1]:
            merged[-1][0].append(name)
            merged[-1][1] = max(merged[-1][1], t)
        else:
            merged.append([[name], t])

    def _combine(names):
        m = dict(mxu=0, vpu=0, bytes=0, note="")
        notes = []
        for nm in names:
            for k2 in ("mxu", "vpu", "bytes"):
                m[k2] += models[nm][k2]
            if models[nm]["note"]:
                notes.append(models[nm]["note"])
        if len(names) > 1:
            notes.append("merged: the shorter prefix materialised an "
                         "intermediate the fused pipeline elides, so "
                         "per-stage differences are not attributable")
        m["note"] = "; ".join(notes)
        return m

    _HBM, _MXU, _VPU = _HBM_GBS, _MXU_PEAK, _VPU_PEAK
    rows = {}
    prev = 0.0
    for names, t in merged:
        stage_t = max(t - prev, 1e-9)
        prev = t
        m = _combine(names)
        bound = max(m["mxu"] / _MXU, m["vpu"] / _VPU, m["bytes"] / _HBM)
        binds = ("MXU" if bound == m["mxu"] / _MXU and m["mxu"] else
                 "VPU" if bound == m["vpu"] / _VPU and m["vpu"] else "HBM")
        label = "+".join(names)
        rows[label] = {
            "us_per_slot": round(stage_t * 1e6, 2),
            "model_bound_us": round(bound * 1e6, 2),
            "pct_of_model": round(100 * bound / stage_t, 1),
            "binds": binds,
            "model_note": m["note"],
        }
        print("DEEP", label, rows[label], flush=True)

    from ft8_demodulator_tpu.ops.sync import _sync_backend
    deep_out = {
        "preset": "DEEP_SEARCH (osr 4x4, K=40, min_score=1, OSD, "
                  "mf_first)",
        "batch": DEEP_BATCH, "chunk": CHUNK, "reps": REPS,
        "sync_backend": _sync_backend(),
        "stages": rows,
        "full_decode_us_per_slot": round(times[-1] * 1e6, 2),
        "slots_per_sec": round(1.0 / times[-1], 1),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "roofline_v5e.json")
    with open(path) as f:
        out = json.load(f)
    out["deep"] = deep_out
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("DEEP full:", deep_out["full_decode_us_per_slot"], "us/slot =",
          deep_out["slots_per_sec"], "slots/s", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--deep", action="store_true",
                    help="measure the DEEP-preset rows only (appends a "
                         "'deep' section to the committed JSON)")
    a = ap.parse_args()
    deep() if a.deep else main()
