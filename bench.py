"""Flagship benchmark: batched single-chip FT8 slot decode throughput.

Config 1/3 of BASELINE.json: batches of 15 s @ 12 kHz slots, osr 2x2,
20 candidates, 20 BP iterations — the full pipeline (STFT -> sync stencil ->
top-k -> LLR -> LDPC BP -> CRC) as one jitted program, vmapped over the
batch.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the speedup over the reference's pure-Python decoder on the
identical workload: 11.71 s per slot, measured in this image on 2026-08-16
(src/ft8_tools/ft8_demodulator/ft8_decode.py decode_ft8_message, fs=12 kHz,
15 s slot, osr 2x2, max_candidates=20, min_score=10, max_iterations=20 —
the reference has no published wall-clock numbers of its own).
"""

from __future__ import annotations

import json
import time

import numpy as np

def _cache():
    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ft8_demodulator_tpu.utils.cache import setup
    setup()


_cache()

REFERENCE_SECONDS_PER_SLOT = 11.71  # measured; see module docstring

FS = 12000.0
SLOT_S = 15.0
# batch 1024 amortises per-launch dispatch on the tunneled backend (256:
# 9,282 / 512: 9,794 / 1024: 10,099 / 2048: 10,245 slots/s — diminishing
# past 1024); chunks of 16 inside the jit hit XLA's best fusion regime
BATCH = int(__import__("os").environ.get("FT8_BENCH_BATCH", "1024"))
CHUNK = int(__import__("os").environ.get("FT8_BENCH_CHUNK", "16"))
BP_CHUNK = int(__import__("os").environ.get("FT8_BENCH_BP_CHUNK", "256"))
if BATCH % CHUNK:
    raise SystemExit(
        f"FT8_BENCH_BATCH ({BATCH}) must be a multiple of "
        f"FT8_BENCH_CHUNK ({CHUNK}): the batch is decoded as "
        f"BATCH/CHUNK vmap-CHUNK chunks inside one jit")
# 30 reps: the end-of-loop host fetch costs one tunnel round trip
# (measured 1-30 ms depending on session conditions), which divides
# across REPS*BATCH as a hidden per-slot offset — 2.8 us/slot at 10
# reps under a 29 ms tunnel, ~0.9 at 30.  The JSON carries the
# measured latency and a corrected rate alongside the raw protocol
# number (round-5 measurement-hygiene finding; see DESIGN_NOTES).
REPS = 30
MAX_CANDIDATES = 20


def _make_batch(rng):
    """Synthesise BATCH noisy slots, each holding one FT8 signal at 0 dB."""
    import jax
    import jax.numpy as jnp

    from ft8_demodulator_tpu.ops.gfsk import _baseband_complex
    from ft8_demodulator_tpu.protocol import constants as C
    from ft8_demodulator_tpu.protocol.encode import encode_tones

    n = int(FS * SLOT_S)
    sps = int(C.SYMBOL_PERIOD_S * FS)
    payloads = rng.integers(0, 256, size=(BATCH, 10), dtype=np.uint8)
    payloads[:, 9] &= 0xF8

    @jax.jit
    def synth(payloads, noise, f0s):
        tones = encode_tones(payloads)
        waves = jax.vmap(
            lambda t, f0: jnp.real(_baseband_complex(t, sps, FS, f0))
        )(tones, f0s)
        sig = jnp.zeros((BATCH, n), jnp.float32)
        sig = sig.at[:, : waves.shape[1]].set(waves)
        power = jnp.mean(waves ** 2, axis=1, keepdims=True)
        return sig + noise * jnp.sqrt(power)

    noise = jnp.asarray(rng.standard_normal((BATCH, n)).astype(np.float32))
    f0s = jnp.asarray(
        (500.0 + 100.0 * rng.integers(0, 40, BATCH)).astype(np.float32))
    return synth(jnp.asarray(payloads), noise, f0s), payloads


def _flop_model(p, num_frames: int, k: int, bp_iters: int) -> dict:
    """Model FLOPs per slot, by stage (VERDICT r1 weak #1: MFU accounting).

    "model" counts 2mnk per matmul and ~1 flop per vector lane-op; "hw"
    additionally multiplies each MXU matmul by its precision pass count on
    v5e (HIGH = bf16x3 = 3 passes, HIGHEST = 6) — the number the MXU
    actually executes, which is what utilisation is measured against.
    """
    from ft8_demodulator_tpu.ops.sync import search_grid

    phi, tau = p.freq_osr, p.time_osr
    kx = p.num_freq_bins + 2 * phi
    nb = num_frames + tau - 1
    g = search_grid(p.num_freq_bins, num_frames, tau, phi)

    # stage 1: block-DFT (cos+sin matmuls, HIGH precision)
    dft = 2 * (2 * nb * p.hop * kx)
    # stage 2: phase combine + hann + |.|^2 + log10 (VPU)
    wf_vpu = (tau * 6 + 12 + 3 + 10) * num_frames * kx
    # stage 3: sync stencil, ~84 masked (cell, comparison) terms x mul+add
    sync = 84 * 4 * g.num_freqs * g.num_times
    # stage 4: candidate select (row max + small top-k)
    select = 2 * g.num_freqs * g.num_times
    # stage 5: LLR one-hot routing matmul (K*8, F) @ (F, T), HIGH
    llr = 2 * (k * 8) * p.num_freq_bins * num_frames
    # stage 6: BP — two (522/581) routing matmuls (HIGH) + parity check
    # (HIGHEST) per iteration per candidate; upper bound (early exit)
    bp_route = bp_iters * k * 2 * (2 * 522 * 581)
    bp_check = bp_iters * k * 2 * 174 * 83
    bp_vpu = bp_iters * k * (581 + 522) * 12

    model = dict(dft=dft, waterfall_vpu=wf_vpu, sync_stencil=sync,
                 select=select, llr_matmul=llr, bp_matmul=bp_route + bp_check,
                 bp_vpu=bp_vpu)
    # hardware passes follow the live precision settings (bf16 passes per
    # f32 matmul: DEFAULT=1, HIGH=3, HIGHEST=6); parity checks are HIGHEST
    from ft8_demodulator_tpu.ops.ldpc_decode import _BP_PRECISION
    from ft8_demodulator_tpu.ops.llr import _LLR_PRECISION
    from ft8_demodulator_tpu.ops.waterfall import _DFT_PRECISION
    np_ = {"DEFAULT": 1, "HIGH": 3, "HIGHEST": 6}
    dft_p = np_[_DFT_PRECISION.name]
    bp_p = np_[_BP_PRECISION.name]
    llr_p = np_[_LLR_PRECISION.name]
    # parity/CRC check matmuls run at DEFAULT since round 4 (0/1
    # operands are bf16-exact, integer dot products <= 77 in f32)
    mxu_hw = dft_p * dft + llr_p * llr + bp_p * bp_route + 1 * bp_check
    return {
        "stages": model,
        "total_model": sum(model.values()),
        "mxu_model": dft + llr + bp_route + bp_check,
        "mxu_hw": mxu_hw,
        "vpu_model": wf_vpu + sync + select + bp_vpu,
    }


# v5e peaks: 197 TFLOP/s bf16 MXU; VPU ~ 8x128x4 lanes x 2 flops x 0.94 GHz
_V5E_MXU_PEAK = 197e12
_V5E_VPU_PEAK = 7.7e12


def main() -> None:
    import os

    from ft8_demodulator_tpu.utils.cache import ensure_live_backend

    # a wedged axon tunnel hangs device init forever; probe with a
    # timeout and fall back to CPU so the bench always emits its JSON
    # line (the note below flags a fallback run)
    backend_note = ensure_live_backend()

    global BATCH, REPS
    if backend_note and "FT8_BENCH_BATCH" not in os.environ:
        # CPU fallback: batch 1024 x 10 reps takes ~15 min on this
        # image's single core — shrink so the (clearly labelled) line
        # still lands inside any reasonable harness timeout
        BATCH, REPS = 4 * CHUNK, 3

    import jax
    import jax.numpy as jnp

    from ft8_demodulator_tpu.demod.decode import decode_slots
    from ft8_demodulator_tpu.ops.waterfall import waterfall_params

    rng = np.random.default_rng(42)
    batch, payloads = _make_batch(rng)

    n = int(FS * SLOT_S)
    p = waterfall_params(FS, 2, 2)
    num_frames = p.num_frames(n)

    @jax.jit
    def decode_batch(waves):
        # decode_slots: the front half (STFT -> sync -> top-K -> LLR) runs
        # in vmap-CHUNK pieces (XLA's fusions for this pipeline are
        # markedly better at small widths: chunk 16 -> 113 us/slot,
        # 64 -> 136, flat 256 -> 165), while LDPC BP + CRC run once over
        # all BATCH*K candidate rows, where the routing matmuls sit much
        # closer to their MXU roofline (measured 81.7 -> 73.0 us/slot at
        # batch 256 on v5e).  One jit, one dispatch.
        return decode_slots(waves, p, num_frames,
                            max_candidates=MAX_CANDIDATES, min_score=10.0,
                            max_iterations=20, chunk=CHUNK,
                            bp_chunk=BP_CHUNK)

    def sink(res):
        """Force full device completion: reduce to a scalar and fetch it.

        (jax.block_until_ready on a result pytree has been observed to
        return early through the tunneled TPU backend; a host fetch of a
        reduction over the last output is unambiguous.)
        """
        return float(jnp.sum(res.success))

    # warmup / compile
    res = decode_batch(batch)
    sink(res)

    # per-sync tunnel latency (diagnostic; the timing loop below pays
    # exactly one of these at its final sink)
    tiny = jax.jit(lambda a: jnp.sum(a))
    float(tiny(batch[0, :128]))
    t_lat = time.perf_counter()
    for _ in range(20):
        float(tiny(batch[0, :128]))
    lat = (time.perf_counter() - t_lat) / 20

    # sanity: the batch must actually decode (guards against a benchmark
    # that got fast by decoding nothing)
    ok = np.asarray(res.success).any(axis=1)
    decoded = np.asarray(res.payload)
    n_correct = 0
    for b in range(BATCH):
        rows = decoded[b][np.asarray(res.success[b])]
        want = payloads[b].copy()
        want[9] &= 0xF8
        if any((row == want).all() for row in rows):
            n_correct += 1

    t0 = time.perf_counter()
    for _ in range(REPS):
        res = decode_batch(batch)
    sink(res)
    dt = time.perf_counter() - t0

    slots_per_sec = BATCH * REPS / dt
    cand_per_sec = slots_per_sec * MAX_CANDIDATES
    slots_corrected = BATCH * REPS / max(dt - lat, 1e-9)

    fm = _flop_model(p, num_frames, MAX_CANDIDATES, 20)
    achieved = fm["total_model"] * slots_per_sec
    mxu_hw = fm["mxu_hw"] * slots_per_sec
    vpu = fm["vpu_model"] * slots_per_sec
    extra = {"backend_note": backend_note} if backend_note else {}
    print(json.dumps({
        **extra,
        "metric": "candidate-decodes/sec/chip",
        "value": round(cand_per_sec, 2),
        "unit": "candidates/s",
        "vs_baseline": round(
            slots_per_sec * REFERENCE_SECONDS_PER_SLOT, 2),
        "slots_per_sec": round(slots_per_sec, 3),
        "sync_latency_ms": round(lat * 1e3, 2),
        "slots_per_sec_latency_corrected": round(slots_corrected, 3),
        "decode_yield": f"{n_correct}/{BATCH}",
        "device": str(jax.devices()[0]),
        # roofline accounting (BP counted at max iterations: upper bound)
        "model_gflop_per_slot": round(fm["total_model"] / 1e9, 3),
        "achieved_tflops": round(achieved / 1e12, 2),
        "mxu_util_pct": round(100.0 * mxu_hw / _V5E_MXU_PEAK, 2),
        "vpu_util_pct": round(100.0 * vpu / _V5E_VPU_PEAK, 2),
        "stage_gflop": {s: round(v / 1e9, 3)
                        for s, v in fm["stages"].items()},
    }))


if __name__ == "__main__":
    main()
