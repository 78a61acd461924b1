"""Tensor-parallel (frequency-sharded) single-slot decode: perf note.

VERDICT r1 item 2 asks for a measured single-chip-vs-sharded comparison of
`decode_slot_tp`.  Only ONE real TPU chip is reachable in this image, so
the measurement splits into the three quantities that together bound the
sharded decode's cost on a real slice:

1. real-chip single-device DEEP slot time (`decode_slot`, the thing TP
   divides),
2. the TP code path's structural overhead at n_f = 1 on the same chip
   (band-sliced DFT + scatter/psum lowered against one device — every
   cost EXCEPT real collectives),
3. the collective volume per slot (exact byte count of the psum'd
   arrays), which at ICI bandwidth prices the n_f > 1 communication that
   cannot be measured here, plus an n_f = 8 virtual-CPU-mesh run that
   proves the sharded program compiles and executes the full collective
   schedule (1 physical core -> timing there measures overhead shape,
   not speedup).

Usage: python benchmarks/tp_note.py [--devices 8] [--reps 20]
Prints one JSON object per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ft8_demodulator_tpu.utils.cache import setup as _cache_setup  # noqa: E402

_cache_setup()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="fake an N-device CPU mesh (0 = real device, "
                    "n_f=1 structural-overhead measurement)")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--fs", type=float, default=10500.0)
    ap.add_argument("--cands", type=int, default=40)
    args = ap.parse_args()

    import jax
    if args.devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    import jax.numpy as jnp

    from ft8_demodulator_tpu.demod.decode import decode_slot
    from ft8_demodulator_tpu.ops.gfsk import ft8_passband
    from ft8_demodulator_tpu.ops.waterfall import waterfall_params
    from ft8_demodulator_tpu.parallel.mesh import make_freq_mesh
    from ft8_demodulator_tpu.parallel.tensor import decode_slot_tp

    fs = args.fs
    k = args.cands
    # DEEP geometry: osr 4x4 at 10.5 kHz — the slot that motivates TP
    p = waterfall_params(fs, bins_per_tone=4, steps_per_symbol=4)
    n = int(fs * 15)
    nf = p.num_frames(n)

    rng = np.random.default_rng(7)
    audio = (rng.standard_normal(n) * 0.02).astype(np.float32)
    payload = np.array([0x1C, 0x3F, 0x8A, 0x6A, 0xE2, 0x07, 0xA1, 0xE3,
                        0x94, 0x50], np.uint8)
    w = np.asarray(ft8_passband(payload, fs, 900.0, 0.0))
    audio[int(0.7 * fs): int(0.7 * fs) + len(w)] += w * 0.2
    wave = jnp.asarray(audio)

    mesh_sizes = ([1] if not args.devices
                  else sorted({1, 2, args.devices} - {0}))

    def run(fn, *a, **kw):
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a, **kw)
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.reps, out

    t_single, ref = run(decode_slot, wave, p, nf, max_candidates=k,
                        min_score=10.0)
    n_ok = int(np.asarray(ref.success).sum())
    print(json.dumps({"config": "decode_slot(single)",
                      "fs": fs, "osr": "4x4", "max_candidates": k,
                      "ms_per_slot": round(t_single * 1e3, 3),
                      "decodes": n_ok}))

    for n_f in mesh_sizes:
        if args.devices and n_f > args.devices:
            continue
        mesh = make_freq_mesh(n_f)
        t_tp, out = run(decode_slot_tp, wave, p, nf, mesh,
                        max_candidates=k, min_score=10.0)
        # decoded-set equality: row ORDER of near-tie noise candidates is
        # permuted by the band-sliced matmul's round-off, so compare the
        # (payload, t, f) set of successful decodes (the tests'
        # bit-identical claim pins row order on tie-free scenarios)
        def decoded_set(r):
            return {(bytes(np.asarray(r.payload)[i]),
                     int(np.asarray(r.abs_time)[i]),
                     int(np.asarray(r.abs_freq)[i]))
                    for i in np.flatnonzero(np.asarray(r.success))}
        same = decoded_set(out) == decoded_set(ref)
        # exact collective volume per slot (see parallel/tensor.py):
        # 3 scatter+psum'd (n_f, K) candidate arrays + one (K, 174) LLR psum
        comm_bytes = 3 * n_f * k * 4 + k * 174 * 4
        print(json.dumps({"config": f"decode_slot_tp(n_f={n_f})",
                          "ms_per_slot": round(t_tp * 1e3, 3),
                          "overhead_vs_single": round(t_tp / t_single, 3),
                          "decoded_set_identical": same,
                          "psum_bytes_per_slot": comm_bytes}))


if __name__ == "__main__":
    main()
