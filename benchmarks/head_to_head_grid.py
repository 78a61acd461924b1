"""Full-grid head-to-head sensitivity certificate vs the LIVE reference.

Runs the reference decoder (/root/reference/src/ft8_tools/ft8_demodulator/
ft8_decode.py:288) and this framework's ``decode_ft8_message`` on IDENTICAL
noisy waveforms over the reference's own benchmark grid
(``src/tests/demodulator/test_ft8_standard.py:70-76``): fs 2000..10500 Hz
step 500, SNR points in a window around the sensitivity cliff, N trials per
point.  The reference sweeps SNR -21..-10 step 0.2 with 20 trials and stops
at the first >=50 % point; decoding is all-or-nothing within ~2 dB, so a
3-point window centred on the predicted cliff (our measured -13.5 dB
full-band 50 % point at fs 2 kHz, shifted by 10*log10(fs/2000) because the
harness defines SNR over the full fs/2 band) captures the whole transition.

Differences from the reference harness, both deliberate:
  * f0=300 Hz instead of f0=0 (test_ft8_standard.py:92 passes f0=0, which
    parks half the GFSK spectrum at DC; a realistic tone keeps the
    comparison meaningful — both decoders get the same placement).
  * success = decoded payload matches the transmitted one (first 9 bytes +
    masked byte 9), not ``len(results) > 0`` (test_ft8_standard.py:66-69
    counts any decode, even a false one).  The any-decode count is also
    recorded.

Results stream incrementally to benchmarks/results/head_to_head_grid.json
after every (fs, snr) point so a partial run is still an artifact.  Points
are visited centre-SNR-first across all fs, then +1 dB, then -1 dB, so the
full fs range is covered early.

Usage:  python benchmarks/head_to_head_grid.py [--trials 10] [--out PATH]

--harden N (VERDICT r4 weak #4): re-visits the committed grid's CLIFF
rows — margin <= 2 decodes, not unanimous — and accumulates fresh
independent trials until each has N total, so no "ours >= reference"
conclusion rests on n < 20.  New trials use a fresh deterministic seed
stream (zlib.crc32-based, disjoint from any prior run's salted-hash
stream); counts add because trials are i.i.d. waveforms under the
identical protocol.  Results stream to the JSON after every row.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")  # the reference saves a PNG inside its decode path

_REF = "/root/reference/src"

FS_GRID = list(range(2000, 10501, 500))
CLIFF_FS2K = -13.5  # measured 50 % point at fs 2 kHz (benchmarks/snr_curve.py)


def predicted_cliff(fs: float) -> float:
    """Full-band SNR of the 50 % yield point at sample rate ``fs``.

    The harness's SNR is over the full fs/2 band; the in-FT8-bandwidth SNR
    at the cliff is fs-independent, so the full-band number shifts by
    -10*log10(fs/2000) relative to the measured fs-2kHz point.
    """
    return CLIFF_FS2K - 10.0 * np.log10(fs / 2000.0)


def payload_key(raw) -> bytes:
    b = bytes(bytearray(raw)[:10])
    return b[:9] + bytes([b[9] & 0xF8]) if len(b) >= 10 else b


def _run_trials(fs, snr, n, rng, our_decode, ref_decode, ft8_passband,
                workdir):
    """n fresh trials at one grid point; returns (ours, ref, ours_any,
    ref_any) counts."""
    ours_ok = ref_ok = ref_any = ours_any = 0
    for _ in range(n):
        pl = rng.integers(0, 256, 10, dtype=np.uint8)
        pl[9] &= 0xF8
        w = np.asarray(ft8_passband(pl, float(fs), 300.0, 0.0),
                       dtype=np.float64)
        sp = float(np.mean(w ** 2))
        sig = w + rng.standard_normal(len(w)) * np.sqrt(
            sp / 10 ** (snr / 10))
        want = payload_key(pl)

        rows = our_decode(sig.astype(np.float32), float(fs),
                          min_score=1.0, max_candidates=20,
                          max_iterations=20)
        ours_any += bool(rows)
        ours_ok += any(payload_key(r.message.payload) == want
                       for r in rows)

        cwd = os.getcwd()
        os.chdir(workdir)
        try:
            ref_rows = ref_decode(wave_data=sig, sample_rate=fs,
                                  bins_per_tone=2, steps_per_symbol=2,
                                  max_candidates=20, min_score=1,
                                  max_iterations=20)
        finally:
            os.chdir(cwd)
        ref_any += bool(ref_rows)
        ref_ok += any(payload_key(m.payload) == want
                      for m, *_ in ref_rows)
    return ours_ok, ref_ok, ours_any, ref_any


def _is_cliff(p) -> bool:
    """A near-tie decided by small counts: margin <= 2 and not unanimous."""
    o, r, n = p["ours"], p["ref"], p["trials"]
    return abs(o - r) <= 2 and not (o == r == 0) and not (o == r == n)


def harden(args, our_decode, ref_decode, ft8_passband) -> None:
    import zlib

    with open(args.out) as f:
        results = json.load(f)
    cliff = [p for p in results["points"] if _is_cliff(p)
             and p["trials"] < args.harden]
    print(f"hardening {len(cliff)} cliff rows to {args.harden} trials",
          flush=True)
    workdir = tempfile.mkdtemp(prefix="h2h_")
    t_start = time.time()
    for i, p in enumerate(cliff):
        extra = args.harden - p["trials"]
        seed = zlib.crc32(f"harden:{p['fs']}:{p['snr_db']}:"
                          f"{p['trials']}".encode())
        rng = np.random.default_rng(seed)
        t0 = time.time()
        o, r, oa, ra = _run_trials(p["fs"], p["snr_db"], extra, rng,
                                   our_decode, ref_decode, ft8_passband,
                                   workdir)
        p["ours"] += o
        p["ref"] += r
        p["ours_any"] += oa
        p["ref_any"] += ra
        p["trials"] += extra
        p["secs"] = round(p.get("secs", 0.0) + time.time() - t0, 1)
        p["hardened"] = True
        results["ours_equal_or_better_everywhere"] = all(
            q["ours"] >= q["ref"] for q in results["points"])
        results["hardened_trials"] = args.harden
        results["harden_note"] = (
            "cliff rows (margin <= 2, non-unanimous) re-accumulated with "
            "fresh independent trials; counts are sums over all passes")
        results["elapsed_secs"] = round(
            results.get("elapsed_secs", 0.0) + time.time() - t_start, 1)
        t_start = time.time()
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1)
        os.replace(tmp, args.out)
        print(f"[{i + 1}/{len(cliff)}] fs={p['fs']} snr={p['snr_db']:+.1f}"
              f" ours={p['ours']}/{p['trials']} ref={p['ref']}/{p['trials']}"
              f" ({p['secs']}s total)", flush=True)
    print("harden done:", "EQUAL-OR-BETTER everywhere"
          if results["ours_equal_or_better_everywhere"] else
          "reference won at least one point", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results", "head_to_head_grid.json"))
    ap.add_argument("--offsets", type=float, nargs="*", default=[0.0, 1.0, -1.0])
    ap.add_argument("--harden", type=int, default=0,
                    help="re-run committed cliff rows, accumulating fresh "
                         "trials to this total per point")
    args = ap.parse_args()

    sys.path.insert(0, _REF)
    from ft8_tools.ft8_demodulator.ft8_decode import \
        decode_ft8_message as ref_decode

    import jax
    jax.config.update("jax_platforms", "cpu")

    from ft8_demodulator_tpu.demod import decode_ft8_message as our_decode
    from ft8_demodulator_tpu.ops.gfsk import ft8_passband

    if args.harden:
        return harden(args, our_decode, ref_decode, ft8_passband)

    points = []  # (fs, snr) in coverage-first order
    for off in args.offsets:
        for fs in FS_GRID:
            snr = round(predicted_cliff(fs) + off, 1)
            points.append((fs, snr))

    results = {
        "grid": "test_ft8_standard.py fs 2000-10500 step 500",
        "f0_hz": 300.0,
        "trials_per_point": args.trials,
        "success": "decoded payload == transmitted (9 bytes + masked byte9)",
        "ref_params": dict(bins_per_tone=2, steps_per_symbol=2,
                           max_candidates=20, min_score=1, max_iterations=20),
        "our_params": "same grid/score params, framework defaults otherwise "
                      "(no OSD/MF/multipass retries — like-for-like)",
        "points": [],
    }

    workdir = tempfile.mkdtemp(prefix="h2h_")
    t_start = time.time()
    for idx, (fs, snr) in enumerate(points):
        rng = np.random.default_rng(hash((fs, round(snr * 10))) & 0xFFFFFFFF)
        t0 = time.time()
        ours_ok, ref_ok, ours_any, ref_any = _run_trials(
            fs, snr, args.trials, rng, our_decode, ref_decode,
            ft8_passband, workdir)

        point = {"fs": fs, "snr_db": round(snr, 1),
                 "ours": ours_ok, "ref": ref_ok,
                 "ours_any": ours_any, "ref_any": ref_any,
                 "trials": args.trials,
                 "secs": round(time.time() - t0, 1)}
        results["points"].append(point)
        results["elapsed_secs"] = round(time.time() - t_start, 1)
        results["points_done"] = idx + 1
        results["points_total"] = len(points)
        eq_or_better = all(p["ours"] >= p["ref"] for p in results["points"])
        results["ours_equal_or_better_everywhere"] = eq_or_better
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1)
        os.replace(tmp, args.out)
        print(f"[{idx + 1}/{len(points)}] fs={fs} snr={snr:+.1f} "
              f"ours={ours_ok}/{args.trials} ref={ref_ok}/{args.trials} "
              f"({point['secs']}s)", flush=True)

    print("done:", "EQUAL-OR-BETTER everywhere"
          if results["ours_equal_or_better_everywhere"] else
          "reference won at least one point", flush=True)


if __name__ == "__main__":
    main()
