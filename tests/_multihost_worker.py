"""Worker for the 2-process multi-host test (see test_multihost.py).

Each process owns 4 virtual CPU devices of an 8-device (1 channel x 8
stream) mesh, decodes the boundary-straddle stream scenario, and prints one
ROW line per decode — the parent asserts both processes print identical,
correct rows (i.e. results are host-addressable everywhere, not just on
process 0).

Usage: python _multihost_worker.py <coordinator_address> <process_id>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))

import os  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from ft8_demodulator_tpu.ops.gfsk import ft8_passband  # noqa: E402
from ft8_demodulator_tpu.parallel.mesh import make_mesh  # noqa: E402
from ft8_demodulator_tpu.parallel.streaming import decode_stream  # noqa: E402

PAYLOAD_A = np.array(
    [0x1C, 0x3F, 0x8A, 0x6A, 0xE2, 0x07, 0xA1, 0xE3, 0x94, 0x50], np.uint8)
PAYLOAD_B = np.array(
    [0xAA, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08, 0x09, 0xF8], np.uint8)
FS = 2000.0


def main() -> None:
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8
    assert len(jax.local_devices()) == 4

    rng = np.random.default_rng(1234)
    n = int(FS * 120)
    stream = (rng.standard_normal(n) * 0.02).astype(np.float32)
    for payload, t, f0 in [(PAYLOAD_A, 2.0, 400.0),
                           (PAYLOAD_B, 23.0, 700.0),   # straddles 30 s edge
                           (PAYLOAD_A, 61.0, 500.0)]:
        w = np.asarray(ft8_passband(payload, FS, f0, 0.0))
        i = int(t * FS)
        stream[i: i + len(w)] += w

    mesh = make_mesh(stream=8, channel=1)
    results = decode_stream(stream, FS, mesh=mesh, min_score=4.0)
    for r in results:
        print(f"ROW {r.message.payload.hex()} {round(r.time_sec)} "
              f"{round(r.freq_hz)}", flush=True)

    # tensor parallelism across BOTH processes: one slot's frequency grid
    # sharded over all 8 global devices (4 per process)
    import jax.numpy as jnp

    from ft8_demodulator_tpu.ops.waterfall import waterfall_params
    from ft8_demodulator_tpu.parallel.mesh import make_freq_mesh
    from ft8_demodulator_tpu.parallel.tensor import decode_slot_tp

    p = waterfall_params(FS, 2, 2)
    slot = stream[: int(15 * FS)]
    res = decode_slot_tp(jnp.asarray(slot), p, p.num_frames(len(slot)),
                         make_freq_mesh(8), min_score=4.0)
    got = {bytes(np.asarray(row).tolist())
           for row, ok in zip(res.payload, np.asarray(res.success)) if ok}
    for pay in sorted(got):
        print(f"TPROW {pay.hex()}", flush=True)

    print(f"DONE process={jax.process_index()} rows={len(results)}",
          flush=True)


if __name__ == "__main__":
    main()
