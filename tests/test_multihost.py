"""True multi-process (multi-host-shaped) decode test.

Spawns TWO separate Python processes joined via jax.distributed.initialize
(localhost coordinator, 4 virtual CPU devices each = 8 global), and has both
decode the boundary-straddle stream scenario over a 1x8 mesh.  Because the
sharded decoder all-gathers results on-device (parallel/streaming.py), BOTH
processes must be able to format the full result list from addressable data
— the exact failure mode of a host-side np.asarray on a non-replicated
global array on a real pod.
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).with_name("_multihost_worker.py")

EXPECTED = {
    "ROW 1c3f8a6ae207a1e39450 2 400",
    "ROW aa0203040506070809f8 23 700",
    "ROW 1c3f8a6ae207a1e39450 61 500",
}


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_decode():
    addr = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), addr, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err}"

    row_sets = [set(ln for ln in out.splitlines() if ln.startswith("ROW "))
                for _, out, _ in outs]
    # identical output on both processes, and exactly the expected decodes
    assert row_sets[0] == row_sets[1] == EXPECTED
    assert all("rows=3" in out for _, out, _ in outs)
    # tensor-parallel decode over the process-spanning 8-device freq mesh
    tp_sets = [set(ln for ln in out.splitlines() if ln.startswith("TPROW "))
               for _, out, _ in outs]
    assert tp_sets[0] == tp_sets[1]
    assert "TPROW 1c3f8a6ae207a1e39450" in tp_sets[0]
