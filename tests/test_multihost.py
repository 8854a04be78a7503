"""Multi-process ``jax.distributed`` validation (SURVEY.md section 2.6 comm
backend row): two real OS processes, 4 virtual CPU devices each, one global
("ch", "time") mesh spanning both — the same bootstrap + collective path a
multi-host pod uses, minus the DCN transport.

The workers run the full distributed flagship step and assert exact decisions;
this test only orchestrates them and checks both exited cleanly.
"""

import os
import socket
import subprocess
import sys
import pytest

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(num_procs: int, ch: int, time: int, devs: int) -> None:
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coordinator = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(num_procs), str(pid),
             str(ch), str(time), str(devs)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for pid in range(num_procs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: OK" in out, out


def test_two_process_distributed_roundtrip():
    _run_workers(num_procs=2, ch=2, time=4, devs=4)


@pytest.mark.slow
def test_four_process_cross_boundary_halos():
    """VERDICT r2 item 4: 2x2 ("ch","time") mesh over FOUR processes with ONE
    device each — every time-axis ppermute halo hop crosses a process
    boundary. The worker asserts bitwise FIR-halo parity per local shard plus
    the full distributed flagship step."""
    _run_workers(num_procs=4, ch=2, time=2, devs=1)
