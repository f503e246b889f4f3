"""Multi-process (multi-host analogue) runtime test (VERDICT r4 #7).

Everything else multi-device in the suite is single-process (the virtual
8-CPU mesh).  This launches 2 LOCAL PROCESSES x 4 CPU devices each via
`jax.distributed.initialize` (gloo collectives — the CPU stand-in for
DCN-across-hosts; SURVEY §5 "standard JAX multi-host runtime") and runs
one data+spatial-sharded train step plus an orbax checkpoint round trip
where each process holds only its addressable shards.

Gate: the 2-process loss matches a single-process 8-device run of the
SAME program on the SAME deterministic global batch, and the checkpoint
restores bit-identically on both processes.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    return env


def _launch(out, num_processes, devices_per_process, port, timeout=900):
    procs = []
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER,
             "--process-id", str(pid),
             "--num-processes", str(num_processes),
             "--coordinator", "127.0.0.1:{}".format(port),
             "--devices-per-process", str(devices_per_process),
             "--out", out],
            env=_clean_env(), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    results = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=timeout)
        assert p.returncode == 0, (stdout[-2000:], stderr[-2000:])
        line = [ln for ln in stdout.splitlines()
                if ln.startswith("{")][-1]
        results.append(json.loads(line))
    return results


@pytest.mark.slow
def test_two_process_step_and_checkpoint_roundtrip(tmp_path):
    two = _launch(str(tmp_path / "ckpt2"), num_processes=2,
                  devices_per_process=4, port=_free_port())
    one = _launch(str(tmp_path / "ckpt1"), num_processes=1,
                  devices_per_process=8, port=_free_port())

    assert [r["n_global_devices"] for r in two] == [8, 8]
    assert [r["n_local_devices"] for r in two] == [4, 4]
    assert all(r["mesh"] == {"data": 4, "spatial": 2, "model": 1}
               for r in two + one)
    # the checkpoint round-trips with process-local shards on BOTH
    # processes, and the persisted offsets contract survives
    assert all(r["restore_ok"] for r in two + one)
    assert all(r["meta_offsets"] for r in two + one)
    # both processes observe the same (replicated) loss...
    assert two[0]["loss"] == pytest.approx(two[1]["loss"], rel=1e-6)
    # ...and the multi-process step computes the same math as the
    # single-process run of the same program (gloo collectives across
    # processes vs intra-process = same GSPMD program, same reduction
    # tree; f32 tolerance for any residual reduction-order difference)
    assert two[0]["loss"] == pytest.approx(one[0]["loss"], rel=2e-5)
