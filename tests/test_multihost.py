"""Two-process multi-host smoke test (SURVEY.md §5.8: the extension beyond
the reference's single-host pmap).

Spawns two Python processes that jax.distributed.initialize against a local
coordinator (4 CPU devices each -> one global 8-device mesh), train a tiny
model with per-process batch sharding, and must produce the SAME losses as a
single-process run over the same global batches.
"""

import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_training_matches_single_process():
    here = os.path.dirname(os.path.abspath(__file__))
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own device count
    # the child needs both the tests dir (multihost_common) and the repo root
    # (gecco_tpu, when not pip-installed) importable
    repo_root = os.path.dirname(here)
    env["PYTHONPATH"] = (
        here + os.pathsep + repo_root + os.pathsep + env.get("PYTHONPATH", "")
    )

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(here, "multihost_child.py"), str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=here,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"

    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSSES"):
                _, pid, *vals = line.split()
                losses[int(pid)] = np.array([float(v) for v in vals])
    assert set(losses) == {0, 1}, f"missing loss lines:\n{outs}"
    # both processes observe the identical (globally-reduced) loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # and it matches a single-process run over the same global batches
    from multihost_common import run_steps

    ref = np.array(run_steps(shard_by_process=False))
    np.testing.assert_allclose(losses[0], ref, rtol=1e-4)
