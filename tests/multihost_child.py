"""Child process for the 2-process multi-host smoke test (test_multihost.py).

Run as: python multihost_child.py <process_id> <coordinator_port>
Prints the per-step losses; the parent asserts cross-process agreement and
parity with a single-process run over the same global batches.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402

from multihost_common import run_steps  # noqa: E402

losses = run_steps(shard_by_process=True)
print("LOSSES", pid, " ".join(f"{l:.6f}" for l in losses), flush=True)
assert all(np.isfinite(losses)), losses
