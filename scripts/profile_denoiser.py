"""Profile the flagship denoiser on-device and itemize per-op time.

Runs a K-eval dependent denoise chain (the same program ``bench.py``'s
chain8 times) under ``jax.profiler.trace``, then parses the written xplane
with the tensorboard-profile converter and prints per-op device time
aggregated over one eval — the only honest per-kernel accounting on the
axon relay (CLAUDE.md: scan-chain wall-clock micro-benchmarks overstate
kernel cost by ~2 ms; ``block_until_ready`` doesn't block).

Usage: python scripts/profile_denoiser.py [--k-evals 8] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace_events_from_xplane(logdir: str):
    """All trace-viewer events from the xplane file under ``logdir``."""
    # NOTE: tensorboard_plugin_profile's converter is broken against this
    # env's protobuf/tensorflow (stale _pb2 stubs, missing pywrap symbol);
    # the standalone xprof package's converter works.
    from xprof.convert import raw_to_tool_data

    xplanes = glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.xplane.pb")
    )
    assert xplanes, f"no xplane under {logdir}"
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[0]], "trace_viewer", {}
    )
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
    return json.loads(data)["traceEvents"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k-evals", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-points", type=int, default=2048)
    args = ap.parse_args()

    from bench import build_model

    model = build_model(jnp.bfloat16, attn_impl="folded_pallas")
    x = jax.random.normal(jax.random.PRNGKey(2), (args.batch, args.n_points, 3))
    sigma = jnp.full((args.batch,), 1.0)

    def chained(m, x0):
        def body(x, _):
            return m.denoise(sigma, x).astype(x.dtype), None

        y, _ = jax.lax.scan(body, x0, None, length=args.k_evals)
        return y.sum()

    fn = jax.jit(chained)
    float(fn(model, x))  # compile + warm

    logdir = tempfile.mkdtemp(prefix="gecco_prof_")
    with jax.profiler.trace(logdir):
        float(fn(model, x))

    events = trace_events_from_xplane(logdir)
    # the device pid's "XLA Ops" thread row holds the per-op timeline; ops
    # nest (while > closed_call > fusion), so report SELF time: an op's
    # duration minus its enclosed children's
    proc_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    thread_names = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    # group by (pid, tid): with more than one device core in the profile
    # (multichip runs) the per-core "XLA Ops" rows interleave in time, and a
    # single nesting stack would mis-attribute parent/child self-times.
    # Zero-duration events are dropped up front — one starting exactly at
    # its parent's end would otherwise be popped out and counted top-level.
    rows = collections.defaultdict(list)
    for e in events:
        if (
            e.get("ph") == "X"
            and e.get("dur", 0) > 0
            and "TPU" in proc_names.get(e["pid"], "")
            and thread_names.get((e["pid"], e["tid"])) == "XLA Ops"
        ):
            rows[(e["pid"], e["tid"])].append(e)
    per_op = collections.Counter()
    total = 0.0
    for row_ops in rows.values():
        row_ops.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # (end_ts, children_dur accumulator index)
        child_dur = []
        for e in row_ops:
            ts, dur = e["ts"], e["dur"]
            while stack and ts >= stack[-1][0]:
                stack.pop()
            if stack:
                child_dur[stack[-1][1]] += dur
            stack.append((ts + dur, len(child_dur)))
            child_dur.append(0.0)
            e["_idx"] = len(child_dur) - 1
        for e in row_ops:
            self_ms = (e["dur"] - child_dur[e["_idx"]]) / 1e3
            per_op[e["name"]] += self_ms
            total += self_ms
    print(
        f"device self-time total: {total:.3f} ms over the chain "
        f"({total / args.k_evals:.3f} ms/eval)"
    )
    print(f"{'ms/eval':>9}  {'% ':>6}  op (self time)")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms / args.k_evals:9.4f}  {100 * ms / total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
