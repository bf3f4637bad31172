"""Shared xprof trace parsing: per-op device self-time from a jax.profiler
trace. The only honest per-kernel accounting on the axon relay (CLAUDE.md:
wall-clock micro-benchmarks overstate kernel cost by ~2 ms/call and
``block_until_ready`` doesn't block)."""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os


def trace_events_from_xplane(logdir: str):
    """All trace-viewer events from the xplane file under ``logdir``."""
    # NOTE: tensorboard_plugin_profile's converter is broken against this
    # env's protobuf/tensorflow (stale _pb2 stubs, missing pywrap symbol);
    # the standalone xprof package's converter works.
    from xprof.convert import raw_to_tool_data

    xplanes = glob.glob(os.path.join(logdir, "plugins/profile/*/*.xplane.pb"))
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


def per_op_self_time_ms(events) -> "collections.Counter":
    """Per-op-name device SELF time (ms) from the TPU pids' "XLA Ops" rows.

    Ops nest (while > closed_call > fusion); self time subtracts enclosed
    children. Events are grouped by (pid, tid) so multi-core traces don't
    interleave into one nesting stack, and zero-duration events are dropped
    (one starting exactly at its parent's end would otherwise escape the
    stack and count as top-level).
    """
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
            per_op[e["name"]] += (e["dur"] - child_dur[e["_idx"]]) / 1e3
    return per_op
