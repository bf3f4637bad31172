"""Isolate the axon host-staging-buffer leak (round-5 queue stage-3 OOM).

Loops ``jax.device_put`` of a fresh ~10 MB uint8 host array (the size of one
conditional image batch) through a trivial jitted consumer, sampling the
process RSS every 50 iterations. On a leak-free runtime RSS stays flat; the
round-5 conditional run grew ~12 MB/step until the kernel OOM-killed it at
~130 GB, implicating per-transfer staging-buffer retention in the relay
runtime. Run standalone on TPU; prints one JSON line with the fitted
MB/iteration slope.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main(iters: int = 500, mb: int = 10) -> None:
    consume = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32))
    shape = (mb * 1024 * 1024,)
    host = np.zeros(shape, np.uint8)
    samples = []
    t0 = time.time()
    for i in range(iters):
        # fresh contents each iteration so no caching layer can dedupe
        host[i % len(host)] = i % 251
        total = int(consume(jax.device_put(host)))
        if i % 50 == 0:
            samples.append((i, rss_mb()))
            print(f"iter {i} rss {samples[-1][1]:.0f} MB (sum {total})", flush=True)
    samples.append((iters, rss_mb()))
    xs = np.array([s[0] for s in samples], np.float64)
    ys = np.array([s[1] for s in samples], np.float64)
    slope = float(np.polyfit(xs, ys, 1)[0])
    print(json.dumps({
        "iters": iters,
        "transfer_mb": mb,
        "rss_start_mb": ys[0],
        "rss_end_mb": ys[-1],
        "leak_mb_per_iter": round(slope, 3),
        "wall_s": round(time.time() - t0, 1),
        "platform": jax.devices()[0].platform,
    }), flush=True)


if __name__ == "__main__":
    main()
