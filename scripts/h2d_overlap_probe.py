#!/usr/bin/env python
"""Measure whether host->device transfers overlap with compute on this
backend (r4 VERDICT #3: the bench's device-resident number excludes h2d with
a tunnel-serialization justification that was 'plausible but unproven' —
this probe is the proof artifact).

Method: time (a) a uint8 image-batch upload alone, (b) a compute-only jitted
workload alone, (c) the upload issued asynchronously BEFORE the compute is
dispatched, both awaited together.  overlap_ratio = (a + b - c) / min(a, b):
1.0 = full overlap (DMA hides behind compute), 0.0 = fully serialized.

  python scripts/h2d_overlap_probe.py [--out H2D_OVERLAP_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="H2D_OVERLAP_r05.json")
    p.add_argument("--mb", type=int, default=22, help="payload ~MB (24x 1241x376 u8 x2)")
    p.add_argument("--trials", type=int, default=6)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # Payload shaped like one bench batch: 24 stereo pairs of u8 frames.
    n = max(1, int(args.mb * 1e6 / (1241 * 376 * 2)))
    host = (
        np.random.default_rng(0).integers(0, 255, (n, 1241, 376), np.uint8),
        np.random.default_rng(1).integers(0, 255, (n, 1241, 376), np.uint8),
    )
    payload_bytes = host[0].nbytes + host[1].nbytes

    # Compute workload sized to take roughly as long as the upload: a chain
    # of matmuls on device-resident data (no host I/O).
    x0 = jnp.asarray(np.random.default_rng(2).normal(size=(2048, 2048)).astype(np.float32))

    @jax.jit
    def work(x, steps):
        def body(_, x):
            return jnp.tanh(x @ x) * 0.5
        return jax.lax.fori_loop(0, steps, body, x)

    steps = 8
    out = work(x0, steps)
    jax.block_until_ready(out)

    def t_upload():
        t0 = time.perf_counter()
        d = jax.device_put(host)
        jax.block_until_ready(d)
        dt = time.perf_counter() - t0
        del d
        return dt

    def t_compute():
        t0 = time.perf_counter()
        o = work(x0, steps)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    # Match compute duration to upload duration (cleanest overlap signal).
    up = min(t_upload() for _ in range(3))
    cp = min(t_compute() for _ in range(3))
    while cp < 0.7 * up and steps < 4096:
        steps *= 2
        o = work(x0, steps)
        jax.block_until_ready(o)
        cp = min(t_compute() for _ in range(3))

    ups, cps, boths = [], [], []
    for _ in range(args.trials):
        ups.append(t_upload())
        cps.append(t_compute())
        t0 = time.perf_counter()
        d = jax.device_put(host)      # async upload issued first
        o = work(x0, steps)           # compute dispatched immediately after
        jax.block_until_ready((d, o))
        boths.append(time.perf_counter() - t0)
        del d

    a, b, c = min(ups), min(cps), min(boths)
    overlap = max(0.0, min(1.0, (a + b - c) / max(min(a, b), 1e-9)))
    artifact = {
        "platform": jax.devices()[0].platform,
        "payload_bytes": payload_bytes,
        "upload_ms": round(a * 1e3, 2),
        "upload_GBps": round(payload_bytes / a / 1e9, 3),
        "compute_ms": round(b * 1e3, 2),
        "together_ms": round(c * 1e3, 2),
        "overlap_ratio": round(overlap, 3),
        "interpretation": (
            "1.0 = transfers fully hide behind compute (double-buffering "
            "works); 0.0 = backend serializes transfer RPCs behind in-flight "
            "computation (bench's with-h2d number is then a tunnel artifact, "
            "not a pipeline property)"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    main()
