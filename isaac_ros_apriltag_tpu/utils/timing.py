"""Truthful throughput timing on the tunneled axon TPU platform.

`jax.block_until_ready` does NOT synchronize there (measured: an 8k^3
matmul "finishes" in 63 us), so every timing loop must force a HOST
READBACK of a scalar each iteration — device execution is in-order, so the
readback bounds all queued work — and deep async queues must be avoided
entirely (they degrade ~30x on the relay). See the methodology notes in
bench.py and CLAUDE.md.
"""

from __future__ import annotations

import time

import numpy as np

import jax


def readback_scalar(tree) -> None:
    """True sync point: pull ONE element of the first leaf to the host."""
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(leaf.ravel()[:1])


def throughput(fn, x, iters: int, *, overlap: int = 1):
    """Time `iters` calls of fn(x) with a host readback per completed call.

    overlap > 1 keeps that many calls in flight (dispatch i+overlap before
    reading back i) so the host<->device round trip of the readback hides
    behind device compute — the steady-state throughput a pipelined
    consumer sees; each completed call is still truly synced.
    Returns (seconds, first_output).
    """
    from collections import deque

    out0 = fn(x)                      # compile + warmup
    readback_scalar(out0)
    window: deque = deque()
    t0 = time.perf_counter()
    for _ in range(iters):
        window.append(fn(x))
        if len(window) >= overlap:
            readback_scalar(window.popleft())
    while window:
        readback_scalar(window.popleft())
    return time.perf_counter() - t0, out0
