"""Scan-only Pallas CCL: the production segmentation front end.

Round 4 replaced the round-3 CCL's pointer-jump passes (serializing
full-image HBM gathers, ~4 ms per rationed jump round — the dominant CCL
cost) with NOTHING in the kernel loop: convergence is bought with more
scan rounds, and residual parent chains are resolved exactly on the
compacted label set by ops/resolve.py (tens of thousands of labels, not
half a million pixels).

Implementation note (measured on v5e): a single pallas_call holding the
(544, 1024) int32 label table in VMEM across all rounds OOMs Mosaic's
scoped vmem — one round body is ~50 chained full-image vector ops
(row fwd/bwd log-scans, diagonal hop, col fwd/bwd log-scans) and the stack
allocator keeps ~25 of those 2.2 MB temporaries live (55.6 MB vs the 16 MB
limit). The BANDED kernels of ops/pallas/ccl.py are the shape that fits:
each program's temporaries are band-sized (64x1024 / 544x128 -> ~256 KB a
piece), so the same ~25-buffer live set is ~6 MB. The scan loop therefore
reuses those kernels with jumps=0; the only inter-kernel cost is the
label's HBM round trip between the row and column passes (~25 MB/round,
tens of microseconds at HBM bandwidth).

Round-for-round bit-identical to ops.ccl.connected_components(..., jumps=0)
(enforced by tests/test_resolve.py). The reference hides its equivalent (a
CUDA union-find) inside closed binaries (ref:
isaac_ros_apriltag/src/apriltag_node.cpp:491-493).
"""

from __future__ import annotations

import functools

import jax

from .ccl import connected_components_pallas


@functools.partial(jax.jit, static_argnames=("rounds", "interpret", "opaque"))
def ccl_scan_pallas(trinary: jax.Array, rounds: int = 16, *,
                    interpret: bool = False,
                    label0: jax.Array | None = None,
                    opaque: bool = False):
    """(H, W) uint8 trinary {0,127,255} -> ((H, W) int32 labels, converged).

    Labels are each pixel's best-known component representative (min flat
    index over the scanned region); `converged` is True iff the final round
    was a no-op. Chains left by under-convergence are finished by
    ops/resolve.py. `label0` (unpadded flat indices) seeds a later phase
    from chain-contracted labels (detector.py's two-phase CCL); with
    `opaque=True` the seed labels are any order-isomorphic int32 values
    (e.g. resolve_roots_rank's compacted ranks) and are scanned/returned
    as-is.
    """
    return connected_components_pallas(trinary, rounds=rounds, jumps=0,
                                       with_convergence=True,
                                       interpret=interpret, label0=label0,
                                       opaque=opaque)
