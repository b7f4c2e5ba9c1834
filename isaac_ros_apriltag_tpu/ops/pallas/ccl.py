"""Pallas TPU kernels for connected-component labeling rounds.

The XLA CCL (ops/ccl.py) spends its time in `jax.lax.associative_scan`
log-step graphs whose per-step slices force repeated HBM round trips
(measured 55 ms/frame at 960x540). Here one CCL round is two pallas calls
plus one cheap XLA gather pass:

  - row fwd/bwd segmented min-scans  -> kernel, grid over row bands
    (rows are independent, so each program scans its band in VMEM with
    Hillis-Steele log-steps over lane rotates);
  - white-only diagonal hop + col fwd/bwd scans -> kernel, grid over column
    bands (a column band holds every row, so vertical neighbors are local;
    the dx = +-1 halo lanes come from the adjacent bands, passed as two
    extra clamped-index block views);
  - pointer jumping label[label]     -> XLA (the gather table is VMEM-sized
    at segmentation resolution, where XLA's gather is tens of microseconds;
    an in-kernel VMEM gather would serialize). Labels stay in PADDED flat
    index space between rounds — no per-round crop/repad (the former XLA
    diag+crop+pad glue cost 8.5 ms/round, more than both kernels together).

Each round is BIT-identical to the XLA backend's round — the scans compute
the same exact segmented min, the diag hop reads all four neighbors from the
same pre-hop label, and both backends order a round as
row scans -> diag hop -> col scans -> jumps — so parity with ops/ccl.py
holds at any round count (enforced by tests/test_pallas.py). The reference
hides its equivalent (a CUDA union-find) inside closed binaries (ref:
isaac_ros_apriltag/src/apriltag_node.cpp:491-493).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Plain python ints (weakly typed in-kernel): jnp scalars here would be
# captured constants, which pallas_call rejects.
_INF = 2 ** 30
_ROW_BAND = 64    # rows per program in the row-scan kernel
_COL_BAND = 128   # cols per program in the col+diag kernel


def _shift_with_fill(x, d: int, axis: int, fill):
    """x shifted so out[i] = x[i - d] along `axis` (d may be negative);
    vacated positions get `fill`. pltpu.roll needs a non-negative 32-bit
    operand, so negative d wraps modulo n and callers pass int32 arrays."""
    rolled = pltpu.roll(x, d % x.shape[axis], axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    n = x.shape[axis]
    if d >= 0:
        mask = idx < d
    else:
        mask = idx >= n + d
    return jnp.where(mask, fill, rolled)


def _seg_min_scan_steps(label, flag, axis: int, direction: int, n: int):
    """Segmented inclusive min-scan via Hillis-Steele log-steps.

    flag[i] != 0 means element i does NOT connect to element i-direction.
    """
    d = direction
    steps = 1
    while steps < n:
        slab = _shift_with_fill(label, d * steps, axis, _INF)
        sflg = _shift_with_fill(flag, d * steps, axis, 1)
        label = jnp.where(flag > 0, label, jnp.minimum(label, slab))
        flag = jnp.bitwise_or(flag, sflg)
        steps *= 2
    return label


def _scan_pair(tri, label, axis: int, n: int):
    """Forward + backward segmented min-scans along `axis` (tri is int32)."""
    invalid = tri == 127
    fwd_b = ((tri != _shift_with_fill(tri, 1, axis, 127))
             | invalid).astype(jnp.int32)
    label = _seg_min_scan_steps(label, fwd_b, axis=axis, direction=1, n=n)
    bwd_b = ((tri != _shift_with_fill(tri, -1, axis, 127))
             | invalid).astype(jnp.int32)
    return _seg_min_scan_steps(label, bwd_b, axis=axis, direction=-1, n=n)


def _row_kernel(n: int):
    def kernel(tri_ref, lab_ref, out_ref):
        tri = tri_ref[:].astype(jnp.int32)   # Mosaic rotates need 32-bit
        out_ref[:] = _scan_pair(tri, lab_ref[:], axis=1, n=n)
    return kernel


def _col_diag_kernel(n: int, band: int):
    """Diag hop (on the post-row-scan labels) + column fwd/bwd scans.

    Receives the center column band plus its left/right neighbor bands
    (clamped at the image edges) for the dx = +-1 halo lanes.
    """

    def neighbor(xc, xl, xr, dy, dx, fill, j, nj, lc):
        # out[r, c] = x[r+dy, c+dx] in GLOBAL coordinates.
        def dyshift(a):
            return _shift_with_fill(a, -dy, 0, fill)
        c = dyshift(xc)
        if dx == 1:
            # neighbor at c+1: rotate left; last lane comes from right band
            shifted = pltpu.roll(c, band - 1, 1)
            borrow = pltpu.roll(dyshift(xr), band - 1, 1)
            out = jnp.where(lc == band - 1, borrow, shifted)
            edge = (lc == band - 1) & (j == nj - 1)
        else:
            # neighbor at c-1: rotate right; first lane comes from left band
            shifted = pltpu.roll(c, 1, 1)
            borrow = pltpu.roll(dyshift(xl), 1, 1)
            out = jnp.where(lc == 0, borrow, shifted)
            edge = (lc == 0) & (j == 0)
        return jnp.where(edge, fill, out)

    def kernel(tc_ref, tl_ref, tr_ref, lc_ref, ll_ref, lr_ref, out_ref):
        j = pl.program_id(0)
        nj = pl.num_programs(0)
        tc = tc_ref[:].astype(jnp.int32)
        tl = tl_ref[:].astype(jnp.int32)
        tr = tr_ref[:].astype(jnp.int32)
        label = lc_ref[:]
        lc = jax.lax.broadcasted_iota(jnp.int32, tc.shape, 1)

        # White-only diagonal hop; all four neighbors read from the pre-hop
        # label (bit-parity with the XLA backend's hop).
        white = tc == 255
        m = label
        for dy, dx in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
            ntri = neighbor(tc, tl, tr, dy, dx, 127, j, nj, lc)
            nlab = neighbor(label, ll_ref[:], lr_ref[:], dy, dx, _INF,
                            j, nj, lc)
            conn = white & (ntri == tc)
            m = jnp.minimum(m, jnp.where(conn, nlab, label))

        out_ref[:] = _scan_pair(tc, m, axis=0, n=n)
    return kernel


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("rounds", "jumps", "jump_every",
                                             "interpret", "with_convergence",
                                             "opaque"))
def connected_components_pallas(trinary: jax.Array, rounds: int = 6,
                                jumps: int = 2, jump_every: int = 1, *,
                                interpret: bool = False,
                                with_convergence: bool = False,
                                label0: jax.Array | None = None,
                                opaque: bool = False):
    """Drop-in replacement for ops.ccl.connected_components.

    (H, W) uint8 trinary {0,127,255} -> (H, W) int32 labels; round-for-round
    bit-identical to the XLA backend (both assign the min flat index).
    With `with_convergence`, also returns True iff the final round was a
    no-op (same telemetry semantics as the XLA backend).
    `label0` overrides the initial label field (UNPADDED flat indices, e.g.
    the chain-contracted labels of a previous scan phase — see
    detector.py's two-phase CCL); `jumps` must be 0 in that mode: label
    values may point anywhere in the image, outside a jump's gather table
    guarantees.
    `opaque` (requires label0): label values are NOT flat indices — any
    int32 order-isomorphic labeling (e.g. the compacted ranks of
    ops/resolve.resolve_roots_rank). They are scanned as-is (min-propagation
    only needs an order) and returned without the flat-index remap; padding
    pixels carry a large constant (they are trinary-invalid and never
    propagate).
    """
    if rounds < 1:
        # rounds=0 would otherwise run body(-1, .) after the empty fori_loop
        # on the with_convergence path.
        raise ValueError("rounds must be >= 1")
    H, W = trinary.shape
    Hp = _round_up(H, _ROW_BAND)
    Wp = _round_up(W, _COL_BAND)
    assert label0 is None or jumps == 0
    assert not opaque or label0 is not None
    tri = jnp.pad(trinary, ((0, Hp - H), (0, Wp - W)),
                  constant_values=jnp.uint8(127))
    # Work in PADDED flat index space (remapped to unpadded at the end, which
    # preserves the component representative: both index spaces are
    # lexicographic in (y, x), so the min is the same pixel).
    ys = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    if label0 is None:
        label0 = ys * Wp + xs
    elif opaque:
        label0 = jnp.full((Hp, Wp), _INF - 1, jnp.int32).at[
            :H, :W].set(label0)
    else:
        lp = (label0 // W) * Wp + label0 % W
        label0 = (ys * Wp + xs).at[:H, :W].set(lp)

    row_scan = pl.pallas_call(
        _row_kernel(Wp),
        grid=(Hp // _ROW_BAND,),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        in_specs=[pl.BlockSpec((_ROW_BAND, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_ROW_BAND, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_ROW_BAND, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    nj = Wp // _COL_BAND
    left = lambda j: (0, jnp.maximum(j - 1, 0))
    right = lambda j: (0, jnp.minimum(j + 1, nj - 1))
    center = lambda j: (0, j)
    cspec = lambda ix: pl.BlockSpec((Hp, _COL_BAND), ix,
                                    memory_space=pltpu.VMEM)
    col_scan = pl.pallas_call(
        _col_diag_kernel(Hp, _COL_BAND),
        grid=(nj,),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        in_specs=[cspec(center), cspec(left), cspec(right),
                  cspec(center), cspec(left), cspec(right)],
        out_specs=cspec(center),
        interpret=interpret,
    )

    def body(r, label):
        label = row_scan(tri, label)
        label = col_scan(tri, tri, tri, label, label, label)

        def jump(lab):
            flat = lab.reshape(-1)
            for _ in range(jumps):
                flat = flat[flat]
            return flat.reshape(Hp, Wp)

        if jumps == 0:
            return label
        return jax.lax.cond((r + 1) % jump_every == 0, jump,
                            lambda lab: lab, label)

    if with_convergence:
        # One compare total (after the explicit final round) instead of one
        # per round; converged = the FINAL round changed nothing.
        label = jax.lax.fori_loop(0, rounds - 1, body, label0, unroll=False)
        new = body(rounds - 1, label)
        label, changed = new, jnp.any(new != label)
    else:
        label = jax.lax.fori_loop(0, rounds, body, label0, unroll=False)
    # Remap padded flat indices -> unpadded flat indices and crop
    # (opaque labels are returned as-is: no index space to remap).
    label = label[:H, :W]
    if not opaque:
        label = (label // Wp) * W + (label % Wp)
    return (label, ~changed) if with_convergence else label
