"""Sort-free boundary clustering: trinary+labels -> per-cluster angular moments.

AprilTag 3 buckets black/white neighbor-pair midpoints by (black component,
white component) key, then fits each cluster's quad from an angular sweep of
its points. The round-2 TPU formulation materialized point lists per cluster,
which required a 131k-element multi-operand `jax.lax.sort` plus several large
scatters — the measured hot spot of the whole detector.

This module removes the sort (and the point lists) entirely: quad fitting
only ever consumes ANGULAR-BIN MOMENT SUMS (ops/quadfit.py), and moments are
order-free, so clusters never need to be contiguous. The pipeline is three
scatter/gather passes over the dense pair grid, all into small tables:

  1. key -> slot assignment by multi-probe hashing: 3 rounds of
     scatter-min(key) into 2^16-entry tables with exact key verification —
     collisions are detected (not merged) and losers re-probe the next table;
     the probability of a real cluster losing all 3 probes is ~1e-9.
  2. per-slot first/second moments + gradient sums (scatter-add) give each
     cluster's centroid, scale and polarity; slots are gated by point count
     and the top `max_clusters` survive (same gates as AprilTag's
     min_cluster_pixels / perimeter bound).
  3. per-pair angular binning about the owning cluster's centroid
     (diamond-angle, no arctan), with normalized-coordinate moment sums
     scattered into the (max_clusters, NBINS) tables quadfit consumes.

Unlike the round-2 path there is NO point-capacity decimation anywhere:
every boundary point contributes to the fit (the fixed-capacity (C, P) point
buffer and its stride decimation are gone along with the sort).

The reference runs its equivalent inside closed CUDA binaries (ref:
isaac_ros_apriltag/src/apriltag_node.cpp:491-493, :290-293).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_I32MAX = jnp.iinfo(jnp.int32).max
_KBITS = 15                  # dense component ids: [0, 2^15); key fits int32
_KMAX = (1 << _KBITS) - 1    # sentinel dense id for ineligible components
_SLOT_BITS = 16              # per-probe hash table size
_NPROBE = 3
NBINS = 64                   # angular bins (matches ops/quadfit.py)

# Neighbor offsets (dx, dy), matching AprilTag 3's gradient_clusters scan
# (right, down, down-left, down-right).
_OFFSETS = ((1, 0), (0, 1), (-1, 1), (1, 1))


class ClusterMoments(NamedTuple):
    """Per-cluster angular moment tables (inputs to ops.quadfit.fit_quads)."""

    # (C, NBINS) float32 per-bin sums over scale-normalized coords (sx, sy):
    bw: jax.Array     # sum of weights (point counts)
    bx: jax.Array     # sum sx
    by: jax.Array     # sum sy
    bxx: jax.Array    # sum sx*sx
    bxy: jax.Array    # sum sx*sy
    byy: jax.Array    # sum sy*sy
    # per-cluster scalars:
    count: jax.Array       # (C,) int32 total boundary points
    centroid: jax.Array    # (C, 2) float32 pixel coords
    scale: jax.Array       # (C,) float32 sqrt(mean r^2) in pixels
    dark_inside: jax.Array  # (C,) bool — quad interior darker than outside
    valid: jax.Array       # (C,) bool — slot holds a gated cluster
    # frame stats:
    num_clusters: jax.Array     # () int32 distinct keys found (approx: slots used)
    num_eligible: jax.Array     # () int32 slots passing the size gates
    num_edge_points: jax.Array  # () int32 boundary points in frame
    overflow: jax.Array         # () bool — hashing or top-C capacity exceeded


def _shift(x: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    out = jnp.roll(x, (-dy, -dx), (0, 1))
    if dy == 1:
        out = out.at[-1, :].set(fill)
    if dy == -1:
        out = out.at[0, :].set(fill)
    if dx == 1:
        out = out.at[:, -1].set(fill)
    if dx == -1:
        out = out.at[:, 0].set(fill)
    return out


def _diamond_bin(dx: jax.Array, dy: jax.Array, nbins: int) -> jax.Array:
    """Monotone circular angle surrogate -> bin id in [0, nbins).

    Diamond angle t in [0, 4): piecewise-linear in (dx, dy), strictly monotone
    in true angle, no transcendentals. Quad fitting only needs a monotone
    circular parameterization (corners are error maxima; arcs are bin ranges),
    not uniform angular widths.
    """
    ax = jnp.abs(dx)
    ay = jnp.abs(dy)
    denom = jnp.maximum(ax + ay, 1e-12)
    t = jnp.where(dy >= 0,
                  jnp.where(dx >= 0, dy / denom, 1.0 + ax / denom),
                  jnp.where(dx < 0, 2.0 + ay / denom, 3.0 + dx / denom))
    return jnp.clip((t * (nbins / 4.0)).astype(jnp.int32), 0, nbins - 1)


def extract_cluster_moments(trinary: jax.Array, label: jax.Array,
                            sizes: jax.Array, *, max_clusters: int,
                            min_component_pixels: int,
                            min_cluster_pixels: int) -> ClusterMoments:
    H, W = trinary.shape
    C = max_clusters
    K = NBINS
    S = 1 << _SLOT_BITS
    if not (2 * W < (1 << 12) and 2 * H < (1 << 12)):
        raise ValueError(
            "packed coords support segmentation images up to 2047x2047; "
            f"got {H}x{W} — use quad_decimate for larger frames")

    # --- dense component relabel (folds in the size gate) ------------------
    flat_label = label.reshape(-1)
    idx = jnp.arange(H * W, dtype=jnp.int32)
    is_root = flat_label == idx
    eligible = is_root & (sizes >= min_component_pixels)
    rank = jnp.cumsum(eligible.astype(jnp.int32)) - 1
    n_comps = rank[-1] + 1
    dense_of_root = jnp.where(eligible & (rank < _KMAX), rank, _KMAX)
    dense = dense_of_root[flat_label].reshape(H, W)     # one (H*W,) gather
    comp_overflow = n_comps > _KMAX

    # --- dense pair generation (4 offsets) ---------------------------------
    key_all, x2_all, y2_all, g_all, m_all = [], [], [], [], []
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    for dx, dy in _OFFSETS:
        v0 = trinary
        v1 = _shift(trinary, dy, dx, jnp.uint8(127))
        pair = (v0.astype(jnp.int32) + v1.astype(jnp.int32)) == 255
        d0, d1 = dense, _shift(dense, dy, dx, jnp.int32(_KMAX))
        p_black = v0 == 0
        db = jnp.where(p_black, d0, d1)
        dw = jnp.where(p_black, d1, d0)
        m = pair & (db != _KMAX) & (dw != _KMAX)
        # doubled coords: midpoint of the pair in half-pixel units
        x2_all.append(2 * xs + dx)
        y2_all.append(2 * ys + dy)
        # gradient points black -> white along the offset
        sgn = jnp.where(p_black, jnp.int32(1), jnp.int32(-1))
        g_all.append((dx * sgn + 1) | ((dy * sgn + 1) << 2))
        key_all.append(jnp.where(m, (db << _KBITS) | dw, _I32MAX))
        m_all.append(m)

    key = jnp.stack(key_all).reshape(-1)                 # (4*H*W,)
    mask = jnp.stack(m_all).reshape(-1)
    x2 = jnp.stack(x2_all).reshape(-1).astype(jnp.float32)
    y2 = jnp.stack(y2_all).reshape(-1).astype(jnp.float32)
    gpack = jnp.stack(g_all).reshape(-1)
    key, mask, x2, y2, gpack = jax.lax.optimization_barrier(
        (key, mask, x2, y2, gpack))
    num_edge = jnp.sum(mask.astype(jnp.int32))

    # --- multi-probe hash: key -> slot in [0, NPROBE*S) --------------------
    slot = jnp.full(key.shape, _NPROBE * S, jnp.int32)   # sentinel = overflow row
    live = mask
    lost = jnp.zeros((), jnp.int32)
    salts = (jnp.int32(-1640531527), jnp.int32(-1028477387), jnp.int32(373587883))
    for p in range(_NPROBE):
        h = ((key * salts[p]) >> 13) & (S - 1)
        h = jnp.where(live, h, S)                        # parked in scratch row
        tbl = jnp.full((S + 1,), _I32MAX, jnp.int32).at[h].min(key)
        won = live & (tbl[h] == key)
        slot = jnp.where(won, p * S + h, slot)
        live = live & ~won
    overflow_hash = jnp.sum(live.astype(jnp.int32)) > 0
    ST = _NPROBE * S

    # --- pass 1: per-slot zeroth/first/second moments + gradient sums ------
    # (pixel coords = doubled/2; use doubled ints, convert after summing)
    w = mask.astype(jnp.float32)
    gx = ((gpack & 0x3) - 1).astype(jnp.float32) * w
    gy = (((gpack >> 2) & 0x3) - 1).astype(jnp.float32) * w
    x = x2 * 0.5
    y = y2 * 0.5
    fields1 = (w, x * w, y * w, (x * x + y * y) * w,
               gx, gy, x * gx + y * gy)
    t1 = [jnp.zeros((ST + 1,), jnp.float32).at[slot].add(f)[:ST]
          for f in fields1]
    cnt, sx_, sy_, sr2, sgx, sgy, sxg = t1
    cnt_i = cnt.astype(jnp.int32)

    # --- gate + top-C slot selection ---------------------------------------
    max_perimeter = 2 * (2 * W + 2 * H)
    slot_used = cnt_i > 0
    eligible_slot = (cnt_i >= min_cluster_pixels) & (cnt_i <= max_perimeter)
    n_used = jnp.sum(slot_used.astype(jnp.int32))
    n_eligible = jnp.sum(eligible_slot.astype(jnp.int32))
    gated = jnp.where(eligible_slot, cnt_i, 0)
    top_sizes, top_slots = jax.lax.top_k(gated, C)       # over 3*S entries
    cvalid = top_sizes > 0
    cluster_of_slot = jnp.full((ST + 1,), -1, jnp.int32).at[
        jnp.where(cvalid, top_slots, ST)].set(jnp.arange(C, dtype=jnp.int32))

    # per-cluster stats (gather from slot tables)
    g = lambda t: t[top_slots]
    ccnt = jnp.where(cvalid, g(cnt), 0.0)
    safe = jnp.maximum(ccnt, 1.0)
    cx = g(sx_) / safe
    cy = g(sy_) / safe
    # mean r^2 about centroid = E[x^2+y^2] - cx^2 - cy^2
    r2m = g(sr2) / safe - cx * cx - cy * cy
    cscale = jnp.sqrt(jnp.maximum(r2m, 1e-12))
    # outward gradient (black->white): positive mean radial dot => dark inside
    mean_dot = (g(sxg) - cx * g(sgx) - cy * g(sgy)) / safe
    dark = mean_dot > 0

    # --- pass 2: angular-bin moments in normalized coords ------------------
    cid = cluster_of_slot[jnp.minimum(slot, ST)]         # (N,) in [-1, C)
    ok = mask & (cid >= 0)
    pcx = cx[jnp.maximum(cid, 0)]
    pcy = cy[jnp.maximum(cid, 0)]
    pscale = jnp.maximum(cscale[jnp.maximum(cid, 0)], 1e-6)
    dxp = x - pcx
    dyp = y - pcy
    sxn = dxp / pscale
    syn = dyp / pscale
    bins = _diamond_bin(dxp, dyp, K)
    dest = jnp.where(ok, cid * K + bins, C * K)
    wv = ok.astype(jnp.float32)
    fields2 = (wv, sxn * wv, syn * wv, sxn * sxn * wv, sxn * syn * wv,
               syn * syn * wv)
    t2 = [jnp.zeros((C * K + 1,), jnp.float32).at[dest].add(f)[:C * K]
          .reshape(C, K) for f in fields2]
    bw, bx, by, bxx, bxy, byy = t2

    return ClusterMoments(
        bw=bw, bx=bx, by=by, bxx=bxx, bxy=bxy, byy=byy,
        count=ccnt.astype(jnp.int32),
        centroid=jnp.stack([cx, cy], -1),
        scale=cscale, dark_inside=dark, valid=cvalid,
        num_clusters=n_used, num_eligible=n_eligible,
        num_edge_points=num_edge,
        overflow=comp_overflow | overflow_hash | (n_eligible > C))
