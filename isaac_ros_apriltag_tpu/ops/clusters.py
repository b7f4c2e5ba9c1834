"""Boundary-point extraction and clustering by component pair.

AprilTag 3 walks every black/white neighboring pixel pair and buckets the
midpoints by the (black component, white component) id pair; each bucket is a
candidate quad boundary. The reference does this inside closed CUDA kernels.

TPU-native formulation (no hash tables, no dynamic allocation):
  1. relabel eligible components (size >= min_component_pixels) to DENSE ids
     via one rank-cumsum + one per-pixel gather — the only big-table lookup;
  2. evaluate all 4*H*W neighbor pairs densely (VPU); each valid pair packs
     its cluster key (black_dense * 2^15 + white_dense) and its payload
     (doubled coords + gradient) into one int32 each;
  3. compact valid pairs into a fixed-capacity buffer via cumsum + scatter;
     on overflow the points are stride-decimated GLOBALLY (not truncated in
     scan order — truncation keeps only the top of the image and evicts
     every tag below it, the round-1 0-detections failure);
  4. sort by (key, hash) — jax.lax.sort with num_keys=2 — so each cluster
     becomes a contiguous segment whose in-segment order is pseudo-random
     (a stride decimation over hash order is a uniform spatial subsample);
  5. segment bookkeeping (boundaries, sizes, starts) with cumsums/scatters;
  6. keep the top `max_clusters` segments by size and scatter their first
     `max_cluster_points` points into a dense (C, P) tensor.

Coordinates use AprilTag's doubled convention: a pair at pixel p with offset o
yields the point 2*p + o, i.e. the midpoint in half-pixel units.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Neighbor offsets (dx, dy), matching AprilTag 3's gradient_clusters scan
# (right, down, down-left, down-right).
_OFFSETS = ((1, 0), (0, 1), (-1, 1), (1, 1))

_I32MAX = jnp.iinfo(jnp.int32).max
_KBITS = 15                  # dense component ids: [0, 2^15); key fits int32
_KMAX = (1 << _KBITS) - 1    # sentinel dense id for ineligible components


class Clusters(NamedTuple):
    xy: jax.Array        # (C, P, 2) float32 — boundary points, pixel units
    grad: jax.Array      # (C, P, 2) float32 — outward gradient (black->white)
    mask: jax.Array      # (C, P) bool
    count: jax.Array     # (C,) int32 — points per cluster (capped at P)
    num_clusters: jax.Array  # () int32 — segments before the top-C cap
    num_eligible: jax.Array  # () int32 — segments passing the size gates
    num_edge_points: jax.Array  # () int32 — boundary points before capacity cap
    edge_stride: jax.Array   # () int32 — global decimation applied on overflow
    overflow: jax.Array      # () bool — a capacity was exceeded


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


def extract_clusters(trinary: jax.Array, label: jax.Array, sizes: jax.Array,
                     *, max_edge_points: int, max_clusters: int,
                     max_cluster_points: int, min_component_pixels: int,
                     min_cluster_pixels: int) -> Clusters:
    H, W = trinary.shape
    E, C, P = max_edge_points, max_clusters, max_cluster_points
    if not (2 * W < (1 << 12) and 2 * H < (1 << 12)):
        raise ValueError(
            "packed payload supports segmentation images up to 2047x2047; "
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

    key_all, pay_all, m_all = [], [], []
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
        x2 = 2 * xs + dx
        y2 = 2 * ys + dy
        # gradient points black -> white along the offset
        sgn = jnp.where(p_black, jnp.int32(1), jnp.int32(-1))
        g = (dx * sgn + 1) | ((dy * sgn + 1) << 2)      # two 2-bit fields
        key_all.append(jnp.where(m, (db << _KBITS) | dw, _I32MAX))
        pay_all.append(x2 | (y2 << 12) | (g << 24))
        m_all.append(m)

    key = jnp.stack(key_all).reshape(-1)
    pay = jnp.stack(pay_all).reshape(-1)
    mask = jnp.stack(m_all).reshape(-1)
    # Materialize before the cumsum: XLA would otherwise recompute the whole
    # pair chain in every log-step of the prefix sum.
    key, pay, mask = jax.lax.optimization_barrier((key, pay, mask))

    # --- compaction into E-capacity buffers (hash decimation on overflow) ----
    # Survivors are chosen by payload hash, NOT by scan-order stride: scan
    # order is structured (e.g. one left-edge point per row for a vertical
    # edge), so `pos % stride == 0` can alias out one whole edge of a tag.
    # A hash gate is a uniform spatial subsample of each cluster.
    num_edge = jnp.sum(mask.astype(jnp.int32))
    stride = jnp.maximum((num_edge + E - 1) // E, 1)
    # High bits of the multiplicative hash: the product's low bits are not
    # mixed (bit 0 equals bit 0 of pay = dx), and a raw `% stride` would
    # decimate by edge orientation.
    pay_hash = ((pay * jnp.int32(-1640531527)) >> 15) & jnp.int32(0xFFFF)
    keep = mask & (pay_hash % stride == 0)
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep & (pos < E), pos, E)
    buf_key = jnp.full((E + 1,), _I32MAX, jnp.int32).at[dest].set(key)[:E]
    buf_pay = jnp.zeros((E + 1,), jnp.int32).at[dest].set(pay)[:E]

    # --- sort by (key, hash) ------------------------------------------------
    # The hash second key pseudo-randomizes in-segment order: the raw scan
    # order is structured (e.g. exactly one left-edge point per row for a
    # vertical edge), so a stride-k decimation over scan order could delete
    # one whole edge; over hash order it is a uniform spatial subsample.
    buf_hash = jnp.where(buf_key != _I32MAX,
                         (buf_pay * jnp.int32(-1640531527)) & jnp.int32(0x7FFFFFFF),
                         _I32MAX)
    skey, _, spay = jax.lax.sort((buf_key, buf_hash, buf_pay), num_keys=2)
    entry_valid = skey != _I32MAX

    # --- segments -----------------------------------------------------------
    first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    first = first & entry_valid
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1          # (E,)
    seg_id = jnp.where(entry_valid, seg_id, E)
    nseg = jnp.max(jnp.where(entry_valid, seg_id, -1)) + 1
    iota = jnp.arange(E, dtype=jnp.int32)
    seg_size = jnp.zeros((E + 1,), jnp.int32).at[seg_id].add(1)[:E]
    seg_start = jnp.full((E + 1,), _I32MAX, jnp.int32).at[seg_id].min(iota)[:E]

    # --- pick top-C segments by size -----------------------------------------
    # Gates in TRUE-pixel units (sizes are in decimated units on overflow):
    # big enough, and not absurdly large (a quad's perimeter is at most
    # 2*(2W + 2H) points, AprilTag 3's same sanity bound).
    max_perimeter = 2 * (2 * W + 2 * H)
    true_size = seg_size * stride
    eligible_seg = (true_size >= min_cluster_pixels) & (true_size <= max_perimeter)
    gated = jnp.where(eligible_seg, seg_size, 0)
    top_sizes, top_segs = jax.lax.top_k(gated, C)
    slot_valid = top_sizes > 0
    slot_of_seg = jnp.full((E + 1,), -1, jnp.int32).at[
        jnp.where(slot_valid, top_segs, E)].set(jnp.arange(C, dtype=jnp.int32))

    # --- scatter points into (C, P) ------------------------------------------
    # Segments larger than P are stride-decimated (not truncated) so the fit
    # still sees the whole boundary — truncation would drop a contiguous arc.
    seg_c = jnp.clip(seg_id, 0, E)
    slot = slot_of_seg[seg_c]
    rankp = iota - seg_start[seg_c]
    seg_stride = jnp.maximum((seg_size[seg_c] + P - 1) // P, 1)
    ok = (entry_valid & (slot >= 0) & (rankp % seg_stride == 0)
          & (rankp // seg_stride < P))
    dest2 = jnp.where(ok, slot * P + rankp // seg_stride, C * P)
    flat_pay = jnp.zeros((C * P + 1,), jnp.int32).at[dest2].set(spay)[:C * P]
    flat_ok = jnp.zeros((C * P + 1,), bool).at[dest2].set(ok)[:C * P]

    x2 = (flat_pay & 0xFFF).astype(jnp.float32)
    y2 = ((flat_pay >> 12) & 0xFFF).astype(jnp.float32)
    xy = jnp.stack([x2 * 0.5, y2 * 0.5], -1).reshape(C, P, 2)
    gp = flat_pay >> 24
    gx = ((gp & 0x3) - 1).astype(jnp.float32)
    gy = (((gp >> 2) & 0x3) - 1).astype(jnp.float32)
    grad = jnp.stack([gx, gy], -1).reshape(C, P, 2)
    top_stride = jnp.maximum((top_sizes + P - 1) // P, 1)
    count = jnp.where(slot_valid, (top_sizes + top_stride - 1) // top_stride, 0)

    n_eligible = jnp.sum(eligible_seg.astype(jnp.int32))
    return Clusters(xy=xy, grad=grad, mask=flat_ok.reshape(C, P),
                    count=count, num_clusters=nseg, num_eligible=n_eligible,
                    num_edge_points=num_edge, edge_stride=stride,
                    overflow=(num_edge > E) | comp_overflow | (n_eligible > C))
