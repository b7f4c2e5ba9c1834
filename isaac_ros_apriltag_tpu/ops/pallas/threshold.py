"""Pallas TPU kernel: fused adaptive threshold (the 'pallas' backend hot path).

One kernel produces the trinary image {0, 127, 255} from grayscale in a
single HBM read + single HBM write per pixel band: per-tile min/max, the 3x3
tile dilation, the low-contrast gate, and the compare all happen in VMEM.
The XLA reference (ops/threshold.py) needs several full-image HBM round
trips for the same chain; this kernel is bit-exact against it (enforced by
tests/test_pallas.py) — the analog of the reference's closed CUDA threshold
stage driven by the `tile_size` parameter (ref: isaac_ros_apriltag/src/
apriltag_node.cpp:450-452, :566).

Formulation notes (everything VPU-friendly, no gathers, no reshapes):
  - tile min/max and the 3x3 tile dilation are expressed as windowed
    min/max via `pltpu.roll` shifts with +-inf edge masking;
  - the anchor value (per-tile scalar) is broadcast back to pixels with a
    `lane % ts == m` select ladder, avoiding strided slices entirely;
  - vertical halo comes from two extra BlockSpecs over the same input
    (one tile-row above, two below), index-clamped at the image edges —
    clamping duplicates edge tiles, which is idempotent under min/max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BAND = 128          # rows per grid step (multiple of 2*ts for any ts <= 64)
_NEG = -3.4e38
_POS = 3.4e38


def _roll(x, shift, axis):
    """Circular roll; pltpu.roll requires a non-negative shift."""
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _shift_rows(x, s):
    """x shifted so out[i] = x[i + s] (no fill needed: callers only consume
    rows whose sources are in range)."""
    return _roll(x, -s, 0) if s else x


def _shift_lanes_min(x, s, lanes):
    """out[:, j] = x[:, j + s], out-of-range -> +inf (min identity)."""
    if s == 0:
        return x
    out = _roll(x, -s, 1)
    if s > 0:
        bad = lanes >= (x.shape[1] - s)
    else:
        bad = lanes < (-s)
    return jnp.where(bad, _POS, out)


def _shift_lanes_max(x, s, lanes):
    if s == 0:
        return x
    out = _roll(x, -s, 1)
    if s > 0:
        bad = lanes >= (x.shape[1] - s)
    else:
        bad = lanes < (-s)
    return jnp.where(bad, _NEG, out)


def _kernel(prev_ref, cur_ref, next_ref, out_ref, *, ts, min_diff):
    # Halo blocks are 8-row aligned (TPU sublane constraint); slice out the
    # ts (above) / 2*ts (below) rows actually needed. At the image edges the
    # halo index maps are clamped, which can supply out-of-window tiles for
    # small ts — substitute the band's own edge tiles there (any tile already
    # inside the dilation window is idempotent under min/max).
    pid = pl.program_id(0)
    band = cur_ref.shape[0]
    prev_rows = prev_ref[prev_ref.shape[0] - ts:, :]
    prev_rows = jnp.where(pid == 0, cur_ref[:ts, :], prev_rows)
    next_rows = next_ref[:2 * ts, :]
    next_rows = jnp.where(pid == pl.num_programs(0) - 1,
                          cur_ref[band - 2 * ts:, :], next_rows)
    xx = jnp.concatenate([prev_rows, cur_ref[:], next_rows], axis=0)
    R, W = xx.shape  # R = ts + BAND + 2*ts
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)

    # Windowed vertical then horizontal min/max of size ts (anchored at top-
    # left): rv[i,j] = reduce x[i..i+ts-1, j]; rh = reduce rv[i, j..j+ts-1].
    rv_min = xx
    rv_max = xx
    for k in range(1, ts):
        s = _shift_rows(xx, k)
        rv_min = jnp.minimum(rv_min, s)
        rv_max = jnp.maximum(rv_max, s)
    rh_min = rv_min
    rh_max = rv_max
    for k in range(1, ts):
        rh_min = jnp.minimum(rh_min, _shift_lanes_min(rv_min, k, lanes))
        rh_max = jnp.maximum(rh_max, _shift_lanes_max(rv_max, k, lanes))

    # 3x3 tile dilation: d[a,b] = reduce rh over offsets {-ts, 0, +ts}^2.
    dv_min = rh_min
    dv_max = rh_max
    for s in (-ts, ts):
        dv_min = jnp.minimum(dv_min, _shift_rows(rh_min, s))
        dv_max = jnp.maximum(dv_max, _shift_rows(rh_max, s))
    d_min = dv_min
    d_max = dv_max
    for s in (-ts, ts):
        d_min = jnp.minimum(d_min, _shift_lanes_min(dv_min, s, lanes))
        d_max = jnp.maximum(d_max, _shift_lanes_max(dv_max, s, lanes))

    # Vertical shift note: anchors live at xx rows a = ts*t; for output rows
    # [ts, ts+BAND) all shifted reads above stay within [0, R) — the halo
    # specs guarantee it — so row rolls never consume wrapped values.

    # Broadcast anchor values back to pixels: out[i,j] takes the dilated
    # value at (i - i%ts, j - j%ts). Select ladder over the residues.
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
    bmin, bmax = d_min, d_max
    for m in range(1, ts):
        sel = (rows % ts) == m
        bmin = jnp.where(sel, _roll(d_min, m, 0), bmin)
        bmax = jnp.where(sel, _roll(d_max, m, 0), bmax)
    fmin, fmax = bmin, bmax
    for m in range(1, ts):
        sel = (lanes % ts) == m
        fmin = jnp.where(sel, _roll(bmin, m, 1), fmin)
        fmax = jnp.where(sel, _roll(bmax, m, 1), fmax)

    contrast = fmax - fmin
    thresh = fmin + contrast * 0.5
    # Keep the select in f32 lane tiling; a bool mask cannot relayout to the
    # (32, 128) u8 tiling directly — cast the final f32 values instead.
    tri = jnp.where(contrast < float(min_diff), 127.0,
                    jnp.where(xx > thresh, 255.0, 0.0))
    out_ref[:] = tri[ts:ts + out_ref.shape[0]].astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("tile_size", "min_white_black_diff",
                                             "interpret"))
def adaptive_threshold_pallas(gray: jax.Array, tile_size: int = 4,
                              min_white_black_diff: int = 5,
                              interpret: bool = False) -> jax.Array:
    """(H, W) float32 grayscale -> (H, W) uint8 trinary {0, 127, 255}.

    Bit-exact vs ops/threshold.py. H, W must be multiples of tile_size.
    """
    H, W = gray.shape
    ts = tile_size
    assert H % ts == 0 and W % ts == 0, (H, W, ts)
    assert ts in (2, 4, 8, 16, 32), ts
    assert _BAND % (2 * ts) == 0 and _BAND % 8 == 0, ts

    # Pad rows to a whole number of bands. Edge padding duplicates the last
    # row, whose tile min/max are contained in the true bottom tiles' — the
    # dilation result at real rows is unchanged (min/max idempotence).
    Hp = -(-H // _BAND) * _BAND
    if Hp != H:
        gray = jnp.pad(gray, ((0, Hp - H), (0, 0)), mode="edge")
    nb = Hp // _BAND

    # Halo block heights are 8-row aligned (sublane tiling constraint).
    pb = max(8, ts)
    nxb = max(8, 2 * ts)
    prev_spec = pl.BlockSpec(
        (pb, W), lambda i: (jnp.maximum(i * (_BAND // pb) - 1, 0), 0),
        memory_space=pltpu.VMEM)
    cur_spec = pl.BlockSpec((_BAND, W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    nxt_max = Hp // nxb - 1
    next_spec = pl.BlockSpec(
        (nxb, W),
        lambda i: (jnp.minimum((i + 1) * (_BAND // nxb), nxt_max), 0),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, ts=ts, min_diff=min_white_black_diff),
        grid=(nb,),
        in_specs=[prev_spec, cur_spec, next_spec],
        out_specs=pl.BlockSpec((_BAND, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, W), jnp.uint8),
        interpret=interpret,
    )(gray, gray, gray)
    return out[:H]
