"""Microbenchmark of the irregular ops (scatter/gather/sort/top_k/cumsum)
that dominate the segmentation path — measured on the real device so the
cluster-extraction redesign targets facts, not folklore."""

import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, iters=10):
    fn2 = jax.jit(fn)
    out = fn2(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn2(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {1000*(time.perf_counter()-t0)/iters:9.3f} ms", flush=True)


rng = np.random.default_rng(0)
N = 2_100_000   # pair count at half-res
B = 1 << 17     # bucket table
E = 1 << 16
CP = 96 * 512

keys = jax.device_put(rng.integers(0, B, N).astype(np.int32))
vals = jax.device_put(rng.integers(0, 1 << 30, N).astype(np.int32))
dest_cp = jax.device_put(rng.integers(0, CP + 1, N).astype(np.int32))
small_keys = jax.device_put(rng.integers(0, B, E).astype(np.int32))
small_vals = jax.device_put(rng.integers(0, 1 << 30, E).astype(np.int32))
px_label = jax.device_put(rng.integers(0, 518400, 518400).astype(np.int32))
mask = jax.device_put((rng.random(N) < 0.1))

t("scatter-add 2.1M -> 128k", lambda k: jnp.zeros((B,), jnp.int32).at[k].add(1), keys)
t("scatter-max 2.1M -> 128k", lambda k, v: jnp.full((B,), -1, jnp.int32).at[k].max(v), keys, vals)
t("scatter-set 2.1M -> 48k(CP)", lambda d, v: jnp.zeros((CP + 1,), jnp.int32).at[d].set(v), dest_cp, vals)
t("gather 2.1M <- 128k", lambda k: jnp.zeros((B,), jnp.int32)[k], keys)
t("gather 0.5M <- 0.5M", lambda l: jnp.zeros((518400,), jnp.int32)[l], px_label)
t("cumsum 2.1M int32", lambda m: jnp.cumsum(m.astype(jnp.int32)), mask)
t("cumsum 8.4M int32", lambda m: jnp.cumsum(jnp.tile(m, 4).astype(jnp.int32)), mask)
t("sort 2.1M 1key+0pay", lambda v: jax.lax.sort((v,), num_keys=1), vals)
t("sort 131k 1key+1pay", lambda v, p: jax.lax.sort((v, p), num_keys=1),
  jnp.tile(small_vals, 2), jnp.tile(small_keys, 2))
t("sort 65k 1key+1pay", lambda v, p: jax.lax.sort((v, p), num_keys=1), small_vals, small_keys)
t("sort 65k 3key+2pay", lambda a, b, c, d, e: jax.lax.sort((a, b, c, d, e), num_keys=3),
  small_vals, small_keys, small_vals, small_keys, small_vals)
t("top_k 128k -> 96", lambda v: jax.lax.top_k(v, 96), jnp.zeros((B,), jnp.int32).at[keys].add(1))
t("top_k 2048 -> 64", lambda v: jax.lax.top_k(v[:2048].astype(jnp.float32), 64), small_vals)
t("argsort (128,1024) rows", lambda v: jnp.argsort(v.reshape(128, 1024), axis=-1),
  jnp.tile(small_vals, 2))
t("argsort (96,512) rows", lambda v: jnp.argsort(v[:96*512].reshape(96, 512), axis=-1), small_vals)
# vmapped per-row gather like quadfit's S[a] windows
idx = jax.device_put(rng.integers(0, 512, (96, 512)).astype(np.int32))
tbl = jax.device_put(rng.random((96, 513)).astype(np.float32))
t("vmap row-gather (96,512)", lambda tb, ix: jax.vmap(lambda s, i: s[i])(tb, ix), tbl, idx)
