"""FPS kernel-variant lab: exact-semantics restructurings of the Pallas
furthest-point-sampling step, oracle-checked then timed.

The production kernel (ops/pallas_fps.py) spends its ~21 us/step almost
entirely in full-(B, N) VPU reductions: 3 masked-max coordinate fetches,
the argmax, a masked-max value fetch, and the first-index tie-break min —
5 "slow" full-array reductions per step (the argmax is ~10x cheaper than
max, measured).  The variants here cut the slow-reduction count without
changing semantics (bit-identical indices vs the XLA fori_loop FPS,
ops/pointops.py:78):

* v2_merged   — end-of-step ordering; the 3 coordinate fetches collapse
                into ONE masked-max over the (3B, N) stacked coords.
                Slow reduces: val + tie + merged-coords = 3.
* v3_blocked  — v2, but coords are fetched from a second (B, 3, Nb, 128)
                blocked layout with a dynamic sublane load (pl.ds) + a
                single-vreg lane select. Slow reduces: val + tie = 2.
* v4_blocked2 — v3 + the distance cache is ALSO maintained in blocked
                layout (extra elementwise work), so the value fetch is a
                dynamic load too. Slow reduces: tie = 1.

Usage:
    python tools/fps_lab.py check   # CPU interpret-mode oracle (fast)
    python tools/fps_lab.py bench   # TPU: compile+time all variants SOLO
"""
from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # python float: a jnp scalar would be a captured const


# ---------------------------------------------------------------------------
# v2: end-of-step fetches, merged coordinate reduction
# ---------------------------------------------------------------------------

def _v2_kernel(xyz_ref, out_ref, dist_ref, num_samples: int):
    b = xyz_ref.shape[0]
    n = xyz_ref.shape[2]
    m = out_ref.shape[1]
    dist_ref[...] = jnp.full((b, n), 1e10, jnp.float32)
    out_ref[...] = jnp.zeros((b, m), jnp.int32)

    xyz = xyz_ref[...]                      # (B, 3, N)
    xs = xyz.reshape(3 * b, n)              # row b*3+c
    x = xyz[:, 0, :]
    y = xyz[:, 1, :]
    z = xyz[:, 2, :]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    point_iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    point_iota3 = jax.lax.broadcasted_iota(jnp.int32, (3 * b, n), 1)

    def body(i, carry):
        lx, ly, lz = carry                  # (B, 1) coords of last pick
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        nd = jnp.minimum(dist_ref[...], d)
        dist_ref[...] = nd
        i1 = jnp.argmax(nd, axis=1).astype(jnp.int32)[:, None]
        val = jnp.max(jnp.where(point_iota == i1, nd, NEG), axis=1,
                      keepdims=True)
        nxt = jnp.min(
            jnp.where(nd == val, point_iota, n), axis=1, keepdims=True
        ).astype(jnp.int32)                 # (B, 1)
        out_ref[...] = jnp.where(slot_iota == i, nxt, out_ref[...])
        # ONE merged masked-max over (3B, N) for the next step's coords
        nxt3 = jnp.concatenate([nxt, nxt, nxt], axis=1).reshape(3 * b, 1)
        c3 = jnp.max(jnp.where(point_iota3 == nxt3, xs, NEG), axis=1,
                     keepdims=True).reshape(b, 3)
        return c3[:, 0:1], c3[:, 1:2], c3[:, 2:3]

    # initial pick is index 0: fetch its coords statically
    init = (xyz[:, 0, 0:1], xyz[:, 1, 0:1], xyz[:, 2, 0:1])
    jax.lax.fori_loop(1, num_samples, body, init)


# ---------------------------------------------------------------------------
# v3: blocked coordinate fetches (dynamic sublane load + lane select)
# ---------------------------------------------------------------------------

def _fetch_blocked_coords(xyz_blk_ref, nxt, b, lane_iota):
    """nxt: (B, 1) int32 -> (lx, ly, lz) each (B, 1) via B dynamic loads."""
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    lx = jnp.zeros((b, 1), jnp.float32)
    ly = jnp.zeros((b, 1), jnp.float32)
    lz = jnp.zeros((b, 1), jnp.float32)
    for bb in range(b):
        idx = jnp.max(jnp.where(row_iota == bb, nxt, 0))  # scalar
        row = idx // 128
        lane = idx % 128
        sel = lane_iota == lane                            # (1, 128)
        cx = jnp.max(jnp.where(sel, xyz_blk_ref[bb, 0, pl.ds(row, 1), :],
                               NEG))
        cy = jnp.max(jnp.where(sel, xyz_blk_ref[bb, 1, pl.ds(row, 1), :],
                               NEG))
        cz = jnp.max(jnp.where(sel, xyz_blk_ref[bb, 2, pl.ds(row, 1), :],
                               NEG))
        here = row_iota == bb
        lx = jnp.where(here, cx, lx)
        ly = jnp.where(here, cy, ly)
        lz = jnp.where(here, cz, lz)
    return lx, ly, lz


def _v3_kernel(xyz_ref, xyz_blk_ref, out_ref, dist_ref, num_samples: int):
    b = xyz_ref.shape[0]
    n = xyz_ref.shape[2]
    m = out_ref.shape[1]
    dist_ref[...] = jnp.full((b, n), 1e10, jnp.float32)
    out_ref[...] = jnp.zeros((b, m), jnp.int32)

    x = xyz_ref[:, 0, :]
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    point_iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, carry):
        lx, ly, lz = carry
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        nd = jnp.minimum(dist_ref[...], d)
        dist_ref[...] = nd
        i1 = jnp.argmax(nd, axis=1).astype(jnp.int32)[:, None]
        val = jnp.max(jnp.where(point_iota == i1, nd, NEG), axis=1,
                      keepdims=True)
        nxt = jnp.min(
            jnp.where(nd == val, point_iota, n), axis=1, keepdims=True
        ).astype(jnp.int32)
        out_ref[...] = jnp.where(slot_iota == i, nxt, out_ref[...])
        return _fetch_blocked_coords(xyz_blk_ref, nxt, b, lane_iota)

    init = _fetch_blocked_coords(
        xyz_blk_ref, jnp.zeros((b, 1), jnp.int32), b, lane_iota
    )
    jax.lax.fori_loop(1, num_samples, body, init)


# ---------------------------------------------------------------------------
# v4: v3 + blocked distance cache (value fetch becomes a dynamic load)
# ---------------------------------------------------------------------------

def _v4_kernel(xyz_ref, xyz_blk_ref, out_ref, dist_ref, dist_blk_ref,
               num_samples: int):
    b = xyz_ref.shape[0]
    n = xyz_ref.shape[2]
    nb = dist_blk_ref.shape[1]
    m = out_ref.shape[1]
    dist_ref[...] = jnp.full((b, n), 1e10, jnp.float32)
    dist_blk_ref[...] = jnp.full((b, nb, 128), 1e10, jnp.float32)
    out_ref[...] = jnp.zeros((b, m), jnp.int32)

    x = xyz_ref[:, 0, :]
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    point_iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)

    def body(i, carry):
        lx, ly, lz = carry                  # (B, 1)
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        nd = jnp.minimum(dist_ref[...], d)
        dist_ref[...] = nd
        # blocked mirror of the same update, per batch row
        for bb in range(b):
            sx = jnp.max(jnp.where(row_iota == bb, lx, NEG))
            sy = jnp.max(jnp.where(row_iota == bb, ly, NEG))
            sz = jnp.max(jnp.where(row_iota == bb, lz, NEG))
            db = ((xyz_blk_ref[bb, 0, :, :] - sx) ** 2
                  + (xyz_blk_ref[bb, 1, :, :] - sy) ** 2
                  + (xyz_blk_ref[bb, 2, :, :] - sz) ** 2)
            dist_blk_ref[bb, :, :] = jnp.minimum(dist_blk_ref[bb, :, :], db)
        i1 = jnp.argmax(nd, axis=1).astype(jnp.int32)[:, None]
        # value fetch: dynamic load from the blocked cache
        val = jnp.zeros((b, 1), jnp.float32)
        for bb in range(b):
            idx = jnp.max(jnp.where(row_iota == bb, i1, 0))
            blkrow = dist_blk_ref[bb, pl.ds(idx // 128, 1), :]
            v = jnp.max(jnp.where(lane_iota == idx % 128, blkrow, NEG))
            val = jnp.where(row_iota == bb, v, val)
        nxt = jnp.min(
            jnp.where(nd == val, point_iota, n), axis=1, keepdims=True
        ).astype(jnp.int32)
        out_ref[...] = jnp.where(slot_iota == i, nxt, out_ref[...])
        return _fetch_blocked_coords(xyz_blk_ref, nxt, b, lane_iota)

    init = _fetch_blocked_coords(
        xyz_blk_ref, jnp.zeros((b, 1), jnp.int32), b, lane_iota
    )
    jax.lax.fori_loop(1, num_samples, body, init)


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------

def _blocked_coords(xyz):
    """(B, N, 3) -> (B, 3, Nb, 128) f32, zero-padded (pad never fetched)."""
    B, N, _ = xyz.shape
    nb = -(-N // 128)
    pad = nb * 128 - N
    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, pad)))
    return xt.reshape(B, 3, nb, 128)


def fps_v2(xyz, num_samples: int, interpret=False):
    B, N, _ = xyz.shape
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)
    kernel = functools.partial(_v2_kernel, num_samples=num_samples)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((B, 3, N), lambda _: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, num_samples), lambda _: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, num_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        interpret=interpret,
    )(xyz_t)


def fps_v3(xyz, num_samples: int, interpret=False):
    B, N, _ = xyz.shape
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)
    blk = _blocked_coords(xyz)
    nb = blk.shape[2]
    kernel = functools.partial(_v3_kernel, num_samples=num_samples)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, 3, N), lambda _: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3, nb, 128), lambda _: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, num_samples), lambda _: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, num_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        interpret=interpret,
    )(xyz_t, blk)


def fps_v4(xyz, num_samples: int, interpret=False):
    B, N, _ = xyz.shape
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)
    blk = _blocked_coords(xyz)
    nb = blk.shape[2]
    kernel = functools.partial(_v4_kernel, num_samples=num_samples)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, 3, N), lambda _: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3, nb, 128), lambda _: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, num_samples), lambda _: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, num_samples), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((B, N), jnp.float32),
            pltpu.VMEM((B, nb, 128), jnp.float32),
        ],
        interpret=interpret,
    )(xyz_t, blk)


VARIANTS = {"v2_merged": fps_v2, "v3_blocked": fps_v3, "v4_blocked2": fps_v4}


def _oracle(xyz, m):
    import nesie_tpu.ops.pointops as pointops

    prev = pointops._FPS_IMPL
    pointops.set_fps_impl("xla")
    try:
        return pointops.furthest_point_sample(xyz, m)
    finally:
        pointops.set_fps_impl(prev)


def check():
    """Interpret-mode oracle on CPU: random + tie-heavy (duplicated) pts."""
    jax.config.update("jax_platforms", "cpu")
    key = jax.random.PRNGKey(0)
    B, N, M = 3, 600, 37
    rand = jax.random.uniform(key, (B, N, 3))
    # tie-heavy: only 40 distinct points, rest duplicates
    base = jax.random.uniform(jax.random.PRNGKey(1), (B, 40, 3))
    dup = jnp.tile(base, (1, N // 40, 1))[:, :N]
    for name, fn in VARIANTS.items():
        for tag, pts in (("rand", rand), ("dup", dup)):
            want = _oracle(pts, M)
            got = fn(pts, M, interpret=True)
            ok = bool(jnp.array_equal(want, got))
            print(f"{name} {tag}: {'OK' if ok else 'MISMATCH'}")
            if not ok:
                bad = jnp.argmax(jnp.any(want != got, axis=0))
                print("  first bad slot", int(bad),
                      want[:, bad], got[:, bad])
                return 1
    print("all variants exact")
    return 0


def bench():
    """TPU: oracle-check then time every variant at the SA1 shape."""
    import nesie_tpu.ops.pointops as pointops
    from nesie_tpu.ops.pallas_fps import furthest_point_sample_pallas

    B, N, M = 8, 40000, 2048
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (B, N, 3))
    want = jax.jit(lambda p: _oracle(p, M))(xyz)

    cand = {"v0_current": lambda p, m: furthest_point_sample_pallas(p, m)}
    cand.update({k: (lambda p, m, f=f: f(p, m)) for k, f in VARIANTS.items()})

    results = {}
    for name, fn in cand.items():
        jf = jax.jit(lambda p, fn=fn: fn(p, M))
        try:
            got = jf(xyz)
            exact = bool(jnp.array_equal(want, got))
        except Exception as e:  # compile failure is a result too
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)
            continue
        # sync via host pull (block_until_ready lies on this backend)
        float(jnp.sum(got))
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            float(jnp.sum(jf(xyz)))
        ms = (time.perf_counter() - t0) / iters * 1000
        results[name] = ms
        print(json.dumps({"variant": name, "ms": round(ms, 2),
                          "exact": exact,
                          "us_per_step": round(ms * 1000 / M, 2)}),
              flush=True)
    return 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    sys.path.insert(0, "/root/repo")
    sys.exit(check() if mode == "check" else bench())
