#!/usr/bin/env python
"""FPS kernel latency experiments (VERDICT r4 item 5: the named perf
lever — eval is capped by the Pallas FPS latency wall of 2047 dependent
steps).

Hypothesis: each FPS step spends most of its time in VPU *reduce
latency*, not element throughput. The shipped kernel issues per step
4 masked float-MAX reduces (3 coord fetches + argmax-value fetch; float
max was measured ~10x slower than argmax here) plus argmax plus the
tie-break min. Variants cut the slow-reduce count:

  v0    shipped `_fps_batched_kernel` (4 float-max + argmax + min)
  v1    fetches via masked SUM (exactly one selected element per row, so
        sum == gather); argmax + sum-fetch value + min tie-break
  v2    v1 fetches + tie-break via monotone int32 bitcast max + min
        (squared distances are >= 0, so the f32 bit pattern is
        order-preserving; no -0.0 can occur) — no argmax, no value fetch
  v3    v2 + two independent row-group chains interleaved in one body
        (ILP across the groups hides reduce latency)
  xla   fori_loop baseline

All variants must be bit-identical to the XLA reference (first-index
argmax ties). Run SOLO on the TPU (concurrent CPU jobs skew wall times
5x — CLAUDE.md).

    python tools/fps_experiments.py --batch 32 --n 40000 --m 2048
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _sync(out):
    return float(jnp.sum(out.astype(jnp.float32)))


# --------------------------------------------------------------- fetches
def _fetch_sum(arr, sel):
    """Gather each row's single selected element by masked sum."""
    return jnp.sum(jnp.where(sel, arr, 0.0), axis=1, keepdims=True)


def _tie_argmax_sum(nd, point_iota, n):
    """Shipped tie-break minus the float-max value fetch: argmax (fast),
    fetch its value by masked SUM, then first-index over equals."""
    i1 = jnp.argmax(nd, axis=1).astype(jnp.int32)[:, None]
    val = jnp.sum(jnp.where(point_iota == i1, nd, 0.0), axis=1,
                  keepdims=True)
    return jnp.min(jnp.where(nd == val, point_iota, n), axis=1,
                   keepdims=True).astype(jnp.int32)


def _tie_bitcast(nd, point_iota, n):
    """First-index argmax in two integer reduces: nd >= 0 so bitcast to
    int32 preserves order; equality on bits is equality on values."""
    bits = pltpu.bitcast(nd, jnp.int32)
    m = jnp.max(bits, axis=1, keepdims=True)
    return jnp.min(jnp.where(bits == m, point_iota, n), axis=1,
                   keepdims=True).astype(jnp.int32)


def _step(x, y, z, dist, last, point_iota, n, tie):
    sel = point_iota == last
    lx = _fetch_sum(x, sel)
    ly = _fetch_sum(y, sel)
    lz = _fetch_sum(z, sel)
    d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
    nd = jnp.minimum(dist, d)
    return nd, tie(nd, point_iota, n)


def _kernel_v12(xyz_ref, out_ref, dist_ref, num_samples: int, tie):
    b, n = xyz_ref.shape[0], xyz_ref.shape[2]
    m = out_ref.shape[1]
    dist_ref[...] = jnp.full((b, n), 1e10, jnp.float32)
    out_ref[...] = jnp.zeros((b, m), jnp.int32)
    x = xyz_ref[:, 0, :]
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    point_iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)

    def body(i, last):
        nd, nxt = _step(x, y, z, dist_ref[...], last, point_iota, n, tie)
        dist_ref[...] = nd
        out_ref[...] = jnp.where(slot_iota == i, nxt, out_ref[...])
        return nxt

    jax.lax.fori_loop(1, num_samples, body, jnp.zeros((b, 1), jnp.int32))


def _kernel_v3(xyz_ref, out_ref, dist_ref, num_samples: int, tie):
    """Two independent row-group chains per body — back-to-back issue of
    group B's elementwise work while group A's reduces retire."""
    b, n = xyz_ref.shape[0], xyz_ref.shape[2]
    m = out_ref.shape[1]
    h = b // 2
    dist_ref[...] = jnp.full((b, n), 1e10, jnp.float32)
    out_ref[...] = jnp.zeros((b, m), jnp.int32)
    xa, xb = xyz_ref[:h, 0, :], xyz_ref[h:, 0, :]
    ya, yb = xyz_ref[:h, 1, :], xyz_ref[h:, 1, :]
    za, zb = xyz_ref[:h, 2, :], xyz_ref[h:, 2, :]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    point_iota = jax.lax.broadcasted_iota(jnp.int32, (h, n), 1)

    def body(i, carry):
        la, lb = carry
        nda, nxa = _step(xa, ya, za, dist_ref[:h], la, point_iota, n, tie)
        ndb, nxb = _step(xb, yb, zb, dist_ref[h:], lb, point_iota, n, tie)
        dist_ref[:h] = nda
        dist_ref[h:] = ndb
        nxt = jnp.concatenate([nxa, nxb], axis=0)
        out_ref[...] = jnp.where(slot_iota == i, nxt, out_ref[...])
        return nxa, nxb

    z0 = jnp.zeros((h, 1), jnp.int32)
    jax.lax.fori_loop(1, num_samples, body, (z0, z0))


def _kernel_v4(xyz_ref, out_ref, dist_ref, num_samples: int, tie,
               unroll: int = 1):
    """Coords stacked (3R, N) [x-block; y-block; z-block]: ONE masked-sum
    fetch per step instead of three, bitcast tie-break — 3 reduce
    latencies per step total."""
    b3, n = xyz_ref.shape
    b = b3 // 3
    m = out_ref.shape[1]
    dist_ref[...] = jnp.full((b, n), 1e10, jnp.float32)
    out_ref[...] = jnp.zeros((b, m), jnp.int32)
    xyz = xyz_ref[...]
    x = xyz[0:b]
    y = xyz[b:2 * b]
    z = xyz[2 * b:]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    point_iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    point_iota3 = jax.lax.broadcasted_iota(jnp.int32, (b3, n), 1)

    def body(i, last):
        last3 = jnp.concatenate([last, last, last], axis=0)  # (3B,1)
        fetched = jnp.sum(jnp.where(point_iota3 == last3, xyz, 0.0),
                          axis=1, keepdims=True)
        lx = fetched[0:b]
        ly = fetched[b:2 * b]
        lz = fetched[2 * b:]
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        nd = jnp.minimum(dist_ref[...], d)
        dist_ref[...] = nd
        nxt = tie(nd, point_iota, n)
        out_ref[...] = jnp.where(slot_iota == i, nxt, out_ref[...])
        return nxt

    jax.lax.fori_loop(1, num_samples, body, jnp.zeros((b, 1), jnp.int32),
                      unroll=unroll)


def make_stacked_variant(rows, n, num_samples, tie, unroll=1,
                         interpret=False):
    def run(xyz):
        B = xyz.shape[0]
        assert B % rows == 0
        g = B // rows
        xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
        stacked = xyz_t.reshape(g, rows, 3, n).swapaxes(1, 2).reshape(
            g * 3 * rows, n)
        k = functools.partial(_kernel_v4, num_samples=num_samples, tie=tie,
                              unroll=unroll)
        return pl.pallas_call(
            k,
            grid=(g,),
            in_specs=[pl.BlockSpec((3 * rows, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, num_samples), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, num_samples), jnp.int32),
            scratch_shapes=[pltpu.VMEM((rows, n), jnp.float32)],
            interpret=interpret,
        )(stacked)

    return run


def make_variant(kernel, tie, rows, n, num_samples, interpret=False):
    def run(xyz):
        B = xyz.shape[0]
        assert B % rows == 0
        xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
        k = functools.partial(kernel, num_samples=num_samples, tie=tie)
        return pl.pallas_call(
            k,
            grid=(B // rows,),
            in_specs=[pl.BlockSpec((rows, 3, n), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, num_samples), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, num_samples), jnp.int32),
            scratch_shapes=[pltpu.VMEM((rows, n), jnp.float32)],
            interpret=interpret,
        )(xyz_t)

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--n", type=int, default=40000)
    p.add_argument("--m", type=int, default=2048)
    p.add_argument("--rows", type=int, default=16)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--variants", default="xla,v0,v1,v2,v3")
    p.add_argument("--json-out", default=None)
    p.add_argument("--interpret", action="store_true",
                   help="interpret-mode correctness check (CPU, no v0)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from nesie_tpu.ops import pointops
    from nesie_tpu.ops.pallas_fps import furthest_point_sample_pallas
    from nesie_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(
        rng.normal(size=(args.batch, args.n, 3)).astype(np.float32) * 3.0)

    pointops.set_fps_impl("xla")
    xla_fn = jax.jit(functools.partial(pointops.furthest_point_sample,
                                       num_samples=args.m))
    ref = None
    ref_v0 = None

    mk = functools.partial(make_variant, rows=args.rows, n=args.n,
                           num_samples=args.m, interpret=args.interpret)
    variants = {
        "xla": xla_fn,
        "v0": jax.jit(functools.partial(furthest_point_sample_pallas,
                                        num_samples=args.m)),
        "v1": jax.jit(mk(_kernel_v12, _tie_argmax_sum)),
        "v2": jax.jit(mk(_kernel_v12, _tie_bitcast)),
        "v3": jax.jit(mk(_kernel_v3, _tie_bitcast)),
        "v4": jax.jit(make_stacked_variant(args.rows, args.n, args.m,
                                           _tie_bitcast,
                                           interpret=args.interpret)),
        "v5": jax.jit(make_stacked_variant(args.rows, args.n, args.m,
                                           _tie_bitcast, unroll=4,
                                           interpret=args.interpret)),
    }

    results = {}
    for name in args.variants.split(","):
        fn = variants[name]
        try:
            t0 = time.perf_counter()
            out = fn(xyz)
            _sync(out)
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                _sync(fn(xyz))
                times.append(time.perf_counter() - t0)
            ms = min(times) * 1e3
            out_np = np.asarray(out)
            if name == "xla":
                ref = out_np
            if name == "v0":
                ref_v0 = out_np
            exact = ref is not None and bool(np.array_equal(out_np, ref))
            # on TPU the XLA baseline fuses the distance arithmetic
            # differently (FMA order), so the shipped kernel is the
            # bit-parity reference for the variants
            exact_v0 = (ref_v0 is not None
                        and bool(np.array_equal(out_np, ref_v0)))
            results[name] = {"ms": round(ms, 2), "exact_vs_xla": exact,
                             "exact_vs_v0": exact_v0,
                             "compile_s": round(compile_s, 1)}
            print(f"{name}: {ms:.2f} ms  exact_xla={exact} "
                  f"exact_v0={exact_v0} (compile {compile_s:.0f}s)")
        except Exception as e:  # keep going; record the failure
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(
            {"batch": args.batch, "n": args.n, "m": args.m,
             "rows": args.rows, "results": results}, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
