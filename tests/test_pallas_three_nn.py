"""Pallas three_nn kernel vs the XLA reference implementation (interpret
mode on CPU; the compiled path is exercised on TPU by bench/profile
runs)."""
import numpy as np
import jax
import jax.numpy as jnp

import nesie_tpu.ops.pointops as po


def _interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )


def test_pallas_three_nn_matches_xla_interpret(monkeypatch):
    _interpret_pallas(monkeypatch)
    from nesie_tpu.ops.pallas_three_nn import three_nn_pallas

    rng = np.random.default_rng(0)
    # M not a multiple of the 128-query cell; N not a multiple of the tile
    q = jnp.asarray(rng.normal(size=(2, 300, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(2, 200, 3)).astype(np.float32))
    want_d, want_i = po.three_nn(q, s)
    got_d, got_i = three_nn_pallas(q, s)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    # the kernel uses the exact (a-b)^2 distance form, the XLA path the
    # matmul form — equal to float rounding, not bitwise
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-4, atol=1e-5
    )


def test_three_nn_pallas_dispatch_and_grad(monkeypatch):
    """The dispatcher path: indices from the kernel, distances recomputed
    differentiably (iou_opt ascends through the interpolation weights)."""
    _interpret_pallas(monkeypatch)
    po.set_three_nn_impl("pallas")
    try:
        rng = np.random.default_rng(1)
        q = np.asarray(rng.normal(size=(1, 64, 3)), np.float32)
        s = jnp.asarray(rng.normal(size=(1, 96, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(1, 96, 8)).astype(np.float32))

        def loss(qq):
            dist, idx = po.three_nn(qq, s)
            w = 1.0 / (dist + 1e-8)
            w = w / jnp.sum(w, axis=-1, keepdims=True)
            return jnp.sum(po.three_interpolate(feats, idx, w) ** 2)

        po.set_three_nn_impl("xla")
        want = loss(jnp.asarray(q))
        po.set_three_nn_impl("pallas")
        got, g = jax.value_and_grad(loss)(jnp.asarray(q))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        g = np.asarray(g)
        assert np.isfinite(g).all() and np.abs(g).sum() > 0
    finally:
        po.set_three_nn_impl("auto")


def test_three_nn_pallas_large_source_falls_back(monkeypatch):
    """Sources past the VMEM guard must silently use the XLA path (no
    pallas_call reached) rather than compile an oversized cell."""
    def boom(*a, **k):  # pragma: no cover - failure branch
        raise AssertionError("pallas path should not be taken")

    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call", boom)
    po.set_three_nn_impl("pallas")
    try:
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(1, 16, 3)).astype(np.float32))
        s = jnp.asarray(rng.normal(size=(1, 8320, 3)).astype(np.float32))
        dist, idx = po.three_nn(q, s)
        assert dist.shape == (1, 16, 3) and idx.shape == (1, 16, 3)
    finally:
        po.set_three_nn_impl("auto")
