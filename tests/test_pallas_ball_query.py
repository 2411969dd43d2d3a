"""Pallas ball-query kernel vs the XLA implementation (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nesie_tpu.ops import ball_query


def test_pallas_ball_query_matches_xla(monkeypatch):
    from jax.experimental import pallas as pl

    import nesie_tpu.ops.pallas_ball_query as pbq

    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    rng = np.random.default_rng(0)
    B, N, M, K = 2, 256, 128, 8
    xyz = jnp.asarray(rng.uniform(size=(B, N, 3)).astype(np.float32))
    centers = xyz[:, :M]  # includes exact-duplicate hits
    want = np.asarray(ball_query(xyz, centers, 0.2, K))
    got = np.asarray(
        pbq.ball_query_pallas(xyz, centers, 0.2, K, tile=64)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_ball_query_no_neighbors(monkeypatch):
    from jax.experimental import pallas as pl

    import nesie_tpu.ops.pallas_ball_query as pbq

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    xyz = jnp.ones((1, 128, 3))
    centers = jnp.zeros((1, 128, 3))
    got = np.asarray(pbq.ball_query_pallas(xyz, centers, 0.1, 4, tile=64))
    np.testing.assert_array_equal(got, 0)


def test_pallas_ball_query_with_padding(monkeypatch):
    from jax.experimental import pallas as pl

    import nesie_tpu.ops.pallas_ball_query as pbq

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    rng = np.random.default_rng(1)
    B, N, M, K = 1, 200, 128, 6  # 200 % 64 != 0 -> padding path
    xyz = jnp.asarray(rng.uniform(size=(B, N, 3)).astype(np.float32))
    centers = xyz[:, :M]
    want = np.asarray(ball_query(xyz, centers, 0.25, K))
    got = np.asarray(
        pbq.ball_query_pallas(xyz, centers, 0.25, K, tile=64)
    )
    np.testing.assert_array_equal(got, want)
