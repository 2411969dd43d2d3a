"""Pallas FPS kernel vs the XLA reference implementation (interpret mode
on CPU; the compiled path is exercised on TPU by bench/profile runs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nesie_tpu.ops import furthest_point_sample


def test_pallas_fps_matches_xla_interpret(monkeypatch):
    from jax.experimental import pallas as pl

    import nesie_tpu.ops.pallas_fps as pf

    # force interpret mode so the kernel runs on CPU
    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    want = np.asarray(furthest_point_sample(xyz, 16))
    got = np.asarray(pf.furthest_point_sample_pallas(xyz, 16))
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_batched_matches_xla(monkeypatch):
    """The batched (one-cell) kernel path: B rows advance in lockstep."""
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from nesie_tpu.ops import furthest_point_sample
    from nesie_tpu.ops import pallas_fps

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.uniform(size=(5, 200, 3)).astype(np.float32))
    want = np.asarray(furthest_point_sample(xyz, 48))
    got = np.asarray(pallas_fps.furthest_point_sample_pallas(xyz, 48))
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_chunked_grid_matches_xla(monkeypatch):
    """Batches over the per-cell VMEM budget are chunked into row-groups
    with padding (B=24 on 40k-point clouds OOMed the 16 MB scoped VMEM
    before this path existed); outputs must match the XLA loop exactly."""
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from nesie_tpu.ops import furthest_point_sample
    from nesie_tpu.ops import pallas_fps

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    # shrink the budget so a small case exercises the multi-cell grid:
    # N=200 -> rows = (12800 // 3200) // 8 * 8 = ... force rows=8 w/ pad
    monkeypatch.setattr(pallas_fps, "_VMEM_CELL_BUDGET", 8 * 16 * 200)
    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.uniform(size=(11, 200, 3)).astype(np.float32))
    want = np.asarray(furthest_point_sample(xyz, 32))
    got = np.asarray(pallas_fps.furthest_point_sample_pallas(xyz, 32))
    np.testing.assert_array_equal(got, want)


def test_pallas_impls_work_under_grad(monkeypatch):
    """Pallas index kernels must be usable inside jax.grad (training):
    indices carry no tangents, but pallas_call has no JVP rule, so the
    dispatchers cut the gradient path. Gradients still flow through the
    gathered features."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import nesie_tpu.ops.pointops as po

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    po.set_fps_impl("pallas")
    po.set_ball_query_impl("pallas")
    try:
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.uniform(size=(1, 256, 3)).astype(np.float32))

        def loss(pts):
            idx = po.furthest_point_sample(pts, 128)
            centers = po.gather_points(pts, idx)
            nbr = po.ball_query(pts, centers, 0.3, 8)
            grouped = po.group_points(pts, nbr)
            return jnp.sum(grouped * grouped)

        g = jax.grad(loss)(xyz)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
    finally:
        po.set_fps_impl("xla")
        po.set_ball_query_impl("xla")
