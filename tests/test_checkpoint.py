"""CheckpointManager: composite save/restore, weights-only load from a
semi checkpoint (the tools/test.py path), legacy single-item fallback."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nesie_tpu.train.runner import CheckpointManager
from nesie_tpu.train.semi import UlbState
from nesie_tpu.train.state import TrainState, create_train_state


def _tiny_state(seed=0):
    params = {"w": jnp.full((3, 3), float(seed)), "b": jnp.zeros((3,))}
    variables = {"params": params, "batch_stats": {"m": jnp.ones((3,))}}
    tx = optax.adamw(1e-3)
    return create_train_state(variables, tx)


def test_roundtrip_with_ulb_state(tmp_path):
    state = _tiny_state(1)._replace(step=jnp.asarray(7))
    ulb = UlbState.create(num_unlabeled=5, num_classes=4)
    ulb = ulb._replace(ulb_list=ulb.ulb_list + 2.0)
    mgr = CheckpointManager(tmp_path)
    mgr.save(7, state, ulb)

    fresh_state = _tiny_state(0)
    fresh_ulb = UlbState.create(num_unlabeled=5, num_classes=4)
    got_state, got_ulb, step = CheckpointManager(tmp_path).restore(
        fresh_state, fresh_ulb
    )
    assert step == 7 and int(got_state.step) == 7
    np.testing.assert_allclose(np.asarray(got_state.params["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(got_ulb.ulb_list), 2.0)


def test_state_only_restore_from_semi_checkpoint(tmp_path):
    """tools/test.py restores only the TrainState; a semi checkpoint also
    contains ulb_state and must not break the eval path."""
    state = _tiny_state(3)._replace(step=jnp.asarray(2))
    ulb = UlbState.create(num_unlabeled=5, num_classes=4)
    CheckpointManager(tmp_path).save(2, state, ulb)

    got_state, got_ulb, step = CheckpointManager(tmp_path).restore(
        _tiny_state(0)
    )
    assert step == 2
    assert got_ulb is None
    np.testing.assert_allclose(np.asarray(got_state.params["w"]), 3.0)


def test_restore_empty_dir(tmp_path):
    state = _tiny_state(0)
    got, ulb, step = CheckpointManager(tmp_path).restore(state)
    assert step == 0 and got is state and ulb is None


def test_legacy_single_item_fallback(tmp_path):
    """Checkpoints written by the previous layout (one 'default' payload
    dict) still restore."""
    import orbax.checkpoint as ocp

    state = _tiny_state(5)._replace(step=jnp.asarray(4))
    legacy = ocp.CheckpointManager((tmp_path / "checkpoints").absolute())
    legacy.save(4, args=ocp.args.StandardSave({"state": state}))
    legacy.wait_until_finished()
    legacy.close()

    got_state, _, step = CheckpointManager(tmp_path).restore(_tiny_state(0))
    assert step == 4
    np.testing.assert_allclose(np.asarray(got_state.params["w"]), 5.0)


def test_weights_only_load_clones_student_as_teacher():
    """--load-from parity: the reference's SimiTeacherHook registers ema
    buffers from the live (loaded) parameters (simi_teacher_hook.py:47-52)
    — pretrain checkpoints carry no EMA — so a weights-only load must
    clone the student into the teacher and keep the fresh optimizer/step."""
    import jax.numpy as jnp

    from nesie_tpu.train.runner import weights_only_load
    from nesie_tpu.train.state import (
        create_train_state, make_lr_schedule, make_optimizer,
    )

    tx = make_optimizer(make_lr_schedule(1e-3, 10))

    def mk(scale):
        variables = {
            "params": {"w": jnp.full((3,), scale)},
            "batch_stats": {"m": jnp.full((2,), scale * 10)},
        }
        return create_train_state(variables, tx)

    fresh = mk(0.0)
    loaded = mk(2.0)
    # make the loaded checkpoint's own EMA distinct from its params
    loaded = loaded._replace(
        ema_params={"w": jnp.full((3,), -1.0)},
        step=loaded.step + 100,
    )
    out = weights_only_load(fresh, loaded)
    np.testing.assert_array_equal(np.asarray(out.params["w"]), 2.0)
    # teacher == loaded student, NOT the loaded checkpoint's EMA
    np.testing.assert_array_equal(np.asarray(out.ema_params["w"]), 2.0)
    np.testing.assert_array_equal(np.asarray(out.ema_batch_stats["m"]), 20.0)
    assert int(out.step) == 0  # fresh counter


def test_resume_rescales_step_on_device_count_change(tmp_path):
    """Reference simi_epoch_based_runner.py:220-231: resuming on a
    different device count rescales the iteration counter so the epoch
    position (and LR schedule) stays aligned."""
    import jax.numpy as jnp

    from nesie_tpu.train.runner import CheckpointManager
    from nesie_tpu.train.state import (
        create_train_state, make_lr_schedule, make_optimizer,
    )

    tx = make_optimizer(make_lr_schedule(1e-3, 10))
    variables = {"params": {"w": jnp.ones((2,))},
                 "batch_stats": {"m": jnp.zeros((2,))}}
    state = create_train_state(variables, tx)
    state = state._replace(step=jnp.asarray(100, state.step.dtype))

    mgr = CheckpointManager(tmp_path)
    mgr.save(100, state, meta={"mesh_size": 2})

    fresh = create_train_state(variables, tx)
    # same mesh size: no rescale
    s_same, _, at = CheckpointManager(tmp_path).restore(fresh, mesh_size=2)
    assert at == 100 and int(s_same.step) == 100
    # written on 2 devices, resumed on 4: 100 * 2/4 = 50
    s_scaled, _, at2 = CheckpointManager(tmp_path).restore(fresh, mesh_size=4)
    assert at2 == 50 and int(s_scaled.step) == 50
    # no mesh_size passed: untouched
    s_raw, _, at3 = CheckpointManager(tmp_path).restore(fresh)
    assert at3 == 100 and int(s_raw.step) == 100


def test_process_local_rows_partitions_batch():
    from nesie_tpu.parallel import process_local_rows

    lo, hi = process_local_rows(24)  # single process: whole batch
    assert (lo, hi) == (0, 24)
