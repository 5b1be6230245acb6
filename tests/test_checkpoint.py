"""Checkpoint save/restore/merge tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from toist_tpu.train import checkpoint as ckpt
from toist_tpu.train.state import TrainState


def test_merge_params_overlay():
    init = {"a": {"w": np.zeros((2, 3)), "mask_head": {"k": np.ones(4)}},
            "b": np.zeros(5)}
    loaded = {"a": {"w": np.full((2, 3), 7.0), "extra": np.ones(9)},
              "b": np.full(5, 2.0)}
    merged = ckpt.merge_params(init, loaded)
    np.testing.assert_allclose(merged["a"]["w"], 7.0)
    np.testing.assert_allclose(merged["b"], 2.0)
    np.testing.assert_allclose(merged["a"]["mask_head"]["k"], 1.0)  # kept
    assert "extra" not in merged["a"]                                # dropped


def test_merge_params_shape_mismatch():
    with pytest.raises(ValueError):
        ckpt.merge_params({"w": np.zeros((2, 3))}, {"w": np.zeros((3, 2))})


def test_save_restore_roundtrip(tmp_path):
    state = TrainState(params={"w": jnp.arange(6.0).reshape(2, 3)},
                       opt_state={"m": jnp.zeros(3)},
                       ema_params={"w": jnp.ones((2, 3))},
                       step=jnp.int32(17))
    frozen = {"frozen": {"bn": {"mean": jnp.full(4, 0.5)}}}
    path = str(tmp_path / "ck")
    ckpt.save(path, state, frozen, epoch=3)
    s2, f2, ep = ckpt.restore(path, state, frozen)
    assert ep == 3
    np.testing.assert_allclose(np.asarray(s2.params["w"]),
                               np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.asarray(s2.ema_params["w"]), 1.0)
    assert int(s2.step) == 17
    np.testing.assert_allclose(np.asarray(f2["frozen"]["bn"]["mean"]), 0.5)
    # load_params prefers EMA.
    params, fr = ckpt.load_params(path, prefer_ema=True)
    np.testing.assert_allclose(np.asarray(params["w"]), 1.0)
    params_raw, _ = ckpt.load_params(path, prefer_ema=False)
    np.testing.assert_allclose(np.asarray(params_raw["w"]),
                               np.arange(6.0).reshape(2, 3))


def test_async_save_roundtrip(tmp_path):
    """Background orbax commit: save returns immediately; wait -> restore."""
    state = TrainState(params={"w": jnp.arange(4.0)},
                       opt_state={"m": jnp.zeros(2)},
                       ema_params=None, step=jnp.int32(5))
    frozen = {"frozen": {}}
    path = str(tmp_path / "ck_async")
    ckpt.save(path, state, frozen, epoch=1, async_save=True)
    ckpt.wait_for_async_saves()
    s2, _f2, ep = ckpt.restore(path, state, frozen)
    assert ep == 1 and int(s2.step) == 5
    np.testing.assert_allclose(np.asarray(s2.params["w"]), np.arange(4.0))
