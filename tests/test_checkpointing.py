"""Checkpoint round-trip, tracker/resume semantics, partial loaders, pruning."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdr2_tpu.config import tiny_config
from emdr2_tpu.models import EMDR2Model
from emdr2_tpu.training import step as step_lib
from emdr2_tpu.training import checkpointing as ckpt
from tests.test_models import make_batch


@pytest.fixture(scope="module")
def state_and_model():
    cfg = tiny_config()
    model = EMDR2Model(cfg)
    batch = make_batch(cfg)
    tx = step_lib.make_optimizer(cfg.train.optimizer, 100)
    state = step_lib.create_train_state(model, batch, tx,
                                        jax.random.PRNGKey(0))
    return cfg, model, batch, tx, state


def tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


class TestCheckpointRoundtrip:
    def test_save_load_tracker(self, state_and_model, tmp_path):
        cfg, model, batch, tx, state = state_and_model
        root = str(tmp_path / "ckpt")
        ckpt.save_checkpoint(root, state, iteration=7)
        assert ckpt.latest_iteration(root) == 7

        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, state)
        restored, it = ckpt.load_checkpoint(root, abstract)
        assert it == 7
        assert tree_equal(restored.params, state.params)
        assert tree_equal(restored.opt_state, state.opt_state)

    def test_async_save_durability_contract(self, state_and_model, tmp_path):
        """Async saves: save() returns after staging; the tracker advances
        only once the checkpoint is durable (finalize_async_saves joins the
        waiter); a later SYNC save drains the in-flight one first so tracker
        writes stay ordered; load after an async save restores the staged
        values."""
        cfg, model, batch, tx, state = state_and_model
        root = str(tmp_path / "ckpt_async")
        ckpt.save_checkpoint(root, state, iteration=3, async_save=True)
        ckpt.finalize_async_saves()
        assert ckpt.latest_iteration(root) == 3

        # async then sync: the sync save must drain the async one, so the
        # tracker ends at the LATER iteration even though the async write
        # finishes in the background
        bumped = state._replace(step=state.step + 1)
        ckpt.save_checkpoint(root, bumped, iteration=4, async_save=True)
        ckpt.save_checkpoint(root, bumped, iteration=5)  # sync, drains
        assert ckpt.latest_iteration(root) == 5

        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, state)
        restored, it = ckpt.load_checkpoint(root, abstract)
        assert it == 5
        assert tree_equal(restored.params, state.params)
        # the iteration-4 async checkpoint also completed and is loadable
        restored4, it4 = ckpt.load_checkpoint(root, abstract, iteration=4)
        assert it4 == 4 and int(restored4.step) == int(bumped.step)

    def test_async_save_failure_surfaces(self, state_and_model, tmp_path,
                                         monkeypatch):
        """ADVICE r4: a failed background commit (disk full, orbax error)
        must be re-raised by finalize_async_saves / the next save, not
        swallowed — otherwise interval checkpointing silently stops while
        training continues believing saves succeed."""
        import threading

        cfg, model, batch, tx, state = state_and_model
        root = str(tmp_path / "ckpt_err")

        class BoomCheckpointer:
            def save(self, path, item, force=False):
                pass  # "stages" instantly

            def wait_until_finished(self):
                raise OSError("disk full")

        monkeypatch.setattr(ckpt, "_async_checkpointer",
                            lambda: BoomCheckpointer())
        ckpt.save_checkpoint(root, state, iteration=1, async_save=True)
        with pytest.raises(RuntimeError, match="background checkpoint save"):
            ckpt.finalize_async_saves()
        # the error queue is drained: the next finalize is clean
        ckpt.finalize_async_saves()
        # the tracker was never advanced past a durable checkpoint
        assert ckpt.latest_iteration(root) is None

    def test_no_load_optim(self, state_and_model, tmp_path):
        cfg, model, batch, tx, state = state_and_model
        root = str(tmp_path / "ckpt2")
        bumped = state._replace(step=state.step + 5)
        ckpt.save_checkpoint(root, bumped, iteration=5)
        restored, _ = ckpt.load_checkpoint(root, state, load_optim=False)
        assert int(restored.step) == int(state.step)  # fresh step kept
        assert tree_equal(restored.params, state.params)

    def test_multiple_iterations_latest_wins(self, state_and_model, tmp_path):
        cfg, model, batch, tx, state = state_and_model
        root = str(tmp_path / "ckpt3")
        ckpt.save_checkpoint(root, state, iteration=1)
        ckpt.save_checkpoint(root, state, iteration=3)
        assert ckpt.latest_iteration(root) == 3

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ckpt.load_checkpoint(str(tmp_path / "nope"), None)


class TestPartialLoaders:
    def test_load_retriever_only(self, state_and_model, tmp_path):
        cfg, model, batch, tx, state = state_and_model
        root = str(tmp_path / "ckpt4")
        ckpt.save_checkpoint(root, state, iteration=2)
        abstract_ret = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            state.params["retriever"])
        sub = ckpt.load_retriever_params(root, abstract_ret)
        assert tree_equal(sub, state.params["retriever"])

    def test_load_reader_only(self, state_and_model, tmp_path):
        cfg, model, batch, tx, state = state_and_model
        root = str(tmp_path / "ckpt5")
        ckpt.save_checkpoint(root, state, iteration=2)
        abstract_reader = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            state.params["reader"])
        sub = ckpt.load_reader_params(root, abstract_reader)
        assert tree_equal(sub, state.params["reader"])


class TestPruning:
    def test_remove_stale(self, state_and_model, tmp_path):
        cfg, model, batch, tx, state = state_and_model
        root = str(tmp_path / "ckpt6")
        for it in (1, 2, 3, 4):
            ckpt.save_checkpoint(root, state, iteration=it)
        ckpt.remove_stale_checkpoints(root, keep_last=2)
        import os
        left = sorted(d for d in os.listdir(root) if d.startswith("iter_"))
        assert left == ["iter_0000003", "iter_0000004"]
        # latest still loadable
        restored, it = ckpt.load_checkpoint(
            root, jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, "shape") else x, state))
        assert it == 4


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
