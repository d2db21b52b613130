"""Engine-loop unit tests on a stub task (no model, instant steps).

Covers the loop-control semantics the reference encodes implicitly in
``train_e2eqa.py:400-412,461-468``: an explicit ``train_iters`` is
authoritative (epochs cycle until it is reached), epochs derive the total
otherwise, and resume skips consumed batches.
"""

import dataclasses

import pytest

from emdr2_tpu.config import tiny_config
from emdr2_tpu.training import engine as engine_lib


class StubState:
    def __init__(self, step=0):
        self.step = step
        self.params = {}


class StubTask:
    def __init__(self, step=0):
        self.state = StubState(step)
        self.global_batch_size = 4
        self._jitted = {}
        self.donate_state = True
        self.steps_run = 0

    def train_step(self, batch):
        self.steps_run += 1
        self.state.step += 1
        return {"loss": 1.0}


class StubDataset:
    """10 examples -> 2 batches of 4 per epoch (drop_last)."""

    def __init__(self, n=10):
        self.n = n
        self.epoch_seeds = []

    def __len__(self):
        return self.n

    def epoch_batches(self, batch_size, seed, **kw):
        self.epoch_seeds.append(seed)
        for i in range(self.n // batch_size):
            yield ("batch", seed, i)


def _cfg(**train_kw):
    cfg = tiny_config()
    return cfg.replace(train=dataclasses.replace(
        cfg.train, log_interval=1000, save_interval=10**6,
        eval_interval=10**6, **train_kw))


class TestTrainItersAuthoritative:
    def test_explicit_train_iters_cycles_epochs(self):
        # 2 batches/epoch, epochs=2 would give 4 iters; train_iters=7 must win
        task, ds = StubTask(), StubDataset()
        it = engine_lib.train(task, ds, _cfg(epochs=2, train_iters=7),
                              printer=lambda s: None)
        assert it == 7
        assert task.steps_run == 7
        # 4 epochs consumed (2+2+2+1), each with a distinct shuffle seed
        assert len(set(ds.epoch_seeds)) == len(ds.epoch_seeds) == 4

    def test_epochs_derive_total_when_unset(self):
        task, ds = StubTask(), StubDataset()
        it = engine_lib.train(task, ds, _cfg(epochs=3, train_iters=None),
                              printer=lambda s: None)
        assert it == 3 * 2 and task.steps_run == 6

    def test_train_iters_smaller_than_epochs(self):
        task, ds = StubTask(), StubDataset()
        it = engine_lib.train(task, ds, _cfg(epochs=5, train_iters=3),
                              printer=lambda s: None)
        assert it == 3 and task.steps_run == 3

    def test_resume_skips_consumed_batches(self):
        # resume at iteration 3 = epoch 1, offset 1: only 1 step left of 4
        task, ds = StubTask(step=3), StubDataset()
        it = engine_lib.train(task, ds, _cfg(epochs=2, train_iters=None),
                              printer=lambda s: None)
        assert it == 4 and task.steps_run == 1
        # resume past a cycled boundary with explicit train_iters
        task, ds = StubTask(step=5), StubDataset()
        it = engine_lib.train(task, ds, _cfg(epochs=2, train_iters=7),
                              printer=lambda s: None)
        assert it == 7 and task.steps_run == 2

    def test_already_done_runs_nothing(self):
        task, ds = StubTask(step=7), StubDataset()
        it = engine_lib.train(task, ds, _cfg(epochs=2, train_iters=7),
                              printer=lambda s: None)
        assert it == 7 and task.steps_run == 0

    def test_empty_dataset_terminates(self):
        task, ds = StubTask(), StubDataset(n=2)  # 0 full batches of 4
        it = engine_lib.train(task, ds, _cfg(epochs=3, train_iters=9),
                              printer=lambda s: None)
        assert it == 0 and task.steps_run == 0


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
