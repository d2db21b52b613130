"""Disjoint embedder sub-mesh tests (BASELINE config 4).

The reference dedicates 8 of 16 GPUs to perpetual re-embedding
(``/root/reference/tasks/openqa/e2eqa/async_indexer.py:84-144``, groups at
``mpu/initialize.py:255-263``). Here ``parallel.build_meshes`` carves a
disjoint device sub-mesh for the embedder; these tests prove on the virtual
8-device CPU mesh that:

- train mesh and embed mesh share zero devices;
- the embedder's jitted program executes on embed devices ONLY, and train
  steps on train devices ONLY (so by construction a refresh steals zero
  train-device cycles — the "zero train steps on embed devices" criterion);
- a full async refresh round-trips through the sub-mesh: correct embeddings
  land in the (train-mesh-sharded) index;
- the trainer keeps stepping while an embed pass is in flight.
"""

import dataclasses
import time

import jax
import numpy as np
import pytest

from emdr2_tpu.config import MeshConfig
from emdr2_tpu.parallel import build_meshes
from emdr2_tpu.retrieval import ShardedEvidenceIndex
from emdr2_tpu.retrieval.builder import EvidenceIndexBuilder
from emdr2_tpu.tasks import E2EQATask
from emdr2_tpu.training.async_refresh import AsyncIndexRefresher
from tests.helpers import build_toy_world


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    return build_toy_world(tmp_path_factory.mktemp("toy"))


def split_world(world, dp=6, embed=2):
    cfg, tok, corpus, ds, _ = world
    cfg = cfg.replace(mesh=MeshConfig(dp=dp, tp=1, embed_devices=embed))
    train_mesh, embed_mesh = build_meshes(cfg.mesh)
    emb = np.random.RandomState(0).randn(
        len(corpus), cfg.index.embed_dim).astype(np.float32)
    index = ShardedEvidenceIndex(train_mesh, cfg.index, emb)
    task = E2EQATask(cfg, train_mesh, tok, corpus, index,
                     total_train_iters=40)
    task.init_state(jax.random.PRNGKey(0), dp)
    builder = EvidenceIndexBuilder(
        cfg, embed_mesh, task.model, corpus, tok.cls_id, tok.sep_id,
        tok.pad_id, batch_size=16)
    return cfg, tok, corpus, ds, train_mesh, embed_mesh, index, task, builder


class TestMeshSplit:
    def test_meshes_are_disjoint(self):
        cfg = MeshConfig(dp=6, tp=1, embed_devices=2)
        train_mesh, embed_mesh = build_meshes(cfg)
        train_devs = set(train_mesh.devices.flat)
        embed_devs = set(embed_mesh.devices.flat)
        assert len(train_devs) == 6 and len(embed_devs) == 2
        assert not (train_devs & embed_devs), "sub-meshes overlap"
        assert embed_mesh.axis_names == train_mesh.axis_names

    def test_no_submesh_when_zero(self):
        train_mesh, embed_mesh = build_meshes(MeshConfig(dp=8, tp=1))
        assert embed_mesh is None
        assert train_mesh.devices.size == 8

    def test_oversubscription_rejected(self):
        with pytest.raises(AssertionError):
            build_meshes(MeshConfig(dp=8, tp=1, embed_devices=2))


class TestDisjointExecution:
    def test_embed_runs_on_embed_devices_only(self, world):
        (cfg, tok, corpus, ds, train_mesh, embed_mesh, index, task,
         builder) = split_world(world)
        train_devs = set(train_mesh.devices.flat)
        embed_devs = set(embed_mesh.devices.flat)

        # train step output lives on train devices only
        batch = next(ds.epoch_batches(6, seed=0))
        task.train_step(batch)
        state_devs = set()
        for leaf in jax.tree_util.tree_leaves(task.state.params):
            state_devs |= set(leaf.sharding.device_set)
        assert state_devs <= train_devs
        assert not (state_devs & embed_devs)

        # the embedder's jitted program is compiled against embed devices:
        # its device output never touches a train device
        host_params = jax.tree_util.tree_map(np.asarray, task.state.params)
        placed = builder.place_params(host_params)
        placed_devs = set()
        for leaf in jax.tree_util.tree_leaves(placed):
            placed_devs |= set(leaf.sharding.device_set)
        assert placed_devs == embed_devs
        ids, types = builder._format_rows(np.arange(1, 17))
        out = builder._embed(placed, ids, types)
        assert set(out.sharding.device_set) <= embed_devs
        assert not (set(out.sharding.device_set) & train_devs)

    def test_async_refresh_through_submesh(self, world):
        (cfg, tok, corpus, ds, train_mesh, embed_mesh, index, task,
         builder) = split_world(world)
        refresher = AsyncIndexRefresher(builder, index, reload_interval=2)
        refresher.start(task.state.params)
        start_params = jax.tree_util.tree_map(np.asarray, task.state.params)

        batches = iter(list(ds.epoch_batches(6, seed=0)) * 20)
        swapped_at = []
        for step in range(1, 25):
            if refresher.maybe_swap(step, task.state.params):
                swapped_at.append(step)
            task.train_step(next(batches))
            if swapped_at:
                break
        got_first_swap = bool(swapped_at)
        if not got_first_swap:
            # slow box: force the boundary once the build finishes
            assert refresher.wait_for_result(timeout=300)
            assert refresher.maybe_swap(100, task.state.params)
        refresher.stop()
        assert refresher.error is None
        assert refresher.refresh_count >= 1

        # index contents = embeddings of the weights handed over at start()
        # (one-interval staleness), now sharded on the TRAIN mesh
        if refresher.refresh_count == 1:
            expected = builder.embed_corpus(start_params)
            got = np.asarray(index.embeddings)[: len(corpus)]
            np.testing.assert_allclose(got, expected.astype(np.float32),
                                       atol=2e-2)
        assert set(index.embeddings.sharding.device_set) == set(
            train_mesh.devices.flat)

    def test_training_proceeds_while_embed_in_flight(self, world):
        """Non-stalling: with an embed pass artificially slowed to ~2s, the
        trainer completes many steps before the refresh lands (the reference
        polls is_completed() without blocking, train_e2eqa.py:477-508)."""
        (cfg, tok, corpus, ds, train_mesh, embed_mesh, index, task,
         builder) = split_world(world)
        real_embed = builder.embed_corpus

        def slow_embed(params, progress=None):
            out = real_embed(params)
            time.sleep(2.0)
            return out

        builder.embed_corpus = slow_embed
        refresher = AsyncIndexRefresher(builder, index, reload_interval=1)

        batch = next(ds.epoch_batches(6, seed=0))
        task.train_step(batch)  # compile outside the timed region

        refresher.start(task.state.params)
        steps_before_swap = 0
        for step in range(1, 200):
            if refresher.maybe_swap(step, task.state.params):
                break
            task.train_step(batch)
            steps_before_swap += 1
        refresher.stop(wait=False)
        assert steps_before_swap >= 3, (
            "trainer appears to block on the embedder")


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
