"""End-to-end smoke test: the full EMDR2 train loop on a toy world.

Exercises every layer at once on the 8-device CPU mesh: tokenization, QA
dataset, query embedding (jit), sharded MIPS search, host postprocess with
neighbor windows, the fused differentiable step (retriever grad through
topk_log_probs + FiD reader + stop-grad teacher), and the optax update.
Asserts the joint loss decreases — the reference's only 'test' was training
curves, so this is the minimum honest equivalent (SURVEY.md §4).
"""

import jax
import numpy as np
import pytest

from emdr2_tpu.parallel import build_mesh
from emdr2_tpu.retrieval import ShardedEvidenceIndex
from emdr2_tpu.tasks import E2EQATask
from tests.helpers import build_toy_world


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    return build_toy_world(tmp_path_factory.mktemp("toy"))


class TestE2ETrain:
    def test_loss_decreases(self, world):
        import dataclasses
        cfg, tok, corpus, ds, _ = world
        # tiny random-init model: crank lr so 12 steps show clear learning
        opt = dataclasses.replace(cfg.train.optimizer, lr=5e-3, warmup=0.0)
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, optimizer=opt))
        mesh = build_mesh()  # 8x1
        B = 8  # one query per dp shard

        # random initial evidence embeddings (stale-index regime: the index
        # is NOT refreshed during this test, exactly like BASELINE config 3)
        rng = np.random.RandomState(0)
        emb = rng.randn(len(corpus), cfg.index.embed_dim).astype(np.float32)
        index = ShardedEvidenceIndex(mesh, cfg.index, emb)

        task = E2EQATask(cfg, mesh, tok, corpus, index, total_train_iters=50)
        task.init_state(jax.random.PRNGKey(0), B)

        losses = []
        for epoch in range(4):
            for batch in ds.epoch_batches(B, seed=epoch):
                m = task.train_step(batch)
                losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        first, last = np.mean(losses[:3]), np.mean(losses[-3:])
        assert last < first * 0.9, (first, last, losses)

    def test_em_eval_scores_tail_batch(self, world):
        """n % B != 0 must not drop examples: the tail batch is padded with
        duplicate rows and deduped by uid (train_e2eqa.py:271-292 parity)."""
        cfg, tok, corpus, ds, _ = world
        mesh = build_mesh()
        rng = np.random.RandomState(2)
        emb = rng.randn(len(corpus), cfg.index.embed_dim).astype(np.float32)
        index = ShardedEvidenceIndex(mesh, cfg.index, emb)
        task = E2EQATask(cfg, mesh, tok, corpus, index, total_train_iters=10)
        task.init_state(jax.random.PRNGKey(2), 8)
        import copy
        ds_odd = copy.copy(ds)
        ds_odd.examples = ds.examples[:19]  # 19 % 8 != 0 -> padded tail batch
        em, n = task.evaluate_em(ds_odd, batch_size=8, max_decode_len=4)
        assert n == 19, "tail-batch examples were dropped"
        assert 0.0 <= em <= 100.0
        # beam eval drives the grouped-K/V device loop at the task level
        emb_, nb = task.evaluate_em(ds_odd, batch_size=8, max_decode_len=4,
                                    beam_size=3)
        assert nb == 19
        assert 0.0 <= emb_ <= 100.0
        # int8-stored cross-K/V (--decode-kv-int8): same EM through the
        # mesh-sharded eval path as the bf16 slab
        em8, n8 = task.evaluate_em(ds_odd, batch_size=8, max_decode_len=4,
                                   kv_quant="int8")
        assert (em8, n8) == (em, n), ((em8, n8), (em, n))

    def test_metrics_structure(self, world):
        cfg, tok, corpus, ds, _ = world
        mesh = build_mesh()
        rng = np.random.RandomState(1)
        emb = rng.randn(len(corpus), cfg.index.embed_dim).astype(np.float32)
        index = ShardedEvidenceIndex(mesh, cfg.index, emb)
        task = E2EQATask(cfg, mesh, tok, corpus, index, total_train_iters=10)
        task.init_state(jax.random.PRNGKey(1), 8)
        batch = next(ds.epoch_batches(8, seed=0))
        m = task.train_step(batch)
        for key in ("loss", "lm_loss", "retriever_loss", "grad_norm"):
            assert np.isfinite(float(m[key])), key
        assert int(task.state.step) == 1


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
