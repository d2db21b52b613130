"""Index builder, recall evaluator, qa_validation, and DPR trainer tests."""

import json

import jax
import numpy as np
import pytest

from emdr2_tpu.parallel import build_mesh
from emdr2_tpu.retrieval import EmbeddingStore, ShardedEvidenceIndex
from emdr2_tpu.retrieval.builder import EvidenceIndexBuilder
from emdr2_tpu.retrieval.evaluate import OpenRetrievalEvaluator
from emdr2_tpu.retrieval.qa_validation import (
    SimpleTokenizer,
    calculate_matches,
    has_answer,
)
from emdr2_tpu.tasks.dense_retriever import DPRDataset, DPRTask, read_dpr_json
from tests.helpers import build_toy_world


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    return build_toy_world(tmp_path_factory.mktemp("toy"))


class TestQAValidation:
    def test_simple_tokenizer(self):
        t = SimpleTokenizer()
        assert t.tokenize("Hello, world-42!") == ["Hello", ",", "world", "-", "42", "!"]
        assert t.words("A B") == ["a", "b"]

    def test_has_answer_string(self):
        t = SimpleTokenizer()
        assert has_answer(["the cat"], "I saw The Cat today", t)
        assert not has_answer(["dog"], "I saw the cat today", t)
        assert has_answer(["42"], "answer is 42.", t)

    def test_has_answer_regex(self):
        t = SimpleTokenizer()
        assert has_answer([r"ca+t"], "a caaat appears", t, match_type="regex")

    def test_calculate_matches_topk(self):
        docs = {1: "the cat sat", 2: "a dog ran", 3: "fish swim"}
        stats = calculate_matches(
            docs.__getitem__,
            answers=[["cat"], ["fish"]],
            closest_docs=[([2, 1, 3], [0, 0, 0]), ([3, 1, 2], [0, 0, 0])],
            workers_num=1)
        # q0 hits at rank 2, q1 at rank 1 -> top1=1, top2=2, top3=2
        assert stats.top_k_hits == [1, 2, 2]


class TestBuilderAndRecall:
    def test_built_index_gives_high_recall(self, world):
        """Embed the toy corpus with a real (random-init) context tower,
        search with the question encodings, and check the whole pipeline is
        consistent: recall with TRAINED-equivalent embeddings = identity
        check via self-retrieval."""
        cfg, tok, corpus, ds, colors = world
        mesh = build_mesh()
        from emdr2_tpu.models import EMDR2Model
        model = EMDR2Model(cfg)
        from tests.test_e2e_train import np  # noqa: F401

        # random params; we check machinery, not quality
        from tests.test_models import make_batch
        params = model.init({"params": jax.random.PRNGKey(0)},
                            make_batch(cfg))["params"]

        builder = EvidenceIndexBuilder(
            cfg, mesh, model, corpus, tok.cls_id, tok.sep_id, tok.pad_id,
            batch_size=16)
        emb = builder.embed_corpus(params)
        assert emb.shape == (len(corpus), cfg.index.embed_dim)
        assert np.isfinite(emb).all()
        # identical passages -> identical embeddings; different -> different
        assert not np.allclose(emb[0], emb[1])

        index = ShardedEvidenceIndex(mesh, cfg.index, emb.astype(np.float32))
        evaluator = OpenRetrievalEvaluator(
            mesh, model, params, index, tok, cfg.retriever.query_seq_len,
            batch_size=8)

        def doc_text(pid):
            return tok.detokenize(corpus.doc_tokens(pid))

        examples = ds.examples[:8]
        result = evaluator.evaluate_recall(examples, k=4, doc_text_fn=doc_text)
        assert set(result) >= {"recall@1", "recall@4"}
        assert all(0.0 <= v <= 1.0 for v in result.values())
        assert result["recall@4"] >= result["recall@1"]

    def test_store_roundtrip_via_builder(self, world, tmp_path):
        cfg, tok, corpus, ds, _ = world
        mesh = build_mesh()
        from emdr2_tpu.models import EMDR2Model
        import jax.numpy as jnp
        model = EMDR2Model(cfg)
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((8, cfg.retriever.seq_len), jnp.int32),
            method=EMDR2Model.embed_context)["params"]
        builder = EvidenceIndexBuilder(
            cfg, mesh, model, corpus, tok.cls_id, tok.sep_id, tok.pad_id,
            batch_size=16)
        store = builder.build_store(params, str(tmp_path / "emb"))
        again = EmbeddingStore.load(str(tmp_path / "emb"))
        assert len(again.ids) == len(corpus)
        np.testing.assert_array_equal(again.ids[:3], [1, 2, 3])


def make_dpr_json(tmp_path, n=16):
    rows = []
    for i in range(n):
        rows.append({
            "question": f"what is item{i}",
            "answers": [f"thing{i}"],
            "positive_ctxs": [{"title": f"item{i}", "text": f"item{i} is thing{i}"}],
            "hard_negative_ctxs": [
                {"title": f"item{(i+1) % n}", "text": f"item{(i+1) % n} is thing{(i+1) % n}"}],
            "negative_ctxs": [{"title": "x", "text": "unrelated text"}],
        })
    p = tmp_path / "dpr.json"
    p.write_text(json.dumps(rows))
    return str(p)


class TestDPR:
    def test_dataset_layout(self, tmp_path):
        from emdr2_tpu.data.tokenizer import BertWordPieceTokenizer, toy_vocab
        path = make_dpr_json(tmp_path)
        tok = BertWordPieceTokenizer(toy_vocab())
        ds = DPRDataset(path, tok, query_seq_len=16, ctx_seq_len=24,
                        hard_negs=1)
        assert len(ds) == 16
        b = ds.batch([0, 1, 2, 3])
        assert b.query_ids.shape == (4, 16)
        assert b.ctx_ids.shape == (8, 24)  # 4 positives + 4 hard negs
        assert b.labels.tolist() == [0, 1, 2, 3]

    def test_training_improves_accuracy(self, world, tmp_path):
        cfg, tok, corpus, _, _ = world
        import dataclasses
        from emdr2_tpu.config import OptimizerConfig
        path = make_dpr_json(tmp_path)
        ds = DPRDataset(path, tok, query_seq_len=cfg.retriever.query_seq_len,
                        ctx_seq_len=cfg.retriever.seq_len, hard_negs=1)
        mesh = build_mesh()
        opt = OptimizerConfig(lr=3e-3, warmup=0.0, weight_decay=0.0)
        task = DPRTask(cfg.retriever, opt, mesh, total_train_iters=60,
                       score_scaling=True)
        first_batch = ds.batch(list(range(8)))
        task.init(jax.random.PRNGKey(0), first_batch)

        before = task.validate([ds.batch(list(range(8, 16)))])
        losses = []
        rng = jax.random.PRNGKey(1)
        for epoch in range(12):
            for batch in ds.epoch_batches(8, seed=epoch):
                rng, sub = jax.random.split(rng)
                m = task.train_step(batch, sub)
                losses.append(m["loss"])
        after = task.validate([ds.batch(list(range(8, 16)))])
        assert np.isfinite(losses).all()
        assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
        assert after["top1_accuracy"] >= before["top1_accuracy"]

    def test_eval_layout_30_30(self, tmp_path):
        """evaluate=True builds the av-rank layout: 1 positive + other+hard
        negatives per query, positives first (train_data_utils.py:177-182)."""
        from emdr2_tpu.data.tokenizer import BertWordPieceTokenizer, toy_vocab
        path = make_dpr_json(tmp_path)
        tok = BertWordPieceTokenizer(toy_vocab())
        ds = DPRDataset(path, tok, query_seq_len=16, ctx_seq_len=24,
                        evaluate=True, val_av_rank_other_neg=2,
                        val_av_rank_hard_neg=1)
        b = ds.batch([0, 1])
        # 2 positives + 2 queries x 3 negatives
        assert b.ctx_ids.shape == (2 + 2 * 3, 24)
        assert b.labels.tolist() == [0, 1]
        # deterministic: same batch twice
        b2 = ds.batch([0, 1])
        np.testing.assert_array_equal(b.ctx_ids, b2.ctx_ids)
        # the positive row equals the train-layout positive row
        ds_tr = DPRDataset(path, tok, query_seq_len=16, ctx_seq_len=24)
        np.testing.assert_array_equal(ds_tr.batch([0]).ctx_ids[0],
                                      b.ctx_ids[0])

    def test_state_checkpoint_roundtrip(self, world, tmp_path):
        """DPR save -> load restores params/opt/step; the checkpoint nests
        params under 'retriever' so the partial loader consumes it."""
        cfg, tok, corpus, _, _ = world
        from emdr2_tpu.config import OptimizerConfig
        from emdr2_tpu.training import checkpointing as ck
        path = make_dpr_json(tmp_path)
        ds = DPRDataset(path, tok, query_seq_len=cfg.retriever.query_seq_len,
                        ctx_seq_len=cfg.retriever.seq_len, hard_negs=1)
        mesh = build_mesh()
        opt = OptimizerConfig(lr=1e-3, warmup=0.0)
        task = DPRTask(cfg.retriever, opt, mesh, total_train_iters=10)
        task.init(jax.random.PRNGKey(0), ds.batch(list(range(8))))
        task.train_step(ds.batch(list(range(8))), jax.random.PRNGKey(1))
        root = str(tmp_path / "dpr_ck")
        ck.save_checkpoint(root, task.get_state(), task.step)

        task2 = DPRTask(cfg.retriever, opt, mesh, total_train_iters=10)
        task2.init(jax.random.PRNGKey(7), ds.batch(list(range(8))))
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, task2.get_state())
        state, it = ck.load_checkpoint(root, abstract)
        task2.set_state(state)
        assert it == 1 and task2.step == 1
        for a, b in zip(jax.tree_util.tree_leaves(task.params),
                        jax.tree_util.tree_leaves(task2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # partial loader sees the dual encoder under 'retriever'
        sub = ck.load_retriever_params(
            root, jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), task.params))
        for a, b in zip(jax.tree_util.tree_leaves(sub),
                        jax.tree_util.tree_leaves(task.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_read_dpr_json_drops_no_positive(self, tmp_path):
        p = tmp_path / "d.json"
        p.write_text(json.dumps([
            {"question": "q", "answers": [], "positive_ctxs": []},
            {"question": "q2", "answers": [], "positive_ctxs":
                [{"title": "t", "text": "x"}]},
        ]))
        assert len(read_dpr_json(str(p))) == 1


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
