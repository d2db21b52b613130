"""Model forward-pass tests on tiny shapes (CPU).

The reference has no tests; these check the structural invariants SURVEY.md §4
proposes: shapes, masking semantics, gradient boundaries, decode-cache parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdr2_tpu.config import tiny_config
from emdr2_tpu.models import DualEncoder, EMDR2Batch, EMDR2Model, T5Model
from emdr2_tpu.models.bert import BertEncoder


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


def rngs():
    return {"params": jax.random.PRNGKey(0)}


class TestBert:
    def test_cls_embedding_shape(self, cfg):
        model = BertEncoder(cfg.retriever.encoder)
        ids = jnp.array([[2, 5, 6, 0], [2, 7, 0, 0]])
        params = model.init(rngs(), ids)
        out = model.apply(params, ids, method=BertEncoder.embed)
        assert out.shape == (2, cfg.retriever.encoder.hidden_size)

    def test_padding_invariance(self, cfg):
        """CLS embedding must not depend on pad-position token content."""
        model = BertEncoder(cfg.retriever.encoder)
        a = jnp.array([[2, 5, 6, 0, 0]])
        b = jnp.array([[2, 5, 6, 0, 0]])
        params = model.init(rngs(), a)
        ea = model.apply(params, a, method=BertEncoder.embed)
        # changing what embedding pad ids would produce isn't possible via ids
        # (pad id is fixed), so check determinism + that an extra pad col
        # doesn't change the result
        c = jnp.array([[2, 5, 6, 0, 0, 0, 0]])
        ec = model.apply(params, c, method=BertEncoder.embed)
        np.testing.assert_allclose(np.asarray(ea), np.asarray(ec), atol=1e-5)

    def test_dual_encoder_towers_differ(self, cfg):
        model = DualEncoder(cfg.retriever)
        ids = jnp.array([[2, 5, 6, 0]])
        params = model.init(rngs(), ids, ids)
        q, c = model.apply(params, ids, ids)
        assert q.shape == c.shape
        assert q.dtype == jnp.float32
        # separate towers -> different random init -> different embeddings
        assert not np.allclose(np.asarray(q), np.asarray(c))


class TestBertPretrainHeads:
    """BERT pretraining heads (ref bert_model.py:29-131) — unused by the
    EMDR2/DPR tasks but part of the reference surface."""

    def test_lm_and_binary_shapes(self, cfg):
        from emdr2_tpu.models.bert import BertPretrainModel
        tcfg = cfg.retriever.encoder
        model = BertPretrainModel(tcfg)
        ids = jnp.array([[2, 5, 6, 0], [2, 7, 0, 0]])
        params = model.init(rngs(), ids)
        lm, binary = model.apply(params, ids)
        assert lm.shape == (2, 4, tcfg.vocab_size)
        assert lm.dtype == jnp.float32
        assert binary.shape == (2, 2)

    def test_lm_head_ties_embeddings(self, cfg):
        """No second [V, H] matrix: the LM projection reuses the word
        embedding (parallel_lm_logits with the embedding weight,
        bert_model.py:95-103)."""
        from emdr2_tpu.models.bert import BertPretrainModel
        import flax
        tcfg = cfg.retriever.encoder
        model = BertPretrainModel(tcfg, add_binary_head=False)
        ids = jnp.array([[2, 5, 6, 0]])
        variables = model.init(rngs(), ids)
        import flax.linen as nn
        flat = flax.traverse_util.flatten_dict(
            flax.core.unfreeze(nn.meta.unbox(variables["params"])))
        vocab_sized = [k for k, v in flat.items()
                       if hasattr(v, "shape") and tcfg.vocab_size in
                       getattr(v, "shape", ())]
        # exactly the word embedding matrix and the LM bias
        assert sorted(p[-1] for p in vocab_sized) == [
            "lm_bias", "word_embeddings"], vocab_sized
        lm, binary = model.apply(variables, ids)
        assert binary is None and np.isfinite(np.asarray(lm)).all()


class TestT5:
    def test_seq2seq_logits(self, cfg):
        tc = cfg.reader.transformer
        model = T5Model(tc)
        enc = jnp.array([[2, 5, 6, 7, 0, 0]])
        dec = jnp.array([[1, 8, 9, 0]])
        params = model.init(rngs(), enc, dec)
        logits = model.apply(params, enc, dec)
        assert logits.shape == (1, 4, tc.vocab_size)

    def test_enc_hidden_injection_matches_internal(self, cfg):
        """enc_hidden_states injection must equal the fused path
        (language_model.py:324-330 parity)."""
        tc = cfg.reader.transformer
        model = T5Model(tc)
        enc = jnp.array([[2, 5, 6, 7, 0, 0]])
        dec = jnp.array([[1, 8, 9, 0]])
        params = model.init(rngs(), enc, dec)
        full = model.apply(params, enc, dec)
        hidden = model.apply(params, enc, method=T5Model.encode)
        from emdr2_tpu.data import masks
        injected = model.apply(
            params, dec, hidden, masks.attention_mask(dec, enc),
            method=T5Model.decode)
        np.testing.assert_allclose(np.asarray(full), np.asarray(injected),
                                   atol=1e-5)

    def test_chunked_gold_log_probs_matches_dense(self, cfg):
        """decode_gold_log_probs (online logsumexp over vocab chunks, used
        by the stop-grad teacher) must equal the dense head's
        gather - logsumexp up to summation order. Vocab 640 % 4 == 0, so
        the chunked path is exercised."""
        tc = cfg.reader.transformer
        assert tc.vocab_size % 4 == 0
        model = T5Model(tc)
        rng = np.random.RandomState(0)
        enc = jnp.asarray(rng.randint(2, 500, (3, 6)), jnp.int32)
        dec = jnp.asarray(rng.randint(1, 500, (3, 4)), jnp.int32)
        labels = jnp.asarray(rng.randint(0, tc.vocab_size, (3, 4)), jnp.int32)
        params = model.init(rngs(), enc, dec)
        hidden = model.apply(params, enc, method=T5Model.encode)
        from emdr2_tpu.data import masks
        mask = masks.attention_mask(dec, enc)
        logits = np.asarray(model.apply(
            params, dec, hidden, mask, method=T5Model.decode)
        ).astype(np.float64)
        lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)
                            ).sum(-1)) + logits.max(-1)
        dense = np.take_along_axis(
            logits, np.asarray(labels)[..., None], axis=-1)[..., 0] - lse
        chunked = np.asarray(model.apply(
            params, dec, hidden, mask, labels,
            method=T5Model.decode_gold_log_probs))
        np.testing.assert_allclose(chunked, dense, atol=2e-5)

    def test_chunked_gold_head_never_materializes_full_logits(self, cfg):
        """The memory contract of the online-logsumexp teacher head: the
        compiled module must not contain a full-vocab fp32 logits tensor
        (f32[B, L, V] is 0.79 GB at flagship teacher shape — the reason the
        chunked head exists), only the [B, L, V/4] chunk inside the scan."""
        tc = cfg.reader.transformer
        assert tc.vocab_size % 4 == 0
        model = T5Model(tc)
        rng = np.random.RandomState(0)
        enc = jnp.asarray(rng.randint(2, 500, (3, 6)), jnp.int32)
        dec = jnp.asarray(rng.randint(1, 500, (3, 4)), jnp.int32)
        labels = jnp.asarray(rng.randint(0, tc.vocab_size, (3, 4)), jnp.int32)
        params = model.init(rngs(), enc, dec)
        hidden = model.apply(params, enc, method=T5Model.encode)
        from emdr2_tpu.data import masks
        mask = masks.attention_mask(dec, enc)

        def gold(p, d, h, m, lab):
            return model.apply(p, d, h, m, lab,
                               method=T5Model.decode_gold_log_probs)

        compiled = jax.jit(gold).lower(
            params, dec, hidden, mask, labels).compile()
        txt = compiled.as_text()
        B, L, V = dec.shape[0], dec.shape[1], tc.vocab_size
        # check both the [B,L,V] and flattened [B*L,V] spellings so a
        # relayouted/reshaped full-logits tensor still trips the assert
        for bad in (f"f32[{B},{L},{V}]", f"f32[{B * L},{V}]"):
            assert bad not in txt, (
                "full-vocab fp32 logits materialized in the teacher gold "
                f"head ({bad})")
        assert (f"f32[{B},{L},{V // 4}]" in txt
                or f"f32[{B * L},{V // 4}]" in txt), (
            "expected the vocab-chunk logits block inside the scan")
        # layout-agnostic backstop: the chunked head's compiled temp memory
        # must stay below a dense-head compile of the same module (which by
        # construction materializes the full [B,L,V] fp32 logits), whatever
        # shape string XLA prints for the buffers
        def dense(p, d, h, m, lab):
            logits = model.apply(p, d, h, m, method=T5Model.decode)
            lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
            picked = jnp.take_along_axis(
                logits, lab[..., None], axis=-1)[..., 0]
            return picked - lse

        mem = compiled.memory_analysis()
        dense_mem = jax.jit(dense).lower(
            params, dec, hidden, mask, labels).compile().memory_analysis()
        if (mem is not None and dense_mem is not None
                and getattr(mem, "temp_size_in_bytes", 0)):
            assert mem.temp_size_in_bytes < dense_mem.temp_size_in_bytes, (
                f"chunked-head temp {mem.temp_size_in_bytes} not below the "
                f"dense head's {dense_mem.temp_size_in_bytes}")

    def test_causality(self, cfg):
        """Changing a future decoder token must not affect earlier logits."""
        tc = cfg.reader.transformer
        model = T5Model(tc)
        enc = jnp.array([[2, 5, 6, 0]])
        dec_a = jnp.array([[1, 8, 9, 10]])
        dec_b = jnp.array([[1, 8, 9, 11]])
        params = model.init(rngs(), enc, dec_a)
        la = model.apply(params, enc, dec_a)
        lb = model.apply(params, enc, dec_b)
        np.testing.assert_allclose(np.asarray(la[:, :3]), np.asarray(lb[:, :3]),
                                   atol=1e-5)


def make_batch(cfg, key=0):
    rng = np.random.RandomState(key)
    B, K = 2, cfg.index.topk
    rc, rr = cfg.retriever, cfg.reader
    V = cfg.retriever.encoder.vocab_size

    def ids(*shape, maxlen=None):
        x = rng.randint(2, V - 1, size=shape).astype(np.int32)
        return x

    qb = ids(B, rc.query_seq_len)
    cb = ids(B, K, rc.seq_len)
    return EMDR2Batch(
        query_bert_ids=jnp.asarray(qb),
        context_bert_ids=jnp.asarray(cb),
        context_bert_types=jnp.zeros_like(jnp.asarray(cb)),
        reader_ids=jnp.asarray(ids(B, K, rr.seq_len)),
        reader_one_ctx_ids=jnp.asarray(ids(B, K, rr.seq_len)),
        dec_ids=jnp.asarray(ids(B, rr.decoder_seq_len)),
        labels=jnp.asarray(ids(B, rr.decoder_seq_len)),
        loss_mask=jnp.ones((B, rr.decoder_seq_len), jnp.float32),
    )


class TestEMDR2:
    @pytest.fixture(scope="class")
    def setup(self, cfg):
        model = EMDR2Model(cfg)
        batch = make_batch(cfg)
        params = model.init(rngs(), batch)
        return model, params, batch

    def test_forward_shapes(self, cfg, setup):
        model, params, batch = setup
        out = model.apply(params, batch)
        B, K = 2, cfg.index.topk
        Ld = cfg.reader.decoder_seq_len
        V = cfg.reader.transformer.vocab_size
        assert out.lm_logits.shape == (B, Ld, V)
        assert out.topk_log_probs.shape == (B, K)
        assert out.gold_log_probs.shape == (B, K, Ld)
        # log_softmax normalization
        np.testing.assert_allclose(
            np.exp(np.asarray(out.topk_log_probs)).sum(-1), 1.0, rtol=1e-5)
        assert np.all(np.asarray(out.gold_log_probs) <= 0)

    def test_retriever_gradient_flows_only_through_topk(self, cfg, setup):
        """EMDR2 invariant (train_e2eqa.py:163-177): the teacher is
        stop-gradient; retriever params get grad only via topk_log_probs."""
        model, params, batch = setup

        def loss_topk_only(p):
            out = model.apply(p, batch)
            return jnp.sum(out.gold_log_probs)  # stop-grad teacher only

        g = jax.grad(lambda p: loss_topk_only(p))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.allclose(np.asarray(l), 0) for l in leaves)

        def loss_through_topk(p):
            out = model.apply(p, batch)
            return jnp.sum(out.topk_log_probs)

        g2 = jax.grad(loss_through_topk)(params)
        ret_grads = jax.tree_util.tree_leaves(g2["params"]["retriever"])
        assert any(not np.allclose(np.asarray(l), 0) for l in ret_grads)

    def test_embed_query_matches_inloss_recompute(self, cfg, setup):
        """Stage-1 search embeddings must equal the values used for
        topk_log_probs (the reference computes them once; we recompute —
        same weights, deterministic, so identical)."""
        model, params, batch = setup
        q1 = model.apply(params, batch.query_bert_ids,
                         method=EMDR2Model.embed_query)
        # recompute inside _topk_log_probs path
        q2 = model.apply(params, batch.query_bert_ids,
                         method=EMDR2Model.embed_query)
        np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))

    def test_minimal_init_batch_params_bit_identical(self, cfg, setup):
        """create_train_state inits at B=1/K=2 (the full-shape init program
        alone crashed the XLA compile helper at B>=6/K=50); param shapes
        and initializer draws depend only on param shape, so the resulting
        tree must be bit-identical to a full-batch init."""
        from emdr2_tpu.training import step as step_lib
        model, _, batch = setup
        key = jax.random.PRNGKey(7)
        mini = step_lib._minimal_init_batch(batch)
        assert mini.reader_ids.shape == (1, 2, batch.reader_ids.shape[-1])
        p_min = model.init({"params": key}, mini)["params"]
        p_full = model.init({"params": key}, batch)["params"]
        eq = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            p_min, p_full)
        assert all(jax.tree_util.tree_leaves(eq))


class TestPackedDropout:
    """PackedDropout (models/layers.py): counter-hash dropout must be an
    exact inverted dropout at the u32-quantized rate."""

    def test_statistics_and_scale(self):
        from emdr2_tpu.models.layers import PackedDropout

        rate = 0.1
        m = PackedDropout(rate)
        x = jnp.ones((64, 4096), jnp.float32)
        y = m.apply({}, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(0)})
        y = np.asarray(y)
        t = round(rate * 4294967296.0)
        q_rate = t / 4294967296.0
        scale = 4294967296.0 / (4294967296 - t)
        # kept elements carry exactly the inverted-dropout scale
        kept = y[y != 0]
        np.testing.assert_allclose(kept, scale, rtol=1e-6)
        # empirical drop rate matches the quantized rate (binomial 5-sigma)
        drop = float((y == 0).mean())
        sigma = (q_rate * (1 - q_rate) / y.size) ** 0.5
        assert abs(drop - q_rate) < 5 * sigma, (drop, q_rate)
        # expectation preserved to the same tolerance
        np.testing.assert_allclose(y.mean(), 1.0, atol=6 * sigma * scale)

    def test_deterministic_and_seeded(self):
        from emdr2_tpu.models.layers import PackedDropout

        m = PackedDropout(0.5)
        x = jnp.asarray(np.random.RandomState(0).randn(8, 256), jnp.float32)
        assert np.array_equal(np.asarray(m.apply({}, x, deterministic=True)),
                              np.asarray(x))
        a = m.apply({}, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(7)})
        b = m.apply({}, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(7)})
        c = m.apply({}, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(8)})
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_grad_is_mask_times_scale(self):
        from emdr2_tpu.models.layers import PackedDropout

        m = PackedDropout(0.25)
        x = jnp.asarray(np.random.RandomState(1).randn(4, 128), jnp.float32)

        def f(x):
            return jnp.sum(m.apply({}, x, deterministic=False,
                                   rngs={"dropout": jax.random.PRNGKey(3)}))

        g = np.asarray(jax.grad(f)(x))
        y = np.asarray(m.apply({}, x, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(3)}))
        t = round(0.25 * 4294967296.0)
        scale = 4294967296.0 / (4294967296 - t)
        np.testing.assert_allclose(g, np.where(y != 0, scale, 0.0), rtol=1e-6)

    def test_mask_independence(self):
        """Counter-hash quality: adjacent elements and different keys must
        be uncorrelated (P(both kept) ~ p_keep^2 at 5 sigma)."""
        from emdr2_tpu.models.layers import PackedDropout

        rate = 0.5  # maximal variance -> most sensitive
        m = PackedDropout(rate)
        x = jnp.ones((512, 2048), jnp.float32)
        ka = np.asarray(m.apply({}, x, deterministic=False,
                                rngs={"dropout": jax.random.PRNGKey(11)})) != 0
        kb = np.asarray(m.apply({}, x, deterministic=False,
                                rngs={"dropout": jax.random.PRNGKey(12)})) != 0
        p = 1.0 - rate
        n = ka.size
        sigma = (p * p * (1 - p * p) / n) ** 0.5
        # lane-adjacent, row-adjacent, and cross-key joint keep rates
        for joint in ((ka[:, 1:] & ka[:, :-1]).mean(),
                      (ka[1:, :] & ka[:-1, :]).mean(),
                      (ka & kb).mean()):
            assert abs(float(joint) - p * p) < 5 * sigma, (joint, p * p)


class TestRematPolicy:
    """remat is a pure memory/FLOPs trade: every policy must produce the
    same loss and gradients as the non-remat stack (config.remat_policy)."""

    @pytest.mark.parametrize("policy", ["nothing", "dots_no_batch"])
    def test_grads_match_no_remat(self, cfg, policy):
        import dataclasses

        ids = jnp.asarray(
            np.random.RandomState(0).randint(2, 500, size=(2, 16)), jnp.int32)

        def grads(enc_cfg):
            model = BertEncoder(enc_cfg)
            params = model.init(rngs(), ids)

            def loss(p):
                return jnp.sum(model.apply(p, ids, method=BertEncoder.embed))

            return loss(params), jax.grad(loss)(params)

        base_cfg = cfg.retriever.encoder
        l0, g0 = grads(base_cfg)
        l1, g1 = grads(dataclasses.replace(
            base_cfg, remat=True, remat_policy=policy))
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
