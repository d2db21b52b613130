"""Reference-checkpoint converter tests: QKV layout math + full-tree
structural round trip into a working model forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from emdr2_tpu.tools.convert_reference_checkpoint import (
    _qkv_bias_to_ours,
    _qkv_to_ours,
    convert_checkpoint,
)


class TestQKVLayout:
    def test_version_ge1_interleave(self):
        nh, hn = 2, 3
        H = nh * hn
        w = np.zeros((3 * H, 4))
        # megatron v>=1 layout: out index = h*hn*3 + d*3 + s
        for h in range(nh):
            for d in range(hn):
                for s in range(3):
                    w[h * hn * 3 + d * 3 + s, :] = s * 100 + h * 10 + d
        ours = _qkv_to_ours(w, nh, 3, version=3)
        # our layout: out index = s*H + h*hn + d
        for s in range(3):
            for h in range(nh):
                for d in range(hn):
                    assert ours[s * H + h * hn + d, 0] == s * 100 + h * 10 + d

    def test_version0_passthrough(self):
        w = np.arange(24, dtype=np.float32).reshape(12, 2)
        np.testing.assert_array_equal(_qkv_to_ours(w, 2, 3, version=0), w)

    def test_bias(self):
        nh, hn = 2, 2
        b = np.zeros(3 * nh * hn)
        for h in range(nh):
            for d in range(hn):
                for s in range(3):
                    b[h * hn * 3 + d * 3 + s] = s * 100 + h * 10 + d
        ours = _qkv_bias_to_ours(b, nh, 3, version=2)
        H = nh * hn
        for s in range(3):
            for h in range(nh):
                for d in range(hn):
                    assert ours[s * H + h * hn + d] == s * 100 + h * 10 + d


def make_megatron_stack(num_layers, H, F, nh, has_cross, rng):
    sd = {}

    def t(*shape):
        return torch.from_numpy(rng.randn(*shape).astype(np.float32))

    for i in range(num_layers):
        p = f"layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = t(H)
        sd[f"{p}.input_layernorm.bias"] = t(H)
        sd[f"{p}.attention.query_key_value.weight"] = t(3 * H, H)
        sd[f"{p}.attention.query_key_value.bias"] = t(3 * H)
        sd[f"{p}.attention.dense.weight"] = t(H, H)
        sd[f"{p}.attention.dense.bias"] = t(H)
        sd[f"{p}.post_attention_layernorm.weight"] = t(H)
        sd[f"{p}.post_attention_layernorm.bias"] = t(H)
        if has_cross:
            sd[f"{p}.inter_attention.query.weight"] = t(H, H)
            sd[f"{p}.inter_attention.query.bias"] = t(H)
            sd[f"{p}.inter_attention.key_value.weight"] = t(2 * H, H)
            sd[f"{p}.inter_attention.key_value.bias"] = t(2 * H)
            sd[f"{p}.inter_attention.dense.weight"] = t(H, H)
            sd[f"{p}.inter_attention.dense.bias"] = t(H)
            sd[f"{p}.post_inter_attention_layernorm.weight"] = t(H)
            sd[f"{p}.post_inter_attention_layernorm.bias"] = t(H)
        sd[f"{p}.mlp.dense_h_to_4h.weight"] = t(F, H)
        sd[f"{p}.mlp.dense_h_to_4h.bias"] = t(F)
        sd[f"{p}.mlp.dense_4h_to_h.weight"] = t(H, F)
        sd[f"{p}.mlp.dense_4h_to_h.bias"] = t(H)
    sd["final_layernorm.weight"] = t(H)
    sd["final_layernorm.bias"] = t(H)
    return sd


def make_megatron_bert(num_layers, H, F, nh, V, P, rng, tokentypes=True):
    def t(*shape):
        return torch.from_numpy(rng.randn(*shape).astype(np.float32))

    emb = {"word_embeddings": {"weight": t(V, H)},
           "position_embeddings": {"weight": t(P, H)}}
    if tokentypes:
        emb["tokentype_embeddings"] = {"weight": t(2, H)}
    return {"embedding": emb,
            "encoder": make_megatron_stack(num_layers, H, F, nh, False, rng)}


class TestFullConvert:
    def test_emdr2_checkpoint_loads_into_model(self):
        rng = np.random.RandomState(0)
        L, H, F, nh, V, P = 2, 64, 128, 4, 512, 128
        V_t5 = 640

        def t(*shape):
            return torch.from_numpy(rng.randn(*shape).astype(np.float32))

        t5_sd = {
            "language_model": {
                "embedding": {"word_embeddings": {"weight": t(V_t5, H)},
                              "position_embeddings": {"weight": t(P, H)}},
                "encoder": make_megatron_stack(L, H, F, nh, False, rng),
                "decoder": make_megatron_stack(L, H, F, nh, True, rng),
            },
            "lm_head": {"bias": t(V_t5)},
        }
        de_sd = {
            "query_model": {"language_model":
                            make_megatron_bert(L, H, F, nh, V, P, rng)},
            "context_model": {"language_model":
                              make_megatron_bert(L, H, F, nh, V, P, rng)},
        }
        ckpt = {"model": {"encoder/t5_model": t5_sd,
                          "retriever/biencoder_model": de_sd},
                "checkpoint_version": 3, "iteration": 42}

        params = convert_checkpoint(ckpt, num_layers=L, num_heads=nh)
        assert set(params) == {"reader", "retriever"}

        # structural match against a freshly-initialized model
        import jax
        import flax.linen as nn
        from emdr2_tpu.config import tiny_config
        from emdr2_tpu.models import EMDR2Model
        from tests.test_models import make_batch

        cfg = tiny_config()
        model = EMDR2Model(cfg)
        batch = make_batch(cfg)
        ref = nn.meta.unbox(
            model.init({"params": jax.random.PRNGKey(0)}, batch)["params"])

        ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
        got_flat = jax.tree_util.tree_flatten_with_path(params)[0]
        ref_paths = {jax.tree_util.keystr(k): v.shape for k, v in ref_flat}
        got_paths = {jax.tree_util.keystr(k): v.shape for k, v in got_flat}
        assert ref_paths == got_paths, (
            set(ref_paths) ^ set(got_paths) or "shape mismatch")

        # converted params drive a real forward
        out = model.apply({"params": params}, batch)
        assert np.isfinite(np.asarray(out.lm_logits)).all()
        np.testing.assert_allclose(
            np.exp(np.asarray(out.topk_log_probs)).sum(-1), 1.0, rtol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestSingleBert:
    def test_bert_clones_into_both_towers(self):
        rng = np.random.RandomState(3)
        L, H, F, nh, V, P = 2, 64, 128, 4, 512, 128
        ckpt = {"model": {"language_model":
                          make_megatron_bert(L, H, F, nh, V, P, rng)},
                "checkpoint_version": 3}
        params = convert_checkpoint(ckpt, kind="auto", num_layers=L,
                                    num_heads=nh)
        assert set(params) == {"retriever"}
        import jax
        q = jax.tree_util.tree_leaves(params["retriever"]["query_model"])
        c = jax.tree_util.tree_leaves(params["retriever"]["context_model"])
        assert all(np.array_equal(a, b) for a, b in zip(q, c))
        # towers are independent copies, not views
        q[0][...] = 0
        assert not np.array_equal(q[0], c[0])
