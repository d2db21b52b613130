"""GOLDEN cross-framework parity: run the ACTUAL reference torch models on
CPU, convert their live checkpoints with ``tools/convert_reference_checkpoint``,
and assert this framework's forward math matches their logits/embeddings.

This is the direct numerical de-risk of the EM north star: everything else
(VALIDATION.md) argues parity indirectly; here the two implementations face
the same weights and the same inputs. Covers:

- T5 reader forward (logits + encoder hidden states) — pre-LN placement,
  learned positions, erf-GELU, tied LM head + bias, mask semantics
  (``/root/reference/megatron/model/t5_model.py:84-202``);
- both fused-QKV checkpoint layouts (version 0 and version >= 1,
  ``transformer.py:192-236``);
- BERT CLS retrieval embedding incl. tokentypes
  (``dualencoder_model.py:146-181``);
- dual-encoder query/context towers (``dualencoder_model.py:27-143``);
- host postprocess token surgery against the reference ``postprocess``
  (``emdr2_model.py:250-376``);
- the FULL EMDR2 joint forward including the stop-gradient teacher:
  lm_logits, topk_log_probs, and per-document gold log-probs
  (``emdr2_model.py:87-212``).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from reference_loader import TINY, StubTokenizer, load_reference, reference_available  # noqa: E402

if not reference_available():  # pragma: no cover
    pytest.skip("/root/reference not present", allow_module_level=True)

from emdr2_tpu.config import (EMDR2Config, ReaderConfig, RetrieverConfig,  # noqa: E402
                              TransformerConfig)
from emdr2_tpu.data.evidence import EvidenceCorpus  # noqa: E402
from emdr2_tpu.data.indexed_dataset import (MMapIndexedDataset,  # noqa: E402
                                            MMapIndexedDatasetBuilder)
from emdr2_tpu.data.postprocess import postprocess_retrieved_python  # noqa: E402
from emdr2_tpu.models.bert import BertEncoder, DualEncoder  # noqa: E402
from emdr2_tpu.models.emdr2 import EMDR2Batch, EMDR2Model  # noqa: E402
from emdr2_tpu.models.t5 import T5Model  # noqa: E402
from emdr2_tpu.tools.convert_reference_checkpoint import (  # noqa: E402
    convert_bert, convert_checkpoint, convert_dualencoder, convert_t5)

ATOL = 1e-4
T = TINY


def _tiny_cfg(vocab, num_tokentypes):
    return TransformerConfig(
        vocab_size=vocab, hidden_size=T["hidden_size"],
        num_layers=T["num_layers"], num_heads=T["num_heads"],
        ffn_size=T["ffn_size"],
        max_position_embeddings=T["max_position_embeddings"],
        num_tokentypes=num_tokentypes, hidden_dropout=0.0,
        attention_dropout=0.0, dtype=jnp.float32)


def _attend(src, tgt):
    """make_attention_mask_3d semantics: True where both tokens are real."""
    return (src >= 1)[:, :, None] & (tgt >= 1)[:, None, :]


def _causal(n):
    return np.tril(np.ones((n, n), bool))


def _rand_ids(rng, shape, pad_from=None):
    ids = rng.randint(7, T["vocab_size"], size=shape).astype(np.int64)
    if pad_from is not None:
        for row, start in enumerate(pad_from):
            ids[row, start:] = 0
    return ids


# ---------------------------------------------------------------------------
# T5 reader
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def ref_t5(ref):
    ref.torch.manual_seed(11)
    model = ref.T5Model(num_tokentypes=2, parallel_output=True,
                        vocab_size=T["padded_vocab"])
    model.eval()
    return model


def _t5_inputs():
    rng = np.random.RandomState(1)
    B, Le, Ld = 2, 16, T["seq_dec"]
    enc = _rand_ids(rng, (B, Le), pad_from=[12, 9])
    dec = _rand_ids(rng, (B, Ld), pad_from=[6, 8])
    return enc, dec


def test_t5_forward_parity(ref, ref_t5):
    enc, dec = _t5_inputs()
    B, Le = enc.shape
    Ld = dec.shape[1]
    enc_mask = ~_attend(enc, enc)
    dec_mask = ~(_attend(dec, dec) & _causal(Ld)[None])
    encdec_mask = ~_attend(dec, enc)
    with torch.no_grad():
        ref_logits, ref_enc = ref_t5(
            torch.from_numpy(enc), torch.from_numpy(dec),
            torch.from_numpy(enc_mask), torch.from_numpy(dec_mask),
            torch.from_numpy(encdec_mask))

    params = convert_t5(ref_t5.state_dict_for_save_checkpoint(),
                        T["num_layers"], T["num_heads"], version=3)
    ours = T5Model(_tiny_cfg(T["padded_vocab"], 0))
    got = ours.apply({"params": params}, jnp.asarray(enc), jnp.asarray(dec))
    # compare REAL decoder rows: on fully-masked (pad) rows the reference's
    # masked_fill REPLACES every score with -10000 (uniform attention) while
    # an additive bias preserves relative scores — both are arbitrary values
    # on rows that every consumer (loss mask, EM eval) discards.
    dec_real = dec >= 1
    np.testing.assert_allclose(np.asarray(got)[dec_real],
                               ref_logits.numpy()[dec_real], atol=ATOL)

    # encoder hidden states (output_enc_hidden path) — compare only real
    # positions: the reference masks pad QUERY rows too (uniform attention),
    # ours is key-side-only; pad rows are never consumed downstream.
    got_enc = ours.apply({"params": params}, jnp.asarray(enc), None,
                         output_enc_hidden=True)
    real = (enc >= 1)
    np.testing.assert_allclose(np.asarray(got_enc)[real],
                               ref_enc.numpy()[real], atol=ATOL)


def test_t5_checkpoint_version0_layout(ref_t5):
    """A version-0 checkpoint stores fused QKV as [qkv, head, hd] outermost
    (``transformer.py:192-210``); fresh models are [head, hd, qkv]. Both
    layouts must convert to identical params."""
    sd3 = ref_t5.state_dict_for_save_checkpoint()

    def to_v0(flat_sd):
        out = {}
        for k, v in flat_sd.items():
            if hasattr(v, "keys") and not hasattr(v, "shape"):
                out[k] = to_v0(v)
            elif k.endswith(("query_key_value.weight", "query_key_value.bias",
                             "key_value.weight", "key_value.bias")):
                n = 3 if "query_key_value" in k else 2
                np_v = v.detach().numpy()
                hp = np_v.shape[0] // n
                hn = hp // T["num_heads"]
                resh = np_v.reshape((T["num_heads"], hn, n) + np_v.shape[1:])
                moved = np.moveaxis(resh, 2, 0).reshape(np_v.shape)
                out[k] = torch.from_numpy(moved.copy())
            else:
                out[k] = v
        return out

    p3 = convert_checkpoint({"model": sd3, "checkpoint_version": 3},
                            kind="t5", num_layers=T["num_layers"],
                            num_heads=T["num_heads"])
    p0 = convert_checkpoint({"model": to_v0(sd3), "checkpoint_version": 0},
                            kind="t5", num_layers=T["num_layers"],
                            num_heads=T["num_heads"])

    import jax
    flat3 = jax.tree_util.tree_leaves_with_path(p3)
    flat0 = dict(jax.tree_util.tree_leaves_with_path(p0))
    assert flat3 and len(flat3) == len(flat0)
    for path, leaf in flat3:
        np.testing.assert_array_equal(leaf, flat0[path], err_msg=str(path))


# ---------------------------------------------------------------------------
# BERT / dual encoder
# ---------------------------------------------------------------------------

def test_bert_cls_embed_parity(ref):
    ref.torch.manual_seed(13)
    model = ref.PretrainedBertModel(num_tokentypes=2, parallel_output=True,
                                    vocab_size=T["padded_vocab"])
    model.eval()
    rng = np.random.RandomState(2)
    ids = _rand_ids(rng, (3, T["seq_ret"]), pad_from=[20, 24, 15])
    types = np.zeros_like(ids)
    types[:, 8:] = 1
    types[ids == 0] = 0
    mask = ~_attend(ids, ids)
    with torch.no_grad():
        ref_cls = model(torch.from_numpy(ids), torch.from_numpy(mask),
                        torch.from_numpy(types))

    sd = model.state_dict_for_save_checkpoint()
    params = convert_bert(sd["language_model"], T["num_layers"],
                          T["num_heads"], version=3)
    ours = BertEncoder(_tiny_cfg(T["padded_vocab"], 2))
    got = ours.apply({"params": params}, jnp.asarray(ids),
                     tokentype_ids=jnp.asarray(types),
                     method=BertEncoder.embed)
    np.testing.assert_allclose(np.asarray(got), ref_cls.numpy(), atol=ATOL)


def test_dualencoder_parity(ref):
    ref.torch.manual_seed(17)
    model = ref.dualencoder_model_provider(vocab_size=T["padded_vocab"])
    model.eval()
    rng = np.random.RandomState(3)
    q_ids = _rand_ids(rng, (2, 10), pad_from=[8, 10])
    c_ids = _rand_ids(rng, (2, T["seq_ret"]), pad_from=[18, 22])
    q_types = np.zeros_like(q_ids)
    c_types = np.zeros_like(c_ids)
    with torch.no_grad():
        ref_q = model.embed_text(model.query_model, torch.from_numpy(q_ids),
                                 torch.from_numpy(~_attend(q_ids, q_ids)),
                                 torch.from_numpy(q_types))
        ref_c = model.embed_text(model.context_model, torch.from_numpy(c_ids),
                                 torch.from_numpy(~_attend(c_ids, c_ids)),
                                 torch.from_numpy(c_types))

    params = convert_dualencoder(model.state_dict_for_save_checkpoint(),
                                 T["num_layers"], T["num_heads"], version=3)
    enc_cfg = _tiny_cfg(T["padded_vocab"], 2)
    ours = DualEncoder(RetrieverConfig(
        encoder=enc_cfg, embed_dim=T["hidden_size"],
        seq_len=T["seq_ret"], query_seq_len=10))
    got_q, got_c = ours.apply({"params": params}, jnp.asarray(q_ids),
                              jnp.asarray(c_ids), jnp.asarray(q_types),
                              jnp.asarray(c_types))
    np.testing.assert_allclose(np.asarray(got_q), ref_q.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_c), ref_c.numpy(), atol=ATOL)


# ---------------------------------------------------------------------------
# Full EMDR2 joint forward (incl. postprocess and the teacher)
# ---------------------------------------------------------------------------

def test_bert_pretrain_heads_parity(ref):
    """BERT pretraining surface (``bert_model.py:61-201``): masked-LM head
    (dense -> gelu -> LayerNorm -> tied projection + vocab bias) and the
    tanh-pooler binary NSP head, converted from the live reference
    ``BertModel`` checkpoint via ``convert_bert_pretrain``."""
    from emdr2_tpu.models.bert import BertPretrainModel
    from emdr2_tpu.tools.convert_reference_checkpoint import (
        convert_bert_pretrain)

    ref.torch.manual_seed(31)
    model = ref.BertModel(num_tokentypes=2, add_binary_head=True,
                          parallel_output=True,
                          vocab_size=T["padded_vocab"])
    model.eval()

    rng = np.random.RandomState(13)
    B, L = 2, 20
    ids = _rand_ids(rng, (B, L), pad_from=[16, 11])
    types = rng.randint(0, 2, size=(B, L)).astype(np.int64)
    types[ids == 0] = 0
    att = (ids >= 1).astype(np.int64)
    with torch.no_grad():
        ref_lm, ref_bin = model(torch.from_numpy(ids),
                                torch.from_numpy(att),
                                tokentype_ids=torch.from_numpy(types))

    params = convert_bert_pretrain(model.state_dict_for_save_checkpoint(),
                                   T["num_layers"], T["num_heads"],
                                   version=3)
    ours = BertPretrainModel(_tiny_cfg(T["padded_vocab"], 2))
    got_lm, got_bin = ours.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(types))
    real = ids >= 1  # pad QUERY rows: reference masks them too (uniform
    np.testing.assert_allclose(np.asarray(got_lm)[real],  # attention), ours
                               ref_lm.numpy()[real],      # is key-side-only
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_bin), ref_bin.numpy(),
                               atol=ATOL)


def _build_corpus(tmp_path):
    """9 docs over 4 titles: a 3-doc group exercises every main_doc_idx
    (0 / 1 / -1), a 2-doc group and singleton cover the window edges."""
    rng = np.random.RandomState(5)
    title_of = [0, 0, 0, 1, 1, 2, 3, 3, 3]
    titles = [[30 + t, 31 + t] for t in title_of]
    docs = [rng.randint(7, 110, size=rng.randint(4, 11)).tolist()
            for _ in title_of]
    text_p, title_p = str(tmp_path / "text"), str(tmp_path / "title")
    with MMapIndexedDatasetBuilder(text_p) as b:
        for d in docs:
            b.add_item(np.asarray(d))
    with MMapIndexedDatasetBuilder(title_p) as b:
        for tt in titles:
            b.add_item(np.asarray(tt))
    return EvidenceCorpus(MMapIndexedDataset(text_p),
                          MMapIndexedDataset(title_p))


class _FakeTopkRetriever:
    """Stands in for ``PreComputedEvidenceDocsRetriever``: returns fixed
    top-K hits with token data in the exact ``get_topk`` output structure
    (``emdr2_model.py:457-468``)."""

    def __init__(self, corpus, topk_ids):
        self.corpus = corpus
        self.topk_ids = topk_ids

    def get_topk(self, query_logits):
        data = []
        for row in self.topk_ids:
            text_list = []
            for eid in row:
                doc_ids, main_idx = self.corpus.neighbours(int(eid))
                doc_list = [self.corpus.doc_tokens(d) for d in doc_ids]
                title = self.corpus.title_tokens(int(eid))
                text_list.append((doc_list, main_idx, title))
            data.append((list(row), text_list))
        return data, None


def test_generation_parity(ref, tmp_path):
    """GOLDEN generation-semantics parity: run the reference's ACTUAL
    ``SampleOrGreedySearch``/``BeamSearch`` decode loops
    (``search_strategy.py:124-239``) on the live reference EMDR2 model in
    eval mode, and assert our device-resident greedy and beam loops produce
    the SAME token streams from the converted checkpoint. This pins the
    generation contract the forward tests can't: BOS seeding, first-EOS
    stripping, incremental-vs-full-prefix equivalence, and the beam's
    length-penalty recursion + ended-hypothesis handling."""
    from emdr2_tpu.models.decoding import (DecoderSession, beam_search_decode,
                                           greedy_decode)

    corpus = _build_corpus(tmp_path)
    B, K, Ld = 2, T["topk"], T["seq_dec"]
    topk_ids = np.array([[2, 4, 6], [3, 9, 8]])
    rng = np.random.RandomState(23)
    query_uid = np.array([-1, -2], dtype=np.int64)
    q_bert = _rand_ids(rng, (B, T["seq_ret"]), pad_from=[9, 7])
    q_t5 = _rand_ids(rng, (B, 8))
    q_t5_len = np.array([6, 8])

    ref.torch.manual_seed(29)
    model = ref.EMDR2Model(_FakeTopkRetriever(corpus, topk_ids))
    model.eval()  # inference branch: (lm_logits, topk_lp, enc_hidden, ids)

    bos, eos = StubTokenizer.bos, StubTokenizer.eos
    args = (torch.from_numpy(query_uid), torch.from_numpy(q_bert),
            torch.zeros_like(torch.from_numpy(q_bert)),
            torch.from_numpy(~_attend(q_bert, q_bert)),
            torch.from_numpy(q_t5), torch.from_numpy(q_t5_len))
    with torch.no_grad():
        ref_greedy = ref.SampleOrGreedySearch(
            max_decode_len=Ld, bos_id=bos, eos_id=eos, sample=False,
            topk_evidence=K).generate_output(model, *args)
        ref_beam = ref.BeamSearch(
            max_decode_len=Ld, bos_id=bos, eos_id=eos, beam_size=3,
            topk_evidence=K).generate_output(model, *args)

    # ours: converted checkpoint + the same retrieved evidence
    sd = model.state_dict_for_save_checkpoint()
    params = convert_checkpoint({"model": sd, "checkpoint_version": 3},
                                kind="emdr2", num_layers=T["num_layers"],
                                num_heads=T["num_heads"])
    ours_pp = postprocess_retrieved_python(
        query_uid, q_t5, q_t5_len, topk_ids, corpus, K,
        T["seq_ret"], T["seq_reader"],
        StubTokenizer.cls, StubTokenizer.sep, StubTokenizer.pad)
    enc_cfg = _tiny_cfg(T["padded_vocab"], 2)
    cfg = EMDR2Config(
        retriever=RetrieverConfig(encoder=enc_cfg, embed_dim=T["hidden_size"],
                                  seq_len=T["seq_ret"], query_seq_len=10),
        reader=ReaderConfig(transformer=_tiny_cfg(T["padded_vocab"], 0),
                            seq_len=T["seq_reader"], decoder_seq_len=Ld),
        update_retriever=True, retriever_score_scaling=True)
    batch = EMDR2Batch(
        query_bert_ids=jnp.asarray(q_bert),
        context_bert_ids=jnp.asarray(ours_pp.context_bert_ids),
        context_bert_types=jnp.asarray(ours_pp.context_bert_types),
        reader_ids=jnp.asarray(ours_pp.reader_ids),
        reader_one_ctx_ids=jnp.asarray(ours_pp.reader_one_ctx_ids),
        dec_ids=jnp.zeros((B, Ld), np.int32),
        labels=jnp.zeros((B, Ld), np.int32),
        loss_mask=jnp.zeros((B, Ld), np.float32))
    session = DecoderSession(EMDR2Model(cfg), params, max_decode_len=Ld)
    got_greedy = greedy_decode(session, batch, bos_id=bos, eos_id=eos)
    got_beam = beam_search_decode(session, batch, bos_id=bos, eos_id=eos,
                                  beam_size=3)

    # the reference substitutes [1] when a row's FIRST token is EOS
    # (search_strategy.py:233-235); ours returns the empty stream
    def norm(rows):
        return [[] if r == [1] else list(r) for r in rows]

    assert norm([list(h) for h in got_greedy]) == norm(ref_greedy)
    assert norm([list(h) for h in got_beam]) == norm(ref_beam)


def test_emdr2_full_forward_parity(ref, tmp_path):
    corpus = _build_corpus(tmp_path)
    B, K, Ld = 2, T["topk"], T["seq_dec"]
    # hits exercising main_doc_idx 0 (doc 1, 4), 1 (doc 2, 8), -1 (doc 3, 9)
    # and the singleton window (doc 6)
    topk_ids = np.array([[2, 4, 6], [3, 9, 8]])
    rng = np.random.RandomState(7)
    query_uid = np.array([-1, -2], dtype=np.int64)
    q_bert = _rand_ids(rng, (B, T["seq_ret"]), pad_from=[9, 7])
    q_t5 = _rand_ids(rng, (B, 8))
    q_t5_len = np.array([6, 8])
    dec = _rand_ids(rng, (B, Ld), pad_from=[6, 8])
    labels = rng.randint(1, T["padded_vocab"], size=(B, Ld)).astype(np.int64)

    ref.torch.manual_seed(19)
    model = ref.EMDR2Model(_FakeTopkRetriever(corpus, topk_ids))
    model.train()  # training branch: returns the teacher logits too
    with torch.no_grad():
        ref_lm, ref_topk_lp, ref_teacher = model(
            torch.from_numpy(query_uid), torch.from_numpy(q_bert),
            torch.zeros_like(torch.from_numpy(q_bert)),
            torch.from_numpy(~_attend(q_bert, q_bert)),
            torch.from_numpy(q_t5), torch.from_numpy(q_t5_len),
            torch.from_numpy(dec))
    assert ref_teacher is not None

    # --- host postprocess parity (token surgery) ---
    with torch.no_grad():
        topk_evidence_data, _ = _FakeTopkRetriever(corpus, topk_ids).get_topk(None)
        r_ctx, r_types, r_reader, r_one = ref.ref_postprocess(
            torch.from_numpy(query_uid), torch.from_numpy(q_t5),
            q_t5_len.tolist(), topk_evidence_data)
    ours_pp = postprocess_retrieved_python(
        query_uid, q_t5, q_t5_len, topk_ids, corpus, K,
        T["seq_ret"], T["seq_reader"],
        StubTokenizer.cls, StubTokenizer.sep, StubTokenizer.pad)
    np.testing.assert_array_equal(ours_pp.context_bert_ids.reshape(B * K, -1),
                                  r_ctx.numpy().reshape(B * K, -1))
    np.testing.assert_array_equal(ours_pp.context_bert_types.reshape(B * K, -1),
                                  r_types.numpy().reshape(B * K, -1))
    np.testing.assert_array_equal(ours_pp.reader_ids.reshape(B * K, -1),
                                  r_reader.numpy())
    np.testing.assert_array_equal(ours_pp.reader_one_ctx_ids.reshape(B * K, -1),
                                  r_one.numpy())

    # --- joint forward parity on the converted live checkpoint ---
    sd = model.state_dict_for_save_checkpoint()
    params = convert_checkpoint({"model": sd, "checkpoint_version": 3},
                                kind="emdr2", num_layers=T["num_layers"],
                                num_heads=T["num_heads"])
    assert set(params) == {"reader", "retriever"}

    enc_cfg = _tiny_cfg(T["padded_vocab"], 2)
    cfg = EMDR2Config(
        retriever=RetrieverConfig(encoder=enc_cfg, embed_dim=T["hidden_size"],
                                  seq_len=T["seq_ret"], query_seq_len=10),
        reader=ReaderConfig(transformer=_tiny_cfg(T["padded_vocab"], 0),
                            seq_len=T["seq_reader"], decoder_seq_len=Ld),
        update_retriever=True, retriever_score_scaling=True)
    batch = EMDR2Batch(
        query_bert_ids=jnp.asarray(q_bert),
        context_bert_ids=jnp.asarray(ours_pp.context_bert_ids),
        context_bert_types=jnp.asarray(ours_pp.context_bert_types),
        reader_ids=jnp.asarray(ours_pp.reader_ids),
        reader_one_ctx_ids=jnp.asarray(ours_pp.reader_one_ctx_ids),
        dec_ids=jnp.asarray(dec),
        labels=jnp.asarray(labels),
        loss_mask=jnp.asarray((dec > 0).astype(np.float32)))
    out = EMDR2Model(cfg).apply({"params": params}, batch, deterministic=True)

    np.testing.assert_allclose(np.asarray(out.topk_log_probs),
                               ref_topk_lp.numpy(), atol=ATOL)
    dec_real = dec >= 1  # pad dec rows: see test_t5_forward_parity note
    np.testing.assert_allclose(np.asarray(out.lm_logits)[dec_real],
                               ref_lm.numpy()[dec_real], atol=ATOL)
    # teacher: the reference returns raw per-doc logits [B, K, Ld, V]
    # (emdr2_model.py:185-211); gold log-probs are gathered downstream
    # (train_e2eqa.py:86-95). Ours fuses head+gather (online logsumexp).
    ref_gold = torch.log_softmax(ref_teacher.float(), dim=-1)
    ref_gold = ref_gold.gather(
        -1, torch.from_numpy(labels)[:, None, :, None].expand(B, K, Ld, 1)
    ).squeeze(-1)
    gold_real = np.broadcast_to(dec_real[:, None, :], (B, K, Ld))
    np.testing.assert_allclose(np.asarray(out.gold_log_probs)[gold_real],
                               ref_gold.numpy()[gold_real], atol=ATOL)
