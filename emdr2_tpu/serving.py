"""Serving: an end-to-end question-answering pipeline.

The reference exposes inference only through evaluation scripts
(``/root/reference/tools/evaluate_orqa.py`` + ``reader_em_score``); this
wraps the same machinery — retrieve -> postprocess -> FiD encode -> KV-cached
greedy/beam decode — as a reusable API for deployment:

    pipeline = QAPipeline.load(checkpoint_dir, vocab_file, evidence_prefix,
                               embedding_path)
    answers = pipeline.ask(["who wrote hamlet?", ...])
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emdr2_tpu.config import EMDR2Config
from emdr2_tpu.data.evidence import EvidenceCorpus
from emdr2_tpu.data.postprocess import postprocess_retrieved
from emdr2_tpu.data.qa_dataset import encode_question
from emdr2_tpu.data.tokenizer import BertWordPieceTokenizer
from emdr2_tpu.models import EMDR2Batch, EMDR2Model
from emdr2_tpu.models.decoding import DecoderSession, beam_search_decode, greedy_decode
from emdr2_tpu.retrieval.index import ShardedEvidenceIndex


def _unbox_params(tree):
    """Strip ``nn.LogicallyPartitioned`` boxes degraded to plain
    ``{'value': ...}`` dicts by a structure-free orbax restore.

    Train params are boxed (layers.py ``with_lp``); a PyTreeCheckpointer
    restore without an abstract target loses the box type, leaving a dict
    level ``apply`` cannot unbox — ``word_embeddings`` would resolve to a
    dict, not an array (caught end-to-end by the /verify drive; the
    training loaders are unaffected because they restore against an
    abstract state that carries the real box types)."""
    if isinstance(tree, dict):
        if set(tree.keys()) == {"value"}:
            return _unbox_params(tree["value"])
        return {k: _unbox_params(v) for k, v in tree.items()}
    return tree


class QAPipeline:
    """Batched open-domain QA: every call retrieves fresh top-K evidence and
    generates an answer with the reader."""

    def __init__(self, cfg: EMDR2Config, params,
                 tokenizer: BertWordPieceTokenizer,
                 corpus: EvidenceCorpus, index: ShardedEvidenceIndex,
                 batch_size: int = 8, beam_size: int = 1,
                 max_decode_len: Optional[int] = None,
                 kv_quant: Optional[str] = None,
                 bf16_params: bool = True):
        self.cfg = cfg
        if bf16_params:
            # serving holds no optimizer state and no fp32 master copy, so
            # the dense kernels can live in bf16 storage outright —
            # BIT-identical outputs (see bf16_eval_params) at ~0.76 GB
            # less param HBM (440M params)
            from emdr2_tpu.models.decoding import bf16_eval_params
            params = bf16_eval_params(params)
        self.params = params
        self.tok = tokenizer
        self.corpus = corpus
        self.index = index
        self.model = EMDR2Model(cfg)
        # serving shards like eval does: the mesh bound into the config (by
        # ``load``/``bind_mesh``) makes the session's encode + token loops
        # mesh-sharded — batch rows over dp, flash kernels shard_mapped
        self.mesh = cfg.reader.transformer.mesh
        if self.mesh is not None:
            # batch rows become one dp-sharded global array, so the jitted
            # batch must be a multiple of the mesh's dp rows; round up —
            # ask() already pads each chunk with duplicate questions and
            # trims the answers back to the real count
            rows = self.mesh.shape[self.mesh.axis_names[0]]
            batch_size = -(-batch_size // rows) * rows
        self.batch_size = batch_size
        self.beam_size = beam_size
        self.max_decode_len = max_decode_len or cfg.reader.decoder_seq_len
        # kv_quant="int8": int8-stored cross-K/V for the token loop — halves
        # the decode slab HBM at parity latency (ops/decode_attention.py)
        self.session = DecoderSession(self.model, params, self.max_decode_len,
                                      mesh=self.mesh, kv_quant=kv_quant)
        self._embed_query = jax.jit(
            lambda p, ids: self.model.apply({"params": p}, ids,
                                            method=EMDR2Model.embed_query))

    # ---------------------------------------------------------------- loading

    @classmethod
    def load(cls, checkpoint_dir: str, vocab_file: str,
             evidence_prefix: str, embedding_path: str,
             cfg: Optional[EMDR2Config] = None, mesh=None, **kw) -> "QAPipeline":
        from emdr2_tpu.data.tokenizer import build_tokenizers
        from emdr2_tpu.parallel import build_mesh
        from emdr2_tpu.retrieval import EmbeddingStore
        from emdr2_tpu.training import checkpointing as ck

        bert_tok, t5_tok = build_tokenizers(vocab_file)
        if cfg is None:
            cfg = EMDR2Config()
        enc = dataclasses.replace(cfg.retriever.encoder,
                                  vocab_size=bert_tok.padded_vocab_size)
        t5c = dataclasses.replace(cfg.reader.transformer,
                                  vocab_size=t5_tok.padded_vocab_size)
        cfg = cfg.replace(
            retriever=dataclasses.replace(cfg.retriever, encoder=enc),
            reader=dataclasses.replace(cfg.reader, transformer=t5c))

        mesh = mesh or build_mesh()
        from emdr2_tpu.parallel.mesh import bind_mesh
        cfg = bind_mesh(cfg, mesh)  # flash kernels shard_map over the mesh
        corpus = EvidenceCorpus.load(evidence_prefix + "_text",
                                     evidence_prefix + "_title")
        if embedding_path.endswith(".pkl"):
            store = EmbeddingStore.load_reference_pickle(embedding_path)
        else:
            store = EmbeddingStore.load(embedding_path)
        index = ShardedEvidenceIndex(mesh, cfg.index,
                                     np.asarray(store.embeddings, np.float32),
                                     passage_ids=np.asarray(store.ids))

        import orbax.checkpoint as ocp
        it = ck.latest_iteration(checkpoint_dir)
        with ocp.PyTreeCheckpointer() as c:
            tree = c.restore(ck.iter_dir(checkpoint_dir, it))
        return cls(cfg, _unbox_params(tree["params"]), t5_tok, corpus, index,
                   **kw)

    # ---------------------------------------------------------------- serving

    def _build_batch(self, questions: Sequence[str]) -> EMDR2Batch:
        cfg = self.cfg
        B = len(questions)
        rows, lens = [], []
        for q in questions:
            ids, n = encode_question(q, self.tok, cfg.retriever.query_seq_len)
            rows.append(ids)
            lens.append(n)
        q_ids = np.asarray(rows, np.int32)

        k = cfg.index.topk + (0 if cfg.index.allow_trivial_doc else 1)
        q_emb = self._embed_query(self.params, jnp.asarray(q_ids))
        _, rows_dev = self.index.search(q_emb, k=k)
        pids = self.index.lookup_passage_ids(np.asarray(rows_dev))

        post = postprocess_retrieved(
            query_uids=[-(i + 1) for i in range(B)],
            query_t5_ids=q_ids, query_t5_lens=lens,
            topk_passage_ids=pids, corpus=self.corpus, topk=cfg.index.topk,
            retriever_seq_len=cfg.retriever.seq_len,
            reader_seq_len=cfg.reader.seq_len,
            cls_id=self.tok.cls_id, sep_id=self.tok.sep_id,
            pad_id=self.tok.pad_id)
        Ld = cfg.reader.decoder_seq_len
        return EMDR2Batch(
            query_bert_ids=jnp.asarray(q_ids),
            context_bert_ids=jnp.asarray(post.context_bert_ids),
            context_bert_types=jnp.asarray(post.context_bert_types),
            reader_ids=jnp.asarray(post.reader_ids),
            reader_one_ctx_ids=jnp.asarray(post.reader_one_ctx_ids),
            dec_ids=jnp.zeros((B, Ld), jnp.int32),
            labels=jnp.zeros((B, Ld), jnp.int32),
            loss_mask=jnp.zeros((B, Ld), jnp.float32),
        )

    def ask(self, questions: Sequence[str],
            return_passages: bool = False) -> List:
        """Answer questions; pads the tail batch so shapes stay static."""
        answers: List = []
        B = self.batch_size
        for s in range(0, len(questions), B):
            chunk = list(questions[s: s + B])
            real = len(chunk)
            while len(chunk) < B:
                chunk.append(chunk[-1])
            batch = self._build_batch(chunk)
            if self.beam_size == 1:
                hyps = greedy_decode(self.session, batch, self.tok.bos_id,
                                     self.tok.eos_id)
            else:
                hyps = beam_search_decode(self.session, batch, self.tok.bos_id,
                                          self.tok.eos_id,
                                          beam_size=self.beam_size)
            for hyp in hyps[:real]:
                answers.append(self.tok.detokenize(hyp).strip())
        return answers

    def retrieve_passages(self, questions: Sequence[str], k: int = 5
                          ) -> List[List[Tuple[int, str]]]:
        """Top-k (passage_id, text) per question — retrieval-only serving."""
        rows = [encode_question(q, self.tok, self.cfg.retriever.query_seq_len)[0]
                for q in questions]
        q_emb = self._embed_query(self.params, jnp.asarray(rows, jnp.int32))
        _, idx = self.index.search(q_emb, k=k)
        pids = self.index.lookup_passage_ids(np.asarray(idx))
        return [[(int(p), self.tok.detokenize(self.corpus.doc_tokens(int(p))).strip())
                 for p in row] for row in pids]
