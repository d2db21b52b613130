"""Retrieval evaluator: recall@k of the dense retriever over the full index.

Replaces ``OpenRetrievalEvaluator`` (``/root/reference/tasks/openqa/
dense_retriever/evaluation/evaluate.py:16-264``): the reference encodes
queries with a distributed sampler, does a varsize all_gather per node, FAISS-
searches on local rank 0, broadcasts and slices. Here query encoding is a
dp-sharded jitted apply and the search is the one-program sharded MIPS index;
no gather choreography is needed.
"""

from __future__ import annotations

import json
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emdr2_tpu.data.qa_dataset import QAExample, encode_question
from emdr2_tpu.retrieval.index import ShardedEvidenceIndex
from emdr2_tpu.retrieval.qa_validation import calculate_matches


class OpenRetrievalEvaluator:
    def __init__(self, mesh: Mesh, model, params, index: ShardedEvidenceIndex,
                 tokenizer, query_seq_len: int, batch_size: int = 64,
                 embed_method=None):
        """``embed_method``: bound flax method mapping query ids to
        embeddings; defaults to ``EMDR2Model.embed_query``. Pass
        ``DualEncoder.embed_query`` to evaluate a standalone DPR model."""
        self.mesh = mesh
        self.model = model
        self.embed_method = embed_method
        self.params = params
        self.index = index
        self.tok = tokenizer
        self.query_seq_len = query_seq_len
        dp = mesh.shape["dp"]
        self.batch_size = max(dp, (batch_size // dp) * dp)
        self._embed_fn = None

    def _embed(self, ids):
        if self._embed_fn is None:
            from emdr2_tpu.models import EMDR2Model

            dp = NamedSharding(self.mesh, P("dp"))
            method = self.embed_method or EMDR2Model.embed_query

            def f(params, ids):
                return self.model.apply({"params": params}, ids,
                                        method=method)

            self._embed_fn = jax.jit(f, in_shardings=(None, dp),
                                     out_shardings=dp)
        return self._embed_fn(self.params, ids)

    def encode_queries(self, questions: Sequence[str]) -> np.ndarray:
        """[n, d] fp32 query embeddings, static-shape batches with tail pad."""
        n = len(questions)
        rows = [encode_question(q, self.tok, self.query_seq_len)[0]
                for q in questions]
        ids = np.asarray(rows, np.int32)
        out = []
        bs = self.batch_size
        for s in range(0, n, bs):
            chunk = ids[s: s + bs]
            if len(chunk) < bs:
                chunk = np.pad(chunk, ((0, bs - len(chunk)), (0, 0)))
            out.append(np.asarray(self._embed(jnp.asarray(chunk))))
        return np.concatenate(out)[:n]

    def retrieve(self, questions: Sequence[str], k: int):
        """-> (passage_ids [n, k], scores [n, k])."""
        q = self.encode_queries(questions)
        n = len(questions)
        # pad to a dp multiple for the sharded search
        dp = self.mesh.shape["dp"]
        n_pad = ((n + dp - 1) // dp) * dp
        if n_pad != n:
            q = np.pad(q, ((0, n_pad - n), (0, 0)))
        dp_sh = NamedSharding(self.mesh, P("dp"))
        q_dev = jax.device_put(jnp.asarray(q), dp_sh)
        scores, rows = self.index.search(q_dev, k=k, queries_sharded=True)
        pids = self.index.lookup_passage_ids(np.asarray(rows)[:n])
        return pids, np.asarray(scores)[:n]

    def evaluate_recall(self, examples: Sequence[QAExample], k: int,
                        doc_text_fn: Callable[[int], str],
                        match_type: str = "string",
                        report_at: Optional[Sequence[int]] = None,
                        dump_path: Optional[str] = None) -> dict:
        """recall@k over QA examples (evaluate.py:96-195 equivalent).

        Returns {k_i: recall fraction}; optionally dumps per-question top-k
        passage ids + hits as JSON (the reference's shard+merge dump,
        :224-264, collapses to one local write)."""
        questions = [e.question for e in examples]
        answers = [e.answers for e in examples]
        pids, scores = self.retrieve(questions, k)
        closest = [(pids[i].tolist(), scores[i].tolist())
                   for i in range(len(questions))]
        stats = calculate_matches(doc_text_fn, answers, closest,
                                  match_type=match_type)
        n = len(questions)
        report_at = report_at or [1, 5, min(20, k), k]
        result = {f"recall@{j}": stats.top_k_hits[j - 1] / n
                  for j in sorted(set(min(j, k) for j in report_at))}
        if dump_path is not None:
            with open(dump_path, "w") as f:
                json.dump([
                    {"question": q, "answers": list(a),
                     "passages": p, "hits": h}
                    for q, a, (p, _), h in zip(questions, answers, closest,
                                               stats.questions_doc_hits)
                ], f)
        return result
