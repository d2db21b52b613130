"""Standalone recall@k evaluation over QA CSVs (glob supported).

Parity with ``/root/reference/evaluate_open_retrieval.py:7-37`` (BASELINE
configs 1-2): load precomputed evidence embeddings, encode dev/test
questions, search the sharded index, report recall@k with string answer
matching against the passage text.
"""

from __future__ import annotations

import argparse
import glob as globlib

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--qa-data", nargs="+", required=True,
                   help="QA csv path(s) or globs")
    p.add_argument("--evidence-data-path", required=True)
    p.add_argument("--embedding-path", required=True)
    p.add_argument("--vocab-file", required=True)
    p.add_argument("--load", default=None, help="retriever checkpoint dir")
    p.add_argument("--topk", type=int, default=100)
    p.add_argument("--report-topk-accuracies", type=int, nargs="+",
                   default=[1, 5, 20, 100])
    p.add_argument("--match", choices=["string", "regex"], default="string")
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--num-attention-heads", type=int, default=12)
    p.add_argument("--ffn-hidden-size", type=int, default=3072)
    p.add_argument("--seq-length-ret", type=int, default=256)
    p.add_argument("--seq-length-query", type=int, default=64)
    p.add_argument("--dump-path", default=None)
    args = p.parse_args(argv)

    from emdr2_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()

    from emdr2_tpu import config as C
    from emdr2_tpu.data.evidence import EvidenceCorpus
    from emdr2_tpu.data.qa_dataset import read_qa_csv
    from emdr2_tpu.data.tokenizer import build_tokenizers
    from emdr2_tpu.models import EMDR2Model
    from emdr2_tpu.parallel import build_mesh
    from emdr2_tpu.retrieval import EmbeddingStore, ShardedEvidenceIndex
    from emdr2_tpu.retrieval.evaluate import OpenRetrievalEvaluator
    from emdr2_tpu.training import checkpointing as ck

    bert_tok, t5_tok = build_tokenizers(args.vocab_file)
    enc = C.TransformerConfig(
        hidden_size=args.hidden_size, num_layers=args.num_layers,
        num_heads=args.num_attention_heads, ffn_size=args.ffn_hidden_size,
        num_tokentypes=2, vocab_size=bert_tok.padded_vocab_size)
    cfg = C.EMDR2Config(
        retriever=C.RetrieverConfig(
            encoder=enc, embed_dim=args.hidden_size,
            seq_len=args.seq_length_ret, query_seq_len=args.seq_length_query),
        index=C.IndexConfig(embed_dim=args.hidden_size, topk=args.topk))

    mesh = build_mesh()
    corpus = EvidenceCorpus.load(args.evidence_data_path + "_text",
                                 args.evidence_data_path + "_title")
    if args.embedding_path.endswith(".pkl"):
        store = EmbeddingStore.load_reference_pickle(args.embedding_path)
    else:
        store = EmbeddingStore.load(args.embedding_path)
    index = ShardedEvidenceIndex(mesh, cfg.index,
                                 np.asarray(store.embeddings, np.float32),
                                 passage_ids=np.asarray(store.ids))

    from emdr2_tpu.parallel.mesh import bind_mesh
    model = EMDR2Model(bind_mesh(cfg, mesh))
    import jax.numpy as jnp
    sample = jnp.zeros((2, cfg.retriever.query_seq_len), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, sample,
                        method=EMDR2Model.embed_query)["params"]
    if args.load:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            params["retriever"])
        params = dict(params)
        params["retriever"] = ck.load_retriever_params(args.load, abstract)

    evaluator = OpenRetrievalEvaluator(
        mesh, model, params, index, t5_tok, cfg.retriever.query_seq_len)

    def doc_text(pid: int) -> str:
        return t5_tok.detokenize(corpus.doc_tokens(pid))

    for pattern in args.qa_data:
        for path in sorted(globlib.glob(pattern)) or [pattern]:
            examples = read_qa_csv(path)
            result = evaluator.evaluate_recall(
                examples, k=args.topk, doc_text_fn=doc_text,
                match_type=args.match,
                report_at=args.report_topk_accuracies,
                dump_path=args.dump_path)
            pretty = " ".join(f"{k}={v:.4f}" for k, v in result.items())
            print(f"{path}: n={len(examples)} {pretty}")


if __name__ == "__main__":
    main()
