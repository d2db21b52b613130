"""Offline evidence index build (BASELINE config 2).

Parity with ``/root/reference/create_doc_index.py`` + ``megatron/
indexer_emdr2.py``: embed the whole corpus with a (checkpointed) context
encoder and write an EmbeddingStore.

Usage:
  python -m emdr2_tpu.tools.create_doc_index \\
      --evidence-data-path wiki --vocab-file vocab.txt \\
      --embedding-path out/emb [--load ckpt_dir] [--batch-size 256]
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--evidence-data-path", required=True)
    p.add_argument("--vocab-file", required=True)
    p.add_argument("--embedding-path", required=True)
    p.add_argument("--load", default=None,
                   help="checkpoint dir holding retriever weights")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--num-attention-heads", type=int, default=12)
    p.add_argument("--ffn-hidden-size", type=int, default=3072)
    p.add_argument("--seq-length-ret", type=int, default=256)
    p.add_argument("--seq-length-query", type=int, default=64)  # unused here
    args = p.parse_args(argv)

    from emdr2_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()

    import dataclasses
    from emdr2_tpu import config as C
    from emdr2_tpu.data.evidence import EvidenceCorpus
    from emdr2_tpu.data.tokenizer import build_tokenizers
    from emdr2_tpu.models import EMDR2Model
    from emdr2_tpu.parallel import build_mesh
    from emdr2_tpu.retrieval.builder import EvidenceIndexBuilder
    from emdr2_tpu.training import checkpointing as ck

    bert_tok, t5_tok = build_tokenizers(args.vocab_file)
    enc = C.TransformerConfig(
        hidden_size=args.hidden_size, num_layers=args.num_layers,
        num_heads=args.num_attention_heads, ffn_size=args.ffn_hidden_size,
        num_tokentypes=2, vocab_size=bert_tok.padded_vocab_size)
    t5c = dataclasses.replace(enc, num_tokentypes=0,
                              vocab_size=t5_tok.padded_vocab_size)
    cfg = C.EMDR2Config(
        retriever=C.RetrieverConfig(encoder=enc, embed_dim=args.hidden_size,
                                    seq_len=args.seq_length_ret),
        reader=C.ReaderConfig(transformer=t5c),
        index=C.IndexConfig(embed_dim=args.hidden_size))

    mesh = build_mesh()
    from emdr2_tpu.parallel.mesh import bind_mesh
    cfg = bind_mesh(cfg, mesh)  # flash kernels shard_map over the mesh
    corpus = EvidenceCorpus.load(args.evidence_data_path + "_text",
                                 args.evidence_data_path + "_title")
    model = EMDR2Model(cfg)

    import jax.numpy as jnp
    sample = jnp.zeros((2, cfg.retriever.seq_len), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, sample, sample * 0,
                        method=EMDR2Model.embed_context)["params"]
    if args.load:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            params["retriever"])
        params = dict(params)
        params["retriever"] = ck.load_retriever_params(args.load, abstract)
        print(f"loaded retriever weights from {args.load}")

    builder = EvidenceIndexBuilder(
        cfg, mesh, model, corpus, t5_tok.cls_id, t5_tok.sep_id, t5_tok.pad_id,
        batch_size=args.batch_size)
    store = builder.build_store(
        params, args.embedding_path)
    print(f"wrote {len(store.ids)} embeddings to {args.embedding_path}")


if __name__ == "__main__":
    main()
