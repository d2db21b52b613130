"""Shared fixtures: a synthetic toy QA world (corpus + QA csv + tokenizer)
small enough for CPU e2e tests but exercising every pipeline stage."""

import numpy as np

from emdr2_tpu.config import tiny_config
from emdr2_tpu.data.evidence import EvidenceCorpus
from emdr2_tpu.data.indexed_dataset import MMapIndexedDataset, MMapIndexedDatasetBuilder
from emdr2_tpu.data.qa_dataset import OpenQADataset
from emdr2_tpu.data.tokenizer import BertWordPieceTokenizer, toy_vocab


def build_toy_world(tmp_path, n_docs=64, n_questions=24, seed=0):
    """A corpus of 'the color of item<i> is <color>' facts and questions
    asking for them; answerable only through retrieval."""
    rng = np.random.RandomState(seed)
    colors = ["red", "blue", "green", "gold"]
    words = [f"item{i}" for i in range(n_docs)] + colors + [
        "color", "of", "is", "what", "the"]
    tok = BertWordPieceTokenizer(toy_vocab(words), vocab_extra_ids=10)

    doc_colors = [colors[rng.randint(len(colors))] for _ in range(n_docs)]
    text_p, title_p = str(tmp_path / "text"), str(tmp_path / "title")
    with MMapIndexedDatasetBuilder(text_p) as b:
        for i in range(n_docs):
            b.add_item(tok.tokenize(f"the color of item{i} is {doc_colors[i]}"))
    with MMapIndexedDatasetBuilder(title_p) as b:
        for i in range(n_docs):
            # two docs per title -> neighbor windows exist
            b.add_item(tok.tokenize(f"item{i // 2}"))
    corpus = EvidenceCorpus(MMapIndexedDataset(text_p),
                            MMapIndexedDataset(title_p))

    qa_path = tmp_path / "qa.csv"
    rows = []
    for q in range(n_questions):
        i = q % n_docs
        rows.append(f"what is the color of item{i}\t['{doc_colors[i]}']\n")
    qa_path.write_text("".join(rows))

    cfg = tiny_config()
    # resize model vocabs to the toy tokenizer
    import dataclasses
    enc = dataclasses.replace(cfg.retriever.encoder,
                              vocab_size=tok.padded_vocab_size)
    t5c = dataclasses.replace(cfg.reader.transformer,
                              vocab_size=tok.padded_vocab_size)
    cfg = cfg.replace(
        retriever=dataclasses.replace(cfg.retriever, encoder=enc),
        reader=dataclasses.replace(cfg.reader, transformer=t5c),
    )
    ds = OpenQADataset([str(qa_path)], tok,
                       max_seq_length=cfg.retriever.query_seq_len,
                       decoder_seq_length=cfg.reader.decoder_seq_len)
    return cfg, tok, corpus, ds, doc_colors
