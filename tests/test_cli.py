"""CLI end-to-end smoke tests: data prep -> offline index -> recall eval ->
OPENQA training -> RETRIEVER training -> checkpoint surgery, all through the
actual command-line entry points on a toy corpus."""

import json
import os

import numpy as np
import pytest

from emdr2_tpu.data.tokenizer import toy_vocab


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    # vocab file
    words = [f"item{i}" for i in range(16)] + [
        "red", "blue", "color", "of", "is", "what", "the"]
    vocab = toy_vocab(words)
    vocab_path = d / "vocab.txt"
    vocab_path.write_text("\n".join(vocab) + "\n")
    # evidence tsv (header + doc_id, text, title)
    rows = ["id\ttext\ttitle"]
    colors = ["red", "blue"]
    for i in range(16):
        rows.append(f"{i+1}\tthe color of item{i} is {colors[i % 2]}\titem{i // 2}")
    (d / "evidence.tsv").write_text("\n".join(rows) + "\n")
    # qa csv
    qa = [f"what is the color of item{i}\t['{colors[i % 2]}']" for i in range(16)]
    (d / "qa.csv").write_text("\n".join(qa) + "\n")
    return d


MODEL_ARGS = ["--hidden-size", "32", "--num-layers", "1",
              "--num-attention-heads", "2", "--ffn-hidden-size", "64",
              "--seq-length-ret", "24", "--seq-length-query", "16"]


class TestCLIPipeline:
    def test_01_build_evidence(self, workdir):
        from emdr2_tpu.tools.build_evidence import build
        n = build(str(workdir / "evidence.tsv"), str(workdir / "wiki"),
                  str(workdir / "vocab.txt"), workers=2)
        assert n == 16
        from emdr2_tpu.data.indexed_dataset import MMapIndexedDataset
        ds = MMapIndexedDataset(str(workdir / "wiki_text"))
        assert len(ds) == 16

    def test_02_create_doc_index(self, workdir):
        from emdr2_tpu.tools.create_doc_index import main
        main(["--evidence-data-path", str(workdir / "wiki"),
              "--vocab-file", str(workdir / "vocab.txt"),
              "--embedding-path", str(workdir / "emb"),
              "--batch-size", "8"] + MODEL_ARGS)
        from emdr2_tpu.retrieval import EmbeddingStore
        store = EmbeddingStore.load(str(workdir / "emb"))
        assert len(store.ids) == 16

    def test_03_evaluate_retrieval(self, workdir, capsys):
        from emdr2_tpu.tools.evaluate_retrieval import main
        main(["--qa-data", str(workdir / "qa.csv"),
              "--evidence-data-path", str(workdir / "wiki"),
              "--embedding-path", str(workdir / "emb"),
              "--vocab-file", str(workdir / "vocab.txt"),
              "--topk", "4",
              "--report-topk-accuracies", "1", "4"] + MODEL_ARGS)
        out = capsys.readouterr().out
        assert "recall@1=" in out and "recall@4=" in out

    def test_04_openqa_task(self, workdir, capsys):
        from emdr2_tpu.tasks.run import main
        rc = main(["--task", "OPENQA",
                   "--vocab-file", str(workdir / "vocab.txt"),
                   "--train-data", str(workdir / "qa.csv"),
                   "--valid-data", str(workdir / "qa.csv"),
                   "--evidence-data-path", str(workdir / "wiki"),
                   "--embedding-path", str(workdir / "emb"),
                   "--save", str(workdir / "run"),
                   "--topk-retrievals", "2", "--batch-size", "1",
                   "--dp", "8", "--epochs", "1", "--log-interval", "1",
                   "--seq-length", "48", "--seq-length-dec", "8",
                   "--save-interval", "1", "--eval-interval", "100",
                   "--max-decode-len", "4",
                   "--async-indexer", "--index-reload-interval", "1",
                   ] + MODEL_ARGS)
        assert rc == 0
        out = capsys.readouterr().out
        assert "valid EM" in out
        from emdr2_tpu.training.checkpointing import latest_iteration
        assert latest_iteration(str(workdir / "run")) == 2  # 16/8 batches

    def test_05_retriever_task(self, workdir, capsys):
        """Full RETRIEVER lifecycle: train -> interval/epoch checkpoint save
        -> post-train index build + recall eval on the dev QA file
        (train_dense_retriever.py:305-309, 371-391)."""
        # DPR json from the same toy facts
        colors = ["red", "blue"]
        rows = [{
            "question": f"what is the color of item{i}",
            "answers": [colors[i % 2]],
            "positive_ctxs": [{"title": f"item{i // 2}",
                               "text": f"the color of item{i} is {colors[i % 2]}"}],
            "hard_negative_ctxs": [{"title": f"item{(i+1) // 2}",
                                    "text": f"the color of item{(i+1) % 16} is x"}],
        } for i in range(16)]
        (workdir / "dpr.json").write_text(json.dumps(rows))
        from emdr2_tpu.tasks.run import main
        args = ["--task", "RETRIEVER",
                "--vocab-file", str(workdir / "vocab.txt"),
                "--train-data", str(workdir / "dpr.json"),
                "--valid-data", str(workdir / "dpr.json"),
                "--save", str(workdir / "dpr_run"),
                "--load", str(workdir / "dpr_run"),
                "--batch-size", "1", "--dp", "8", "--epochs", "1",
                "--save-interval", "2", "--log-interval", "1",
                "--topk-retrievals", "4",
                "--val-av-rank-other-neg", "2", "--val-av-rank-hard-neg", "1",
                "--report-topk-accuracies", "1", "4",
                "--evidence-data-path", str(workdir / "wiki"),
                "--embedding-path", str(workdir / "emb_dpr"),
                "--qa-file-dev", str(workdir / "qa.csv")] + MODEL_ARGS
        rc = main(args)
        assert rc == 0
        out = capsys.readouterr().out
        assert "top1" in out and "average_rank" in out
        assert "DEV retrieval" in out and "recall@4" in out
        from emdr2_tpu.training.checkpointing import latest_iteration
        assert latest_iteration(str(workdir / "dpr_run")) == 2  # 16/8 batches
        from emdr2_tpu.retrieval import EmbeddingStore
        assert len(EmbeddingStore.load(str(workdir / "emb_dpr")).ids) == 16

    def test_05b_retriever_resume_noop(self, workdir, capsys):
        """Re-launching with --load at the final iteration runs 0 extra steps
        but still executes the post-train evaluation."""
        from emdr2_tpu.tasks.run import main
        rc = main(["--task", "RETRIEVER",
                   "--vocab-file", str(workdir / "vocab.txt"),
                   "--train-data", str(workdir / "dpr.json"),
                   "--load", str(workdir / "dpr_run"),
                   "--batch-size", "1", "--dp", "8", "--epochs", "1",
                   "--topk-retrievals", "4",
                   "--report-topk-accuracies", "1", "4",
                   "--evidence-data-path", str(workdir / "wiki"),
                   "--qa-file-dev", str(workdir / "qa.csv")] + MODEL_ARGS)
        assert rc == 0
        out = capsys.readouterr().out
        assert "resumed retriever" in out
        assert "DEV retrieval" in out

    def test_05c_openqa_init_from_dpr(self, workdir, capsys):
        """The two-stage pipeline: a trained DPR checkpoint initializes the
        EMDR2 retriever subtree at iteration 0 (--pretrained-dpr-load,
        reference training.py:156-158)."""
        from emdr2_tpu.tasks.run import main
        rc = main(["--task", "OPENQA",
                   "--vocab-file", str(workdir / "vocab.txt"),
                   "--train-data", str(workdir / "qa.csv"),
                   "--evidence-data-path", str(workdir / "wiki"),
                   "--embedding-path", str(workdir / "emb_dpr"),
                   "--pretrained-dpr-load", str(workdir / "dpr_run"),
                   "--topk-retrievals", "2", "--batch-size", "1",
                   "--dp", "8", "--train-iters", "1", "--epochs", "1",
                   "--log-interval", "1",
                   "--seq-length", "48", "--seq-length-dec", "8",
                   "--save-interval", "100", "--eval-interval", "100",
                   "--max-decode-len", "4"] + MODEL_ARGS)
        assert rc == 0
        out = capsys.readouterr().out
        assert "initialized retriever from" in out

    def test_04b_eval_only_batch_roundup(self, workdir, capsys):
        """--eval-only with an --eval-batch-size that does not divide the
        dp mesh: evaluate_em rounds the jitted batch up to the mesh row
        multiple (pad rows are uid-duplicates the score dedupe discards),
        and the bf16 eval param cast engages."""
        from emdr2_tpu.tasks.run import main
        rc = main(["--task", "OPENQA",
                   "--vocab-file", str(workdir / "vocab.txt"),
                   "--train-data", str(workdir / "qa.csv"),
                   "--valid-data", str(workdir / "qa.csv"),
                   "--evidence-data-path", str(workdir / "wiki"),
                   "--embedding-path", str(workdir / "emb"),
                   "--load", str(workdir / "run"),
                   "--eval-only", "--eval-batch-size", "3",
                   "--topk-retrievals", "2", "--batch-size", "1",
                   "--dp", "8", "--epochs", "1",
                   "--seq-length", "48", "--seq-length-dec", "8",
                   "--max-decode-len", "4"] + MODEL_ARGS)
        assert rc == 0
        out = capsys.readouterr().out
        # all 16 unique examples scored despite padding/round-up
        assert "over 16" in out

    def test_04c_qapipeline_load(self, workdir):
        """QAPipeline.load against a REAL saved checkpoint: the orbax
        restore degrades nn.LogicallyPartitioned boxes to {'value': ...}
        dicts, which load must strip (serving.py _unbox_params) — and the
        bf16_params default must answer identically to fp32 storage."""
        import dataclasses

        import jax.numpy as jnp

        from emdr2_tpu.config import (EMDR2Config, IndexConfig, ReaderConfig,
                                      RetrieverConfig, TransformerConfig)
        from emdr2_tpu.serving import QAPipeline
        enc = TransformerConfig(
            vocab_size=1, hidden_size=32, num_layers=1, num_heads=2,
            ffn_size=64, max_position_embeddings=512, num_tokentypes=2,
            hidden_dropout=0.0, attention_dropout=0.0, dtype=jnp.bfloat16)
        t5c = dataclasses.replace(enc, num_tokentypes=0)
        cfg = EMDR2Config(
            retriever=RetrieverConfig(encoder=enc, embed_dim=32,
                                      seq_len=24, query_seq_len=16),
            reader=ReaderConfig(transformer=t5c, seq_len=48,
                                decoder_seq_len=8),
            index=IndexConfig(embed_dim=32, topk=2))
        kw = dict(checkpoint_dir=str(workdir / "run"),
                  vocab_file=str(workdir / "vocab.txt"),
                  evidence_prefix=str(workdir / "wiki"),
                  embedding_path=str(workdir / "emb"))
        qs = ["what is the color of item0", "what is the color of item3"]
        p16 = QAPipeline.load(cfg=cfg, batch_size=4, **kw)  # bf16 default
        a16 = p16.ask(qs)
        assert len(a16) == 2 and all(isinstance(a, str) for a in a16)
        p32 = QAPipeline.load(cfg=cfg, batch_size=4, bf16_params=False, **kw)
        assert p32.ask(qs) == a16

    def test_06_checkpoint_surgery(self, workdir):
        from emdr2_tpu.tools.checkpoint_surgery import extract, strip_optim
        run = str(workdir / "run")
        out = extract(run, "retriever", str(workdir / "ret_only"))
        assert os.path.exists(out)
        slim = strip_optim(run, str(workdir / "slim"))
        assert os.path.exists(slim)
        # extracted checkpoint is loadable by the partial loader
        import jax
        from emdr2_tpu.training import checkpointing as ck
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as c:
            tree = c.restore(out)
        assert "retriever" in tree["params"]
        assert "reader" not in tree["params"]


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
