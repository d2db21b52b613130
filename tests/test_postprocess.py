"""Postprocess / evidence-corpus / QA-dataset behavior tests.

The extension-window cases are hand-derived from the reference semantics
(emdr2_model.py:306-359) including its off-by-one tail-keep quirks.
"""

import numpy as np
import pytest

from emdr2_tpu.data.evidence import EvidenceCorpus, TitleDocMap
from emdr2_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder, MMapIndexedDataset
from emdr2_tpu.data.postprocess import (
    PostprocessedBatch,
    context_bert_format,
    postprocess_retrieved,
    query_extended_context_t5_format,
    query_single_context_t5_format,
)
from emdr2_tpu.data.qa_dataset import OpenQADataset, encode_answer, encode_question
from emdr2_tpu.data.tokenizer import BertWordPieceTokenizer, toy_vocab

SEP, PAD, CLS = 100, 0, 101
Q = [9, 9]
TITLE = [7]
PREFIX = Q + TITLE + [SEP]      # 4 tokens
MAXLEN = 12                     # budget = 12 - 4 - 1 = 7


def ext(doc_list, idx):
    return query_extended_context_t5_format(Q, TITLE, doc_list, idx,
                                            MAXLEN, SEP, PAD)


class TestExtendedContext:
    def test_long_main_truncated(self):
        ids = ext([[1] * 10], 0)
        assert ids == PREFIX + [1] * 7 + [SEP]

    def test_first_extends_right(self):
        ids = ext([[1, 2, 3], [4, 4], [5, 5]], 0)
        assert ids == PREFIX + [1, 2, 3, 4, 4, 5, 5] + [SEP]

    def test_last_keeps_left_tail(self):
        # left = 9 tokens, extra = 4 -> reference keeps extra-1 = 3 tail tokens
        ids = ext([[4] * 5, [5] * 4, [1, 2, 3]], -1)
        assert ids == PREFIX + [5, 5, 5, 1, 2, 3] + [SEP] + [PAD] * 1

    def test_middle_long_left_no_right(self):
        ids = ext([[4] * 8, [1, 2, 3], [6, 6]], 1)
        assert ids == PREFIX + [4, 4, 4, 1, 2, 3] + [SEP] + [PAD] * 1

    def test_middle_short_left_then_right(self):
        ids = ext([[4, 4], [1, 2, 3], [6] * 5], 1)
        assert ids == PREFIX + [4, 4, 1, 2, 3, 6, 6] + [SEP]

    def test_single_context_format(self):
        ids = query_single_context_t5_format(Q, TITLE, [1, 2, 3], MAXLEN, SEP, PAD)
        assert ids == PREFIX + [1, 2, 3] + [SEP] + [PAD] * 4
        # truncation keeps room for the trailing SEP
        ids = query_single_context_t5_format(Q, TITLE, [1] * 20, MAXLEN, SEP, PAD)
        assert len(ids) == MAXLEN and ids[-1] == SEP

    def test_context_bert_format(self):
        ids, types = context_bert_format([5, 6], 6, CLS, SEP, PAD)
        assert ids == [CLS, 5, 6, SEP, PAD, PAD]
        assert types == [0, 0, 0, 0, PAD, PAD]


class TestTitleDocMap:
    def test_window_positions(self):
        # docs 1,2,3,4 share title A; doc 5 alone
        m = TitleDocMap.from_keys(["A", "A", "A", "A", "B"])
        assert m.neighbours(1) == ([1, 2, 3], 0)
        assert m.neighbours(2) == ([1, 2, 3], 1)
        assert m.neighbours(3) == ([2, 3, 4], 1)
        assert m.neighbours(4) == ([2, 3, 4], -1)
        assert m.neighbours(5) == ([5], 0)


def build_corpus(tmp_path, docs, titles):
    tp, pp = str(tmp_path / "title"), str(tmp_path / "text")
    with MMapIndexedDatasetBuilder(pp) as b:
        for d in docs:
            b.add_item(d)
    with MMapIndexedDatasetBuilder(tp) as b:
        for t in titles:
            b.add_item(t)
    return EvidenceCorpus(MMapIndexedDataset(pp), MMapIndexedDataset(tp))


class TestPostprocess:
    def test_end_to_end_shapes_and_skip(self, tmp_path):
        # 4 docs, ids 1-4; docs 1-2 share a title
        docs = [[11, 11], [12, 12], [13, 13], [14, 14]]
        titles = [[21], [21], [22], [23]]
        corpus = build_corpus(tmp_path, docs, titles)

        B, K = 2, 2
        q_ids = np.asarray([[9, 9, 0, 0], [8, 8, 8, 0]], np.int32)
        q_lens = [2, 3]
        # query 0 retrieved K+1 hits including its own uid (-1): skipped
        topk = np.asarray([[1, -1, 3], [2, 4, 1]])
        out = postprocess_retrieved(
            query_uids=[-1, -2], query_t5_ids=q_ids, query_t5_lens=q_lens,
            topk_passage_ids=topk, corpus=corpus, topk=K,
            retriever_seq_len=8, reader_seq_len=16,
            cls_id=CLS, sep_id=SEP, pad_id=PAD)
        assert isinstance(out, PostprocessedBatch)
        assert out.context_bert_ids.shape == (B, K, 8)
        assert out.reader_ids.shape == (B, K, 16)
        # query0 doc0 = doc 1: [CLS] 21 SEP 11 11 SEP
        np.testing.assert_array_equal(
            out.context_bert_ids[0, 0, :6], [CLS, 21, SEP, 11, 11, SEP])
        # reader row starts with the true-length query
        np.testing.assert_array_equal(out.reader_ids[1, 0, :3], [8, 8, 8])
        # doc 1 is first of [1,2]: extended context pulls doc 2 tokens
        r = out.reader_ids[0, 0].tolist()
        assert r[: 4] == [9, 9, 21, SEP] and 12 in r

    def test_insufficient_docs_raises(self, tmp_path):
        corpus = build_corpus(tmp_path, [[11]], [[21]])
        with pytest.raises(AssertionError, match="usable docs"):
            postprocess_retrieved(
                [-1], np.asarray([[9, 0]], np.int32), [1],
                np.asarray([[1]]), corpus, topk=2,
                retriever_seq_len=8, reader_seq_len=16,
                cls_id=CLS, sep_id=SEP, pad_id=PAD)


class TestQADataset:
    def test_csv_and_encoding(self, tmp_path):
        p = tmp_path / "qa.csv"
        p.write_text("who is it?\t['bob', 'robert']\nwhat now\t['x']\n")
        tok = BertWordPieceTokenizer(toy_vocab())
        ds = OpenQADataset([str(p)], tok, max_seq_length=16,
                           decoder_seq_length=8)
        assert len(ds) == 2
        b = ds.batch([0, 1])
        assert b.query_uid.tolist() == [-1, -2]
        assert b.query_bert_ids.shape == (2, 16)
        assert b.query_bert_ids[0, 0] == tok.cls_id
        # dec_in starts with BOS; labels end (at mask boundary) with EOS
        assert b.dec_ids[0, 0] == tok.bos_id
        n = int(b.loss_mask[0].sum())
        assert b.labels[0, n - 1] == tok.eos_id
        assert b.references[0] == ["bob", "robert"]

    def test_answer_truncation(self):
        tok = BertWordPieceTokenizer(toy_vocab())
        dec_in, dec_out, mask = encode_answer("a" * 40, tok, 4)
        assert len(dec_in) == len(dec_out) == len(mask) == 4
        assert dec_out[3] == tok.eos_id  # EOS still present after truncation

    def test_epoch_batches_seeded(self, tmp_path):
        p = tmp_path / "qa.csv"
        p.write_text("".join(f"q {i}\t['a']\n" for i in range(10)))
        tok = BertWordPieceTokenizer(toy_vocab())
        ds = OpenQADataset([str(p)], tok, 16, 8)
        b1 = [b.query_uid.tolist() for b in ds.epoch_batches(3, seed=7)]
        b2 = [b.query_uid.tolist() for b in ds.epoch_batches(3, seed=7)]
        assert b1 == b2 and len(b1) == 3  # drop_last


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
