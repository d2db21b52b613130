"""C++ store ops: build, exactness vs the pure-Python paths, speed sanity."""

import time

import numpy as np
import pytest

from emdr2_tpu.data.indexed_dataset import MMapIndexedDataset, MMapIndexedDatasetBuilder
from emdr2_tpu.data.postprocess import context_bert_format


@pytest.fixture(scope="module")
def lib():
    from emdr2_tpu import native
    return native


def build_store(tmp_path, name, seqs, dtype=np.uint16):
    prefix = str(tmp_path / name)
    with MMapIndexedDatasetBuilder(prefix, dtype=np.dtype(dtype)) as b:
        for s in seqs:
            b.add_item(s)
    return MMapIndexedDataset(prefix)


class TestGather:
    @pytest.mark.parametrize("dtype", [np.uint16, np.int32, np.int64, np.uint8])
    def test_matches_python(self, lib, tmp_path, dtype):
        rng = np.random.RandomState(0)
        seqs = [rng.randint(1, 200, size=rng.randint(1, 30)).tolist()
                for _ in range(50)]
        ds = build_store(tmp_path, f"g_{np.dtype(dtype).name}", seqs, dtype)
        idx = rng.randint(0, 50, size=64)
        out = lib.batch_gather_padded(ds._bin, ds.pointers, ds.sizes,
                                      ds.dtype, idx, max_len=16, pad_id=0)
        for r, i in enumerate(idx):
            expect = np.zeros(16, np.int32)
            s = np.asarray(seqs[i][:16])
            expect[: len(s)] = s
            np.testing.assert_array_equal(out[r], expect)

    def test_used_by_dataset(self, tmp_path):
        ds = build_store(tmp_path, "d", [[1, 2, 3], [9]])
        out = ds.batch_padded([1, 0], max_len=4)
        np.testing.assert_array_equal(out, [[9, 0, 0, 0], [1, 2, 3, 0]])


class TestContextFormat:
    def test_matches_python_formatter(self, lib, tmp_path):
        rng = np.random.RandomState(1)
        CLS, SEP, PAD, L = 101, 102, 0, 24
        texts = [rng.randint(1, 90, size=rng.randint(1, 40)).tolist()
                 for _ in range(30)]
        titles = [rng.randint(1, 90, size=rng.randint(1, 6)).tolist()
                  for _ in range(30)]
        text_ds = build_store(tmp_path, "text", texts)
        title_ds = build_store(tmp_path, "title", titles)
        doc_ids = np.arange(1, 31)
        ids, types = lib.batch_context_format(
            title_ds, text_ds, doc_ids, L, CLS, SEP, PAD)
        for r in range(30):
            want_ids, want_types = context_bert_format(
                titles[r] + [SEP] + texts[r], L, CLS, SEP, PAD)
            np.testing.assert_array_equal(ids[r], want_ids, err_msg=f"row {r}")
            np.testing.assert_array_equal(types[r], want_types)

    def test_truncation_edge(self, lib, tmp_path):
        CLS, SEP, PAD, L = 101, 102, 0, 8
        text_ds = build_store(tmp_path, "t2", [[7] * 50])
        title_ds = build_store(tmp_path, "ti2", [[5] * 50])
        ids, types = lib.batch_context_format(
            title_ds, text_ds, np.asarray([1]), L, CLS, SEP, PAD)
        want_ids, want_types = context_bert_format(
            [5] * 50 + [SEP] + [7] * 50, L, CLS, SEP, PAD)
        np.testing.assert_array_equal(ids[0], want_ids)

    def test_faster_than_python(self, lib, tmp_path):
        rng = np.random.RandomState(2)
        n = 2000
        texts = [rng.randint(1, 90, size=80).tolist() for _ in range(n)]
        titles = [rng.randint(1, 90, size=4).tolist() for _ in range(n)]
        text_ds = build_store(tmp_path, "t3", texts)
        title_ds = build_store(tmp_path, "ti3", titles)
        doc_ids = np.arange(1, n + 1)

        # best-of-3 to tolerate CPU contention from parallel test workers
        native_t = min(
            (lambda t0: (lib.batch_context_format(
                title_ds, text_ds, doc_ids, 128, 1, 2, 0),
                time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(3))

        t0 = time.perf_counter()
        for d in doc_ids[:200]:
            context_bert_format(titles[d - 1] + [2] + texts[d - 1], 128, 1, 2, 0)
        python_t = (time.perf_counter() - t0) * (n / 200)
        assert native_t < python_t * 2, (native_t, python_t)


def build_toy_corpus(tmp_path, n_docs=60, dtype=np.uint16, seed=3,
                     max_doc_len=40):
    """Corpus with shared titles (2-4 docs per title) so all neighbour-window
    positions (first/middle/last) and window lengths occur."""
    from emdr2_tpu.data.evidence import EvidenceCorpus
    rng = np.random.RandomState(seed)
    texts, titles = [], []
    group_of = []
    g = 0
    while len(texts) < n_docs:
        size = int(rng.randint(1, 5))
        for _ in range(min(size, n_docs - len(texts))):
            texts.append(rng.randint(3, 200,
                                     size=rng.randint(1, max_doc_len)).tolist())
            titles.append([200 + g])
        g += 1
    text_ds = build_store(tmp_path, f"pp_t_{dtype.__name__}", texts, dtype)
    title_ds = build_store(tmp_path, f"pp_ti_{dtype.__name__}", titles, dtype)
    return EvidenceCorpus(text_ds, title_ds)


class TestPostprocessNative:
    """C++ postprocess_batch vs the pure-Python golden implementation
    (SURVEY §7 hard-part 3: the per-step B*K reader/teacher row build)."""

    @pytest.mark.parametrize("dtype", [np.uint16, np.int32])
    @pytest.mark.parametrize("reader_len", [24, 64, 256])
    def test_matches_python_golden(self, lib, tmp_path, dtype, reader_len):
        from emdr2_tpu.data.postprocess import (postprocess_retrieved,
                                                postprocess_retrieved_python)
        corpus = build_toy_corpus(tmp_path, dtype=dtype)
        rng = np.random.RandomState(7)
        B, K = 6, 4
        uids = -np.arange(1, B + 1, dtype=np.int64)
        qlens = rng.randint(2, 10, size=B).astype(np.int32)
        qids = rng.randint(3, 200, size=(B, 12)).astype(np.int32)
        topk_ids = np.stack([
            rng.choice(np.arange(1, len(corpus) + 1), size=K, replace=False)
            for _ in range(B)]).astype(np.int64)
        kw = dict(query_uids=uids, query_t5_ids=qids, query_t5_lens=qlens,
                  topk_passage_ids=topk_ids, corpus=corpus, topk=K,
                  retriever_seq_len=32, reader_seq_len=reader_len,
                  cls_id=1, sep_id=2, pad_id=0)
        golden = postprocess_retrieved_python(**kw)
        fast = postprocess_retrieved(**kw)  # dispatches to C++
        for name, a, b in zip(golden._fields, golden, fast):
            np.testing.assert_array_equal(a, b, err_msg=name)

    def test_trivial_doc_skip(self, lib, tmp_path):
        """A hit equal to the query uid is skipped; K+1 retrieved -> K kept."""
        from emdr2_tpu.data.postprocess import (postprocess_retrieved,
                                                postprocess_retrieved_python)
        corpus = build_toy_corpus(tmp_path, seed=5)
        B, K = 2, 3
        uids = np.asarray([3, -1], np.int64)  # query 0 is corpus-sourced
        topk_ids = np.asarray([[3, 1, 2, 4], [5, 6, 7, 8]], np.int64)
        qids = np.full((B, 8), 9, np.int32)
        qlens = np.asarray([4, 4], np.int32)
        kw = dict(query_uids=uids, query_t5_ids=qids, query_t5_lens=qlens,
                  topk_passage_ids=topk_ids, corpus=corpus, topk=K,
                  retriever_seq_len=24, reader_seq_len=48,
                  cls_id=1, sep_id=2, pad_id=0)
        golden = postprocess_retrieved_python(**kw)
        fast = postprocess_retrieved(**kw)
        for a, b in zip(golden, fast):
            np.testing.assert_array_equal(a, b)

    def test_faster_than_python_postprocess(self, lib, tmp_path):
        import time
        from emdr2_tpu.data.postprocess import (postprocess_retrieved,
                                                postprocess_retrieved_python)
        corpus = build_toy_corpus(tmp_path, n_docs=400, seed=9,
                                  max_doc_len=120)
        rng = np.random.RandomState(11)
        B, K = 16, 10
        kw = dict(
            query_uids=-np.arange(1, B + 1, dtype=np.int64),
            query_t5_ids=rng.randint(3, 200, size=(B, 16)).astype(np.int32),
            query_t5_lens=np.full(B, 12, np.int32),
            topk_passage_ids=rng.randint(
                1, len(corpus) + 1, size=(B, K)).astype(np.int64),
            corpus=corpus, topk=K, retriever_seq_len=64, reader_seq_len=128,
            cls_id=1, sep_id=2, pad_id=0)
        corpus.neighbour_table()  # exclude one-time table build
        t0 = time.perf_counter()
        postprocess_retrieved(**kw)
        native_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        postprocess_retrieved_python(**kw)
        python_t = time.perf_counter() - t0
        # generous bound: CI contention; typical speedup is >20x
        assert native_t < python_t, (native_t, python_t)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
