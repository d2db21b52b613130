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


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
