"""Unit tests for masks, wordpiece tokenization, and the mmap token store."""

import numpy as np
import pytest

from emdr2_tpu.data import masks
from emdr2_tpu.data.indexed_dataset import (
    MMapIndexedDataset,
    MMapIndexedDatasetBuilder,
    best_dtype,
)
from emdr2_tpu.data.tokenizer import BertWordPieceTokenizer, pad_vocab_size, toy_vocab
from emdr2_tpu.data.wordpiece import BasicTokenizer, FullTokenizer, WordPieceTokenizer


class TestMasks:
    def test_padding_semantics(self):
        # parity: token id >= 1 is real (reference mask_creation_utils.py:11)
        ids = np.array([[5, 3, 0, 0], [1, 0, 0, 0]])
        m = np.asarray(masks.padding_mask(ids))
        assert m.tolist() == [[True, True, False, False], [True, False, False, False]]

    def test_attention_mask_matches_reference_outer_product(self):
        src = np.array([[2, 3, 0]])
        tgt = np.array([[7, 0, 0, 9]])
        m = np.asarray(masks.attention_mask(src, tgt)).astype(np.int64)
        ref = (tgt[:, None, :] >= 1) * (src[:, :, None] >= 1)  # :17-26 semantics
        np.testing.assert_array_equal(m, ref.astype(np.int64))

    def test_causal(self):
        m = np.asarray(masks.causal_mask(3)).astype(int)
        np.testing.assert_array_equal(m, [[1, 0, 0], [1, 1, 0], [1, 1, 1]])

    def test_self_attention_causal_composition(self):
        ids = np.array([[4, 4, 0]])
        m = np.asarray(masks.self_attention_mask(ids, causal=True)).astype(int)
        np.testing.assert_array_equal(m[0], [[1, 0, 0], [1, 1, 0], [0, 0, 0]])

    def test_bias_finite(self):
        m = masks.self_attention_mask(np.array([[0, 0]]))
        bias = np.asarray(masks.mask_to_bias(m))
        assert np.all(np.isfinite(bias))


class TestWordPiece:
    def test_basic_lower_and_punct(self):
        bt = BasicTokenizer(lower_case=True)
        assert bt.tokenize("Hello, World!") == ["hello", ",", "world", "!"]

    def test_accent_strip(self):
        bt = BasicTokenizer(lower_case=True)
        assert bt.tokenize("café") == ["cafe"]

    def test_cjk_isolation(self):
        bt = BasicTokenizer(lower_case=True)
        assert bt.tokenize("ab中文cd") == ["ab", "中", "文", "cd"]

    def test_wordpiece_greedy_longest_match(self):
        vocab = {"[UNK]": 0, "un": 1, "##aff": 2, "##able": 3, "##ff": 4}
        wp = WordPieceTokenizer(vocab)
        assert wp.tokenize("unaffable") == ["un", "##aff", "##able"]

    def test_wordpiece_unk(self):
        vocab = {"[UNK]": 0, "a": 1}
        wp = WordPieceTokenizer(vocab)
        assert wp.tokenize("xyz") == ["[UNK]"]
        assert wp.tokenize("a" * 300) == ["[UNK]"]

    def test_full_roundtrip_ids(self):
        v = toy_vocab()
        full = FullTokenizer(v)
        toks = full.tokenize("cat!")
        assert toks == ["c", "##a", "##t", "!"]
        ids = full.tokens_to_ids(toks)
        assert full.ids_to_tokens(ids) == toks


class TestBertTokenizer:
    def test_special_tokens_appended(self):
        tok = BertWordPieceTokenizer(toy_vocab(), vocab_extra_ids=3)
        base = len(toy_vocab())
        # BOS/EOS first, then sentinels — parity with reference tokenizer.py:151-167
        assert tok.bos_id == base
        assert tok.eos_id == base + 1
        assert tok.vocab["<extra_id_0>"] == base + 2
        assert tok.vocab_size == base + 5

    def test_pad_vocab(self):
        assert pad_vocab_size(30522) == 30592
        assert pad_vocab_size(128) == 128

    def test_detokenize_joins_wordpieces(self):
        tok = BertWordPieceTokenizer(toy_vocab())
        ids = tok.tokenize("hi there")
        text = tok.detokenize(ids).strip()
        assert text.replace(" ", "") == "hithere"


class TestIndexedDataset:
    def test_roundtrip(self, tmp_path):
        prefix = str(tmp_path / "ds")
        seqs = [[1, 2, 3], [7], [4, 5, 6, 8, 9]]
        b = MMapIndexedDatasetBuilder(prefix, dtype=best_dtype(30000))
        for s in seqs:
            b.add_item(s)
            b.end_document()
        b.finalize()

        ds = MMapIndexedDataset(prefix)
        assert len(ds) == 3
        assert ds.dtype == np.uint16
        for i, s in enumerate(seqs):
            np.testing.assert_array_equal(ds[i], s)
        np.testing.assert_array_equal(ds.sizes, [3, 1, 5])
        np.testing.assert_array_equal(ds.doc_idx, [0, 1, 2, 3])

    def test_get_with_offset(self, tmp_path):
        prefix = str(tmp_path / "ds")
        with MMapIndexedDatasetBuilder(prefix) as b:
            b.add_item(list(range(10)))
        ds = MMapIndexedDataset(prefix)
        np.testing.assert_array_equal(ds.get(0, offset=2, length=3), [2, 3, 4])

    def test_reference_format_compat(self, tmp_path):
        """Byte-level check of the header the reference reader expects
        (indexed_dataset.py:335-420)."""
        import struct

        prefix = str(tmp_path / "ds")
        with MMapIndexedDatasetBuilder(prefix, dtype=np.dtype(np.int32)) as b:
            b.add_item([10, 20])
            b.end_document()
        with open(prefix + ".idx", "rb") as f:
            assert f.read(9) == b"MMIDIDX\x00\x00"
            assert struct.unpack("<Q", f.read(8))[0] == 1
            assert struct.unpack("<B", f.read(1))[0] == 4  # int32 code
            assert struct.unpack("<Q", f.read(8))[0] == 1  # n sequences
            assert struct.unpack("<Q", f.read(8))[0] == 2  # doc idx entries

    def test_batch_padded(self, tmp_path):
        prefix = str(tmp_path / "ds")
        with MMapIndexedDatasetBuilder(prefix) as b:
            b.add_item([1, 2, 3, 4, 5])
            b.add_item([9])
        ds = MMapIndexedDataset(prefix)
        out = ds.batch_padded([1, 0], max_len=3, pad_id=0)
        np.testing.assert_array_equal(out, [[9, 0, 0], [1, 2, 3]])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
