"""Sharded evidence index + datastore tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emdr2_tpu.config import IndexConfig
from emdr2_tpu.parallel import build_mesh
from emdr2_tpu.retrieval import EmbeddingStore, ShardedEvidenceIndex


@pytest.fixture(scope="module")
def mesh():
    return build_mesh()  # 8 x 1


def make_cfg(**kw):
    base = dict(embed_dim=32, topk=5, chunk_rows=64, group_size=1,
                query_tile=8, dtype=jnp.float32, exact=False)
    base.update(kw)
    return IndexConfig(**base)


class TestShardedIndex:
    def test_search_matches_numpy(self, mesh):
        rng = np.random.RandomState(0)
        n, d, k = 1000, 32, 5   # n not divisible by 8 devices * 64 chunk
        emb = rng.randn(n, d).astype(np.float32)
        q = rng.randn(16, d).astype(np.float32)
        idx = ShardedEvidenceIndex(mesh, make_cfg(), emb)
        vals, rows = idx.search(jnp.asarray(q), k=k)
        scores = q @ emb.T
        ni = np.argsort(-scores, 1)[:, :k]
        np.testing.assert_array_equal(np.asarray(rows), ni)
        np.testing.assert_allclose(
            np.asarray(vals), np.take_along_axis(scores, ni, 1), rtol=1e-4)

    def test_sharded_queries(self, mesh):
        rng = np.random.RandomState(1)
        n, d, k = 512, 32, 4
        emb = rng.randn(n, d).astype(np.float32)
        q = rng.randn(16, d).astype(np.float32)
        idx = ShardedEvidenceIndex(mesh, make_cfg(), emb)
        from emdr2_tpu.parallel import data_sharding
        q_dev = jax.device_put(jnp.asarray(q), data_sharding(mesh))
        vals, rows = idx.search(q_dev, k=k, queries_sharded=True)
        scores = q @ emb.T
        ni = np.argsort(-scores, 1)[:, :k]
        np.testing.assert_array_equal(np.asarray(rows), ni)

    def test_update_hot_swap(self, mesh):
        rng = np.random.RandomState(2)
        n, d = 256, 32
        emb = rng.randn(n, d).astype(np.float32)
        idx = ShardedEvidenceIndex(mesh, make_cfg(), emb)
        q = rng.randn(4, d).astype(np.float32)
        _, rows_before = idx.search(jnp.asarray(q), k=3)
        emb2 = rng.randn(n, d).astype(np.float32)
        idx.update(emb2)
        _, rows_after = idx.search(jnp.asarray(q), k=3)
        ni = np.argsort(-(q @ emb2.T), 1)[:, :3]
        np.testing.assert_array_equal(np.asarray(rows_after), ni)
        assert not np.array_equal(np.asarray(rows_before), np.asarray(rows_after))

    def test_negative_scores_with_tail_padding(self, mesh):
        """Index zero-pad rows score 0.0; with all-negative true scores they
        would displace real candidates from the in-kernel group selection
        unless masked via n_valid (ADVICE r2: the post-hoc guard alone
        demotes pad rows but cannot recover the displaced real ones)."""
        n, d, k = 1000, 32, 5
        u = np.zeros(d, np.float32)
        u[0] = 1.0
        # best rows are the last real ones (999, 998, ...), which share
        # 16-row groups with the zero-padded tail
        emb = -np.arange(n, 0, -1, dtype=np.float32)[:, None] * u[None, :]
        q = u[None, :].repeat(4, axis=0)
        idx = ShardedEvidenceIndex(
            mesh, make_cfg(group_size=16, query_tile=8), emb)
        assert idx.n_padded != idx.n_real  # the case under test
        vals, rows = idx.search(jnp.asarray(q), k=k)
        # per-group top-2 contract: the mixed real/pad tail group (992-1007)
        # must yield its two best REAL rows (999, 998) — without the
        # in-kernel mask the 0.0-scoring pad rows take both slots and the
        # real ones are unrecoverable; remaining k come from earlier groups
        expect = np.array([999, 998, 991, 990, 975])
        np.testing.assert_array_equal(np.asarray(rows),
                                      np.tile(expect, (4, 1)))
        np.testing.assert_allclose(
            np.asarray(vals),
            np.tile(-(n - expect).astype(np.float32), (4, 1)), rtol=1e-5)

    def test_negative_scores_exact_path(self, mesh):
        """Same displacement scenario through the exact/small-shard branch
        (cfg.exact=True): pad rows must be masked BEFORE lax.top_k — the
        old post-hoc guard demoted them but could not recover the real
        rows they displaced from the per-shard top-k."""
        n, d, k = 1000, 32, 5
        u = np.zeros(d, np.float32)
        u[0] = 1.0
        emb = -np.arange(n, 0, -1, dtype=np.float32)[:, None] * u[None, :]
        q = u[None, :].repeat(4, axis=0)
        idx = ShardedEvidenceIndex(mesh, make_cfg(exact=True), emb)
        assert idx.n_padded != idx.n_real  # the case under test
        vals, rows = idx.search(jnp.asarray(q), k=k)
        # exact search: the true global top-k, all on the pad-carrying
        # last shard
        expect = np.arange(999, 994, -1)
        np.testing.assert_array_equal(np.asarray(rows),
                                      np.tile(expect, (4, 1)))
        np.testing.assert_allclose(
            np.asarray(vals),
            np.tile(-(n - expect).astype(np.float32), (4, 1)), rtol=1e-5)

    def test_passage_id_lookup(self, mesh):
        n, d = 64, 32
        emb = np.eye(n, d, dtype=np.float32)
        ids = np.arange(1000, 1000 + n, dtype=np.int64)
        idx = ShardedEvidenceIndex(mesh, make_cfg(), emb, passage_ids=ids)
        q = np.eye(3, d, dtype=np.float32)  # query i matches row i
        _, rows = idx.search(jnp.asarray(q), k=1)
        pids = idx.lookup_passage_ids(np.asarray(rows)[:, 0])
        np.testing.assert_array_equal(pids, [1000, 1001, 1002])


class TestEmbeddingStore:
    def test_accumulate_save_load(self, tmp_path):
        store = EmbeddingStore(8)
        store.add_block([3, 1], np.ones((2, 8)))
        store.add_block([2], np.full((1, 8), 2.0))
        assert len(store) == 3
        store.save(str(tmp_path / "emb"))
        loaded = EmbeddingStore.load(str(tmp_path / "emb"))
        np.testing.assert_array_equal(loaded.ids, [3, 1, 2])

    def test_shard_merge_sorts_and_checks(self, tmp_path):
        path = str(tmp_path / "emb")
        for rank, ids in enumerate([[5, 3], [1, 2], [4, 6]]):
            s = EmbeddingStore(4)
            s.add_block(ids, np.full((2, 4), float(rank)))
            s.save_shard(path, rank)
        merged = EmbeddingStore.merge_shards(path, expected_total=6)
        np.testing.assert_array_equal(merged.ids, [1, 2, 3, 4, 5, 6])
        # row for id 1 came from rank 1
        assert merged.embeddings[0, 0] == 1.0
        # reloadable
        again = EmbeddingStore.load(path)
        np.testing.assert_array_equal(again.ids, merged.ids)

    def test_merge_rejects_duplicates(self, tmp_path):
        path = str(tmp_path / "emb")
        for rank in range(2):
            s = EmbeddingStore(4)
            s.add_block([7], np.zeros((1, 4)))
            s.save_shard(path, rank)
        with pytest.raises(AssertionError, match="duplicate"):
            EmbeddingStore.merge_shards(path)

    def test_reference_pickle_ingest(self, tmp_path):
        import pickle
        data = {10: np.ones(4, np.float16), 5: np.zeros(4, np.float16)}
        p = tmp_path / "ref.pkl"
        with open(p, "wb") as f:
            pickle.dump(data, f)
        store = EmbeddingStore.load_reference_pickle(str(p))
        np.testing.assert_array_equal(store.ids, [5, 10])
        # embeddings must be permuted together with ids
        np.testing.assert_array_equal(store.embeddings[0], np.zeros(4))
        np.testing.assert_array_equal(store.embeddings[1], np.ones(4))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestQuantizedIndex:
    """IndexConfig(quantize="int8"): int8 rows + per-group fp32 scales,
    threaded through the shard_map search program."""

    def test_search_matches_fp32_index(self, mesh):
        rng = np.random.RandomState(10)
        n, d, k = 1024, 32, 5
        emb = rng.randn(n, d).astype(np.float32)
        q = rng.randn(16, d).astype(np.float32)
        ref = ShardedEvidenceIndex(mesh, make_cfg(group_size=8), emb)
        q_idx = ShardedEvidenceIndex(
            mesh, make_cfg(group_size=8, quantize="int8"), emb)
        assert q_idx.embeddings.dtype == jnp.int8
        assert q_idx.scales is not None
        rv, rr = ref.search(jnp.asarray(q), k=k)
        qv, qr = q_idx.search(jnp.asarray(q), k=k)
        recall = np.mean([
            len(set(np.asarray(qr)[i]) & set(np.asarray(rr)[i])) / k
            for i in range(q.shape[0])
        ])
        assert recall >= 0.9, recall
        # scores approximate fp32 scores within int8 error
        scores = q @ emb.T
        true = np.take_along_axis(scores, np.asarray(qr), 1)
        assert np.abs(np.asarray(qv) - true).max() <= 0.02 * np.abs(
            scores).max()

    def test_update_requantizes(self, mesh):
        rng = np.random.RandomState(11)
        n, d = 512, 32
        emb = rng.randn(n, d).astype(np.float32)
        idx = ShardedEvidenceIndex(
            mesh, make_cfg(group_size=8, quantize="int8"), emb)
        old_scales = idx.scales
        emb2 = 3.0 * rng.randn(n, d).astype(np.float32)
        idx.update(emb2)
        assert idx.scales is not old_scales
        q = rng.randn(4, d).astype(np.float32)
        _, rows = idx.search(jnp.asarray(q), k=3)
        # returned top-1's true score within int8 error of the true max
        # (exact-rank equality is brittle when true top-2 nearly tie)
        s = q @ emb2.T
        top1 = np.take_along_axis(s, np.asarray(rows)[:, :1], 1)[:, 0]
        assert (s.max(1) - top1 <= 0.01 * np.abs(s).max()).all()

    def test_swap_device_array_quantizes_on_device(self, mesh):
        rng = np.random.RandomState(12)
        n, d = 512, 32
        emb = rng.randn(n, d).astype(np.float32)
        idx = ShardedEvidenceIndex(
            mesh, make_cfg(group_size=8, quantize="int8"), emb)
        fresh = rng.randn(idx.n_padded, d).astype(np.float32)
        fresh[idx.n_real:] = 0.0
        dev = jax.device_put(jnp.asarray(fresh), idx._sharding)
        idx.swap_device_array(dev)
        assert idx.embeddings.dtype == jnp.int8
        q = rng.randn(4, d).astype(np.float32)
        _, rows = idx.search(jnp.asarray(q), k=3)
        s = q @ fresh[:n].T
        top1 = np.take_along_axis(s, np.asarray(rows)[:, :1], 1)[:, 0]
        assert (s.max(1) - top1 <= 0.01 * np.abs(s).max()).all()

    def test_update_from_process_local_quantized(self, mesh):
        """Per-process refresh path quantizes its own row block — scales
        land sharded with no cross-host traffic (single process here, but
        the same code path runs per-host)."""
        rng = np.random.RandomState(13)
        n, d = 512, 32
        emb = rng.randn(n, d).astype(np.float32)
        idx = ShardedEvidenceIndex(
            mesh, make_cfg(group_size=8, quantize="int8"), emb)
        emb2 = rng.randn(n, d).astype(np.float32)
        idx.update_from_process_local(emb2)
        q = rng.randn(4, d).astype(np.float32)
        _, rows = idx.search(jnp.asarray(q), k=3)
        s = q @ emb2.T
        top1 = np.take_along_axis(s, np.asarray(rows)[:, :1], 1)[:, 0]
        assert (s.max(1) - top1 <= 0.01 * np.abs(s).max()).all()
