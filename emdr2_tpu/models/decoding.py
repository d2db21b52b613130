"""Answer generation: greedy/sampling and length-normalized beam search.

Parity target: ``/root/reference/megatron/model/search_strategy.py`` —
``SampleOrGreedySearch`` (:181-240) and ``BeamSearch`` (:124-178) with the
polynomial length normalization applied during search (``lp(n) =
(5+n)^alpha / 6^alpha``, :20-38), the ended-hypothesis bias trick (only an
ended hypothesis's first continuation survives, score frozen, :52-72), and
EOS stripping with a 1-token fallback (:230-238).

TPU-first differences:

- the reference re-runs the decoder over the whole prefix each step with no
  KV cache (SURVEY §3.6). Here retrieval + FiD encoding happen ONCE, and
  decoding runs over a self-attention KV cache + cached cross-attention K/V;
- BOTH greedy and beam token loops are device-resident ``lax.while_loop``
  programs — one dispatch + one readback per batch. Beam's hypothesis
  bookkeeping (top-k over candidates, parent gather, cache reorder, the
  ended-mask freeze) is all inside the jitted loop, vs the reference's (and
  this repo's former) one-dispatch-per-token host loop;
- with a ``mesh``, every session function runs mesh-sharded: eval batches
  are dp-sharded global arrays (assembled from per-process local rows on
  multi-host — the analog of the reference evaluating across all trainer
  ranks, train_e2eqa.py:271-292), and generated tokens come back as a
  dp-sharded array each process reads its own rows from.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from emdr2_tpu.models.emdr2 import EMDR2Batch, EMDR2Model


def length_penalty(n: int, alpha: float = 0.6) -> float:
    """PolynomialNormalization.lp (search_strategy.py:27-28)."""
    return (5.0 + n) ** alpha / (5.0 + 1.0) ** alpha


def bf16_eval_params(params):
    """Shrink eval/serving param HBM with BIT-identical outputs.

    Casts every fp32 *kernel* of rank >= 2 (Dense/FusedDense weights) to
    bf16 storage. The model consumes those through an ``astype(cfg.dtype)``
    at the use site (layers.py Dense/FusedDense), so pre-rounding the
    storage hands the matmuls the exact same bf16 operands the fp32 copy
    produced — token streams and step log-probs are unchanged
    (tests/test_decoding.py::test_bf16_eval_params_identical).

    Kept fp32 because they are consumed in fp32, where pre-rounding WOULD
    change results: rank-0/1 leaves (LayerNorm scale/bias, layers.py:148-157;
    LM bias added to fp32 logits) and the embedding tables — Embeddings
    sums word+position(+tokentype) lookups in fp32 *before* the bf16 cast
    (layers.py:247-254), so the tables must stay fp32 for the sum to round
    identically. 440M params: 1.76 GB -> ~1.0 GB (the ~70M embedding rows
    stay fp32).
    """
    def cast(path, x):
        if not (hasattr(x, "dtype") and x.dtype == jnp.float32
                and getattr(x, "ndim", 0) >= 2):
            return x
        if any("embeddings" in str(getattr(p, "key", "")) for p in path):
            return x
        return x.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, params)


def _take_rows(tree, idx):
    """Gather rows of every array leaf along axis 0 (cache fan-out/reorder)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.take(x, idx, axis=0) if x.ndim > 0 else x, tree)


# Row budget per FiD-encode block under auto chunking. 400 rows (= B=8 at
# K=50) is the largest monolithic encode measured to compile and run on a
# 16 GB v5e; beyond it the encode runs in K-blocks of <= this many rows
# (exact — rows encode independently; see EMDR2Model.fid_encode).
ENCODE_CHUNK_ROWS_AUTO = 400


def _encode_chunk_k(B: int, K: int, max_rows: int) -> int:
    """Largest divisor of K whose block (B * chunk_k rows) fits the budget;
    K itself when the whole batch fits (no chunking)."""
    if B * K <= max_rows:
        return K
    best = 1
    for d in range(1, K + 1):
        if K % d == 0 and B * d <= max_rows:
            best = d
    return best


class DecoderSession:
    """Holds the jitted encode/step functions and the mutable decode cache.

    ``mesh``: optional ``jax.sharding.Mesh``. When given, input batches are
    assembled into dp-sharded global arrays (multi-host aware) and every
    jitted function computes over the whole mesh; generated token arrays are
    returned dp-sharded and read back per-process.
    """

    def __init__(self, model: EMDR2Model, params, max_decode_len: int,
                 mesh=None, kv_quant: Optional[str] = None,
                 encode_chunk_rows: Optional[int] = None):
        if kv_quant not in (None, "int8"):
            raise ValueError(f"kv_quant must be None or 'int8', {kv_quant!r}")
        self.model = model
        self.params = params
        self.max_decode_len = max_decode_len
        self.mesh = mesh
        self.kv_quant = kv_quant
        # K-block encode budget: batches whose B*K exceeds this many rows
        # encode in blocks (exact; bounds the encode workspace so large eval
        # batches compile — VERDICT r4 weak #2). None = auto default.
        self.encode_chunk_rows = (ENCODE_CHUNK_ROWS_AUTO
                                  if encode_chunk_rows is None
                                  else encode_chunk_rows)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._dp = NamedSharding(mesh, P("dp"))
        else:
            self._dp = None
        n_layers = model.config.reader.transformer.num_layers

        @jax.jit
        def encode(params, batch):
            # with_scores=False: generation never reads the retrieval score
            # distribution (see encode_for_generation), so don't pay the
            # query+context dual-encoder towers per eval batch.
            # Batches over the encode row budget run in K-blocks: each block
            # encodes [B, chunk_k, Lr] and writes its rows of the full
            # hidden buffer in place (fori_loop + dynamic_update_slice) —
            # exact, since FiD rows encode independently, and the encode
            # workspace is bounded by the block instead of B*K (B=16/K=50
            # failed to compile monolithically; VERDICT r4 weak #2).
            reader_ids = batch.reader_ids
            B, K, Lr = reader_ids.shape
            chunk_k = _encode_chunk_k(B, K, self.encode_chunk_rows)
            if chunk_k == K:
                _, enc_hidden, enc_flat_ids = model.apply(
                    {"params": params}, batch, with_scores=False,
                    method=EMDR2Model.encode_for_generation)
                return enc_hidden, enc_flat_ids

            def enc_block(ids_c):  # [B, chunk_k, Lr] -> [B, chunk_k*Lr, H]
                h, _ = model.apply({"params": params}, ids_c,
                                   method=EMDR2Model.fid_encode)
                return h

            # block 0 concretely (supplies dtype/H for the full buffer) ...
            h0 = enc_block(jax.lax.dynamic_slice_in_dim(
                reader_ids, 0, chunk_k, axis=1))
            hidden = jnp.zeros((B, K * Lr, h0.shape[-1]), h0.dtype)
            hidden = jax.lax.dynamic_update_slice_in_dim(hidden, h0, 0,
                                                         axis=1)

            # ... remaining blocks in-place under a fori_loop (compiles the
            # encoder once regardless of block count)
            def body(c, hid):
                ids_c = jax.lax.dynamic_slice_in_dim(
                    reader_ids, c * chunk_k, chunk_k, axis=1)
                return jax.lax.dynamic_update_slice_in_dim(
                    hid, enc_block(ids_c), c * (chunk_k * Lr), axis=1)

            hidden = jax.lax.fori_loop(1, K // chunk_k, body, hidden)
            return hidden, reader_ids.reshape(B, K * Lr)

        nh = model.config.reader.transformer.num_heads
        hd = model.config.reader.transformer.head_dim

        @jax.jit
        def cross_kvs(params, enc_hidden):
            """Per-decoder-layer encoder K/V projections, computed once.
            Reaches into the param tree for the cross-attention key_value
            kernels ([D, 2, H] FusedDense layout) — a session-level
            optimization keeping the modules themselves oblivious.

            Emitted PRE-SPLIT and PRE-HEADED as (k, v) pairs in
            [B, nh, Lk, hd] layout: the token loop's score and context
            matmuls then consume them as contiguous batched GEMMs. Keeping
            the fused [B, Lk, 2, H] slab instead costs the split + head
            transpose EVERY decode step — at 25.6k keys that relayout
            traffic (~3x the 3.8 GB K/V read) dominated the measured
            22.6 ms/step (the roofline for reading K+V once is ~4.6 ms)."""
            import flax.linen as nn
            outs = []
            B, Lk = enc_hidden.shape[0], enc_hidden.shape[1]
            for i in range(n_layers):
                p = nn.meta.unbox(params["reader"]["decoder"][f"layer_{i}"][
                    "cross_attention"]["key_value"])
                kern = p["kernel"].astype(enc_hidden.dtype)
                bias = p["bias"].astype(enc_hidden.dtype)
                kv = jnp.einsum("bld,dnh->blnh", enc_hidden, kern,
                                preferred_element_type=enc_hidden.dtype
                                ) + bias                       # [B, Lk, 2, H]
                kv = kv.reshape(B, Lk, 2, nh, hd).transpose(2, 0, 3, 1, 4)
                if kv_quant == "int8":
                    # int8 storage halves the slab HBM (3.8 -> 1.9 GB at
                    # flagship B=4) at parity step latency — the measured
                    # trade is capacity, not speed (ops/decode_attention.py
                    # module docstring); the decode kernel dequantizes per
                    # key row in VMEM. Rows are padded to
                    # the kernel's chunk multiple HERE, once per encode —
                    # padded rows carry scale 1 / value 0 and the attention
                    # bias marks them -1e9 (layers.py int8 branch).
                    from emdr2_tpu.ops.decode_attention import (
                        padded_rows, quantize_kv_rows)
                    pad = padded_rows(Lk) - Lk
                    k8, ks = quantize_kv_rows(kv[0])
                    v8, vs = quantize_kv_rows(kv[1])
                    if pad:
                        k8, v8 = (jnp.pad(a, ((0, 0), (0, 0), (0, pad),
                                              (0, 0))) for a in (k8, v8))
                        ks, vs = (jnp.pad(a, ((0, 0), (0, 0), (0, pad)),
                                          constant_values=1.0)
                                  for a in (ks, vs))
                    outs.append((k8, ks, v8, vs))
                else:
                    outs.append((kv[0], kv[1]))  # each [B, nh, Lk, hd]
            return outs

        def decode_lp(params, cache, tok, enc_flat_ids, kvs, pos):
            """One decoder step -> (log-probs [rows, V] fp32, new cache)."""
            logits, new_vars = model.apply(
                {"params": params, "cache": cache},
                tok, None, enc_flat_ids,
                position_offset=pos, cross_kvs=kvs,
                method=EMDR2Model.decode_step, mutable=["cache"])
            return jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32),
                                      axis=-1), new_vars["cache"]

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, cache, dec_tok, enc_flat_ids, kvs, pos):
            return decode_lp(params, cache, dec_tok, enc_flat_ids, kvs, pos)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def reorder(cache, parent_idx):
            return _take_rows(cache, parent_idx)

        def fresh_cache(enc_flat_ids, kvs, rows):
            """Zeroed decode cache, traced INSIDE the loop jits: the param
            initialization in model.init is dead code XLA eliminates (only
            the cache zeros survive), and building the cache in-loop saves
            a separate init dispatch + donated-transfer round-trip per eval
            batch (~30 ms through a remote-device tunnel)."""
            variables = model.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((rows, 1), jnp.int32), None, enc_flat_ids, 0, kvs,
                method=EMDR2Model.decode_step)
            return variables["cache"]

        def make_token_loop(sample: bool):
            def token_loop(params, tok0, enc_flat_ids, kvs,
                           eos_id, rng, max_len=max_decode_len):
                """Device-resident token decode: one dispatch per batch.

                A host-driven loop costs a blocking device round-trip per
                token (argmax/categorical readback); over a remote/tunneled
                device that dominates generation latency (measured ~40 ms
                per step dispatch vs 6 ms of compute at B=4/K=50). The
                whole token loop runs in one jitted lax.while_loop with an
                early-exit predicate on all-rows-EOS. ``sample=True`` draws
                from the per-step categorical (the reference's
                SampleOrGreedySearch sampling mode, search_strategy.py:213)
                with a position-folded key instead of taking the argmax."""
                B = tok0.shape[0]
                cache = fresh_cache(enc_flat_ids, kvs, B)
                out0 = jnp.zeros((B, max_len), jnp.int32)
                done0 = jnp.zeros((B,), bool)

                def cond(st):
                    pos, _tok, done, _cache, _out = st
                    return (pos < max_len) & ~jnp.all(done)

                def body(st):
                    pos, tok, done, cache, out = st
                    lp, cache = decode_lp(params, cache, tok, enc_flat_ids,
                                          kvs, pos)
                    if sample:
                        ys = jax.random.categorical(
                            jax.random.fold_in(rng, pos), lp, axis=-1
                        ).astype(jnp.int32)
                    else:
                        ys = jnp.argmax(lp, axis=-1).astype(jnp.int32)
                    out = jax.lax.dynamic_update_slice_in_dim(
                        out, ys[:, None], pos, axis=1)
                    done = done | (ys == eos_id)
                    return pos + 1, ys[:, None], done, cache, out

                _, _, _, _, out = jax.lax.while_loop(
                    cond, body, (0, tok0, done0, cache, out0))
                return out
            return token_loop

        self._encode, self._cross_kvs = encode, cross_kvs
        self._decode_lp = decode_lp
        self._step, self._reorder = step, reorder
        # explicit dp out-sharding under a mesh: generated tokens come back
        # as a dp-sharded global array each process reads its rows from
        _jit = functools.partial(
            jax.jit,
            **({"out_shardings": self._dp} if self._dp is not None else {}))
        self._greedy_loop = _jit(make_token_loop(sample=False))
        self._sample_loop = _jit(make_token_loop(sample=True))
        self._fresh_cache = fresh_cache
        self._beam_loops = {}

    # --------------------------------------------------------- mesh plumbing

    def _globalize(self, batch: EMDR2Batch) -> EMDR2Batch:
        """Local rows -> dp-sharded global arrays (identity without a mesh)."""
        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, batch)
        from emdr2_tpu.parallel.distributed import make_global_batch
        if jax.process_count() > 1:  # local host rows for the assembly
            batch = jax.tree_util.tree_map(np.asarray, batch)
        return make_global_batch(self.mesh, batch)

    def _tok0(self, global_rows: int, bos_id: int):
        """[B, 1] BOS column, dp-sharded under a mesh (each process provides
        its rows on multi-host)."""
        if self.mesh is None:
            return jnp.full((global_rows, 1), bos_id, jnp.int32)
        from emdr2_tpu.parallel.distributed import make_global_array
        local = global_rows // jax.process_count()
        return make_global_array(
            self.mesh, np.full((local, 1), bos_id, np.int32))

    def _broadcast_key(self, rng):
        """Process 0's rng key to every process, via a collective restricted
        to the session mesh (never the embed sub-mesh — see the call site).
        Handles typed keys and raw uint32 key arrays."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        typed = jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
        impl = jax.random.key_impl(rng) if typed else None
        kd = np.asarray(jax.random.key_data(rng) if typed else rng)
        orig_shape, orig_dtype = kd.shape, kd.dtype
        kd = kd.reshape(-1).astype(np.uint32)
        mesh = self.mesh
        dp_ax = mesh.axis_names[0]
        shape = (mesh.shape[dp_ax], kd.size)
        sh = NamedSharding(mesh, P(dp_ax, None))
        # each process fills its own dp rows with ITS key words ...
        arr = jax.make_array_from_callback(
            shape, sh, lambda idx: np.broadcast_to(
                kd, (len(range(*idx[0].indices(shape[0]))), kd.size)))
        # ... and a jitted row-0 gather replicates the dp-slice-0 owner's
        # (process 0's) words to everyone
        key = ("bcast_key", shape)
        if not hasattr(self, "_bcast_fns"):
            self._bcast_fns = {}
        if key not in self._bcast_fns:
            self._bcast_fns[key] = jax.jit(
                lambda a: a[0], out_shardings=NamedSharding(mesh, P()))
        words = np.asarray(self._bcast_fns[key](arr))
        words = words.astype(orig_dtype).reshape(orig_shape)
        if typed:
            return jax.random.wrap_key_data(jnp.asarray(words), impl=impl)
        return jnp.asarray(words)

    def _readback(self, out) -> np.ndarray:
        """Generated-token array -> this process's rows."""
        if self.mesh is None:
            return np.asarray(out)
        from emdr2_tpu.parallel.distributed import host_local_rows
        return host_local_rows(out)

    # ------------------------------------------------------------- frontend

    def encode(self, batch: EMDR2Batch):
        """FiD encoder states + per-layer cross K/V (no retrieval scores —
        generation never consumes them; see encode_for_generation).

        ``batch`` holds this process's local rows; under a mesh they are
        assembled into dp-sharded global arrays first."""
        batch = self._globalize(batch)
        enc_hidden, enc_flat_ids = self._encode(self.params, batch)
        kvs = self._cross_kvs(self.params, enc_hidden)
        return kvs, enc_flat_ids

    def init_cache(self, batch_rows: int, kvs, enc_flat_ids):
        """Build the zeroed cache pytree by tracing one decode step.

        Jitted (cached per batch size): un-jitted ``model.init`` executes
        op-by-op, which costs a dispatch round-trip per op on a remote
        device — measured seconds per eval batch through the tunnel. Under a
        mesh the cache comes out dp-sharded (out_shardings from eval_shape)."""
        key = ("init_cache", batch_rows)
        if not hasattr(self, "_init_fns"):
            self._init_fns = {}
        if key not in self._init_fns:
            # single source with the in-loop construction (fresh_cache)
            init_fn = functools.partial(self._fresh_cache, rows=batch_rows)
            if self.mesh is None:
                self._init_fns[key] = jax.jit(init_fn)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P
                repl = NamedSharding(self.mesh, P())
                shapes = jax.eval_shape(init_fn, enc_flat_ids, kvs)
                out_sh = jax.tree_util.tree_map(
                    lambda s: self._dp if s.ndim > 0 else repl, shapes)
                self._init_fns[key] = jax.jit(init_fn, out_shardings=out_sh)
        return self._init_fns[key](enc_flat_ids, kvs)

    def step(self, cache, dec_tok, kvs, enc_flat_ids, pos: int):
        return self._step(self.params, cache, jnp.asarray(dec_tok, jnp.int32),
                          enc_flat_ids, kvs, pos)

    def reorder(self, cache, parent_idx):
        return self._reorder(cache, jnp.asarray(parent_idx, jnp.int32))

    def beam_loop(self, beam_size: int, alpha: float):
        """Jitted device-resident beam search loop (cached per (k, alpha))."""
        key = (beam_size, alpha)
        if key not in self._beam_loops:
            self._beam_loops[key] = self._make_beam_loop(beam_size, alpha)
        return self._beam_loops[key]

    def _make_beam_loop(self, k: int, alpha: float):
        decode_lp = self._decode_lp
        max_len = self.max_decode_len

        # length_penalty traces fine on jnp scalars; single source for the
        # polynomial normalization formula
        def lp_poly(n):
            return length_penalty(n, alpha)

        def beam_loop(params, tok0, enc_flat_ids, kvs, eos_id):
            """Length-normalized beam search fully on device, parity with
            BeamSearch (search_strategy.py:124-178): the per-token top-k,
            ended-hypothesis freezing (score frozen, only the first
            continuation survives via a -1e4 bias, :52-72), parent gather
            and KV-cache reorder all run inside one lax.while_loop.

            Step 0 runs on B rows and fans out to B*k; later steps run B*k
            rows. ``total`` holds the length-NORMALIZED running score; each
            step un-normalizes by lp(len-1), adds the token log-prob, and
            re-normalizes by lp(len) — algebraically identical to the
            reference's normalize-at-selection."""
            B = tok0.shape[0]
            cache = self._fresh_cache(enc_flat_ids, kvs, B)

            # ---- step 0 on B rows, fan out B -> B*k -------------------
            lp0, cache = decode_lp(params, cache, tok0, enc_flat_ids, kvs, 0)
            top_sc, top_idx = jax.lax.top_k(lp0, k)          # [B, k]
            rep = jnp.repeat(jnp.arange(B), k)
            cache = _take_rows(cache, rep)
            # kvs stay at B rows: the attention fast path folds the k beams
            # of an example into extra query rows of one GEMM, so the
            # 25.6k-key K/V slab is read once per step, not k times. Beam
            # reordering never crosses examples (parent = best//k + b*k),
            # so per-example K/V are correct for every beam row.
            kvs_k = kvs
            enc_k = jnp.repeat(enc_flat_ids, k, axis=0)

            seqs0 = jnp.zeros((B * k, max_len), jnp.int32)
            seqs0 = seqs0.at[:, 0].set(top_idx.reshape(-1))
            total0 = top_sc.reshape(-1)                      # lp(1) == 1
            ended0 = seqs0[:, 0] == eos_id

            def cond(st):
                pos, _seqs, _total, ended, _cache = st
                return (pos < max_len) & ~jnp.all(ended)

            def body(st):
                pos, seqs, total, ended, cache = st
                tok = jax.lax.dynamic_slice_in_dim(seqs, pos - 1, 1, axis=1)
                lp, cache = decode_lp(params, cache, tok, enc_k, kvs_k, pos)
                cand_lp, cand_idx = jax.lax.top_k(lp, k)     # [B*k, k]

                new_len = (pos + 1).astype(jnp.float32)
                norm = (total[:, None] * lp_poly(new_len - 1.0)
                        + cand_lp) / lp_poly(new_len)
                frozen = total[:, None] + jnp.where(
                    jnp.arange(k)[None, :] == 0, 0.0, -1e4)
                scores = jnp.where(ended[:, None], frozen, norm)
                cand_tok = jnp.where(ended[:, None], eos_id, cand_idx)

                scores2 = scores.reshape(B, k * k)
                best_sc, best = jax.lax.top_k(scores2, k)    # [B, k]
                total = best_sc.reshape(-1)
                parent = (best // k
                          + jnp.arange(B)[:, None] * k).reshape(-1)
                chosen = jnp.take_along_axis(
                    cand_tok.reshape(B, k * k), best, axis=1).reshape(-1)

                seqs = jnp.take(seqs, parent, axis=0)
                seqs = jax.lax.dynamic_update_slice_in_dim(
                    seqs, chosen[:, None].astype(jnp.int32), pos, axis=1)
                ended = jnp.take(ended, parent, axis=0) | (chosen == eos_id)
                cache = _take_rows(cache, parent)
                return pos + 1, seqs, total, ended, cache

            _, seqs, total, _, _ = jax.lax.while_loop(
                cond, body, (jnp.asarray(1), seqs0, total0, ended0, cache))

            # ---- best hypothesis per example (finish_beam, :103-121) ----
            best_row = jnp.argmax(total.reshape(B, k), axis=1)
            seqs3 = seqs.reshape(B, k, max_len)
            return jnp.take_along_axis(
                seqs3, best_row[:, None, None], axis=1)[:, 0]

        return jax.jit(
            beam_loop,
            **({"out_shardings": self._dp} if self._dp is not None else {}))


def _strip_eos(rows: np.ndarray, eos_id: int) -> List[List[int]]:
    """Cut at first EOS; empty -> [1] (search_strategy.py:230-238)."""
    outs = []
    for y in rows:
        y = list(y)
        if eos_id in y:
            y = y[: y.index(eos_id)]
        outs.append(y if y else [1])
    return outs


def greedy_decode(session: DecoderSession, batch: EMDR2Batch,
                  bos_id: int, eos_id: int,
                  rng: Optional[jax.Array] = None,
                  sample: bool = False) -> List[List[int]]:
    """Greedy (or multinomial-sampling) generation for this process's rows
    of ``batch``.

    Both modes run the whole token loop on device — one dispatch + one
    readback per batch, mesh/multi-host capable. Sampling threads ``rng``
    into the loop and draws from the per-step categorical with a
    position-folded key (parity: SampleOrGreedySearch sampling mode,
    search_strategy.py:213-217)."""
    kvs, enc_flat_ids = session.encode(batch)
    B = enc_flat_ids.shape[0]  # global rows

    if sample:
        assert rng is not None, "sampling decode needs an rng key"
        if session.mesh is not None and jax.process_count() > 1:
            # every controller must drive the SPMD loop with the same key:
            # differing keys desynchronize the all-rows-EOS early-exit
            # predicate (different trip counts per process -> hung
            # collectives). Broadcast process 0's key over the SESSION
            # mesh only — multihost_utils.broadcast_one_to_all builds an
            # all-device mesh, which would race a concurrently-embedding
            # async refresher's collectives on the embed sub-mesh.
            rng = session._broadcast_key(rng)
    loop = session._sample_loop if sample else session._greedy_loop
    out = loop(session.params, session._tok0(B, bos_id), enc_flat_ids,
               kvs, jnp.asarray(eos_id, jnp.int32),
               rng if rng is not None else jax.random.PRNGKey(0))
    return _strip_eos(session._readback(out), eos_id)


def beam_search_decode(session: DecoderSession, batch: EMDR2Batch,
                       bos_id: int, eos_id: int, beam_size: int = 5,
                       alpha: float = 0.6) -> List[List[int]]:
    """Length-normalized beam search for this process's rows of ``batch``,
    parity with BeamSearch (search_strategy.py:124-178).

    The whole search — including step 0's B -> B*beam fan-out — runs in one
    jitted device-resident loop (``DecoderSession._make_beam_loop``); the
    reference re-encodes/gathers full hidden-state tensors on host every
    token (:87-100)."""
    kvs, enc_flat_ids = session.encode(batch)
    B = enc_flat_ids.shape[0]  # global rows
    out = session.beam_loop(beam_size, alpha)(
        session.params, session._tok0(B, bos_id), enc_flat_ids, kvs,
        jnp.asarray(eos_id, jnp.int32))
    return _strip_eos(session._readback(out), eos_id)
