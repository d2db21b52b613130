"""Answer generation: greedy/sampling and length-normalized beam search.

Parity target: ``/root/reference/megatron/model/search_strategy.py`` —
``SampleOrGreedySearch`` (:181-240) and ``BeamSearch`` (:124-178) with the
polynomial length normalization applied during search (``lp(n) =
(5+n)^alpha / 6^alpha``, :20-38), the ended-hypothesis bias trick (only an
ended hypothesis's first continuation survives, score frozen, :52-72), and
EOS stripping with a 1-token fallback (:230-238).

TPU-first difference: the reference re-runs the decoder over the whole
prefix each step with no KV cache (SURVEY §3.6). Here retrieval + FiD
encoding happen ONCE, and each decode step is a jitted single-token pass
over a self-attention KV cache + cached cross-attention K/V. Hypothesis
bookkeeping (tiny: B*beam rows) runs on host; cache reordering for beam
continuation is a jitted gather.
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


class DecoderSession:
    """Holds the jitted encode/step functions and the mutable decode cache."""

    def __init__(self, model: EMDR2Model, params, max_decode_len: int):
        self.model = model
        self.params = params
        self.max_decode_len = max_decode_len
        n_layers = model.config.reader.transformer.num_layers

        @jax.jit
        def encode(params, batch):
            return model.apply({"params": params}, batch,
                               method=EMDR2Model.encode_for_generation)

        @jax.jit
        def cross_kvs(params, enc_hidden):
            """Per-decoder-layer encoder K/V projections, computed once.
            Reaches into the param tree for the cross-attention key_value
            kernels — a session-level optimization keeping the modules
            themselves oblivious."""
            import flax.linen as nn
            outs = []
            for i in range(n_layers):
                p = nn.meta.unbox(params["reader"]["decoder"][f"layer_{i}"][
                    "cross_attention"]["key_value"])
                kern = p["kernel"].astype(enc_hidden.dtype)
                bias = p["bias"].astype(enc_hidden.dtype)
                outs.append(jnp.dot(enc_hidden, kern,
                                    preferred_element_type=enc_hidden.dtype)
                            + bias)
            return outs

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, cache, dec_tok, enc_flat_ids, kvs, pos):
            logits, new_vars = model.apply(
                {"params": params, "cache": cache},
                dec_tok, None, enc_flat_ids,
                position_offset=pos, cross_kvs=kvs,
                method=EMDR2Model.decode_step, mutable=["cache"])
            return jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32),
                                      axis=-1), new_vars["cache"]

        @functools.partial(jax.jit, donate_argnums=(0,))
        def reorder(cache, parent_idx):
            return jax.tree_util.tree_map(
                lambda x: jnp.take(x, parent_idx, axis=0)
                if x.ndim > 0 else x, cache)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def greedy_loop(params, cache, tok0, enc_flat_ids, kvs,
                        eos_id, max_len=max_decode_len):
            """Device-resident greedy decode: one dispatch per batch.

            The host-driven loop costs a blocking device round-trip per
            token (argmax readback); over a remote/tunneled device that
            dominates generation latency (measured 5.5 s -> ~0.6 s per
            B=4/K=50 batch). The whole token loop runs in one jitted
            lax.while_loop with an early-exit predicate on all-rows-EOS."""
            B = tok0.shape[0]
            out0 = jnp.zeros((B, max_len), jnp.int32)
            done0 = jnp.zeros((B,), bool)

            def cond(st):
                pos, _tok, done, _cache, _out = st
                return (pos < max_len) & ~jnp.all(done)

            def body(st):
                pos, tok, done, cache, out = st
                logits, new_vars = model.apply(
                    {"params": params, "cache": cache},
                    tok, None, enc_flat_ids,
                    position_offset=pos, cross_kvs=kvs,
                    method=EMDR2Model.decode_step, mutable=["cache"])
                ys = jnp.argmax(logits[:, -1, :].astype(jnp.float32),
                                axis=-1).astype(jnp.int32)
                out = jax.lax.dynamic_update_slice_in_dim(
                    out, ys[:, None], pos, axis=1)
                done = done | (ys == eos_id)
                return pos + 1, ys[:, None], done, new_vars["cache"], out

            _, _, _, _, out = jax.lax.while_loop(
                cond, body, (0, tok0, done0, cache, out0))
            return out

        self._encode, self._cross_kvs = encode, cross_kvs
        self._step, self._reorder = step, reorder
        self._greedy_loop = greedy_loop

    def encode(self, batch: EMDR2Batch):
        """Retrieval scores + FiD encoder states + per-layer cross K/V."""
        topk_lp, enc_hidden, enc_flat_ids = self._encode(self.params, batch)
        kvs = self._cross_kvs(self.params, enc_hidden)
        return topk_lp, kvs, enc_flat_ids

    def init_cache(self, batch_rows: int, kvs, enc_flat_ids):
        """Build the zeroed cache pytree by tracing one decode step.

        Jitted (cached per batch size): un-jitted ``model.init`` executes
        op-by-op, which costs a dispatch round-trip per op on a remote
        device — measured seconds per eval batch through the tunnel."""
        key = ("init_cache", batch_rows)
        if not hasattr(self, "_init_fns"):
            self._init_fns = {}
        if key not in self._init_fns:
            model = self.model

            @jax.jit
            def init_fn(enc_flat_ids, kvs):
                dec_tok = jnp.zeros((batch_rows, 1), jnp.int32)
                variables = model.init(
                    {"params": jax.random.PRNGKey(0)}, dec_tok, None,
                    enc_flat_ids, 0, kvs, method=EMDR2Model.decode_step)
                return variables["cache"]

            self._init_fns[key] = init_fn
        return self._init_fns[key](enc_flat_ids, kvs)

    def step(self, cache, dec_tok, kvs, enc_flat_ids, pos: int):
        return self._step(self.params, cache, jnp.asarray(dec_tok, jnp.int32),
                          enc_flat_ids, kvs, pos)

    def reorder(self, cache, parent_idx):
        return self._reorder(cache, jnp.asarray(parent_idx, jnp.int32))


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
    """Greedy (or multinomial-sampling) generation.

    Greedy runs the whole token loop on device (one dispatch + one readback
    per batch); sampling keeps the host loop for rng bookkeeping."""
    B = batch.dec_ids.shape[0]
    _, kvs, enc_flat_ids = session.encode(batch)
    cache = session.init_cache(B, kvs, enc_flat_ids)

    tok = np.full((B, 1), bos_id, np.int32)
    if not sample:
        out = session._greedy_loop(session.params, cache,
                                   jnp.asarray(tok), enc_flat_ids, kvs,
                                   jnp.asarray(eos_id, jnp.int32))
        return _strip_eos(np.asarray(out), eos_id)

    done = np.zeros(B, bool)
    result = []
    for pos in range(session.max_decode_len):
        log_probs, cache = session.step(cache, tok, kvs, enc_flat_ids, pos)
        rng, sub = jax.random.split(rng)
        ys = np.asarray(jax.random.categorical(sub, log_probs, axis=-1))
        result.append(ys)
        done |= ys == eos_id
        tok = ys[:, None].astype(np.int32)
        if done.all():
            break
    return _strip_eos(np.stack(result, 1), eos_id)


def beam_search_decode(session: DecoderSession, batch: EMDR2Batch,
                       bos_id: int, eos_id: int, beam_size: int = 5,
                       alpha: float = 0.6) -> List[List[int]]:
    """Length-normalized beam search, parity with BeamSearch
    (search_strategy.py:124-178).

    Step 1 runs on B rows and fans out to B*beam; later steps run B*beam
    rows with the decode cache gathered along the beam-parent index (the
    reference re-encodes/gathers full hidden-state tensors instead,
    :87-100)."""
    B = batch.dec_ids.shape[0]
    k = beam_size
    _, kvs, enc_flat_ids = session.encode(batch)

    # ---- step 0 on B rows ----------------------------------------------------
    cache = session.init_cache(B, kvs, enc_flat_ids)
    tok = np.full((B, 1), bos_id, np.int32)
    log_probs, cache = session.step(cache, tok, kvs, enc_flat_ids, 0)
    lp = np.asarray(log_probs)                       # [B, V]
    topk_idx = np.argsort(-lp, axis=1)[:, :k]        # [B, k]
    topk_score = np.take_along_axis(lp, topk_idx, axis=1)

    # fan out rows B -> B*k (replicate encoder-side tensors and cache rows)
    rep = np.repeat(np.arange(B), k)
    kvs_k = [jnp.repeat(x, k, axis=0) for x in kvs]
    enc_flat_k = jnp.repeat(enc_flat_ids, k, axis=0)
    cache = session.reorder(cache, rep)

    seqs = topk_idx.reshape(-1, 1)                   # [B*k, 1]
    total = topk_score.reshape(-1).astype(np.float64)  # raw scores so far
    ended = seqs[:, -1] == eos_id

    for pos in range(1, session.max_decode_len):
        if ended.all():
            break
        tok = seqs[:, -1:].astype(np.int32)
        log_probs, cache = session.step(cache, tok, kvs_k, enc_flat_k, pos)
        lp = np.asarray(log_probs)                   # [B*k, V]
        cand_idx = np.argsort(-lp, axis=1)[:, :k]    # [B*k, k]
        cand_lp = np.take_along_axis(lp, cand_idx, axis=1)

        # ended hypotheses: freeze score, allow only the first continuation
        # (bias -1e4 on the rest), force token to EOS (:52-72)
        new_len = seqs.shape[1] + 1
        norm = (total[:, None] * length_penalty(new_len - 1, alpha)
                + cand_lp) / length_penalty(new_len, alpha)
        frozen = total[:, None] + np.where(
            np.arange(k)[None, :] == 0, 0.0, -1e4)
        scores = np.where(ended[:, None], frozen, norm)  # [B*k, k]
        cand_tok = np.where(ended[:, None], eos_id, cand_idx)

        scores = scores.reshape(B, k * k)
        best = np.argsort(-scores, axis=1)[:, :k]    # [B, k]
        total = np.take_along_axis(scores, best, axis=1).reshape(-1)
        parent = best // k + np.arange(B)[:, None] * k   # global row of parent
        parent = parent.reshape(-1)
        chosen_tok = np.take_along_axis(
            cand_tok.reshape(B, k * k), best, axis=1).reshape(-1)

        seqs = np.concatenate(
            [seqs[parent], chosen_tok[:, None]], axis=1)
        ended = ended[parent] | (chosen_tok == eos_id)
        cache = session.reorder(cache, parent)

    # ---- finish: best hypothesis per example (finish_beam, :103-121) --------
    total = total.reshape(B, k)
    best_rows = np.asarray([
        seqs.reshape(B, k, -1)[b, int(np.argmax(total[b]))] for b in range(B)])
    return _strip_eos(best_rows, eos_id)
