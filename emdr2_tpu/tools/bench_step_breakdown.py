"""Where the flagship train-step time goes — per-pass roofline breakdown.

bench.py reports one ms/step number; this tool compiles and times the
step's constituent passes SEPARATELY at the same flagship shape
(B=4, K=50, seq 512, flash + remat, bf16):

  retriever   grad of the dual-encoder scores (query + context towers
              fwd+bwd)
  reader      grad of the student FiD pass (encoder over B*K x 512,
              decoder over B x 32 with 25.6k-key cross-attn, LM head)
  teacher     the stop-gradient one-context teacher (fwd only: encoder over
              B*K x 512 + decoder over B*K x 32 + LM head + gold gather)
  optimizer   adamw update at full parameter count

For each pass it also prints the analytic model TFLOPs (bench.py formulas)
and the implied per-pass hardware utilization, so the gap between measured
MFU and peak is attributable: pass X at Y% of peak for Z ms. Run:

    python -m emdr2_tpu.tools.bench_step_breakdown [--batch 4] [--topk 50]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time



def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--topk", type=int, default=50)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args(argv)
    B, K = args.batch, args.topk

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
    import bench as bench_mod
    from emdr2_tpu.models import EMDR2Model
    from emdr2_tpu.training import step as step_lib

    cfg = bench_mod.flagship_step_config(B, K)
    enc, t5 = cfg.retriever.encoder, cfg.reader.transformer
    compiled, state, batch = bench_mod.make_flagship_step(B, K)
    model = EMDR2Model(cfg)

    kind = getattr(jax.devices()[0], "device_kind", "")
    peak = bench_mod.PEAK_FLOPS.get(kind, 197e12)

    def fetch(out):
        # force a host transfer of one leaf: executions on a single device
        # complete in stream order, so this bounds every prior dispatch.
        # (block_until_ready is not a reliable fence through the
        # remote-device tunnel; an explicit transfer is.)
        import numpy as np
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

    def timeit(fn, *a):
        fetch(fn(*a))
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*a)
        fetch(out)
        return (time.time() - t0) / args.iters

    # ---- passes -----------------------------------------------------------
    def retriever_loss(params):
        lp = model.apply({"params": params}, batch,
                         method=EMDR2Model._topk_log_probs,
                         deterministic=True)
        return jnp.sum(lp)

    def reader_loss(params):
        enc_hidden, enc_flat = model.apply(
            {"params": params}, batch.reader_ids, True,
            method=EMDR2Model._fid_encode)
        from emdr2_tpu.data import masks
        m = masks.attention_mask(batch.dec_ids, enc_flat)
        logits = model.apply({"params": params}, method=lambda s: s.reader.decode(
            batch.dec_ids, enc_hidden, m, True))
        return jnp.sum(logits.astype(jnp.float32) * 1e-9)

    def teacher_fwd(params):
        return model.apply({"params": params}, batch, True,
                           method=EMDR2Model._teacher_gold_log_probs)

    tx = step_lib.make_optimizer(cfg.train.optimizer, 10000)

    @jax.jit
    def opt_update(state):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        updates, opt_state = tx.update(zeros, state.opt_state, state.params)
        return jax.tree_util.tree_map(lambda a, b: a + b,
                                      state.params, updates), opt_state

    r_grad = jax.jit(jax.grad(retriever_loss))
    d_grad = jax.jit(jax.grad(reader_loss))
    t_fwd = jax.jit(teacher_fwd)

    # analytic FLOPs per pass — the SAME formulas bench.model_flops_per_step
    # uses (single source; a fix there propagates here)
    Lq, Lc = cfg.retriever.query_seq_len, cfg.retriever.seq_len
    Lr, Ld = cfg.reader.seq_len, cfg.reader.decoder_seq_len
    layer_self = bench_mod.layer_self_flops
    dec_stack = bench_mod.decoder_stack_flops

    V = t5.vocab_size
    fl_ret = 3 * (B * enc.num_layers * layer_self(Lq, enc.hidden_size, enc.ffn_size)
                  + B * K * enc.num_layers * layer_self(Lc, enc.hidden_size, enc.ffn_size))
    fl_reader = 3 * (B * K * t5.num_layers * layer_self(Lr, t5.hidden_size, t5.ffn_size)
                     + B * dec_stack(Ld, K * Lr, t5.hidden_size, t5.ffn_size, t5.num_layers)
                     + 2 * B * Ld * t5.hidden_size * V)
    fl_teacher = (B * K * t5.num_layers * layer_self(Lr, t5.hidden_size, t5.ffn_size)
                  + B * K * dec_stack(Ld, Lr, t5.hidden_size, t5.ffn_size, t5.num_layers)
                  + 2 * B * K * Ld * t5.hidden_size * V)

    rows = {}
    for name, fn, a, fl in (
            ("retriever_fwdbwd", r_grad, (state.params,), fl_ret),
            ("reader_fwdbwd", d_grad, (state.params,), fl_reader),
            ("teacher_fwd", t_fwd, (state.params,), fl_teacher),
            ("optimizer", opt_update, (state,), 0)):
        dt = timeit(fn, *a)
        rows[name] = {"ms": round(dt * 1000, 1),
                      "model_tflops": round(fl / 1e12, 1),
                      "util_vs_peak": round(fl / dt / peak, 3) if fl else None}

    # full step donates the state: rethread it through the loop
    st, m = compiled(state, batch)
    fetch(m)
    t0 = time.time()
    for _ in range(args.iters):
        st, m = compiled(st, batch)
    fetch(m)
    dt_full = (time.time() - t0) / args.iters
    rows["full_step"] = {"ms": round(dt_full * 1000, 1)}
    rows["sum_of_parts_ms"] = round(
        1000 * sum(v["ms"] / 1000 for k, v in rows.items()
                   if k not in ("full_step",)), 1)
    print(json.dumps({"device": kind, "B": B, "K": K, "breakdown": rows}))


if __name__ == "__main__":
    main()
