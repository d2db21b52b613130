"""Decompose the flagship step's dropout cost by site group.

README's pipeline table shows a measured gap between the deterministic
step and the counter-hash-dropout step (~77 ms at r4 numbers). The mask is
pure fused integer math (``models/layers.PackedDropout``), so the residue
is VPU op count, not HBM — but nobody has measured WHICH of the site
groups pays it: the ~170 elementwise hidden-dropout sites (residual adds,
embeddings, MLP) or the in-kernel attention dropout the flash kernels
generate per tile (``ops/fid_attention._keep_mask``).

Runs the flagship B=4/K=50 train step under four rate configurations and
reports ms/step for each, in one chip session so the numbers compare:

    base   hidden=0.1  attention=0.1   (the training default)
    hid0   hidden=0.0  attention=0.1   -> base - hid0 = hidden-site cost
    att0   hidden=0.1  attention=0.0   -> base - att0 = attention cost
    det    hidden=0.0  attention=0.0   (the deterministic floor)

Each variant runs in its own process (a TPU OOM poisons the live client —
same isolation rationale as bench_train_sweep). Results append as JSON
lines; re-runs skip completed variants.

Usage:
    python -m emdr2_tpu.tools.bench_dropout_breakdown \
        --out /root/repo/BENCH_DROPOUT.jsonl
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

VARIANTS = {
    "base": (0.1, 0.1),
    "hid0": (0.0, 0.1),
    "att0": (0.1, 0.0),
    "det": (0.0, 0.0),
}


def run_variant(name: str, iters: int) -> dict:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_default_prng_impl", "rbg")
    import numpy as np

    from bench import make_flagship_step

    hid, att = VARIANTS[name]
    row = {"variant": name, "hidden_dropout": hid, "attention_dropout": att,
           "hash": os.environ.get("EMDR2_DROPOUT_HASH", "default")}
    try:
        t0 = time.time()
        compiled, state, batch = make_flagship_step(
            4, 50, hidden_dropout=hid, attention_dropout=att)
        row["compile_s"] = round(time.time() - t0, 1)
        state, m = compiled(state, batch)  # warmup
        np.asarray(m["loss"])
        t0 = time.time()
        for _ in range(iters):
            state, m = compiled(state, batch)
        np.asarray(m["loss"])
        row["ms_per_step"] = round((time.time() - t0) / iters * 1000, 1)
    except Exception as e:
        row["error"] = f"{type(e).__name__}: {e}"[:400]
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="base,hid0,att0,det")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--out", default="/root/repo/BENCH_DROPOUT.jsonl")
    p.add_argument("--variant", default=None,
                   help="internal: run ONE variant in this process")
    args = p.parse_args(argv)

    if args.variant:
        row = run_variant(args.variant, args.iters)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"  -> {row}", flush=True)
        return

    done = set()
    if os.path.exists(args.out):
        for line in open(args.out):
            r = json.loads(line)
            if "ms_per_step" in r:
                done.add((r["variant"], r.get("hash", "default")))

    cur_hash = os.environ.get("EMDR2_DROPOUT_HASH", "default")
    for name in args.variants.split(","):
        if (name, cur_hash) in done:
            print(f"skip {name}/{cur_hash} (done)", flush=True)
            continue
        print(f"variant {name} (hash={cur_hash}) ...", flush=True)
        subprocess.run(
            [sys.executable, "-m", "emdr2_tpu.tools.bench_dropout_breakdown",
             "--variant", name, "--iters", str(args.iters),
             "--out", args.out],
            cwd="/root/repo")


if __name__ == "__main__":
    main()
