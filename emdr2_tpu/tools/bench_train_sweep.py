"""Per-chip train-throughput frontier: B x remat-policy x index-residency.

The reference trains EMDR2 at batch 8 per 40 GB A100
(``/root/reference/examples/openqa/emdr2_nq.sh:88``); this repo's flagship
step had only ever been measured at B=4 (VERDICT r4 item 1). This sweeps the
per-chip batch against the two remat layouts that fit a 16 GB v5e — full
per-layer remat and the towers-stored default — with the per-chip evidence
index shard RESIDENT (int8 / bf16 / absent) exactly as e2e training holds it
next to the step's workspace, and reports ms/step + examples/s/chip for
every combination. OOM rows are recorded with the failure string, never
silently skipped (the README remat-table convention).

Results append to ``--out`` as JSON lines so a crashed sweep resumes with
``--skip-done``. One full-flagship XLA compile per new (B, policy) shape
(~10 min cold, seconds from the persistent cache at ``.jax_cache``).

Usage:
    python -m emdr2_tpu.tools.bench_train_sweep \
        --bs 4,5,6,8 --policies towers,full --residency int8,none,bf16 \
        --out /root/repo/BENCH_SWEEP.jsonl
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np


def shard_rows():
    """Per-chip index rows at flagship scale: the 21M-passage corpus over 16
    chips, kernel-aligned as ShardedEvidenceIndex lays it out."""
    from emdr2_tpu.config import IndexConfig
    from emdr2_tpu.ops.mips import row_alignment

    cfg = IndexConfig()
    align = row_alignment(cfg.chunk_rows, cfg.group_size)
    return ((21_015_324 // 16) // align) * align, cfg.group_size


def alloc_residency(kind: str):
    """Materialize the resident index slab the way training holds it:
    bf16 [N, 768] (~1.9 GB) or int8 [N, 768] + per-group fp32 scales
    (~0.97 GB). Returns live device buffers (kept referenced by the caller
    for the duration of the timing run)."""
    if kind == "none":
        return None
    n, group = shard_rows()
    if kind == "bf16":
        slab = jnp.zeros((n, 768), jnp.bfloat16)
        jax.block_until_ready(slab)
        return (slab,)
    if kind == "int8":
        slab = jnp.zeros((n, 768), jnp.int8)
        scales = jnp.ones((n // group,), jnp.float32)
        jax.block_until_ready((slab, scales))
        return (slab, scales)
    raise ValueError(kind)


def run_row(B: int, policy: str, residency: str, iters: int) -> dict:
    from bench import (PEAK_FLOPS, flagship_step_config, make_flagship_step,
                       model_flops_per_step)

    row = {"B": B, "policy": policy, "residency": residency}
    slab = None
    try:
        # the slab allocates FIRST (training brings the index up before the
        # train state), then params/adam, then the step's temp workspace
        slab = alloc_residency(residency)
        t0 = time.time()
        compiled, state, batch = make_flagship_step(
            B, 50, remat_policy="nothing", remat_towers=(policy == "full"))
        row["compile_s"] = round(time.time() - t0, 1)

        state, m = compiled(state, batch)  # warmup
        np.asarray(m["loss"])
        t0 = time.time()
        for _ in range(iters):
            state, m = compiled(state, batch)
        np.asarray(m["loss"])  # host fetch = reliable fence through axon
        dt = (time.time() - t0) / iters

        row["ms_per_step"] = round(dt * 1000, 1)
        row["examples_per_sec_per_chip"] = round(B / dt, 3)
        kind = getattr(jax.devices()[0], "device_kind", "")
        peak = PEAK_FLOPS.get(kind, 197e12)
        mflops = model_flops_per_step(flagship_step_config(B, 50), B, 50)
        row["model_flops_util"] = round(mflops / dt / peak, 3)
        row["device"] = kind
        del state, batch, compiled
    except Exception as e:  # OOM rows are data, not failures
        row["error"] = f"{type(e).__name__}: {e}"[:400]
    finally:
        del slab
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bs", default="4,5,6,8")
    p.add_argument("--policies", default="towers,full",
                   help="towers = reader remat + towers stored (the default "
                        "recipe); full = per-layer remat everywhere")
    p.add_argument("--residency", default="int8,none,bf16")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--out", default="/root/repo/BENCH_SWEEP.jsonl")
    p.add_argument("--skip-done", action="store_true")
    p.add_argument("--row", default=None,
                   help="internal: run ONE row ('B:policy:residency') in "
                        "this process and append it to --out")
    args = p.parse_args(argv)

    if args.row:
        b, policy, res = args.row.split(":")
        row = run_row(int(b), policy, res, args.iters)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"  -> {row}", flush=True)
        return

    done = set()
    if args.skip_done and os.path.exists(args.out):
        for line in open(args.out):
            r = json.loads(line)
            if "ms_per_step" in r or "error" in r:
                done.add((r["B"], r["policy"], r["residency"]))

    bs = [int(b) for b in args.bs.split(",")]
    policies = args.policies.split(",")
    residency = args.residency.split(",")

    # One fresh PROCESS per row: a TPU OOM leaks the failed row's device
    # buffers into the live client (every subsequent row then spuriously
    # RESOURCE_EXHAUSTs — observed when the whole sweep shared a process),
    # so isolation is correctness here, not hygiene. The persistent compile
    # cache keeps the per-process recompile at ~2-4 min.
    import subprocess
    for policy in policies:
        for B in bs:
            for res in residency:
                key = (B, policy, res)
                if key in done:
                    print(f"skip {key} (done)", flush=True)
                    continue
                print(f"row B={B} policy={policy} residency={res} ...",
                      flush=True)
                r = subprocess.run(
                    [sys.executable, "-m",
                     "emdr2_tpu.tools.bench_train_sweep",
                     "--row", f"{B}:{policy}:{res}",
                     "--iters", str(args.iters), "--out", args.out],
                    cwd="/root/repo")
                if r.returncode != 0:
                    with open(args.out, "a") as f:
                        f.write(json.dumps(
                            {"B": B, "policy": policy, "residency": res,
                             "error": f"row process died rc={r.returncode}"})
                            + "\n")


if __name__ == "__main__":
    main()
