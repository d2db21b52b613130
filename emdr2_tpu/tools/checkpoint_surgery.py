"""Checkpoint surgery: extract submodels, prune stale checkpoints.

Parity with ``/root/reference/tools/save_emdr2_models.py:10-41`` (split an
EMDR2 checkpoint into standalone retriever / reader checkpoints) and
``tools/clean_checkpoints.py`` (strip optimizer state / prune).

Usage:
  python -m emdr2_tpu.tools.checkpoint_surgery extract \\
      --load run/ --submodel retriever --save out_dir/
  python -m emdr2_tpu.tools.checkpoint_surgery strip-optim \\
      --load run/ --save slim/
  python -m emdr2_tpu.tools.checkpoint_surgery prune --load run/ --keep 2
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import orbax.checkpoint as ocp

from emdr2_tpu.training import checkpointing as ck


def _load_raw(root: str, iteration=None):
    it = iteration if iteration is not None else ck.latest_iteration(root)
    if it is None:
        raise FileNotFoundError(f"no tracker in {root}")
    with ocp.PyTreeCheckpointer() as c:
        tree = c.restore(ck.iter_dir(root, it))
    return tree, it


def extract(load: str, submodel: str, save: str, iteration=None) -> str:
    """Write a checkpoint containing only params[submodel] under the same
    layout, so partial loaders can consume it."""
    tree, it = _load_raw(load, iteration)
    sub = {"params": {submodel: tree["params"][submodel]},
           "step": tree.get("step", np.int32(it))}
    os.makedirs(save, exist_ok=True)
    path = ck.iter_dir(save, it)
    with ocp.PyTreeCheckpointer() as c:
        c.save(path, sub, force=True)
    with open(os.path.join(save, ck.TRACKER), "w") as f:
        f.write(str(it))
    return path


def strip_optim(load: str, save: str, iteration=None) -> str:
    """Drop optimizer state (clean_checkpoints.py equivalent)."""
    tree, it = _load_raw(load, iteration)
    slim = {k: v for k, v in tree.items() if k != "opt_state"}
    os.makedirs(save, exist_ok=True)
    path = ck.iter_dir(save, it)
    with ocp.PyTreeCheckpointer() as c:
        c.save(path, slim, force=True)
    with open(os.path.join(save, ck.TRACKER), "w") as f:
        f.write(str(it))
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("extract")
    e.add_argument("--load", required=True)
    e.add_argument("--submodel", choices=["retriever", "reader"],
                   required=True)
    e.add_argument("--save", required=True)
    e.add_argument("--iteration", type=int, default=None)
    s = sub.add_parser("strip-optim")
    s.add_argument("--load", required=True)
    s.add_argument("--save", required=True)
    s.add_argument("--iteration", type=int, default=None)
    r = sub.add_parser("prune")
    r.add_argument("--load", required=True)
    r.add_argument("--keep", type=int, default=2)
    args = p.parse_args(argv)

    if args.cmd == "extract":
        print(extract(args.load, args.submodel, args.save, args.iteration))
    elif args.cmd == "strip-optim":
        print(strip_optim(args.load, args.save, args.iteration))
    else:
        ck.remove_stale_checkpoints(args.load, keep_last=args.keep)
        print(f"pruned {args.load} to last {args.keep}")


if __name__ == "__main__":
    main()
