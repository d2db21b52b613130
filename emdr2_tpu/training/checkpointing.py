"""Checkpoint save/load (orbax) with reference-parity semantics.

Replaces ``/root/reference/megatron/checkpointing.py``:

- layout: ``<dir>/iter_{it:07d}`` + tracker file
  ``latest_checkpointed_iteration.txt`` (:74-91);
- contents: params, optimizer state, step, dropout RNG key — the analog of
  the reference's model/optimizer/lr-scheduler/rng-state bundle (:94-142);
- ``load_checkpoint`` with ``load_optim=False`` / iteration override — the
  ``--finetune/--no-load-optim`` escapes (:145-264);
- partial loaders ``load_retriever_params`` / ``load_reader_params`` — the
  dual-encoder-only and T5-only loaders used to initialize from pretrained
  DPR/T5 and to hand fresh weights to the async indexer (:267-344);
- ``remove_stale_checkpoints`` pruning (:347-363).

Checkpoints also serve as the weight-transport channel in the reference's
async protocol; in this framework the embedder sub-mesh reads weights
directly from device memory, and checkpoints are only for fault tolerance.
"""

from __future__ import annotations

import os
import re
import shutil
import threading
from typing import Any, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

TRACKER = "latest_checkpointed_iteration.txt"

# ---- async save machinery ---------------------------------------------------
# The reference blocks the train loop on every save (checkpointing.py:94-142,
# torch.save of the full fp32 state). Here interval saves can instead STAGE
# (device -> host copy) and return, with the multi-GB disk write riding a
# background thread under the next train steps. Durability contract: the
# tracker file is written ONLY after orbax finalizes the checkpoint directory
# (tmp-dir + atomic rename), by a per-save waiter thread — a crash mid-write
# leaves the tracker at the previous complete checkpoint, never pointing at a
# partial one. At most one save is in flight (each save drains the previous).
_ASYNC: Optional[ocp.AsyncCheckpointer] = None
_PENDING: List[threading.Thread] = []
_ERRORS: List[BaseException] = []  # failures from background _finish threads


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC


def finalize_async_saves() -> None:
    """Block until every staged save is durable and its tracker written.
    Called implicitly by every sync save / load; call explicitly before
    process exit if the last save was async.

    A failed background commit (disk full, orbax error) is re-raised HERE —
    the waiter thread records the exception rather than dying silently, so
    the next save/load/finalize surfaces it instead of training on while
    interval checkpointing has quietly stopped working."""
    while _PENDING:
        t = _PENDING.pop(0)
        t.join()
    if _ERRORS:
        err = _ERRORS.pop(0)
        _ERRORS.clear()
        raise RuntimeError(
            "a background checkpoint save failed; the tracker was NOT "
            "advanced past the last durable checkpoint") from err


def iter_dir(root: str, iteration: int) -> str:
    return os.path.join(root, f"iter_{iteration:07d}")


def latest_iteration(root: str) -> Optional[int]:
    tracker = os.path.join(root, TRACKER)
    if os.path.exists(tracker):
        with open(tracker) as f:
            return int(f.read().strip())
    return None


def save_checkpoint(root: str, state: Any, iteration: int,
                    async_save: bool = False) -> str:
    """Write the full train state and update the tracker atomically-enough
    (tracker written after the checkpoint completes, as the reference does
    via barrier + rank-0 write, checkpointing.py:135-142).

    ``async_save=True`` returns after staging (device -> host copy); the
    disk write + tracker update happen in the background (see the module
    comment for the durability contract). Use for interval saves; keep
    exit/final saves synchronous so they are durable before return."""
    root = os.path.abspath(root)
    os.makedirs(root, exist_ok=True)
    path = iter_dir(root, iteration)
    finalize_async_saves()  # at most one in flight; ordered tracker writes
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.save(path, state, force=True)  # returns after staging

        def _finish(it: int = iteration, r: str = root):
            try:
                ckptr.wait_until_finished()
                if jax.process_index() == 0:
                    with open(os.path.join(r, TRACKER), "w") as f:
                        f.write(str(it))
            except BaseException as e:  # surfaced by finalize_async_saves
                _ERRORS.append(e)

        t = threading.Thread(target=_finish, daemon=True,
                             name=f"ckpt-finalize-{iteration}")
        t.start()
        _PENDING.append(t)
        return path
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)  # multihost: collective save
    if jax.process_index() == 0:  # single-writer tracker (rank-0 write,
        with open(os.path.join(root, TRACKER), "w") as f:  # :135-142)
            f.write(str(iteration))
    return path


def load_checkpoint(root: str, abstract_state: Any,
                    iteration: Optional[int] = None,
                    load_optim: bool = True) -> tuple:
    """Restore a TrainState. ``abstract_state`` provides shapes/shardings
    (from ``step_lib.abstract_train_state`` or a concrete state).

    Returns (state, iteration). With ``load_optim=False`` the optimizer state
    and step from ``abstract_state`` (usually fresh) are kept — the
    ``--finetune`` path."""
    root = os.path.abspath(root)
    finalize_async_saves()  # a staged save may be the one we restore
    if iteration is None:
        iteration = latest_iteration(root)
        if iteration is None:
            raise FileNotFoundError(f"no tracker file in {root}")
    path = iter_dir(root, iteration)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, abstract_state)
    if not load_optim:
        restored = restored._replace(opt_state=abstract_state.opt_state,
                                     step=abstract_state.step)
    return restored, iteration


def _restore_subtree(root: str, iteration: Optional[int], keys: list,
                     abstract_subtree: Any) -> Any:
    """Restore only ``state.params[...keys...]`` from a checkpoint —
    the analog of the reference's key_list drill-down loaders
    (checkpointing.py:267-344)."""
    root = os.path.abspath(root)
    if iteration is None:
        iteration = latest_iteration(root)
        if iteration is None:
            raise FileNotFoundError(f"no tracker file in {root}")
    path = iter_dir(root, iteration)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    out = restored["params"]
    for k in keys:
        out = out[k]
    flat_out = jax.tree_util.tree_leaves(out)
    flat_abs, treedef = jax.tree_util.tree_flatten(abstract_subtree)
    assert len(flat_out) == len(flat_abs), (
        f"subtree {keys} has {len(flat_out)} arrays, expected {len(flat_abs)}")
    leaves = [np.asarray(x, getattr(a, "dtype", None))
              for x, a in zip(flat_out, flat_abs)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_retriever_params(root: str, abstract_retriever: Any,
                          iteration: Optional[int] = None) -> Any:
    """Dual-encoder subtree only (``load_dualencoder_checkpoint``,
    checkpointing.py:267-310)."""
    return _restore_subtree(root, iteration, ["retriever"], abstract_retriever)


def load_reader_params(root: str, abstract_reader: Any,
                       iteration: Optional[int] = None) -> Any:
    """T5 reader subtree only (``load_t5_checkpoint``, :313-344)."""
    return _restore_subtree(root, iteration, ["reader"], abstract_reader)


def remove_stale_checkpoints(root: str, keep_last: int = 2) -> None:
    """Prune old iter_* dirs, keeping the newest ``keep_last``
    (checkpointing.py:347-363)."""
    if not os.path.isdir(root):
        return
    iters = sorted(
        int(m.group(1))
        for d in os.listdir(root)
        if (m := re.match(r"iter_(\d+)$", d)) and
        os.path.isdir(os.path.join(root, d)))
    for it in iters[:-keep_last] if keep_last > 0 else iters:
        shutil.rmtree(iter_dir(root, it), ignore_errors=True)
