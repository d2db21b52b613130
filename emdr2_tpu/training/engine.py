"""Training engine: the epoch/interval loop for end-to-end EMDR2 training.

Replaces the reference's ``train``/``_train`` (``/root/reference/tasks/
openqa/e2eqa/train_e2eqa.py:415-544``) and the generic engine pieces of
``megatron/training.py:233-377``: per-interval loss averaging and timer
logs, checkpoint save/eval intervals, ``exit_interval`` clean shutdown that
waits for an in-flight index build, epoch/iteration resume math
(``iteration -> epoch, batch offset``, :428-430), and the async-refresh
handshake points.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

from emdr2_tpu.config import EMDR2Config
from emdr2_tpu.training import checkpointing as ckpt_lib
from emdr2_tpu.utils.timers import Timers


class TrainLog:
    """Interval-averaged metric logging (training_log, training.py:233-322)."""

    def __init__(self, log_interval: int, printer: Callable[[str], None] = print):
        self.log_interval = log_interval
        self.printer = printer
        self._acc: Dict[str, float] = {}
        self._count = 0
        self._t0 = time.perf_counter()
        self.history: List[Dict[str, float]] = []

    def push(self, iteration: int, total_iters: int,
             metrics: Dict[str, float]) -> None:
        for k, v in metrics.items():
            self._acc[k] = self._acc.get(k, 0.0) + float(v)
        self._count += 1
        if iteration % self.log_interval == 0:
            avg = {k: v / self._count for k, v in self._acc.items()}
            ms = (time.perf_counter() - self._t0) * 1000.0 / self._count
            avg["ms_per_iter"] = ms
            avg["iteration"] = iteration
            self.history.append(avg)
            parts = " | ".join(f"{k} {v:.4e}" for k, v in avg.items()
                               if k != "iteration")
            self.printer(f" iteration {iteration:8d}/{total_iters} | {parts}")
            self._acc, self._count = {}, 0
            self._t0 = time.perf_counter()


def train(task, dataset, cfg: EMDR2Config,
          refresher=None,
          save_dir: Optional[str] = None,
          eval_callback: Optional[Callable[[int], None]] = None,
          tensorboard_dir: Optional[str] = None,
          prefetch_depth: int = 0,
          timeout_minutes: Optional[float] = None,
          printer: Callable[[str], None] = print) -> int:
    """Run the e2e training loop; returns the final iteration.

    ``task`` is an E2EQATask with an initialized state; ``dataset`` an
    OpenQADataset. train_iters = epochs x batches-per-epoch unless
    cfg.train.train_iters is set (parity with train_e2eqa.py:564-570).

    ``eval_callback(iteration)`` may return a metrics dict (e.g.
    ``{"valid_em": ...}``); it is written to TensorBoard at that iteration.
    The metrics writer is flushed/closed on EVERY exit path — normal
    completion, time budget, exit_interval, and error propagation — so no
    buffered events are lost on early returns.
    """
    tcfg = cfg.train
    B = task.global_batch_size
    batches_per_epoch = len(dataset) // B
    total_iters = (tcfg.train_iters if tcfg.train_iters is not None
                   else tcfg.epochs * batches_per_epoch)

    iteration = int(task.state.step)
    start_epoch = iteration // max(batches_per_epoch, 1)
    start_offset = iteration % max(batches_per_epoch, 1)

    if refresher is not None:
        refresher.start(task.state.params)

    log = TrainLog(tcfg.log_interval, printer)
    timers = Timers()
    from emdr2_tpu.utils.monitoring import MetricsWriter, report_memory
    writer = MetricsWriter(tensorboard_dir)
    # full config dump as TB text, the reference's args-to-tensorboard
    # (initialize.py:154-160); fenced so TB renders it verbatim
    import pprint
    writer.text("config", "```\n" + pprint.pformat(cfg) + "\n```")
    reported_memory = False
    # wall-clock budget: checkpoint and exit cleanly before a scheduler kills
    # the job — the generic equivalent of the reference's cluster-specific
    # ADLR autoresume polling (global_vars.py:137-152, utils.py:84-98)
    deadline = (time.perf_counter() + timeout_minutes * 60.0
                if timeout_minutes else None)

    # An explicit train_iters is authoritative: epochs cycle (re-shuffled per
    # pass) until total_iters is reached, matching the reference where
    # train_iters drives the loop and epochs merely derive it
    # (train_e2eqa.py:400-412,461-468).
    # multi-host: every process runs this loop in lockstep; each feeds only
    # its contiguous slice of the global batch (parallel/distributed.py)
    import jax as _jax
    dist_kw = ({"rank": _jax.process_index(),
                "world_size": _jax.process_count()}
               if _jax.process_count() > 1 else {})

    refresh_count = 0
    epoch = start_epoch
    try:
      while iteration < total_iters and batches_per_epoch > 0:
        epoch_batches = dataset.epoch_batches(B, seed=tcfg.seed + epoch,
                                              **dist_kw)
        if prefetch_depth > 0:
            from emdr2_tpu.training.prefetch import (BatchPrefetcher,
                                                     MainDispatchPrefetcher)
            # the worker embeds stage-A queries from a donation-safe
            # query-tower snapshot (refreshed after every step), so the
            # jitted step keeps donating the 5.3 GB state buffers — turning
            # donation off instead would transiently double them and OOM
            # the flagship 16 GB v5e layout (e2eqa.enable_prefetch_snapshots)
            if hasattr(task, "enable_prefetch_snapshots"):
                task.enable_prefetch_snapshots()
            else:  # tasks without a snapshot path: fall back to donate-off
                assert not task._jitted.get("train_step"), (
                    "enable prefetch before the first train step is compiled")
                task.donate_state = False
            if _jax.process_count() > 1:
                # multi-controller-safe variant: ALL jitted dispatch (stage A
                # + steps) stays on this main thread in one deterministic
                # order per controller; the worker only blocks on device
                # results and runs the host postprocess — no concurrent
                # collective enqueues, no cross-host deadlock
                epoch_batches = MainDispatchPrefetcher(
                    task, epoch_batches, depth=prefetch_depth)
            else:
                epoch_batches = BatchPrefetcher(task, epoch_batches,
                                                depth=prefetch_depth)
        for bi, batch in enumerate(epoch_batches):
            if epoch == start_epoch and bi < start_offset:
                continue  # resume skip (train_e2eqa.py:461-468)
            if iteration >= total_iters:
                break

            if refresher is not None and refresher.maybe_swap(
                    iteration, task.state.params):
                refresh_count += 1
                writer.scalars({"index_refresh_count": refresh_count},
                               iteration)
                if save_dir is not None:
                    # the reference saves a checkpoint at every refresh —
                    # it IS the weight channel there (:482); here it's pure
                    # fault tolerance
                    ckpt_lib.save_checkpoint(save_dir, task.state, iteration,
                                             async_save=getattr(
                                                 tcfg, "async_save", False))
                    ckpt_lib.remove_stale_checkpoints(save_dir, keep_last=2)

            timers("step").start()
            if prefetch_depth > 0:  # batch is an already-built device batch
                metrics = task.train_step_prebuilt(batch)
            else:
                metrics = task.train_step(batch)
            timers("step").stop()
            iteration += 1
            log.push(iteration, total_iters, metrics)
            if iteration % tcfg.log_interval == 0:
                writer.scalars({k: float(v) for k, v in metrics.items()},
                               iteration)
                if not reported_memory:
                    report_memory(" ", printer)  # first-log memory report
                    reported_memory = True       # (training.py:317-319)

            if save_dir is not None and iteration % tcfg.save_interval == 0:
                # interval saves stage + finalize in the background — the
                # multi-GB write rides under the next train steps; the
                # exit/timeout/final saves below stay synchronous (durable
                # before return) and drain any in-flight async save first
                ckpt_lib.save_checkpoint(save_dir, task.state, iteration,
                                         async_save=getattr(
                                             tcfg, "async_save", False))
            if eval_callback is not None and iteration % tcfg.eval_interval == 0:
                eval_metrics = eval_callback(iteration)
                if eval_metrics:  # e.g. {"valid_em": ...} -> TB scalars
                    writer.scalars({k: float(v)
                                    for k, v in eval_metrics.items()},
                                   iteration)
            if deadline is not None and time.perf_counter() > deadline:
                if refresher is not None:
                    refresher.stop(wait=False)
                if save_dir is not None:
                    ckpt_lib.save_checkpoint(save_dir, task.state, iteration)
                printer(f" exiting at iteration {iteration} (time budget)")
                return iteration
            if tcfg.exit_interval and iteration % tcfg.exit_interval == 0:
                # clean shutdown: wait for an in-flight index build, final
                # save, stop (train_e2eqa.py:531-544)
                if refresher is not None:
                    refresher.stop(wait=True)
                if save_dir is not None:
                    ckpt_lib.save_checkpoint(save_dir, task.state, iteration)
                printer(f" exiting at iteration {iteration} (exit_interval)")
                return iteration
        epoch += 1
    finally:
        # flush buffered TB events on EVERY exit path (normal completion,
        # timeout return, exit_interval return, exception propagation)
        writer.close()

    if refresher is not None:
        refresher.stop(wait=True)
    if save_dir is not None:
        ckpt_lib.save_checkpoint(save_dir, task.state, iteration)
    return iteration
