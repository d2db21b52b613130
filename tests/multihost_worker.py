"""Worker process for test_multihost: drives the REAL E2EQATask (stages
A/B/C, host postprocess, sharded MIPS) on a multi-process CPU mesh.

Launched by tests/test_multihost.py with:
    python tests/multihost_worker.py <pid> <nproc> <coordinator> <tmpdir>
and XLA_FLAGS forcing N virtual devices per process. Each process feeds only
its DistributedBatchSampler slice of every global batch; losses print on one
line for the parent to compare across processes and against a single-process
run.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_threefry_partitionable", True)


def main() -> None:
    pid, nproc, coord, tmpdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "train"
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    sys.path.insert(0, "/root/repo")
    import pathlib

    import numpy as np

    from emdr2_tpu.config import MeshConfig
    from emdr2_tpu.parallel import build_mesh
    from emdr2_tpu.retrieval import ShardedEvidenceIndex
    from emdr2_tpu.tasks import E2EQATask
    from tests.helpers import build_toy_world

    # each process builds its own (deterministic, identical) toy world copy
    world_dir = pathlib.Path(tmpdir) / f"world_p{pid}"
    world_dir.mkdir(parents=True, exist_ok=True)
    cfg, tok, corpus, ds, _ = build_toy_world(world_dir)

    total = jax.device_count()
    mesh = build_mesh(MeshConfig(dp=total, tp=1), jax.devices())
    emb = np.random.RandomState(0).randn(
        len(corpus), cfg.index.embed_dim).astype(np.float32)
    index = ShardedEvidenceIndex(mesh, cfg.index, emb)
    task = E2EQATask(cfg, mesh, tok, corpus, index, total_train_iters=10)
    task.init_state(jax.random.PRNGKey(0), total)

    if mode == "prefetch":
        # multi-controller-safe prefetch (VERDICT r3 item 3): stage A is
        # dispatched from the MAIN thread in deterministic order against the
        # step dispatches; the worker thread only blocks on device results +
        # runs host postprocess. Losses must match a single-process run of
        # the same pipeline.
        from emdr2_tpu.training.prefetch import MainDispatchPrefetcher
        task.enable_prefetch_snapshots()
        losses = []
        for epoch in range(2):
            feed = MainDispatchPrefetcher(
                task, ds.epoch_batches(total, seed=epoch, rank=pid,
                                       world_size=nproc), depth=1)
            for db in feed:
                losses.append(float(task.train_step_prebuilt(db)["loss"]))
        print("PLOSSES " + " ".join(f"{v:.8f}" for v in losses), flush=True)
        return

    if mode == "zerocopy":
        # multi-host zero-copy refresh (VERDICT r3 item 4): the global slab
        # is embedded device-resident over a DISJOINT process-spanning embed
        # mesh; the swap repartitions onto the train mesh with intra-host
        # d2d copies. Must equal the host-RAM block path exactly.
        from jax.sharding import Mesh
        from emdr2_tpu.retrieval.builder import EvidenceIndexBuilder
        devs = jax.devices()
        mine = lambda p: [d for d in devs if d.process_index == p]
        train_devs = mine(0)[:2] + mine(1)[:2]
        embed_devs = mine(0)[2:] + mine(1)[2:]
        train_mesh = Mesh(np.array(train_devs).reshape(4, 1), ("dp", "tp"))
        embed_mesh = Mesh(np.array(embed_devs).reshape(4, 1), ("dp", "tp"))
        emb0 = np.random.RandomState(0).randn(
            len(corpus), cfg.index.embed_dim).astype(np.float32)
        idx_zc = ShardedEvidenceIndex(train_mesh, cfg.index, emb0)
        idx_host = ShardedEvidenceIndex(train_mesh, cfg.index, emb0)
        task2 = E2EQATask(cfg, train_mesh, tok, corpus, idx_zc,
                          total_train_iters=10)
        task2.init_state(jax.random.PRNGKey(0), 4)
        builder = EvidenceIndexBuilder(
            cfg, embed_mesh, task2.model, corpus, tok.cls_id, tok.sep_id,
            tok.pad_id, batch_size=16)
        params = task2.state.params
        # zero-copy: device-resident global slab -> local-repartition swap
        slab = builder.embed_corpus_device(params,
                                           out_rows=idx_zc.n_padded)
        idx_zc.swap_device_array(slab)
        # host path on the same weights
        blk = builder.embed_corpus(params,
                                   row_partition=idx_host.process_row_range())
        idx_host.update_from_process_local(blk)
        # the contract: this process's post-swap index rows == the host-path
        # block (up to bf16-vs-fp16 storage rounding of identical values)
        start, stop = idx_zc.process_row_range()
        mine_rows = np.concatenate([
            np.asarray(sh.data, np.float32)
            for sh in sorted(idx_zc.embeddings.addressable_shards,
                             key=lambda s: s.index[0].start or 0)])
        n_blk = blk.shape[0]
        eq = np.allclose(mine_rows[:n_blk], blk.astype(np.float32),
                         atol=2e-2)
        # padded tail rows past the corpus must still be masked (zeros in
        # the host path; duplicate embeddings in the device path — both are
        # hidden by n_valid masking, so no contract on them)
        print(f"ZEQ {int(eq)}", flush=True)
        q = np.random.RandomState(7).randn(
            8, cfg.index.embed_dim).astype(np.float32)
        for tag, idx in (("ZROWS", idx_zc), ("HROWS", idx_host)):
            vals, rows = idx.search(q, k=5)
            print(f"{tag} " + " ".join(
                map(str, np.asarray(rows).reshape(-1).tolist())), flush=True)
            print(f"{tag[0]}VALS " + " ".join(
                f"{v:.5f}" for v in np.asarray(vals).reshape(-1)), flush=True)
        return

    if mode == "refresh":
        # multi-host index refresh: each process embeds + swaps ONLY its own
        # index-shard row range; verified by searching the post-swap index
        from emdr2_tpu.retrieval.builder import EvidenceIndexBuilder
        builder = EvidenceIndexBuilder(
            cfg, mesh, task.model, corpus, tok.cls_id, tok.sep_id,
            tok.pad_id, batch_size=16)
        part = index.process_row_range()
        emb_local = builder.embed_corpus(task.state.params,
                                         row_partition=part)
        index.update_from_process_local(emb_local)
        vals, rows = index.search(
            np.random.RandomState(7).randn(
                8, cfg.index.embed_dim).astype(np.float32), k=5)
        print("ROWS " + " ".join(
            map(str, np.asarray(rows).reshape(-1).tolist())), flush=True)
        print("VALS " + " ".join(
            f"{v:.5f}" for v in np.asarray(vals).reshape(-1)), flush=True)
        # refresh-swap agreement: processes must reach the same verdict —
        # False while ANY process's embedder is unfinished, True when all
        # are (the lockstep-swap protocol maybe_swap runs at interval
        # boundaries)
        from types import SimpleNamespace

        from emdr2_tpu.training.async_refresh import AsyncIndexRefresher
        stub = SimpleNamespace(index=index)
        mixed = AsyncIndexRefresher._all_ready_on_train_mesh(stub, pid == 0)
        all_on = AsyncIndexRefresher._all_ready_on_train_mesh(stub, True)
        print(f"AGREE {int(mixed)} {int(all_on)}", flush=True)
        return

    losses = []
    for epoch in range(2):
        for batch in ds.epoch_batches(total, seed=epoch, rank=pid,
                                      world_size=nproc):
            m = task.train_step(batch)
            losses.append(float(m["loss"]))
        if epoch == 0:
            # mid-training collective eval — exactly what engine.train's
            # eval_callback does at eval_interval on every process: greedy
            # EM with the mesh-sharded decoder + the sharded forward losses
            em, n = task.evaluate_em(ds, batch_size=total, max_decode_len=4)
            vl = task.validation_loss(ds, batch_size=total)
            print(f"EVAL {em:.6f} {n} {vl['loss']:.8f}", flush=True)
            # sampling-decode key broadcast: every process passes a
            # DIFFERENT key (the realistic hazard); the session must
            # broadcast process 0's over its mesh so the SPMD token loop
            # stays in lockstep. Parent asserts the words agree.
            from emdr2_tpu.models.decoding import DecoderSession
            session = DecoderSession(task.model, task.state.params, 4,
                                     mesh=mesh)
            bk = session._broadcast_key(jax.random.PRNGKey(100 + pid))
            print("BKEY " + " ".join(
                map(str, np.asarray(bk).reshape(-1).tolist())), flush=True)
    print("LOSSES " + " ".join(f"{v:.8f}" for v in losses), flush=True)


if __name__ == "__main__":
    main()
