"""Auxiliary subsystems: samplers, monitoring, layer-param sharing, timers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdr2_tpu.data.samplers import DistributedBatchSampler, RandomSampler
from emdr2_tpu.utils.monitoring import MetricsWriter, report_memory
from emdr2_tpu.utils.timers import Timers


class TestSamplers:
    def test_random_sampler_epoch_seeded(self):
        s = RandomSampler(10, seed=3)
        a = list(iter(s))
        s.set_epoch(1)
        b = list(iter(s))
        s.set_epoch(0)
        c = list(iter(s))
        assert sorted(a) == list(range(10))
        assert a != b and a == c

    def test_distributed_contiguous(self):
        s = list(range(8))
        ranks = [list(DistributedBatchSampler(s, 4, rank=r, world_size=2))
                 for r in range(2)]
        assert ranks[0] == [[0, 1], [4, 5]]
        assert ranks[1] == [[2, 3], [6, 7]]

    def test_distributed_interleaved(self):
        s = list(range(4))
        r0 = list(DistributedBatchSampler(s, 4, rank=0, world_size=2,
                                          interleave=True))
        r1 = list(DistributedBatchSampler(s, 4, rank=1, world_size=2,
                                          interleave=True))
        assert r0 == [[0, 2]] and r1 == [[1, 3]]

    def test_drop_last(self):
        s = list(range(10))
        full = list(DistributedBatchSampler(s, 4, drop_last=True))
        keep = list(DistributedBatchSampler(s, 4, drop_last=False))
        assert len(full) == 2 and len(keep) == 3


class TestMonitoring:
    def test_report_memory(self):
        lines = []
        stats = report_memory(printer=lines.append)
        assert len(stats) == jax.local_device_count()
        assert all("memory used" in l for l in lines)

    def test_metrics_writer_noop_and_tb(self, tmp_path):
        w = MetricsWriter(None)
        w.scalars({"x": 1.0}, 0)  # no-op, no crash
        w.close()
        w2 = MetricsWriter(str(tmp_path / "tb"))
        w2.scalars({"loss": 1.5}, 1)
        w2.text("args", "hello")
        w2.close()
        import os
        if w2._writer is not None:  # tensorboard available
            assert any(os.scandir(tmp_path / "tb"))


class TestLayerSharing:
    @pytest.mark.parametrize("style,expect_map", [
        ("grouped", [0, 1, 0, 1]),
        ("spaced", [0, 0, 1, 1]),
    ])
    def test_sharing_param_count_and_order(self, style, expect_map):
        import dataclasses
        from emdr2_tpu.config import tiny_config
        from emdr2_tpu.models.layers import TransformerStack

        base = tiny_config().retriever.encoder
        cfg = dataclasses.replace(base, num_layers=4, num_unique_layers=2,
                                  param_sharing_style=style)
        stack = TransformerStack(cfg)
        x = jnp.zeros((2, 8, cfg.hidden_size))
        params = stack.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        layer_keys = sorted(k for k in params if k.startswith("layer_"))
        assert layer_keys == ["layer_0", "layer_1"]  # only unique layers
        out = stack.apply({"params": params}, x)
        assert out.shape == x.shape

    def test_no_sharing_default(self):
        from emdr2_tpu.config import tiny_config
        from emdr2_tpu.models.layers import TransformerStack

        cfg = tiny_config().retriever.encoder
        stack = TransformerStack(cfg)
        x = jnp.zeros((1, 4, cfg.hidden_size))
        params = stack.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        n_layers = sum(1 for k in params if k.startswith("layer_"))
        assert n_layers == cfg.num_layers


class TestTimers:
    def test_elapsed_and_log(self):
        t = Timers()
        import time
        t("phase").start()
        time.sleep(0.01)
        t("phase").stop()
        msg = t.log(["phase"])
        assert "phase" in msg and "time (ms)" in msg


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
