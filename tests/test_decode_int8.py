"""int8-stored cross-K/V decode path (ops/decode_attention.py).

The token loop re-reads the whole precomputed cross-K/V slab every step;
int8 storage halves that read roofline. These tests pin (a) the quantizer's
error contract, (b) the flash kernel against a dense XLA reference on the
same int8 data (interpret mode), (c) end-to-end greedy/beam decode equality
with the bf16 path on a tiny model, and (d) the shard_mapped form against
the single-device kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdr2_tpu.config import tiny_config
from emdr2_tpu.models import EMDR2Model
from emdr2_tpu.models.decoding import (
    DecoderSession,
    beam_search_decode,
    greedy_decode,
)
from emdr2_tpu.ops.decode_attention import (
    decode_cross_attention_int8,
    decode_cross_attention_int8_reference,
    decode_cross_attention_int8_sharded,
    padded_rows,
    quantize_kv_rows,
)
from tests.test_models import make_batch


class TestQuantizer:
    def test_roundtrip_error_bound(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 17, 8),
                              jnp.float32)
        x8, s = quantize_kv_rows(x)
        assert x8.dtype == jnp.int8 and s.shape == (2, 3, 17)
        back = x8.astype(jnp.float32) * s[..., None]
        # symmetric absmax: per-element error <= scale/2
        err = np.abs(np.asarray(back - x))
        bound = np.asarray(s)[..., None] / 2 + 1e-7
        assert (err <= bound).all()

    def test_zero_rows_exact(self):
        x = jnp.zeros((1, 2, 4, 8), jnp.float32)
        x8, s = quantize_kv_rows(x)
        assert np.asarray(s).min() == 1.0  # guarded scale, no div-by-zero
        assert np.abs(np.asarray(x8)).max() == 0

    def test_padded_rows(self):
        assert padded_rows(25600) == 25600       # flagship: zero padding
        assert padded_rows(100) == 128
        assert padded_rows(3200) == 3200
        assert padded_rows(3201) == 6400


class TestKernel:
    def _mk(self, B=2, R=3, nh=4, hd=16, Lk=128, masked_tail=5, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        q = jax.random.normal(ks[0], (B, R, nh, hd), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, nh, Lk, hd), jnp.float32)
        v = jax.random.normal(ks[2], (B, nh, Lk, hd), jnp.float32)
        bias = jnp.zeros((B, Lk), jnp.float32)
        if masked_tail:
            bias = bias.at[:, -masked_tail:].set(-1e9)
        k8, kscale = quantize_kv_rows(k)
        v8, vscale = quantize_kv_rows(v)
        return q, k8, kscale, v8, vscale, bias

    def test_matches_reference(self):
        args = self._mk()
        out = decode_cross_attention_int8(*args)
        ref = decode_cross_attention_int8_reference(*args)
        # identical int8 data; differences are bf16-dot rounding only
        np.testing.assert_allclose(
            np.asarray(out, jnp.float32), np.asarray(ref, jnp.float32),
            atol=0.03, rtol=0.03)

    def test_multi_chunk_accumulation(self):
        # Lk spanning several chunks exercises the online-softmax carry
        args = self._mk(Lk=512, masked_tail=17, seed=3)
        out = decode_cross_attention_int8(*args, key_chunk=128)
        ref = decode_cross_attention_int8_reference(*args)
        np.testing.assert_allclose(
            np.asarray(out, jnp.float32), np.asarray(ref, jnp.float32),
            atol=0.03, rtol=0.03)

    def test_masked_columns_ignored(self):
        # poisoning masked K/V rows must not change the output
        q, k8, ks, v8, vs, bias = self._mk(masked_tail=13, seed=1)
        out = decode_cross_attention_int8(q, k8, ks, v8, vs, bias)
        k8p = k8.at[:, :, -13:, :].set(127)
        v8p = v8.at[:, :, -13:, :].set(-127)
        outp = decode_cross_attention_int8(q, k8p, ks, v8p, vs, bias)
        np.testing.assert_allclose(np.asarray(out, jnp.float32),
                                   np.asarray(outp, jnp.float32),
                                   atol=1e-5)

    def test_sharded_matches_single(self):
        # rows over dp, heads over tp — same numbers as the plain kernel
        from jax.sharding import Mesh
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
        q, k8, ks, v8, vs, bias = self._mk(B=4, nh=4, seed=2)
        plain = decode_cross_attention_int8(q, k8, ks, v8, vs, bias)
        sharded = jax.jit(
            lambda *a: decode_cross_attention_int8_sharded(
                *a, mesh=mesh))(q, k8, ks, v8, vs, bias)
        np.testing.assert_allclose(np.asarray(plain, jnp.float32),
                                   np.asarray(sharded, jnp.float32),
                                   atol=1e-5)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = EMDR2Model(cfg)
    batch = make_batch(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return cfg, model, params, batch


class TestSessionInt8:
    def test_greedy_matches_bf16_path(self, setup):
        cfg, model, params, batch = setup
        base = greedy_decode(DecoderSession(model, params, 6), batch,
                             bos_id=1, eos_id=2)
        q8 = greedy_decode(DecoderSession(model, params, 6, kv_quant="int8"),
                           batch, bos_id=1, eos_id=2)
        assert base == q8

    def test_beam_runs_and_matches(self, setup):
        cfg, model, params, batch = setup
        base = beam_search_decode(DecoderSession(model, params, 5), batch,
                                  bos_id=1, eos_id=2, beam_size=3)
        q8 = beam_search_decode(
            DecoderSession(model, params, 5, kv_quant="int8"), batch,
            bos_id=1, eos_id=2, beam_size=3)
        assert base == q8

    def test_bad_quant_mode_rejected(self, setup):
        cfg, model, params, _ = setup
        with pytest.raises(ValueError):
            DecoderSession(model, params, 4, kv_quant="int4")
