"""FiD flash cross-attention: forward/backward parity with the XLA reference."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdr2_tpu.ops.fid_attention import (
    fid_cross_attention,
    fid_cross_attention_reference,
)


def make_inputs(B=2, Lq=8, Lk=256, nh=2, hd=32, seed=0, n_masked=40):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, Lq, nh, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, Lk, nh, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, Lk, nh, hd), jnp.float32)
    bias = np.zeros((B, Lk), np.float32)
    if n_masked:
        bias[:, -n_masked:] = -1e9  # padded key positions
    return q, k, v, jnp.asarray(bias)


class TestForward:
    @pytest.mark.parametrize("chunk", [64, 128, 256])
    def test_matches_reference(self, chunk):
        q, k, v, bias = make_inputs()
        got = fid_cross_attention(q, k, v, bias, chunk, True)
        want = fid_cross_attention_reference(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_no_mask(self):
        q, k, v, bias = make_inputs(n_masked=0)
        got = fid_cross_attention(q, k, v, bias, 64, True)
        want = fid_cross_attention_reference(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_fully_masked_rows_finite(self):
        """All keys masked -> output must be finite (zeros), not NaN."""
        q, k, v, bias = make_inputs()
        bias = jnp.full_like(bias, -1e9)
        got = fid_cross_attention(q, k, v, bias, 64, True)
        assert np.isfinite(np.asarray(got)).all()


class TestBackward:
    def test_grads_match_reference(self):
        q, k, v, bias = make_inputs(B=2, Lq=8, Lk=128, nh=2, hd=32,
                                    n_masked=16)
        g_target = jnp.asarray(
            np.random.RandomState(7).randn(*q.shape), jnp.float32)

        def loss_flash(q, k, v):
            out = fid_cross_attention(q, k, v, bias, 64, True)
            return jnp.sum(out * g_target)

        def loss_ref(q, k, v):
            out = fid_cross_attention_reference(q, k, v, bias)
            return jnp.sum(out * g_target)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4, err_msg=f"d{name}")

    def test_masked_keys_get_zero_grad(self):
        q, k, v, bias = make_inputs(Lk=128, n_masked=32)

        def loss(k, v):
            return jnp.sum(fid_cross_attention(q, k, v, bias, 64, True))

        dk, dv = jax.grad(loss, argnums=(0, 1))(k, v)
        np.testing.assert_allclose(np.asarray(dk[:, -32:]), 0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dv[:, -32:]), 0, atol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
