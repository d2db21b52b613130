"""Flash FiD attention integrated in the model: parity at real positions."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdr2_tpu.config import tiny_config
from emdr2_tpu.models import EMDR2Batch, EMDR2Model
from tests.test_models import make_batch


def flash_cfg(cfg, key_chunk=64):
    """Enable the flash kernel everywhere it applies: FiD decoder
    cross-attention AND padding-masked self-attention in the T5 encoder and
    both BERT towers (the flagship configuration)."""
    enc = dataclasses.replace(cfg.retriever.encoder,
                              fid_flash_attention=True,
                              flash_key_chunk=key_chunk)
    t5c = dataclasses.replace(cfg.reader.transformer,
                              fid_flash_attention=True,
                              flash_key_chunk=key_chunk)
    return cfg.replace(
        retriever=dataclasses.replace(cfg.retriever, encoder=enc),
        reader=dataclasses.replace(cfg.reader, transformer=t5c))


class TestFlashIntegration:
    def test_logits_match_standard_path(self):
        cfg = tiny_config()
        batch = make_batch(cfg)
        model_std = EMDR2Model(cfg)
        params = model_std.init({"params": jax.random.PRNGKey(0)}, batch)
        out_std = model_std.apply(params, batch)

        model_flash = EMDR2Model(flash_cfg(cfg))
        out_flash = model_flash.apply(params, batch)

        # decoder positions are all real in make_batch (loss_mask all ones)
        np.testing.assert_allclose(np.asarray(out_flash.lm_logits),
                                   np.asarray(out_std.lm_logits), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_flash.gold_log_probs),
                                   np.asarray(out_std.gold_log_probs),
                                   atol=2e-4)

    def test_grads_match_standard_path(self):
        cfg = tiny_config()
        batch = make_batch(cfg)
        model_std = EMDR2Model(cfg)
        params = model_std.init({"params": jax.random.PRNGKey(0)}, batch)
        model_flash = EMDR2Model(flash_cfg(cfg))

        def loss(model, p):
            out = model.apply(p, batch)
            lp = jax.nn.log_softmax(out.lm_logits, -1)
            gold = jnp.take_along_axis(lp, batch.labels[..., None], -1)[..., 0]
            return -(gold * batch.loss_mask).sum() / batch.loss_mask.sum()

        g_std = jax.grad(lambda p: loss(model_std, p))(params)
        g_fl = jax.grad(lambda p: loss(model_flash, p))(params)
        ls, lf = (jax.tree_util.tree_leaves(g) for g in (g_std, g_fl))
        worst = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                    for a, b in zip(ls, lf))
        assert worst < 5e-4, worst

    def test_nondivisible_tail_is_padded(self):
        """Lk not divisible by key_chunk -> the key axis is padded to a chunk
        multiple with -1e9 bias and the flash kernel still runs; padded keys
        must not leak attention."""
        cfg = tiny_config()
        # Lk = K*Lr = 4*48 = 192; force chunk that doesn't divide
        cfgf = flash_cfg(cfg, key_chunk=129)
        batch = make_batch(cfg)
        # pad out some reader positions in one doc
        rid = np.array(batch.reader_ids)  # writable copy
        rid[:, 0, 20:] = 0
        batch = batch._replace(reader_ids=jnp.asarray(rid))
        model_std = EMDR2Model(cfg)
        params = model_std.init({"params": jax.random.PRNGKey(0)}, batch)
        out_std = model_std.apply(params, batch)
        out_fb = EMDR2Model(cfgf).apply(params, batch)
        np.testing.assert_allclose(np.asarray(out_fb.lm_logits),
                                   np.asarray(out_std.lm_logits), atol=2e-4)

    def test_training_mode_with_attention_dropout(self):
        """Flash path in training mode: attention dropout runs inside the
        kernel, seeded off the flax 'dropout' rng — same rng key must give
        identical outputs, different keys different outputs."""
        cfg = tiny_config()
        enc = dataclasses.replace(cfg.retriever.encoder,
                                  attention_dropout=0.3, hidden_dropout=0.0)
        t5c = dataclasses.replace(cfg.reader.transformer,
                                  attention_dropout=0.3, hidden_dropout=0.0)
        cfgf = flash_cfg(cfg.replace(
            retriever=dataclasses.replace(cfg.retriever, encoder=enc),
            reader=dataclasses.replace(cfg.reader, transformer=t5c)))
        batch = make_batch(cfg)
        model = EMDR2Model(cfgf)
        params = model.init({"params": jax.random.PRNGKey(0)}, batch)

        def run(seed):
            return model.apply(params, batch, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(seed)})

        a, b, c = run(1), run(1), run(2)
        assert np.isfinite(np.asarray(a.lm_logits)).all()
        np.testing.assert_array_equal(np.asarray(a.lm_logits),
                                      np.asarray(b.lm_logits))
        assert np.abs(np.asarray(a.lm_logits) -
                      np.asarray(c.lm_logits)).max() > 1e-6


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
