"""emdr2_tpu — a TPU-native framework for end-to-end retrieval-augmented QA.

Rebuilt from scratch in JAX/Flax/pjit/Pallas with the capabilities of the
EMDR2 reference (DevSinghSachan/emdr2): joint training of a BERT dual-encoder
retriever and a T5 Fusion-in-Decoder reader against a sharded in-HBM MIPS
index that is refreshed online by an embedder sub-mesh.
"""

__version__ = "0.1.0"

from emdr2_tpu.config import (  # noqa: F401
    EMDR2Config,
    IndexConfig,
    MeshConfig,
    OptimizerConfig,
    ReaderConfig,
    RetrieverConfig,
    TrainConfig,
    TransformerConfig,
    bert_base,
    t5_base,
    tiny_config,
)
