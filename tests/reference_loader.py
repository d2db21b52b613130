"""Load the ACTUAL reference torch models on CPU for golden parity tests.

The reference (``/root/reference``, Megatron fork) targets CUDA + apex, but
its model math runs fine on CPU torch with a handful of environment shims —
none of which touch the numerics:

- ``torch._six`` (removed in torch>=1.13): module stub exporting ``inf``;
- ``np.float``/``np.int`` (removed in numpy>=1.24): alias the builtins;
- ``torch.cuda.current_device()`` -> ``"cpu"`` so parameter/new-tensor
  construction (``mpu/layers.py:143,225`` etc.) lands on CPU;
- ``torch.cuda.LongTensor`` -> ``torch.LongTensor`` (postprocess output,
  ``emdr2_model.py:300-303``);
- the CUDA rng tracker (``mpu/random.py:127-199``) -> a null tracker: it
  only scopes *initialization* randomness, and parity tests convert whatever
  weights the instantiation produced, so the init distribution is irrelevant;
- model-parallel world size/rank pinned to 1/0 via the mpu setters
  (``mpu/initialize.py:187-211``) — the same singleton-MP configuration the
  reference's own async path runs with (``async_indexer.py:75``). Every mpu
  collective early-returns at world size 1, so no process group is needed.

Megatron's argument globals are process-wide singletons, so ONE tiny config
(`TINY`) is parsed once and shared by every parity test in the process.
"""

from __future__ import annotations

import contextlib
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

# One tiny-but-nontrivial shape shared by all parity tests: 2 layers so
# inter-layer wiring is exercised, 4 heads so the fused-QKV head layout
# matters, asymmetric seq lengths so axes can't be silently swapped.
TINY = dict(
    num_layers=2,
    hidden_size=32,
    num_heads=4,
    kv_channels=8,
    ffn_size=128,
    max_position_embeddings=64,
    seq_reader=40,      # --seq-length   (reader query+context rows)
    seq_ret=24,         # --seq-length-ret (retriever context rows)
    seq_dec=8,          # decoder rows (dataset-determined in the reference)
    vocab_size=120,     # raw; padded to 128 by vocab_size_with_padding
    padded_vocab=128,
    topk=3,             # --topk-retrievals
)


class StubTokenizer:
    """The minimal tokenizer surface the model path touches: vocab size for
    head sizing (``emdr2_model.py:39-49``), special ids for postprocess
    (``emdr2_model.py:270-295``) and pad lookups (``dualencoder_model.py:152``)."""

    vocab_size = TINY["vocab_size"]
    pad = 0
    cls = 2
    sep = 3
    mask = 4
    eos = 5
    bos = 6


class _NullRngTracker:
    def fork(self, *a, **k):
        return contextlib.nullcontext()

    def add(self, *a, **k):
        pass

    def get_states(self):
        return {}

    def set_states(self, states):
        pass

    def reset(self):
        pass


_NS = None


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "megatron"))


def load_reference():
    """Import the reference on CPU with `TINY` args; returns a namespace of
    its model classes + the parsed args. Idempotent (globals are one-shot)."""
    global _NS
    if _NS is not None:
        return _NS

    import numpy as np
    for name, builtin in [("float", float), ("int", int), ("bool", bool)]:
        if not hasattr(np, name):
            setattr(np, name, builtin)
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.inf = float("inf")
        sys.modules["torch._six"] = six

    import torch
    torch.cuda.current_device = lambda: "cpu"
    torch.cuda.LongTensor = torch.LongTensor
    torch.cuda.FloatTensor = torch.FloatTensor
    # the search strategies call .cuda() on fresh tensors inside their
    # decode loops (search_strategy.py:138,71,84,195) — make it a no-op
    torch.Tensor.cuda = lambda self, *a, **k: self

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    t = TINY
    argv = [
        "--num-layers", str(t["num_layers"]),
        "--hidden-size", str(t["hidden_size"]),
        "--num-attention-heads", str(t["num_heads"]),
        "--kv-channels", str(t["kv_channels"]),
        "--ffn-hidden-size", str(t["ffn_size"]),
        "--max-position-embeddings", str(t["max_position_embeddings"]),
        "--seq-length", str(t["seq_reader"]),
        "--seq-length-ret", str(t["seq_ret"]),
        "--attention-dropout", "0.0",
        "--hidden-dropout", "0.0",
        "--topk-retrievals", str(t["topk"]),
        "--retriever-score-scaling",
        "--update-retriever",
        "--allow-trivial-doc",
    ]
    from megatron import global_vars
    old_argv = sys.argv
    try:
        sys.argv = ["reference_parity"] + argv
        args = global_vars._parse_args()
    finally:
        sys.argv = old_argv
    args.padded_vocab_size = t["padded_vocab"]
    global_vars._GLOBAL_TOKENIZER = StubTokenizer()
    global_vars._GLOBAL_T5_TOKENIZER = StubTokenizer()

    from megatron import mpu
    mpu.initialize.set_model_parallel_world_size(1)
    mpu.initialize.set_model_parallel_rank(0)
    from megatron.mpu import random as mpu_random
    mpu_random._CUDA_RNG_STATE_TRACKER = _NullRngTracker()

    from megatron.model import bert_model as ref_bert
    from megatron.model import emdr2_model as ref_emdr2
    from megatron.model import search_strategy as ref_search
    from megatron.model import t5_model as ref_t5
    from megatron.model import dualencoder_model as ref_dual

    _NS = types.SimpleNamespace(
        torch=torch,
        args=args,
        T5Model=ref_t5.T5Model,
        PretrainedBertModel=ref_dual.PretrainedBertModel,
        dualencoder_model_provider=ref_dual.dualencoder_model_provider,
        EMDR2Model=ref_emdr2.EMDR2Model,
        ref_postprocess=ref_emdr2.postprocess,
        emdr2_model=ref_emdr2,
        SampleOrGreedySearch=ref_search.SampleOrGreedySearch,
        BeamSearch=ref_search.BeamSearch,
        BertModel=ref_bert.BertModel,
    )
    return _NS
