"""Convert reference (Megatron/torch) checkpoints into emdr2_tpu params.

Lets users bring the published MSS-pretrained retriever/reader and EMDR2
checkpoints (``/root/reference/README.md:60-121``) into this framework.
Handles three layouts (``checkpointing.py:267-344`` drill-down keys):

- EMDR2 joint:      model = {'encoder/t5_model', 'retriever/biencoder_model'}
- T5-only:          model = {'language_model', 'lm_head'}
- dual-encoder-only: model = {'query_model', 'context_model'}

Key layout facts encoded here (verified against the reference source):
- torch Linear weights are [out, in]; our Dense kernels are [in, out];
- Megatron's fused QKV output dim is laid out [head, head_dim, qkv]
  (``transformer.py:227-236``: view to (np, hn, 3)) for checkpoint_version
  >= 1, and [qkv, head, head_dim] for version 0 (``:192-210``); our layout
  is [qkv, head, head_dim] (split then reshape);
- cross-attention fused KV similarly (np, hn, 2) (``:242-252``);
- pre-LN naming: input_layernorm -> ln_self, post_attention_layernorm ->
  ln_cross (decoder) or ln_mlp (encoder), post_inter_attention_layernorm ->
  ln_mlp (decoder), final_layernorm -> ln_final;
- EMDR2 asserts model-parallel size 1 (``dualencoder_model.py:15``), so no
  partition merging is required.

Usage:
  python -m emdr2_tpu.tools.convert_reference_checkpoint \\
      --input <reference ckpt .pt or iter dir> --output <orbax ckpt dir> \\
      [--kind auto|emdr2|t5|dualencoder]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().to("cpu").float().numpy())


def _qkv_to_ours(w: np.ndarray, num_heads: int, n_split: int,
                 version: int) -> np.ndarray:
    """Megatron fused [n_split*H, H_in] weight -> ours, still [out, in]."""
    out_dim, in_dim = w.shape
    h = out_dim // n_split
    hn = h // num_heads
    if version == 0:
        return w  # already [qkv, head, hd] outermost
    w = w.reshape(num_heads, hn, n_split, in_dim)
    w = np.transpose(w, (2, 0, 1, 3))
    return w.reshape(out_dim, in_dim)


def _qkv_bias_to_ours(b: np.ndarray, num_heads: int, n_split: int,
                      version: int) -> np.ndarray:
    if version == 0:
        return b
    h = b.shape[0] // n_split
    hn = h // num_heads
    return np.transpose(b.reshape(num_heads, hn, n_split),
                        (2, 0, 1)).reshape(-1)


def _fused_kernel(w: np.ndarray, n_split: int) -> np.ndarray:
    """[n*H, D] (ours-order outermost) -> the FusedDense [D, n, H] param."""
    out_dim, in_dim = w.shape
    return w.T.reshape(in_dim, n_split, out_dim // n_split)


def _linear(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _to_np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _to_np(sd[f"{prefix}.bias"])
    return out


def _ln(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _to_np(sd[f"{prefix}.weight"]),
            "bias": _to_np(sd[f"{prefix}.bias"])}


def convert_stack(sd: Dict, num_layers: int, num_heads: int, version: int,
                  has_cross: bool) -> Dict:
    """A ParallelTransformer state dict (flat dotted keys) -> TransformerStack."""
    out: Dict = {}
    for i in range(num_layers):
        p = f"layers.{i}"
        # the reference names the module ``self_attention``
        # (transformer.py:447); ancient Megatron dumps used ``attention``
        attn = (f"{p}.self_attention"
                if f"{p}.self_attention.query_key_value.weight" in sd
                else f"{p}.attention")
        layer: Dict = {
            "ln_self": _ln(sd, f"{p}.input_layernorm"),
            "self_attention": {
                "qkv": {
                    # FusedDense stores [D, 3, H] (head-blocked tp sharding,
                    # models/layers.py:FusedDense); flatten of the last two
                    # axes recovers the [q | k | v] slab
                    "kernel": _fused_kernel(_qkv_to_ours(
                        _to_np(sd[f"{attn}.query_key_value.weight"]),
                        num_heads, 3, version), 3),
                    "bias": _qkv_bias_to_ours(
                        _to_np(sd[f"{attn}.query_key_value.bias"]),
                        num_heads, 3, version).reshape(3, -1),
                },
                "out": _linear(sd, f"{attn}.dense"),
            },
            "mlp": {
                "wi": _linear(sd, f"{p}.mlp.dense_h_to_4h"),
                "wo": _linear(sd, f"{p}.mlp.dense_4h_to_h"),
            },
        }
        if has_cross:
            layer["ln_cross"] = _ln(sd, f"{p}.post_attention_layernorm")
            layer["ln_mlp"] = _ln(sd, f"{p}.post_inter_attention_layernorm")
            layer["cross_attention"] = {
                "query": _linear(sd, f"{p}.inter_attention.query"),
                "key_value": {
                    "kernel": _fused_kernel(_qkv_to_ours(
                        _to_np(sd[f"{p}.inter_attention.key_value.weight"]),
                        num_heads, 2, version), 2),
                    "bias": _qkv_bias_to_ours(
                        _to_np(sd[f"{p}.inter_attention.key_value.bias"]),
                        num_heads, 2, version).reshape(2, -1),
                },
                "out": _linear(sd, f"{p}.inter_attention.dense"),
            }
        else:
            layer["ln_mlp"] = _ln(sd, f"{p}.post_attention_layernorm")
        out[f"layer_{i}"] = layer
    out["ln_final"] = _ln(sd, "final_layernorm")
    return out


def _flatten_module_sd(sd) -> Dict:
    """Torch state dicts may arrive nested (from state_dict_for_save_
    checkpoint) or flat; normalize to flat dotted keys of tensors."""
    flat = {}

    def rec(prefix, node):
        if hasattr(node, "keys") and not hasattr(node, "shape"):
            for k, v in node.items():
                rec(f"{prefix}.{k}" if prefix else str(k), v)
        else:
            flat[prefix] = node

    rec("", sd)
    return flat


def convert_bert(lm_sd: Dict, num_layers: int, num_heads: int,
                 version: int) -> Dict:
    """language_model of a PretrainedBertModel -> BertEncoder params."""
    flat = _flatten_module_sd(lm_sd)
    emb = {
        "word_embeddings": _to_np(flat["embedding.word_embeddings.weight"]),
        "position_embeddings": _to_np(
            flat["embedding.position_embeddings.weight"]),
    }
    if "embedding.tokentype_embeddings.weight" in flat:
        emb["tokentype_embeddings"] = _to_np(
            flat["embedding.tokentype_embeddings.weight"])
    enc_sd = {k[len("encoder."):]: v for k, v in flat.items()
              if k.startswith("encoder.")}
    return {"embeddings": emb,
            "encoder": convert_stack(enc_sd, num_layers, num_heads, version,
                                     has_cross=False)}


def convert_bert_pretrain(model_sd: Dict, num_layers: int, num_heads: int,
                          version: int) -> Dict:
    """Full ``BertModel`` pretraining checkpoint -> ``BertPretrainModel``
    params: the language_model trunk plus the masked-LM head (dense -> gelu
    -> LayerNorm -> tied projection + vocab bias) and, when present, the
    tanh pooler + binary NSP head (``bert_model.py:61-201``)."""
    flat = _flatten_module_sd(model_sd)
    out = {
        "bert": convert_bert(model_sd["language_model"], num_layers,
                             num_heads, version),
        "lm_dense": _linear(flat, "lm_head.dense"),
        "lm_layernorm": _ln(flat, "lm_head.layernorm"),
        "lm_bias": _to_np(flat["lm_head.bias"]),
    }
    if "binary_head.weight" in flat:
        out["pooler"] = _linear(flat, "language_model.pooler.dense")
        out["binary_head"] = _linear(flat, "binary_head")
    return out


def convert_t5(t5_sd: Dict, num_layers: int, num_heads: int,
               version: int) -> Dict:
    flat = _flatten_module_sd(t5_sd)
    lm = {k[len("language_model."):]: v for k, v in flat.items()
          if k.startswith("language_model.")}
    emb = {
        "word_embeddings": _to_np(lm["embedding.word_embeddings.weight"]),
        "position_embeddings": _to_np(
            lm["embedding.position_embeddings.weight"]),
    }
    enc_sd = {k[len("encoder."):]: v for k, v in lm.items()
              if k.startswith("encoder.")}
    dec_sd = {k[len("decoder."):]: v for k, v in lm.items()
              if k.startswith("decoder.")}
    return {
        "shared_embeddings": emb,
        "encoder": convert_stack(enc_sd, num_layers, num_heads, version,
                                 has_cross=False),
        "decoder": convert_stack(dec_sd, num_layers, num_heads, version,
                                 has_cross=True),
        "lm_bias": _to_np(flat["lm_head.bias"]),
    }


def convert_dualencoder(de_sd: Dict, num_layers: int, num_heads: int,
                        version: int) -> Dict:
    flat_q = de_sd["query_model"]["language_model"]
    flat_c = de_sd["context_model"]["language_model"]
    return {"query_model": convert_bert(flat_q, num_layers, num_heads, version),
            "context_model": convert_bert(flat_c, num_layers, num_heads,
                                          version)}


def convert_single_bert_to_dual(bert_lm_sd: Dict, num_layers: int,
                                num_heads: int, version: int) -> Dict:
    """Clone one BERT trunk into both retriever towers — the reference's
    ``init_state_dict_from_bert`` path (dualencoder_model.py:111-143), used
    when starting DPR pretraining from a plain BERT checkpoint."""
    import copy
    tower = convert_bert(bert_lm_sd, num_layers, num_heads, version)
    return {"query_model": tower, "context_model": copy.deepcopy(tower)}


def convert_checkpoint(ckpt: Dict, kind: str = "auto",
                       num_layers: int = 12, num_heads: int = 12) -> Dict:
    """Reference torch checkpoint dict -> {"retriever": ..., "reader": ...}
    (whichever halves are present)."""
    model = ckpt.get("model", ckpt)
    # NOTE: version 0 is a real value — `ckpt.get(...) or 3` would coerce it
    # to 3 and misconvert every v0 QKV slab (caught by
    # tests/test_reference_parity.py::test_t5_checkpoint_version0_layout)
    version = ckpt.get("checkpoint_version", None)
    version = 3 if version is None else int(version)
    if kind == "auto":
        if "encoder/t5_model" in model or "retriever/biencoder_model" in model:
            kind = "emdr2"
        elif "query_model" in model or "context_model" in model:
            kind = "dualencoder"
        elif "language_model" in model:
            # T5 checkpoints have a decoder inside the language model;
            # plain BERT checkpoints don't
            kind = ("t5" if "decoder" in model["language_model"] else "bert")
        else:
            kind = "bert"
    out: Dict = {}
    if kind == "bert":
        # a single BertModel checkpoint: clone the trunk into both towers
        lm = model.get("language_model", model)
        out["retriever"] = convert_single_bert_to_dual(
            lm, num_layers, num_heads, version)
        return out
    if kind == "emdr2":
        if "encoder/t5_model" in model:
            out["reader"] = convert_t5(model["encoder/t5_model"],
                                       num_layers, num_heads, version)
        if "retriever/biencoder_model" in model:
            out["retriever"] = convert_dualencoder(
                model["retriever/biencoder_model"], num_layers, num_heads,
                version)
    elif kind == "t5":
        out["reader"] = convert_t5(model, num_layers, num_heads, version)
    else:
        out["retriever"] = convert_dualencoder(model, num_layers, num_heads,
                                               version)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help=".pt file or reference iter_*/mp_rank_00 dir")
    p.add_argument("--output", required=True, help="orbax checkpoint root")
    p.add_argument("--kind", default="auto",
                   choices=["auto", "emdr2", "t5", "dualencoder", "bert"])
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--num-attention-heads", type=int, default=12)
    args = p.parse_args(argv)

    import torch
    path = args.input
    if os.path.isdir(path):
        for cand in ("model_optim_rng.pt", "mp_rank_00/model_optim_rng.pt"):
            full = os.path.join(path, cand)
            if os.path.exists(full):
                path = full
                break
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params = convert_checkpoint(ckpt, args.kind, args.num_layers,
                                args.num_attention_heads)
    iteration = int(ckpt.get("iteration", 0))

    import orbax.checkpoint as ocp
    from emdr2_tpu.training import checkpointing as ck
    os.makedirs(args.output, exist_ok=True)
    out_path = ck.iter_dir(os.path.abspath(args.output), iteration)
    with ocp.PyTreeCheckpointer() as c:
        c.save(out_path, {"params": params, "step": np.int32(iteration)},
               force=True)
    with open(os.path.join(args.output, ck.TRACKER), "w") as f:
        f.write(str(iteration))
    print(f"converted {args.input} ({list(params)}) -> {out_path}")


if __name__ == "__main__":
    main()
