"""Parameter / activation PartitionSpecs for WavLM & heads (DP + optional TP).

TP layout for the stacked-layer WavLM pytree (leading axis = layer, scanned):
attention q/k/v and ffn-in shard their OUTPUT feature dim over the model
axis; out-proj and ffn-out shard their INPUT (contracting) dim, so the
all-reduce lands once per block — the Megatron layout, expressed purely as
NamedSharding annotations and compiled to ICI collectives by GSPMD.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from stutter_tpu.parallel.mesh import MODEL_AXIS, MeshPlan


def wavlm_param_spec(plan: MeshPlan) -> dict:
    """PartitionSpec pytree matching init_wavlm_params/convert output."""
    m = MODEL_AXIS if plan.model_size > 1 else None
    rep = P()
    layer_spec = {
        # [L, D, D]: column-parallel qkv, row-parallel out
        "q_w": P(None, None, m), "q_b": P(None, m),
        "k_w": P(None, None, m), "k_b": P(None, m),
        "v_w": P(None, None, m), "v_b": P(None, m),
        "o_w": P(None, m, None), "o_b": rep,
        "gru_w": rep, "gru_b": rep, "gru_const": rep,
        # [L, D, F] / [L, F, D]
        "ff_w1": P(None, None, m), "ff_b1": P(None, m),
        "ff_w2": P(None, m, None), "ff_b2": rep,
        "ln1_s": rep, "ln1_b": rep, "ln2_s": rep, "ln2_b": rep,
    }
    return {
        "feature_encoder": {"conv_layers": [
            {"w": rep, "b": rep, "norm": {"scale": rep, "bias": rep}}
        ]},
        "feature_projection": {"ln": {"scale": rep, "bias": rep}, "w": rep, "b": rep},
        "encoder": {
            "pos_conv": {"w": rep, "b": rep},
            "ln": {"scale": rep, "bias": rep},
            "rel_attn_embed": rep,
            "layers": layer_spec,
        },
    }


def whisper_param_spec(plan: MeshPlan) -> dict:
    """PartitionSpec pytree matching init_whisper_params/convert output.

    Same Megatron layout as WavLM: q/k/v and fc1 column-parallel, o and fc2
    row-parallel, one all-reduce per attention/ffn block; stems, norms,
    embeddings replicated. Head count must divide the model-axis size
    (whisper-large: 20 heads -> tp in {1, 2, 4, 5, 10, 20}).
    """
    m = MODEL_AXIS if plan.model_size > 1 else None
    rep = P()

    def attn(prefix):
        return {
            f"{prefix}_q_w": P(None, None, m), f"{prefix}_q_b": P(None, m),
            f"{prefix}_k_w": P(None, None, m),
            f"{prefix}_v_w": P(None, None, m), f"{prefix}_v_b": P(None, m),
            f"{prefix}_o_w": P(None, m, None), f"{prefix}_o_b": rep,
        }

    def ffn_ln(extra_ln: bool):
        spec = {
            "fc1_w": P(None, None, m), "fc1_b": P(None, m),
            "fc2_w": P(None, m, None), "fc2_b": rep,
            "ln1_s": rep, "ln1_b": rep, "ln2_s": rep, "ln2_b": rep,
        }
        if extra_ln:
            spec.update({"ln3_s": rep, "ln3_b": rep})
        return spec

    return {
        "encoder": {
            "conv1_w": rep, "conv1_b": rep, "conv2_w": rep, "conv2_b": rep,
            "pos_embed": rep, "ln_s": rep, "ln_b": rep,
            "layers": {**attn("attn"), **ffn_ln(False)},
        },
        "decoder": {
            "embed_tokens": rep, "pos_embed": rep, "ln_s": rep, "ln_b": rep,
            "layers": {**attn("attn"), **attn("xattn"), **ffn_ln(True)},
        },
    }


def shard_params(plan: MeshPlan, params, spec_tree) -> dict:
    """device_put a param pytree with per-leaf NamedShardings.

    spec_tree may be a partial prefix (e.g. conv_layers listed once); leaves
    without a matching spec are replicated.
    """

    def place(path, leaf):
        spec = _lookup(spec_tree, path)
        return jax.device_put(leaf, NamedSharding(plan.mesh, spec))

    return _tree_map_with_path(place, params)


def _lookup(spec_tree, path):
    node = spec_tree
    for i, key in enumerate(path):
        if isinstance(node, P):
            # int8 turbo weights are {"q": int8 [..., K, N], "s": f32
            # [..., N]} (ops/quant.py); the spec tree names the WEIGHT, so
            # derive: q inherits the weight's spec (same rank/layout), s
            # keeps the layer + output axes (drop the contracting dim) —
            # column-parallel scales shard with their channels, row-parallel
            # scales replicate.
            rest = path[i:]
            if rest == ("q",):
                return node
            if rest == ("s",) and len(node) == 3:
                return P(node[0], node[2])
            return P()
        if isinstance(node, dict) and key in node:
            node = node[key]
        elif isinstance(node, list):
            node = node[0] if node else P()
        else:
            return P()
        if node is None:
            return P()
    return node if isinstance(node, P) else P()


def _tree_map_with_path(fn, tree, path=()):
    if isinstance(tree, dict):
        return {k: _tree_map_with_path(fn, v, path + (k,)) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_tree_map_with_path(fn, v, path + (i,)) for i, v in enumerate(tree)]
    if tree is None:
        return None
    return fn(path, tree)
