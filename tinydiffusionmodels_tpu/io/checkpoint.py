"""Pytree <-> torch state_dict name/layout mapping for every model.

Checkpoint compatibility contract (SURVEY.md §2.3): a user must be able to
take a ``.pth`` written by the reference and load it here, and vice versa.
torch layouts differ from ours:

- conv kernels: torch OIHW <-> ours HWIO,
- linear weights: torch (out, in) <-> ours (in, out),
- fused qkv: torch ``self_attn.in_proj_weight`` is (3d, d).

torch state_dict names follow the reference modules: SimpleUNet
(src/mnist.py:64-74), TinyTransformer = ``encoder.layers.N.*`` + ``time_emb``
(src/shakespeare.py:105-113), LearnedEmbedding = ``embeddings.weight``
(src/shakespeare.py:54), LearnedRounding = ``decoder.*``
(src/shakespeare.py:91).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

import jax.numpy as jnp
import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _conv_to_torch(w) -> np.ndarray:  # HWIO -> OIHW
    return _np(w).transpose(3, 2, 0, 1)


def _conv_from_torch(w) -> jnp.ndarray:  # OIHW -> HWIO
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


# ---------------------------------------------------------------------------
# SimpleUNet
# ---------------------------------------------------------------------------

_UNET_BLOCKS = ("rb1", "rb2", "rb3", "rb4")


def unet_to_state_dict(params: dict) -> "OrderedDict[str, np.ndarray]":
    sd: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for name in _UNET_BLOCKS:
        p = params[name]
        sd[f"{name}.conv1.weight"] = _conv_to_torch(p["conv1"]["w"])
        sd[f"{name}.conv1.bias"] = _np(p["conv1"]["b"])
        sd[f"{name}.conv2.weight"] = _conv_to_torch(p["conv2"]["w"])
        sd[f"{name}.conv2.bias"] = _np(p["conv2"]["b"])
        sd[f"{name}.time_emb.weight"] = _np(p["time_emb"]["w"]).T
        sd[f"{name}.time_emb.bias"] = _np(p["time_emb"]["b"])
        if p.get("skip") is not None:
            sd[f"{name}.skip.weight"] = _conv_to_torch(p["skip"]["w"])
            sd[f"{name}.skip.bias"] = _np(p["skip"]["b"])
    sd["out.weight"] = _conv_to_torch(params["out"]["w"])
    sd["out.bias"] = _np(params["out"]["b"])
    return sd


def unet_from_state_dict(sd: dict) -> dict:
    params: dict = {}
    for name in _UNET_BLOCKS:
        p = {
            "conv1": {
                "w": _conv_from_torch(sd[f"{name}.conv1.weight"]),
                "b": jnp.asarray(_np(sd[f"{name}.conv1.bias"])),
            },
            "conv2": {
                "w": _conv_from_torch(sd[f"{name}.conv2.weight"]),
                "b": jnp.asarray(_np(sd[f"{name}.conv2.bias"])),
            },
            "time_emb": {
                "w": jnp.asarray(_np(sd[f"{name}.time_emb.weight"]).T),
                "b": jnp.asarray(_np(sd[f"{name}.time_emb.bias"])),
            },
            "skip": None,
        }
        if f"{name}.skip.weight" in sd:
            p["skip"] = {
                "w": _conv_from_torch(sd[f"{name}.skip.weight"]),
                "b": jnp.asarray(_np(sd[f"{name}.skip.bias"])),
            }
        params[name] = p
    params["out"] = {
        "w": _conv_from_torch(sd["out.weight"]),
        "b": jnp.asarray(_np(sd["out.bias"])),
    }
    return params


# ---------------------------------------------------------------------------
# TinyTransformer
# ---------------------------------------------------------------------------

def transformer_to_state_dict(params: dict) -> "OrderedDict[str, np.ndarray]":
    sd: "OrderedDict[str, np.ndarray]" = OrderedDict()
    sd["time_emb.weight"] = _np(params["time_emb"]["w"]).T
    sd["time_emb.bias"] = _np(params["time_emb"]["b"])
    if "pos_emb" in params:
        # torch nn.Embedding layout: (max_len, dim), no transpose.
        sd["pos_emb.weight"] = _np(params["pos_emb"])
    if "selfcond_proj" in params:
        # Framework extension (self-conditioning); torch-style names so the
        # checkpoint stays loadable as a plain state_dict.
        sd["selfcond_proj.weight"] = _np(params["selfcond_proj"]["w"]).T
        sd["selfcond_proj.bias"] = _np(params["selfcond_proj"]["b"])
    for i, layer in enumerate(params["layers"]):
        pre = f"encoder.layers.{i}"
        attn = layer["self_attn"]
        sd[f"{pre}.self_attn.in_proj_weight"] = _np(attn["in_proj"]["w"]).T
        sd[f"{pre}.self_attn.in_proj_bias"] = _np(attn["in_proj"]["b"])
        sd[f"{pre}.self_attn.out_proj.weight"] = _np(attn["out_proj"]["w"]).T
        sd[f"{pre}.self_attn.out_proj.bias"] = _np(attn["out_proj"]["b"])
        sd[f"{pre}.linear1.weight"] = _np(layer["linear1"]["w"]).T
        sd[f"{pre}.linear1.bias"] = _np(layer["linear1"]["b"])
        sd[f"{pre}.linear2.weight"] = _np(layer["linear2"]["w"]).T
        sd[f"{pre}.linear2.bias"] = _np(layer["linear2"]["b"])
        sd[f"{pre}.norm1.weight"] = _np(layer["norm1"]["scale"])
        sd[f"{pre}.norm1.bias"] = _np(layer["norm1"]["bias"])
        sd[f"{pre}.norm2.weight"] = _np(layer["norm2"]["scale"])
        sd[f"{pre}.norm2.bias"] = _np(layer["norm2"]["bias"])
    return sd


def transformer_from_state_dict(sd: dict) -> dict:
    depth = 0
    while f"encoder.layers.{depth}.self_attn.in_proj_weight" in sd:
        depth += 1
    if depth == 0:
        raise ValueError("no encoder layers found in state_dict")
    layers = []
    for i in range(depth):
        pre = f"encoder.layers.{i}"
        layers.append(
            {
                "self_attn": {
                    "in_proj": {
                        "w": jnp.asarray(
                            _np(sd[f"{pre}.self_attn.in_proj_weight"]).T
                        ),
                        "b": jnp.asarray(_np(sd[f"{pre}.self_attn.in_proj_bias"])),
                    },
                    "out_proj": {
                        "w": jnp.asarray(
                            _np(sd[f"{pre}.self_attn.out_proj.weight"]).T
                        ),
                        "b": jnp.asarray(
                            _np(sd[f"{pre}.self_attn.out_proj.bias"])
                        ),
                    },
                },
                "linear1": {
                    "w": jnp.asarray(_np(sd[f"{pre}.linear1.weight"]).T),
                    "b": jnp.asarray(_np(sd[f"{pre}.linear1.bias"])),
                },
                "linear2": {
                    "w": jnp.asarray(_np(sd[f"{pre}.linear2.weight"]).T),
                    "b": jnp.asarray(_np(sd[f"{pre}.linear2.bias"])),
                },
                "norm1": {
                    "scale": jnp.asarray(_np(sd[f"{pre}.norm1.weight"])),
                    "bias": jnp.asarray(_np(sd[f"{pre}.norm1.bias"])),
                },
                "norm2": {
                    "scale": jnp.asarray(_np(sd[f"{pre}.norm2.weight"])),
                    "bias": jnp.asarray(_np(sd[f"{pre}.norm2.bias"])),
                },
            }
        )
    params = {
        "time_emb": {
            "w": jnp.asarray(_np(sd["time_emb.weight"]).T),
            "b": jnp.asarray(_np(sd["time_emb.bias"])),
        },
        "layers": tuple(layers),
    }
    if "pos_emb.weight" in sd:
        params["pos_emb"] = jnp.asarray(_np(sd["pos_emb.weight"]))
    if "selfcond_proj.weight" in sd:
        params["selfcond_proj"] = {
            "w": jnp.asarray(_np(sd["selfcond_proj.weight"]).T),
            "b": jnp.asarray(_np(sd["selfcond_proj.bias"])),
        }
    return params


# ---------------------------------------------------------------------------
# LearnedEmbedding / LearnedRounding
# ---------------------------------------------------------------------------

def embedding_to_state_dict(params: dict) -> "OrderedDict[str, np.ndarray]":
    return OrderedDict([("embeddings.weight", _np(params["weight"]))])


def embedding_from_state_dict(sd: dict) -> dict:
    return {"weight": jnp.asarray(_np(sd["embeddings.weight"]))}


def rounding_to_state_dict(params: dict) -> "OrderedDict[str, np.ndarray]":
    return OrderedDict(
        [
            ("decoder.weight", _np(params["decoder"]["w"]).T),
            ("decoder.bias", _np(params["decoder"]["b"])),
        ]
    )


def rounding_from_state_dict(sd: dict) -> dict:
    return {
        "decoder": {
            "w": jnp.asarray(_np(sd["decoder.weight"]).T),
            "b": jnp.asarray(_np(sd["decoder.bias"])),
        }
    }


# ---------------------------------------------------------------------------
# Generic pytrees (optimizer state, TinyGPT, train-state resume)
# ---------------------------------------------------------------------------

def tree_to_numpy(tree: Any) -> Any:
    """Recursively convert jax arrays to numpy (codec-ready)."""
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def tree_to_jax(tree: Any) -> Any:
    import jax

    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree
    )
