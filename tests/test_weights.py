"""Weight-converter roundtrip: build a torch-style state dict from a flax
tree via the inverse naming/transpose rules, convert it back, and require
every leaf to be placed and bit-equal. Validates the diffusers-name mapping
on the full (tiny) UNet/VAE/text topologies."""
import re

import numpy as np
import jax
import pytest

from gbnerf_tpu.guidance import (AutoencoderKL, CLIPTextConfig,
                                 CLIPTextEncoder, UNet2DCondition, UNetConfig,
                                 VAEConfig)
from gbnerf_tpu.guidance.weights import (_TEXT_RULES, _UNET_RULES, _VAE_RULES,
                                         convert_state_dict)

_INV = [
    (r"down_(\d+)_resnets_(\d+)", r"down_blocks.\1.resnets.\2"),
    (r"down_(\d+)_attentions_(\d+)", r"down_blocks.\1.attentions.\2"),
    (r"down_(\d+)_downsamplers_0", r"down_blocks.\1.downsamplers.0"),
    (r"up_(\d+)_resnets_(\d+)", r"up_blocks.\1.resnets.\2"),
    (r"up_(\d+)_attentions_(\d+)", r"up_blocks.\1.attentions.\2"),
    (r"up_(\d+)_upsamplers_0", r"up_blocks.\1.upsamplers.0"),
    (r"mid_resnets_(\d+)", r"mid_block.resnets.\1"),
    (r"mid_attentions_(\d+)", r"mid_block.attentions.\1"),
    (r"transformer_blocks_(\d+)", r"transformer_blocks.\1"),
    (r"to_out_0", r"to_out.0"),
    (r"ff\.net_0", r"ff.net.0"),
    (r"ff\.net_2", r"ff.net.2"),
]

_INV_VAE = [
    (r"(en|de)coder\.down_(\d+)_resnets_(\d+)", r"\1coder.down_blocks.\2.resnets.\3"),
    (r"(en|de)coder\.down_(\d+)_downsamplers_0", r"\1coder.down_blocks.\2.downsamplers.0"),
    (r"(en|de)coder\.up_(\d+)_resnets_(\d+)", r"\1coder.up_blocks.\2.resnets.\3"),
    (r"(en|de)coder\.up_(\d+)_upsamplers_0", r"\1coder.up_blocks.\2.upsamplers.0"),
    (r"(en|de)coder\.mid_resnets_(\d+)", r"\1coder.mid_block.resnets.\2"),
    (r"(en|de)coder\.mid_attentions_0", r"\1coder.mid_block.attentions.0"),
    (r"to_out_0", r"to_out.0"),
]

_INV_TEXT = [
    (r"^token_embedding\.embedding$", r"text_model.embeddings.token_embedding.weight"),
    (r"^position_embedding$", r"text_model.embeddings.position_embedding.weight"),
    (r"^layers_(\d+)\.(q_proj|k_proj|v_proj|out_proj)",
     r"text_model.encoder.layers.\1.self_attn.\2"),
    (r"^layers_(\d+)\.(fc1|fc2)", r"text_model.encoder.layers.\1.mlp.\2"),
    (r"^layers_(\d+)\.(layer_norm1|layer_norm2)",
     r"text_model.encoder.layers.\1.\2"),
    (r"^final_layer_norm", r"text_model.final_layer_norm"),
]


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def to_torch_sd(params, inv_rules):
    """Inverse of convert_state_dict for testing."""
    sd = {}
    for path, val in flatten(params).items():
        flax_key = ".".join(path)
        leaf = path[-1]
        name = ".".join(path[:-1])
        if flax_key == "position_embedding":
            tkey, tval = flax_key, val
        elif leaf == "embedding":
            tkey, tval = name + ".weight", val
        elif leaf == "kernel":
            if val.ndim == 4:
                tkey, tval = name + ".weight", val.transpose(3, 2, 0, 1)
            else:
                tkey, tval = name + ".weight", val.T
        elif leaf == "scale":
            tkey, tval = name + ".weight", val
        else:
            tkey, tval = name + "." + leaf, val
        for pat, rep in inv_rules:
            tkey = re.sub(pat, rep, tkey)
        sd[tkey] = tval + 1.0  # shift so conversion provably overwrites
    return sd


def assert_roundtrip(params, torch_sd, rules, embed_keys=()):
    out, converted, unmatched = convert_state_dict(torch_sd, params, rules,
                                                   embed_keys=embed_keys)
    assert not unmatched, f"unmatched keys: {unmatched[:8]}"
    flat_in, flat_out = flatten(params), flatten(out)
    assert len(converted) == len(flat_in)
    for path, val in flat_in.items():
        np.testing.assert_allclose(flat_out[path], val + 1.0, atol=1e-6,
                                   err_msg="/".join(path))


def test_unet_converter_roundtrip(key):
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    params = unet.init(key, np.zeros((1, 16, 16, 9), np.float32), 0.0,
                       np.zeros((1, 7, cfg.cross_attention_dim),
                                np.float32))["params"]
    assert_roundtrip(params, to_torch_sd(params, _INV), _UNET_RULES)


def test_vae_converter_roundtrip(key):
    vae = AutoencoderKL(VAEConfig.tiny())
    params = vae.init(key, np.zeros((1, 32, 32, 3), np.float32))["params"]
    assert_roundtrip(params, to_torch_sd(params, _INV_VAE), _VAE_RULES)


def test_text_converter_roundtrip(key):
    cfg = CLIPTextConfig.tiny()
    enc = CLIPTextEncoder(cfg)
    params = enc.init(key, np.zeros((1, 77), np.int32))["params"]
    assert_roundtrip(params, to_torch_sd(params, _INV_TEXT), _TEXT_RULES,
                     embed_keys=("token_embedding", "position_embedding"))
