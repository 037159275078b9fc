"""Weight-converter roundtrip: build a torch-style state dict from a flax
tree via the inverse naming/transpose rules, convert it back, and require
every leaf to be placed and bit-equal. Validates the diffusers-name mapping
on the full (tiny) UNet/VAE/text topologies."""
import os
import re

import numpy as np
import jax
import pytest

from gbnerf_tpu.guidance import (AutoencoderKL, CLIPTextConfig,
                                 CLIPTextEncoder, UNet2DCondition, UNetConfig,
                                 VAEConfig)
from gbnerf_tpu.guidance.weights import (_TEXT_RULES, _UNET_RULES, _VAE_RULES,
                                         convert_state_dict)

# Heavyweight module (SD stacks / SPMD compiles / training loops):
# deselected from the default fast run (pytest.ini); run with -m slow.
pytestmark = pytest.mark.slow

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


def test_prior_ckpt_roundtrip(tmp_path):
    """save_prior_ckpt/load_prior_ckpt: a trained tiny prior restores over a
    DIFFERENT-seed fresh stack bit-exactly (params AND prompt embeds — the
    embeds ship in the ckpt so the consumer need not match the trainer's
    text-tower seed). Consumed by guidance.sd_prior_ckpt (train/loop.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gbnerf_tpu.config import GuidanceConfig
    from gbnerf_tpu.guidance.stable import build_sd_modules
    from gbnerf_tpu.guidance.text import CLIPTextConfig
    from gbnerf_tpu.guidance.unet import UNetConfig
    from gbnerf_tpu.guidance.vae import VAEConfig
    from gbnerf_tpu.guidance.weights import load_prior_ckpt, save_prior_ckpt

    kw = dict(unet_config=UNetConfig.tiny(), vae_config=VAEConfig.tiny(),
              text_config=CLIPTextConfig(vocab_size=64, width=16, layers=1,
                                         heads=2),
              latent_size=64, dtype=jnp.float32)
    gcfg = GuidanceConfig(prompt="sphere")
    m1 = build_sd_modules(gcfg, jax.random.PRNGKey(0), **kw)
    p = str(tmp_path / "prior.msgpack")
    save_prior_ckpt(p, m1)

    m2 = build_sd_modules(gcfg, jax.random.PRNGKey(7), **kw)
    # different init seed → different params (some leaves are zero-init
    # biases identical across seeds; any kernel leaf must differ)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(m1.unet_params),
                        jax.tree_util.tree_leaves(m2.unet_params)))

    m2 = load_prior_ckpt(p, m2)
    # regression: from_bytes yields numpy leaves; as jit args those
    # re-upload host→device every step (185 → 1.7 it/s measured through
    # the tunnel) — the loader must commit them to device arrays.
    assert all(isinstance(x, jax.Array) for x in
               jax.tree_util.tree_leaves(m2.unet_params))
    for a, b in zip(jax.tree_util.tree_leaves(m1.unet_params),
                    jax.tree_util.tree_leaves(m2.unet_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(m1.embeds_rgb),
                                  np.asarray(m2.embeds_rgb))
    np.testing.assert_array_equal(np.asarray(m1.embeds_normal),
                                  np.asarray(m2.embeds_normal))


def _tiny_stack():
    import jax
    import jax.numpy as jnp

    from gbnerf_tpu.config import GuidanceConfig
    from gbnerf_tpu.guidance.stable import build_sd_modules
    from gbnerf_tpu.guidance.text import CLIPTextConfig
    from gbnerf_tpu.guidance.unet import UNetConfig
    from gbnerf_tpu.guidance.vae import VAEConfig

    return build_sd_modules(
        GuidanceConfig(prompt="sphere"), jax.random.PRNGKey(0),
        unet_config=UNetConfig.tiny(), vae_config=VAEConfig.tiny(),
        text_config=CLIPTextConfig(vocab_size=49408, width=32, layers=2,
                                   heads=2),
        latent_size=64, dtype=jnp.float32)


@pytest.mark.parametrize("legacy_attn", [False, True])
def test_fake_diffusers_ckpt_full_coverage(tmp_path, legacy_attn):
    """The weights on-ramp proof (VERDICT r1 #5): a synthesized diffusers
    checkpoint with the REAL torch key scheme (tools/make_fake_sd_ckpt.py,
    derived from the diffusers naming rules — NOT from our flax trees)
    converts with ZERO unmatched keys, covers EVERY flax leaf, and the
    loaded stack runs a sane forward. legacy_attn exercises the original
    SD1.x VAE query/key/value attention names the runwayml ckpt ships."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gbnerf_tpu.guidance.weights import (convert_state_dict, count_leaves,
                                             load_sd_weights, _UNET_RULES)
    from tools.make_fake_sd_ckpt import save_ckpt

    d = str(tmp_path / "fake_sd")
    save_ckpt(d, tiny=True, legacy_attn=legacy_attn)

    mods = _tiny_stack()
    # reach the text params: rebuild them the way build_sd_modules does
    from gbnerf_tpu.guidance.text import CLIPTextConfig, CLIPTextEncoder

    tcfg = CLIPTextConfig(vocab_size=49408, width=32, layers=2, heads=2)
    text_model = CLIPTextEncoder(tcfg, dtype=jnp.float32)
    text_params = jax.jit(text_model.init)(
        jax.random.PRNGKey(2), jnp.zeros((1, 77), jnp.int32))["params"]

    up, vp, tp = load_sd_weights(d, mods.unet_params, mods.vae_params,
                                 text_params, strict=True)

    # full coverage: every flax leaf received a torch tensor
    for loaded, init in ((up, mods.unet_params), (vp, mods.vae_params),
                         (tp, text_params)):
        assert count_leaves(loaded) == count_leaves(init)
        changed = sum(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(loaded),
                            jax.tree_util.tree_leaves(init)))
        assert changed == count_leaves(init), \
            f"{count_leaves(init) - changed} leaves untouched by the ckpt"

    # sanity forward through the loaded UNet + VAE
    lat = mods.vae.apply({"params": vp}, jnp.ones((1, 64, 64, 3)) * 0.5,
                         method="encode")
    assert np.isfinite(np.asarray(lat)).all()
    x = jnp.zeros((1, 8, 8, 9))
    emb = jnp.zeros((1, 77, 32))
    out = mods.unet.apply({"params": up}, x, jnp.asarray(10), emb)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_fake_peft_lora_merges(tmp_path):
    """A synthesized PEFT-style LoRA safetensors dict merges into the torch
    base dict: W ← W + (α/r)·B@A on the targeted projections
    (reference train_dreambooth...py:631-652 trains rank 32 → scale 1)."""
    import numpy as np

    from safetensors.numpy import save_file

    from gbnerf_tpu.guidance.weights import merge_lora_state_dict

    rng = np.random.default_rng(0)
    base = {
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight":
            rng.normal(0, 0.02, (32, 32)).astype(np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_k.weight":
            rng.normal(0, 0.02, (32, 32)).astype(np.float32),
    }
    r = 4
    lora = {}
    for key in base:
        stem = key[: -len(".weight")]
        lora[f"base_model.model.{stem}.lora_A.weight"] = \
            rng.normal(0, 0.1, (r, 32)).astype(np.float32)
        lora[f"base_model.model.{stem}.lora_B.weight"] = \
            rng.normal(0, 0.1, (32, r)).astype(np.float32)
    d = tmp_path / "lora"
    d.mkdir()
    save_file(lora, str(d / "adapter_model.safetensors"))

    merged = merge_lora_state_dict(base, str(d), rank=r)
    for key in base:
        stem = key[: -len(".weight")]
        A = lora[f"base_model.model.{stem}.lora_A.weight"]
        B = lora[f"base_model.model.{stem}.lora_B.weight"]
        np.testing.assert_allclose(merged[key], base[key] + B @ A,
                                   rtol=1e-5, atol=1e-6)


def test_check_weights_cli(tmp_path):
    """tools/check_weights.py — the real-weights first-contact command
    (VERDICT r2 #4) — passes end to end against the full-key fake
    checkpoint (+ fake VGG npz), and fails loudly on a broken dir."""
    import subprocess
    import sys

    import numpy as np

    from tools.convert_vgg import TORCH_CONV_IDX, convert
    from tools.make_fake_sd_ckpt import save_ckpt

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = str(tmp_path / "fake_sd")
    save_ckpt(d, tiny=True)

    rng = np.random.default_rng(0)
    cfg = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
    vgg_sd, cin = {}, 3
    for idx, cout in zip(TORCH_CONV_IDX, cfg):
        vgg_sd[f"features.{idx}.weight"] = \
            rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
        vgg_sd[f"features.{idx}.bias"] = np.zeros(cout, np.float32)
        cin = cout
    vgg_npz = str(tmp_path / "vgg.npz")
    np.savez(vgg_npz, **convert(vgg_sd, None))  # no lin heads → uniform

    cmd = [sys.executable, os.path.join(root, "tools", "check_weights.py"),
           d, "--tiny", "--allow_hash_tokenizer", "--cpu",
           "--vgg", vgg_npz]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=root)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PASS:" in r.stdout, r.stdout

    # negative arm: missing vae/ subdir → loud failure, nonzero exit
    import shutil

    shutil.rmtree(os.path.join(d, "vae"))
    # keep --cpu: conftest's CPU forcing does not reach subprocesses, and
    # without it the model inits dispatch to the tunneled TPU
    cmd_neg = [c for c in cmd if c not in ("--vgg", vgg_npz)]
    r2 = subprocess.run(cmd_neg, capture_output=True, text=True, cwd=root)
    assert r2.returncode != 0
    assert "CHECK FAILED" in r2.stdout, r2.stdout + r2.stderr
