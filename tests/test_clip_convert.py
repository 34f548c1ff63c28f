"""CLIP checkpoint conversion: synthetic OpenAI-layout state_dicts convert
into param trees that the flax towers accept and run (key-mapping coverage —
a downsample-index bug previously survived because nothing exercised this)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hulc_tpu.models.clip import (
    CLIPTextTransformer,
    CLIPVisionTransformer,
    ModifiedResNet,
    convert_openai_clip,
)


def _rn(shape):
    return np.random.default_rng(abs(hash(shape)) % 2**31).normal(0, 0.02, shape).astype(np.float32)


def synth_rn50_state_dict(width=8, embed_dim=32, heads=4, t_width=16, t_layers=2, vocab=64, ctx=8):
    """Minimal OpenAI-CLIP-shaped state_dict (RN50 visual + text)."""
    sd = {}

    def conv(p, cout, cin, k):
        sd[f"{p}.weight"] = _rn((cout, cin, k, k))

    def bn(p, c):
        for suffix, val in [("weight", np.ones(c)), ("bias", np.zeros(c)),
                            ("running_mean", np.zeros(c)), ("running_var", np.ones(c))]:
            sd[f"{p}.{suffix}"] = val.astype(np.float32)

    def linear(p, o, i):
        sd[f"{p}.weight"] = _rn((o, i))
        sd[f"{p}.bias"] = np.zeros(o, np.float32)

    def ln(p, d):
        sd[f"{p}.weight"] = np.ones(d, np.float32)
        sd[f"{p}.bias"] = np.zeros(d, np.float32)

    # visual stem
    conv("visual.conv1", width // 2, 3, 3); bn("visual.bn1", width // 2)
    conv("visual.conv2", width // 2, width // 2, 3); bn("visual.bn2", width // 2)
    conv("visual.conv3", width, width // 2, 3); bn("visual.bn3", width)
    inplanes = width
    for li, blocks in enumerate([3, 4, 6, 3]):
        planes = width * (2**li)
        for bi in range(blocks):
            p = f"visual.layer{li + 1}.{bi}"
            conv(f"{p}.conv1", planes, inplanes, 1); bn(f"{p}.bn1", planes)
            conv(f"{p}.conv2", planes, planes, 3); bn(f"{p}.bn2", planes)
            conv(f"{p}.conv3", planes * 4, planes, 1); bn(f"{p}.bn3", planes * 4)
            if bi == 0 and (li > 0 or inplanes != planes * 4):
                # OpenAI layout: downsample = ("-1" avgpool, "0" conv, "1" bn)
                conv(f"{p}.downsample.0", planes * 4, inplanes, 1)
                bn(f"{p}.downsample.1", planes * 4)
            inplanes = planes * 4
    emb = width * 32
    sd["visual.attnpool.positional_embedding"] = _rn(((224 // 32) ** 2 + 1, emb))
    for proj in ["q_proj", "k_proj", "v_proj"]:
        linear(f"visual.attnpool.{proj}", emb, emb)
    linear("visual.attnpool.c_proj", embed_dim, emb)

    # text tower
    sd["token_embedding.weight"] = _rn((vocab, t_width))
    sd["positional_embedding"] = _rn((ctx, t_width))
    for i in range(t_layers):
        p = f"transformer.resblocks.{i}"
        ln(f"{p}.ln_1", t_width); ln(f"{p}.ln_2", t_width)
        sd[f"{p}.attn.in_proj_weight"] = _rn((3 * t_width, t_width))
        sd[f"{p}.attn.in_proj_bias"] = np.zeros(3 * t_width, np.float32)
        linear(f"{p}.attn.out_proj", t_width, t_width)
        linear(f"{p}.mlp.c_fc", 4 * t_width, t_width)
        linear(f"{p}.mlp.c_proj", t_width, 4 * t_width)
    ln("ln_final", t_width)
    sd["text_projection"] = _rn((t_width, embed_dim))
    return sd


def test_rn50_conversion_runs():
    width, embed_dim = 8, 32
    sd = synth_rn50_state_dict(width=width, embed_dim=embed_dim)
    converted = convert_openai_clip(sd)
    model = ModifiedResNet(width=width, output_dim=embed_dim, heads=4, input_resolution=224)
    x = jnp.zeros((1, 224, 224, 3))
    init = model.init(jax.random.key(0), x)["params"]
    # converted tree must structurally match the flax init tree
    init_leaves = jax.tree_util.tree_leaves_with_path(init)
    conv_tree = jax.tree_util.tree_map(jnp.asarray, converted["visual"])
    for path, leaf in init_leaves:
        node = conv_tree
        for k in path:
            node = node[k.key]
        assert node.shape == leaf.shape, f"{jax.tree_util.keystr(path)}: {node.shape} vs {leaf.shape}"
    out = model.apply({"params": conv_tree}, x)
    assert out.shape == (1, embed_dim) and np.isfinite(np.asarray(out)).all()


def test_text_conversion_runs():
    sd = synth_rn50_state_dict()
    converted = convert_openai_clip(sd, text_heads=2)
    model = CLIPTextTransformer(vocab_size=64, context_length=8, width=16, layers=2, heads=2, output_dim=32)
    tokens = jnp.asarray([[63, 5, 62, 0, 0, 0, 0, 0]], jnp.int32)
    conv_tree = jax.tree_util.tree_map(jnp.asarray, converted["text"])
    out = model.apply({"params": conv_tree}, tokens)
    assert out.shape == (1, 32) and np.isfinite(np.asarray(out)).all()
