"""Reference PyTorch checkpoint -> hulc_tpu flax params converter.

Maps the state_dict of the reference Hulc/GCBC LightningModule
(hulc/models/hulc.py module tree; published checkpoints via
checkpoints/download_model_weights.sh) onto our parameter pytree.

Layout conversions:
  * Linear: torch (out, in) -> flax kernel (in, out) [transpose]
  * Conv2d: torch (out, in, kh, kw) -> flax NHWC kernel (kh, kw, in, out)
  * nature_cnn flatten: torch flattens NCHW (c, y, x); our NHWC flatten is
    (y, x, c) — the first dense after the flatten is re-permuted.
  * torch RNN weight_ih/weight_hh (g*H, in) -> ScanRNN ih kernel (in, g*H) /
    hh (H, g*H)
  * MultiheadAttention in_proj (3d, d) -> flax per-head q/k/v kernels
    (d, heads, head_dim) and out_proj -> (heads, head_dim, d)

Use :func:`load_torch_checkpoint` for Lightning .ckpt files and
:func:`convert_state_dict` for raw state_dicts (numpy arrays or torch
tensors). Unmapped reference keys are returned for inspection; missing
target params raise.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from hulc_tpu.config import HulcConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


class _Mapper:
    def __init__(self, sd: Dict[str, Any]):
        self.sd = {k: _np(v) for k, v in sd.items()}
        self.used = set()

    def get(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def linear(self, prefix: str) -> Dict[str, np.ndarray]:
        return {"kernel": self.get(f"{prefix}.weight").T, "bias": self.get(f"{prefix}.bias")}

    def conv(self, prefix: str) -> Dict[str, np.ndarray]:
        w = self.get(f"{prefix}.weight")  # (out, in, kh, kw)
        return {"kernel": w.transpose(2, 3, 1, 0), "bias": self.get(f"{prefix}.bias")}

    def layernorm(self, prefix: str) -> Dict[str, np.ndarray]:
        return {"scale": self.get(f"{prefix}.weight"), "bias": self.get(f"{prefix}.bias")}

    def rnn(self, prefix: str, num_layers: int) -> Dict[str, np.ndarray]:
        out = {}
        for layer in range(num_layers):
            out[f"ih_{layer}"] = {
                "kernel": self.get(f"{prefix}.weight_ih_l{layer}").T,
                "bias": self.get(f"{prefix}.bias_ih_l{layer}"),
            }
            out[f"hh_{layer}"] = self.get(f"{prefix}.weight_hh_l{layer}").T
            out[f"bhh_{layer}"] = self.get(f"{prefix}.bias_hh_l{layer}")
        return out

    def birnn(self, prefix: str, num_layers: int) -> Dict[str, np.ndarray]:
        out = {}
        for layer in range(num_layers):
            for suffix, name in [("", f"fwd_{layer}"), ("_reverse", f"bwd_{layer}")]:
                out[name] = {
                    "ih_0": {
                        "kernel": self.get(f"{prefix}.weight_ih_l{layer}{suffix}").T,
                        "bias": self.get(f"{prefix}.bias_ih_l{layer}{suffix}"),
                    },
                    "hh_0": self.get(f"{prefix}.weight_hh_l{layer}{suffix}").T,
                    "bhh_0": self.get(f"{prefix}.bias_hh_l{layer}{suffix}"),
                }
        return out

    def attention(self, prefix: str, d_model: int, heads: int) -> Dict[str, Any]:
        head_dim = d_model // heads
        in_w = self.get(f"{prefix}.in_proj_weight")
        in_b = self.get(f"{prefix}.in_proj_bias")
        wq, wk, wv = np.split(in_w, 3, axis=0)
        bq, bk, bv = np.split(in_b, 3, axis=0)
        out_w = self.get(f"{prefix}.out_proj.weight")
        out_b = self.get(f"{prefix}.out_proj.bias")

        def qkv(w, b):
            return {
                "kernel": w.T.reshape(d_model, heads, head_dim),
                "bias": b.reshape(heads, head_dim),
            }

        return {
            "query": qkv(wq, bq),
            "key": qkv(wk, bk),
            "value": qkv(wv, bv),
            "out": {"kernel": out_w.T.reshape(heads, head_dim, d_model), "bias": out_b},
        }


def _vision_static(m: _Mapper, prefix: str, learnable_temp: bool = False) -> Dict[str, Any]:
    out = {
        "conv0": m.conv(f"{prefix}.conv_model.0"),
        "conv1": m.conv(f"{prefix}.conv_model.2"),
        "conv2": m.conv(f"{prefix}.conv_model.4"),
        "fc1": m.linear(f"{prefix}.fc1.0"),
        "fc2": m.linear(f"{prefix}.fc2"),
        "ln": m.layernorm(f"{prefix}.ln"),
    }
    if m.has(f"{prefix}.spatial_softmax.temperature"):
        temp = m.get(f"{prefix}.spatial_softmax.temperature")
        if learnable_temp:
            # reference spatial_softmax_temp=null -> trained nn.Parameter
            out["spatial_softmax"] = {"temperature": temp.reshape(1)}
    return out


def _vision_gripper(m: _Mapper, prefix: str, conv_hw: int = 7, conv_c: int = 64) -> Dict[str, Any]:
    # nature_cnn: Sequential(conv0, act, conv1, act, conv2, act, Flatten, fc, act)
    fc0_w = m.get(f"{prefix}.conv_model.7.weight")  # (128, c*h*w) over NCHW flatten
    fc0 = {
        "kernel": fc0_w.reshape(-1, conv_c, conv_hw, conv_hw)
        .transpose(2, 3, 1, 0)
        .reshape(conv_hw * conv_hw * conv_c, -1),
        "bias": m.get(f"{prefix}.conv_model.7.bias"),
    }
    return {
        "conv0": m.conv(f"{prefix}.conv_model.0"),
        "conv1": m.conv(f"{prefix}.conv_model.2"),
        "conv2": m.conv(f"{prefix}.conv_model.4"),
        "fc0": fc0,
        "fc1": m.linear(f"{prefix}.fc1.0"),
        "fc2": m.linear(f"{prefix}.fc2"),
        "ln": m.layernorm(f"{prefix}.ln"),
    }


def _goal_encoder(m: _Mapper, prefix: str, has_dropout: bool) -> Dict[str, Any]:
    # visual: mlp.(0,2,4); language: Dropout first -> mlp.(1,3,5)
    o = 1 if has_dropout else 0
    return {
        "fc0": m.linear(f"{prefix}.mlp.{o}"),
        "fc1": m.linear(f"{prefix}.mlp.{o + 2}"),
        "fc2": m.linear(f"{prefix}.mlp.{o + 4}"),
        "ln": m.layernorm(f"{prefix}.ln"),
    }


def convert_state_dict(
    state_dict: Dict[str, Any], cfg: HulcConfig
) -> Tuple[Dict[str, Any], List[str]]:
    """Convert a reference Hulc state_dict to our params tree.

    Returns (params, unused_reference_keys).
    """
    m = _Mapper(state_dict)
    params: Dict[str, Any] = {}

    # ---- perceptual encoders -------------------------------------------
    pe: Dict[str, Any] = {}
    if m.has("perceptual_encoder.rgb_static_encoder.fc2.weight"):
        pe["rgb_static"] = _vision_static(
            m,
            "perceptual_encoder.rgb_static_encoder",
            learnable_temp=cfg.perceptual_encoder.rgb_static.spatial_softmax_temp is None,
        )
    if cfg.perceptual_encoder.rgb_gripper is not None and m.has(
        "perceptual_encoder.rgb_gripper_encoder.fc2.weight"
    ):
        g = cfg.perceptual_encoder.rgb_gripper
        hw = {84: 7, 48: 3, 64: 5}.get(g.input_size, 7)
        pe["rgb_gripper"] = _vision_gripper(m, "perceptual_encoder.rgb_gripper_encoder", hw)
    if pe:
        params["perceptual_encoder"] = pe

    # ---- plan proposal --------------------------------------------------
    if m.has("plan_proposal.fc_state.0.weight"):
        pp = {
            f"fc_{i}": m.linear(f"plan_proposal.fc_model.{2 * i}")
            for i in range(cfg.plan_proposal.num_layers)
        }
        pp["fc_state"] = m.linear("plan_proposal.fc_state.0")
        params["plan_proposal"] = pp

    # ---- plan recognition ----------------------------------------------
    pr_cfg = cfg.plan_recognition
    if not m.has("plan_recognition.fc_state.0.weight"):
        pr = None
    elif pr_cfg.kind == "transformer":
        d_model = cfg.perceptual_encoder.latent_size
        d_model += (-d_model) % pr_cfg.num_heads
        layers = {}
        for i in range(pr_cfg.num_layers):
            t = f"plan_recognition.transformer_encoder.layers.{i}"
            layers[f"layer_{i}"] = {
                "self_attn": m.attention(f"{t}.self_attn", d_model, pr_cfg.num_heads),
                "linear1": m.linear(f"{t}.linear1"),
                "linear2": m.linear(f"{t}.linear2"),
                "norm1": m.layernorm(f"{t}.norm1"),
                "norm2": m.layernorm(f"{t}.norm2"),
            }
        pr = {
            "position_embeddings": m.get("plan_recognition.position_embeddings.weight"),
            "encoder": layers,
            "fc": m.linear("plan_recognition.fc"),
            "fc_state": m.linear("plan_recognition.fc_state.0"),
        }
    else:
        pr = {
            "birnn": m.birnn("plan_recognition.birnn_model", pr_cfg.birnn_num_layers),
            "fc_state": m.linear("plan_recognition.fc_state.0"),
        }
    if pr is not None:
        params["plan_recognition"] = pr

    # ---- goal encoders --------------------------------------------------
    if m.has("visual_goal.mlp.0.weight"):
        params["visual_goal"] = _goal_encoder(m, "visual_goal", has_dropout=False)
    if m.has("language_goal.mlp.1.weight"):
        params["language_goal"] = _goal_encoder(m, "language_goal", has_dropout=True)

    # ---- action decoder -------------------------------------------------
    ad_cfg = cfg.action_decoder
    if m.has("action_decoder.rnn.weight_ih_l0"):
        ad: Dict[str, Any] = {"rnn": m.rnn("action_decoder.rnn", ad_cfg.num_layers)}
        if ad_cfg.kind == "logistic":
            ad["mean_fc"] = m.linear("action_decoder.mean_fc")
            ad["log_scale_fc"] = m.linear("action_decoder.log_scale_fc")
            ad["prob_fc"] = m.linear("action_decoder.prob_fc")
            if ad_cfg.discrete_gripper:
                ad["gripper_fc"] = m.linear("action_decoder.gripper_fc")
        else:
            ad["action_fc"] = m.linear("action_decoder.actions.0")
        params["action_decoder"] = ad

    # ---- aux heads ------------------------------------------------------
    if m.has("logit_scale"):
        params["logit_scale"] = m.get("logit_scale")
    if m.has("proj_vis_lang.mlp_im.0.weight"):
        pvl = {
            "im_fc0": m.linear("proj_vis_lang.mlp_im.0"),
            "im_fc1": m.linear("proj_vis_lang.mlp_im.2"),
        }
        if m.has("proj_vis_lang.mlp_lang.0.weight"):
            pvl["lang_fc0"] = m.linear("proj_vis_lang.mlp_lang.0")
            pvl["lang_fc1"] = m.linear("proj_vis_lang.mlp_lang.2")
        params["proj_vis_lang"] = pvl
    if m.has("bc_z_lang_decoder.mlp.0.weight"):
        params["bc_z_lang_decoder"] = {
            "fc0": m.linear("bc_z_lang_decoder.mlp.0"),
            "fc1": m.linear("bc_z_lang_decoder.mlp.2"),
        }
    if m.has("mia_lang_discriminator.mlp.0.weight"):
        params["mia_lang_discriminator"] = {
            "fc0": m.linear("mia_lang_discriminator.mlp.0"),
            "fc1": m.linear("mia_lang_discriminator.mlp.3"),
        }

    unused = sorted(set(m.sd) - m.used)
    return params, unused


def load_torch_checkpoint(path, cfg: HulcConfig) -> Tuple[Dict[str, Any], List[str]]:
    """Load a Lightning .ckpt (or raw state_dict .pt) and convert."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    return convert_state_dict(sd, cfg)


def main(argv=None):
    """CLI: convert a reference .ckpt into a flax params .npz.

    Usage: python -m hulc_tpu.training.torch_convert <ckpt> <out.npz>
           [--config hulc]

    The output is a flat {'/'-joined path: array} npz; load it back with
    :func:`load_params_npz` or hand the tree to
    ``training.pretrain.initialize_pretrained_weights``.
    """
    import argparse

    p = argparse.ArgumentParser(description="reference torch checkpoint -> flax params")
    p.add_argument("ckpt", help="Lightning .ckpt or raw state_dict .pt")
    p.add_argument("out", help="output .npz path")
    p.add_argument("--config", default="hulc", help="model preset the checkpoint matches")
    args = p.parse_args(argv)

    from hulc_tpu.config import get_config

    params, unused = load_torch_checkpoint(args.ckpt, get_config(args.config))

    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    walk(params, "")
    np.savez(args.out, **flat)
    print(f"[torch_convert] wrote {len(flat)} arrays -> {args.out}")
    if unused:
        print(f"[torch_convert] {len(unused)} unmapped reference keys (head/optimizer/etc):")
        for k in unused[:20]:
            print(f"  {k}")


def load_params_npz(path) -> Dict[str, Any]:
    """Inverse of the CLI dump: .npz -> nested flax params dict."""
    out: Dict[str, Any] = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p_ in parts[:-1]:
                node = node.setdefault(p_, {})
            node[parts[-1]] = z[key]
    return out


if __name__ == "__main__":
    main()
