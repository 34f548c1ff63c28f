"""ScanRNN / transformer parity with torch modules via weight transplant.

These tests are the numerical foundation of the torch-checkpoint converter:
if a weight-transplanted module matches torch outputs, converted reference
checkpoints will reproduce reference behavior.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from hulc_tpu.models.layers import ScanBiRNN, ScanRNN, TransformerEncoder

B, S, F, H = 3, 11, 10, 16


def _set_rnn_params(params, t_rnn, num_layers, gate=1):
    """Transplant torch RNN weights into ScanRNN param tree."""
    p = dict(params)
    for layer in range(num_layers):
        w_ih = getattr(t_rnn, f"weight_ih_l{layer}").detach().numpy()  # (g*H, in)
        w_hh = getattr(t_rnn, f"weight_hh_l{layer}").detach().numpy()  # (g*H, H)
        b_ih = getattr(t_rnn, f"bias_ih_l{layer}").detach().numpy()
        b_hh = getattr(t_rnn, f"bias_hh_l{layer}").detach().numpy()
        p[f"ih_{layer}"] = {"kernel": jnp.asarray(w_ih.T), "bias": jnp.asarray(b_ih)}
        p[f"hh_{layer}"] = jnp.asarray(w_hh.T)
        p[f"bhh_{layer}"] = jnp.asarray(b_hh)
    return p


@pytest.mark.parametrize("cell,t_cls", [("rnn", torch.nn.RNN), ("gru", torch.nn.GRU), ("lstm", torch.nn.LSTM)])
def test_scan_rnn_matches_torch(cell, t_cls):
    torch.manual_seed(0)
    kwargs = dict(input_size=F, hidden_size=H, num_layers=2, batch_first=True)
    if cell == "rnn":
        kwargs["nonlinearity"] = "relu"
    t_rnn = t_cls(**kwargs)
    x = np.random.default_rng(0).normal(size=(B, S, F)).astype(np.float32)
    with torch.no_grad():
        t_out, t_hn = t_rnn(torch.from_numpy(x))

    model = ScanRNN(hidden_size=H, num_layers=2, cell=cell)
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    params = _set_rnn_params(params, t_rnn, 2)
    out, hn = model.apply({"params": params}, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-4)
    if cell == "lstm":
        np.testing.assert_allclose(np.asarray(hn[0]), t_hn[0].numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(hn[1]), t_hn[1].numpy(), atol=1e-4)
    else:
        np.testing.assert_allclose(np.asarray(hn), t_hn.numpy(), atol=1e-4)


def test_scan_rnn_carry_streaming_equals_full():
    """Stepping one frame at a time with carry == full-sequence forward."""
    model = ScanRNN(hidden_size=H, num_layers=2, cell="rnn")
    x = np.random.default_rng(1).normal(size=(B, S, F)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    full, _ = model.apply({"params": params}, jnp.asarray(x))

    carry = model.init_carry(B)
    outs = []
    for t in range(S):
        y, carry = model.apply({"params": params}, jnp.asarray(x[:, t : t + 1]), carry)
        outs.append(np.asarray(y[:, 0]))
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full), atol=1e-5)


def test_bidirectional_rnn_matches_torch():
    torch.manual_seed(1)
    t_rnn = torch.nn.RNN(F, H, num_layers=2, nonlinearity="relu", bidirectional=True, batch_first=True)
    x = np.random.default_rng(2).normal(size=(B, S, F)).astype(np.float32)
    with torch.no_grad():
        t_out, _ = t_rnn(torch.from_numpy(x))

    model = ScanBiRNN(hidden_size=H, num_layers=2, cell="rnn")
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    # torch packs fwd as l{k}, bwd as l{k}_reverse; each direction is a
    # single-layer ScanRNN here.
    for layer in range(2):
        for direction, name in [("", f"fwd_{layer}"), ("_reverse", f"bwd_{layer}")]:
            w_ih = getattr(t_rnn, f"weight_ih_l{layer}{direction}").detach().numpy()
            w_hh = getattr(t_rnn, f"weight_hh_l{layer}{direction}").detach().numpy()
            b_ih = getattr(t_rnn, f"bias_ih_l{layer}{direction}").detach().numpy()
            b_hh = getattr(t_rnn, f"bias_hh_l{layer}{direction}").detach().numpy()
            params[name] = {
                "ih_0": {"kernel": jnp.asarray(w_ih.T), "bias": jnp.asarray(b_ih)},
                "hh_0": jnp.asarray(w_hh.T),
                "bhh_0": jnp.asarray(b_hh),
            }
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-4)


def test_transformer_encoder_matches_torch():
    """Post-LN parity with torch nn.TransformerEncoder (2 layers, 2 heads)."""
    d_model, heads, ff, layers = 8, 2, 32, 2
    torch.manual_seed(2)
    t_layer = torch.nn.TransformerEncoderLayer(d_model, heads, dim_feedforward=ff, dropout=0.0)
    t_enc = torch.nn.TransformerEncoder(t_layer, num_layers=layers)
    x = np.random.default_rng(3).normal(size=(B, S, d_model)).astype(np.float32)
    with torch.no_grad():
        t_out = t_enc(torch.from_numpy(x).permute(1, 0, 2)).permute(1, 0, 2).numpy()

    model = TransformerEncoder(num_layers=layers, num_heads=heads, dim_feedforward=ff, dropout=0.0)
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    head_dim = d_model // heads
    for i, t_l in enumerate(t_enc.layers):
        in_w = t_l.self_attn.in_proj_weight.detach().numpy()  # (3*d, d)
        in_b = t_l.self_attn.in_proj_bias.detach().numpy()
        wq, wk, wv = np.split(in_w, 3, axis=0)
        bq, bk, bv = np.split(in_b, 3, axis=0)
        out_w = t_l.self_attn.out_proj.weight.detach().numpy()  # (d, d)
        out_b = t_l.self_attn.out_proj.bias.detach().numpy()
        attn = params[f"layer_{i}"]["self_attn"]
        # flax MHA kernels: (d_in, heads, head_dim); out: (heads, head_dim, d)
        attn["query"]["kernel"] = jnp.asarray(wq.T.reshape(d_model, heads, head_dim))
        attn["query"]["bias"] = jnp.asarray(bq.reshape(heads, head_dim))
        attn["key"]["kernel"] = jnp.asarray(wk.T.reshape(d_model, heads, head_dim))
        attn["key"]["bias"] = jnp.asarray(bk.reshape(heads, head_dim))
        attn["value"]["kernel"] = jnp.asarray(wv.T.reshape(d_model, heads, head_dim))
        attn["value"]["bias"] = jnp.asarray(bv.reshape(heads, head_dim))
        attn["out"]["kernel"] = jnp.asarray(out_w.T.reshape(heads, head_dim, d_model))
        attn["out"]["bias"] = jnp.asarray(out_b)
        lp = params[f"layer_{i}"]
        lp["linear1"]["kernel"] = jnp.asarray(t_l.linear1.weight.detach().numpy().T)
        lp["linear1"]["bias"] = jnp.asarray(t_l.linear1.bias.detach().numpy())
        lp["linear2"]["kernel"] = jnp.asarray(t_l.linear2.weight.detach().numpy().T)
        lp["linear2"]["bias"] = jnp.asarray(t_l.linear2.bias.detach().numpy())
        lp["norm1"]["scale"] = jnp.asarray(t_l.norm1.weight.detach().numpy())
        lp["norm1"]["bias"] = jnp.asarray(t_l.norm1.bias.detach().numpy())
        lp["norm2"]["scale"] = jnp.asarray(t_l.norm2.weight.detach().numpy())
        lp["norm2"]["bias"] = jnp.asarray(t_l.norm2.bias.detach().numpy())

    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t_out, atol=2e-4)


def test_scan_rnn_tanh_matches_torch_default():
    """torch nn.RNN's DEFAULT nonlinearity is tanh (used by the MCIL BiRNN,
    reference birnn.yaml rnn_type: nn.RNN)."""
    torch.manual_seed(3)
    t_rnn = torch.nn.RNN(F, H, num_layers=2, batch_first=True)  # tanh default
    x = np.random.default_rng(4).normal(size=(B, S, F)).astype(np.float32)
    with torch.no_grad():
        t_out, _ = t_rnn(torch.from_numpy(x))
    model = ScanRNN(hidden_size=H, num_layers=2, cell="rnn_tanh")
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    params = _set_rnn_params(params, t_rnn, 2)
    out, _ = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-4)


def test_quaternion_axis_angle_w_negative():
    """w near -1 (angle ~ 2pi, tiny xyz) must return the full-turn rotation,
    not the near-zero Taylor branch (regression for the |xyz|-keyed branch)."""
    from hulc_tpu.ops.rotations import quaternion_to_axis_angle

    aa = np.asarray(quaternion_to_axis_angle(jnp.asarray([[-1.0, 1e-7, 0.0, 0.0]])))
    # fp32 sin near pi limits precision; assert the magnitude is O(2pi),
    # far from the old bug's ~5e-7
    assert np.linalg.norm(aa) > 3.0


def test_relu_custom_vjp_gradient_matches_torch():
    """The custom-VJP relu (layers.relu) must reproduce torch's backward
    exactly, including relu'(0) = 0 (jnp.maximum's JVP splits ties 0.5)."""
    from hulc_tpu.models.layers import relu

    x = np.asarray([-2.0, -1e-8, 0.0, 1e-8, 3.5], dtype=np.float32)
    t_x = torch.from_numpy(x).requires_grad_(True)
    torch.relu(t_x).sum().backward()

    g = jax.grad(lambda v: relu(v).sum())(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(g), t_x.grad.numpy())


def test_relu_rnn_gradient_matches_torch():
    """End-to-end backward through the relu ScanRNN (lax.scan over the
    custom-VJP relu) vs torch nn.RNN(relu) — weight grads must agree."""
    torch.manual_seed(5)
    t_rnn = torch.nn.RNN(F, H, num_layers=1, batch_first=True, nonlinearity="relu")
    x = np.random.default_rng(6).normal(size=(B, S, F)).astype(np.float32)

    t_x = torch.from_numpy(x)
    t_out, _ = t_rnn(t_x)
    t_out.sum().backward()
    t_wih_grad = t_rnn.weight_ih_l0.grad.numpy()
    t_whh_grad = t_rnn.weight_hh_l0.grad.numpy()

    model = ScanRNN(hidden_size=H, num_layers=1, cell="rnn")
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    params = _set_rnn_params(params, t_rnn, 1)

    def loss(p):
        out, _ = model.apply({"params": p}, jnp.asarray(x))
        return out.sum()

    grads = jax.grad(loss)(params)
    np.testing.assert_allclose(
        np.asarray(grads["ih_0"]["kernel"]).T, t_wih_grad, atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(grads["hh_0"]).T, t_whh_grad, atol=1e-3)
