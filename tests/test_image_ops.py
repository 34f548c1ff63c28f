"""Image preprocessing: random-shift crop equivalence with the reference's
grid_sample formulation, and fused normalize correctness."""

import numpy as np
import jax
import jax.numpy as jnp

from hulc_tpu.ops.image_ops import preprocess_rgb_seq, random_shift, resize_bilinear


def test_random_shift_shapes_and_range():
    imgs = jnp.asarray(np.random.default_rng(0).integers(0, 255, (8, 84, 84, 3), np.uint8))
    out = random_shift(jax.random.key(0), imgs, pad=4)
    assert out.shape == imgs.shape and out.dtype == imgs.dtype


def test_random_shift_is_integer_crop_of_padded():
    """Every output must be an exact crop of the replicate-padded input."""
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (4, 16, 16, 1), np.uint8)
    out = np.asarray(random_shift(jax.random.key(3), jnp.asarray(imgs), pad=3))
    padded = np.pad(imgs, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="edge")
    for i in range(4):
        found = any(
            np.array_equal(out[i], padded[i, sy : sy + 16, sx : sx + 16])
            for sy in range(7)
            for sx in range(7)
        )
        assert found, f"image {i} is not a crop of its padded input"


def test_random_shift_matches_reference_grid_sample():
    """The reference bilinear grid_sample with integer shifts == integer crop."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 255, (2, 3, 32, 32)).astype(np.float32)  # NCHW for torch
    pad = 5
    n, c, h, w = imgs.shape
    x = F.pad(torch.from_numpy(imgs), (pad,) * 4, "replicate")
    eps = 1.0 / (h + 2 * pad)
    arange = torch.linspace(-1.0 + eps, 1.0 - eps, h + 2 * pad)[:h]
    arange = arange.unsqueeze(0).repeat(h, 1).unsqueeze(2)
    base_grid = torch.cat([arange, arange.transpose(1, 0)], dim=2).unsqueeze(0).repeat(n, 1, 1, 1)
    shift_int = torch.tensor([[3, 7], [0, 10]], dtype=torch.float32).view(n, 1, 1, 2)
    grid = base_grid + shift_int * (2.0 / (h + 2 * pad))
    ref = F.grid_sample(x, grid, padding_mode="zeros", align_corners=False).numpy()

    padded = np.pad(imgs, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    for i, (sx, sy) in enumerate([(3, 7), (0, 10)]):
        crop = padded[i, :, sy : sy + h, sx : sx + w]
        np.testing.assert_allclose(ref[i], crop, atol=0.5)  # grid_sample fp rounding, well under 1 uint8 level


def test_preprocess_rgb_seq_normalization():
    imgs = np.zeros((2, 3, 8, 8, 3), np.uint8)
    imgs[0] = 255
    out = np.asarray(preprocess_rgb_seq(jnp.asarray(imgs)))
    assert out.shape == imgs.shape
    np.testing.assert_allclose(out[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[1], -1.0, atol=1e-6)


def test_resize_bilinear_shape():
    imgs = jnp.zeros((4, 100, 100, 3))
    out = resize_bilinear(imgs, 200, 200)
    assert out.shape == (4, 200, 200, 3)


def test_matmul_shift_exactly_equals_slice_shift():
    """The one-hot selection matmul path (TPU production path) must be
    bit-identical to the dynamic-slice path for uint8 inputs — every value
    0..255 is exactly representable in the matmul accumulator and each
    output has exactly one contributing term."""
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.integers(0, 256, (16, 24, 24, 3), np.uint8))
    key = jax.random.key(11)
    a = random_shift(key, imgs, pad=5, method="slice")
    b = random_shift(key, imgs, pad=5, method="matmul")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # extreme values survive
    imgs2 = jnp.asarray(np.full((2, 16, 16, 3), 255, np.uint8))
    np.testing.assert_array_equal(
        np.asarray(random_shift(key, imgs2, pad=3, method="matmul")), 255
    )


def test_matmul_shift_bf16_values_exact():
    """The TPU path casts uint8 pixels to bf16 before the selection matmul;
    every value 0..255 fits bf16's 8 mantissa bits, so a bf16-input crop must
    round-trip all 256 values exactly (validated here explicitly since the
    CPU path defaults to f32)."""
    vals = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    imgs = jnp.asarray(np.broadcast_to(vals, (4, 16, 16, 1)))
    key = jax.random.key(3)
    ref = random_shift(key, imgs, pad=4, method="slice")
    got = random_shift(key, imgs.astype(jnp.bfloat16), pad=4, method="matmul")
    np.testing.assert_array_equal(np.asarray(got.astype(jnp.uint8)), np.asarray(ref))
