"""Auxiliary loss heads (reference hulc/models/auxiliary_loss_networks/).

ProjVisLang: twin MLP projections of seq_feat and language goal for the
CLIP-style contrastive loss (proj_vis_lang.py). BCZLangDecoder: regress the
language embedding from seq_feat (bc_z_lang_decoder.py). MIALangDiscriminator:
match/mismatch logit on concatenated projections (mia_lang_discriminator.py).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class ProjVisLang(nn.Module):
    output_dim: int = 32
    proj_lang: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vis_emb: Array, lang_emb: Array) -> Tuple[Array, Array]:
        v = nn.Dense(128, dtype=self.dtype, name="im_fc0")(vis_emb.astype(self.dtype))
        v = nn.Dense(self.output_dim, dtype=self.dtype, name="im_fc1")(nn.relu(v))
        if self.proj_lang:
            l = nn.Dense(128, dtype=self.dtype, name="lang_fc0")(lang_emb.astype(self.dtype))
            l = nn.Dense(self.output_dim, dtype=self.dtype, name="lang_fc1")(nn.relu(l))
        else:
            l = lang_emb
        return v, l


class BCZLangDecoder(nn.Module):
    lang_dim: int = 384
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(512, dtype=self.dtype, name="fc0")(x.astype(self.dtype))
        return nn.Dense(self.lang_dim, dtype=self.dtype, name="fc1")(nn.relu(x))


class MIALangDiscriminator(nn.Module):
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vis_emb: Array, lang_emb: Array, *, deterministic: bool = True) -> Array:
        x = jnp.concatenate([vis_emb, lang_emb], axis=-1).astype(self.dtype)
        x = nn.relu(nn.Dense(512, dtype=self.dtype, name="fc0")(x))
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(1, dtype=jnp.float32, name="fc1")(x)
