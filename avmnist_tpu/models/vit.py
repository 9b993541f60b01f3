"""ViT encoders (reference models/dino_vit.py:11-177), rebuilt TPU-first.

Differences from a naive translation:
- attention is a fused einsum over (B, heads, T, head_dim) — T is at most 197 tokens
  ((112/8)^2+1, dino_vit.py:28-32), so full softmax attention maps straight onto the
  MXU; no sequence parallelism is needed (SURVEY.md §5).
- post-LN torch ``nn.TransformerEncoderLayer`` semantics are preserved exactly
  (residual -> LayerNorm ordering, GELU MLP, dropout placement), since DINO training
  dynamics are sensitive to norm placement.
- CLS token and positional embeddings are zero-initialized, matching the reference
  quirk (dino_vit.py:87-91 uses torch.zeros, never randn).
- mixed-precision policy mirrors torch AMP autocast, under which the reference
  trains (Trainer(precision='16-mixed'), run_dino.py:356-365): matmuls/convs run in
  the compute dtype (bf16 here) but LayerNorm and the attention softmax ALWAYS run
  in float32 — autocast's fp32 op list. Running them in bf16 (the naive
  cast-everything policy) destabilizes post-LN ViT DINO training: the round-2
  multi_dual_vit run was healthy for 10 epochs, then the teacher entropy exploded
  to ~log(P) and the loss oscillated without recovering. LN/softmax are VPU ops,
  so the f32 island costs no MXU throughput.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from avmnist_tpu.models.layers import Conv, Dense


class PatchEmbedding(nn.Module):
    """Conv-as-patchify (dino_vit.py:11-41; same module serves image and audio)."""

    patch_size: int = 4
    embed_dim: int = 192

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) -> (B, T, D)
        p = self.patch_size
        x = Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID")(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


class SelfAttention(nn.Module):
    """Multi-head self-attention (torch MultiheadAttention equivalent).

    Init parity: torch MHA._reset_parameters applies xavier_uniform to the packed
    in_proj weight (vs the kaiming default of plain Linear layers) and zeros the
    in_proj bias; out_proj keeps the Linear default kernel with a zero bias —
    both matched here (biases are zero-init framework-wide, models/layers.py)."""

    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, t, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = Dense(3 * d, kernel_init=nn.initializers.xavier_uniform())(
            x).reshape(b, t, 3, h, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (B, T, H, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        # softmax in f32 (torch autocast fp32 op; see module docstring), back to the
        # compute dtype for the value matmul — exactly autocast's cast points
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        return Dense(d)(out)


class TransformerEncoderLayer(nn.Module):
    """Post-LN layer matching torch nn.TransformerEncoderLayer(activation='gelu')."""

    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True):
        # torch nn.LayerNorm default eps=1e-5 (flax default is 1e-6). LN computes
        # in f32 (dtype=float32 promotes input AND scale/bias) per the autocast
        # policy; matmul inputs are cast back to the network compute dtype.
        d = x.shape[-1]
        cdt = x.dtype
        ln = lambda: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        a = SelfAttention(self.num_heads, self.dropout)(x, train=train)
        a = nn.Dropout(self.dropout, deterministic=not train)(a)
        x32 = ln()(x.astype(jnp.float32) + a.astype(jnp.float32))
        f = Dense(int(d * self.mlp_ratio))(x32.astype(cdt))
        f = nn.gelu(f, approximate=False)  # torch nn.GELU default: exact erf
        f = nn.Dropout(self.dropout, deterministic=not train)(f)
        f = Dense(d)(f)
        f = nn.Dropout(self.dropout, deterministic=not train)(f)
        return ln()(x32 + f.astype(jnp.float32)).astype(cdt)


class TransformerEncoder(nn.Module):
    """Stack + final LayerNorm (dino_vit.py:43-63)."""

    depth: int = 4
    num_heads: int = 3
    mlp_ratio: float = 4.0
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(self.depth):
            x = TransformerEncoderLayer(self.num_heads, self.mlp_ratio, self.dropout)(
                x, train=train
            )
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x).astype(x.dtype)


class ViTEncoder(nn.Module):
    """CLS-token ViT (dino_vit.py:65-177; ViTEncoder and AudioViTEncoder share this —
    they are structurally identical, differing only in default patch size)."""

    patch_size: int = 4
    embed_dim: int = 192
    depth: int = 4
    num_heads: int = 3
    mlp_ratio: float = 4.0
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True):
        b = x.shape[0]
        x = PatchEmbedding(self.patch_size, self.embed_dim)(x)  # (B, T, D)
        t = x.shape[1]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.zeros, (1, t + 1, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)), x], axis=1)
        x = x + pos
        x = TransformerEncoder(self.depth, self.num_heads, self.mlp_ratio, self.dropout)(
            x, train=train
        )
        return x[:, 0]


def AudioViTEncoder(patch_size: int = 8, embed_dim: int = 192, depth: int = 4,
                    num_heads: int = 3, mlp_ratio: float = 4.0, dropout: float = 0.1):
    """Audio variant (dino_vit.py:122-177): identical architecture, patch 8 on 112x112."""
    return ViTEncoder(patch_size=patch_size, embed_dim=embed_dim, depth=depth,
                      num_heads=num_heads, mlp_ratio=mlp_ratio, dropout=dropout)


class LegacyMultiModalViTEncoder(nn.Module):
    """Self-contained legacy dual-ViT encoder (dino_vit.py:179-215): fixed 192-dim
    image (patch 4) + audio (patch 8) ViTs, concat, 384 -> 512 GELU -> out fusion.
    Superseded by DualViTMultiModalEncoder in the live drivers; kept for parity with
    the legacy MultiModalViTDINO stack (whose DINO wrapper is subsumed by
    objectives.dino.make_dino_objective)."""

    output_dim: int = 256
    modality = None

    def setup(self):
        self.image_encoder = ViTEncoder(patch_size=4, embed_dim=192, depth=4,
                                        num_heads=3)
        self.audio_encoder = ViTEncoder(patch_size=8, embed_dim=192, depth=4,
                                        num_heads=3)
        self.fusion_hidden = Dense(512)
        self.fusion_out = Dense(self.output_dim)

    def encode_image(self, images, train: bool = True):
        return self.image_encoder(images, train=train)

    def encode_audio(self, spectrograms, train: bool = True):
        return self.audio_encoder(spectrograms, train=train)

    def __call__(self, images, spectrograms, train: bool = True):
        f = jnp.concatenate([self.image_encoder(images, train=train),
                             self.audio_encoder(spectrograms, train=train)], axis=1)
        return self.fusion_out(nn.gelu(self.fusion_hidden(f), approximate=False))  # torch nn.GELU default: exact erf
