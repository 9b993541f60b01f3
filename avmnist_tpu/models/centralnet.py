"""CentralNet supervised fusion model (reference models/centralnet/centralnet.py,
itself derived from the MFAS repo). Rebuilt functionally in flax, NHWC.

Preserved reference quirks (bit-for-bit semantics, flagged here for the record):
- GP_LeNet taps global pools on the PRE-pool activations (centralnet.py:43-53), while
  GP_LeNet_Deeper taps gp1 on the POST-pool activation but gp2..gp5 pre-pool
  (centralnet.py:94-112).
- ``_fuse_features`` with equal widths uses alpha1 for BOTH terms
  (centralnet.py:230 — `f1 * a1 + f2 * a1`, evident upstream bug kept for parity).
- conv/linear weights use explicit kaiming_uniform (centralnet.py:37-40, 88-91).
- alphas are init ~ U(0,1) scalars (torch.rand(1), centralnet.py:127-136).

The three "central" Conv1d(1,1,k=3) layers slide over the fused feature vector; here
that is a (B, N, 1) NHC conv — a trivially small op XLA fuses into the surrounding
elementwise work.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmnist_tpu.models.layers import kaiming_uniform, global_avg_pool, max_pool2


class KConv(nn.Conv):
    kernel_init: Callable = kaiming_uniform


class KDense(nn.Dense):
    kernel_init: Callable = kaiming_uniform


class GPLeNet(nn.Module):
    """3-block conv net with per-block global-pool taps (centralnet.py:18-57)."""

    channels: int = 16
    num_outputs: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9)
        c = self.channels
        out1 = nn.relu(bn()(KConv(c, (5, 5), padding=2, use_bias=False)(x)))
        x = max_pool2(out1)
        gp1 = global_avg_pool(out1)
        out2 = nn.relu(bn()(KConv(2 * c, (3, 3), padding=1, use_bias=False)(x)))
        x = max_pool2(out2)
        gp2 = global_avg_pool(out2)
        out3 = nn.relu(bn()(KConv(4 * c, (3, 3), padding=1, use_bias=False)(x)))
        gp3 = global_avg_pool(out3)
        out = KDense(self.num_outputs)(gp3)
        return out, (gp1, gp2, gp3)


class GPLeNetDeeper(nn.Module):
    """5-block variant (centralnet.py:60-116). Note gp1 taps post-pool (:96)."""

    channels: int = 16
    num_outputs: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9)
        c = self.channels
        out1 = nn.relu(bn()(KConv(c, (5, 5), padding=2, use_bias=False)(x)))
        x = max_pool2(out1)
        gp1 = global_avg_pool(x)  # post-pool tap (reference quirk)
        gps = [gp1]
        for i, mult in enumerate((2, 4, 8, 16)):
            out = nn.relu(bn()(KConv(mult * c, (3, 3), padding=1, use_bias=False)(x)))
            x = max_pool2(out)
            gps.append(global_avg_pool(out))
        out = KDense(self.num_outputs)(gps[-1])
        return out, tuple(gps)


def _lateral_pad(f: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Zero-pad feature dim on the right (centralnet.py:234-241)."""
    return jnp.pad(f, ((0, 0), (0, pad)))


def _fuse(f1, f2, a1, a2, fusetype: str):
    """Weighted-sum / concat fusion with width matching (centralnet.py:209-232)."""
    dif = f1.shape[1] - f2.shape[1]
    if fusetype == "cat":
        if dif > 0:
            f2 = _lateral_pad(f2, dif)
        elif dif < 0:
            f1 = _lateral_pad(f1, -dif)
        return jnp.concatenate([f1, f2], axis=1)
    # wsum
    if dif > 0:
        return f1 * a1 + _lateral_pad(f2, dif) * a2
    if dif < 0:
        return _lateral_pad(f1, -dif) * a1 + f2 * a2
    return f1 * a1 + f2 * a1  # reference quirk: a1 applied to both when widths match


class CentralNet(nn.Module):
    """SimpleAV_CentralNet (centralnet.py:119-207).

    __call__(audio, image) -> (audio_out, image_out, fusion_out); the training loss is
    CE(audio)+CE(image)+CE(fusion) (reference centralnet_train.py:56-63).
    """

    channels: int = 16
    num_outputs: int = 10
    fusingmix: str = "11,32,53"
    fusetype: str = "wsum"

    @nn.compact
    def __call__(self, audio, image, train: bool = True):
        audio_out, agp = GPLeNetDeeper(self.channels, self.num_outputs)(audio, train=train)
        image_out, igp = GPLeNet(self.channels, self.num_outputs)(image, train=train)

        rand_init = nn.initializers.uniform(scale=1.0)
        alphas = {
            name: self.param(name, rand_init, (1,))
            for name in (
                "alpha1_feat1", "alpha1_feat2", "alpha2_feat1", "alpha2_feat2",
                "alpha3_feat1", "alpha3_feat2", "alpha_conv1", "alpha_conv2",
            )
        }

        pairs = {
            "11,32,53": ((agp[0], igp[0]), (agp[2], igp[1]), (agp[4], igp[2])),
            "11,22,33": ((agp[0], igp[0]), (agp[1], igp[1]), (agp[2], igp[2])),
            "31,42,53": ((agp[2], igp[0]), (agp[3], igp[1]), (agp[4], igp[2])),
        }[self.fusingmix]

        fuses = [
            _fuse(a, i, alphas[f"alpha{n+1}_feat1"], alphas[f"alpha{n+1}_feat2"], self.fusetype)
            for n, (a, i) in enumerate(pairs)
        ]

        def conv1d(name, f):
            # Conv1d(1, 1, k=3, pad=1, bias=False) over the feature vector.
            y = KConv(1, (3,), padding=1, use_bias=False, name=name)(f[:, :, None])
            return nn.relu(y[:, :, 0])

        one = jnp.ones((1,), dtype=fuses[0].dtype)
        cc1 = _fuse(conv1d("central_conv1", fuses[0]), fuses[1], alphas["alpha_conv1"], one, "wsum")
        cc2 = _fuse(conv1d("central_conv2", cc1), fuses[2], alphas["alpha_conv2"], one, "wsum")
        cc3 = conv1d("central_conv3", cc2)
        fusion_out = KDense(self.num_outputs, name="central_classifier")(cc3)
        return audio_out, image_out, fusion_out
