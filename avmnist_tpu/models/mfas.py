"""MFAS (Multimodal Fusion Architecture Search) cell machinery.

Reference: models/centralnet/aux_models.py:151-539 — ``Cell`` / ``FixedCell``
(ENAS-style block DAGs over a 10-op vocabulary), ``CellBlock`` + coupled
``DropPath``, ``CreateOp``/``ConvBranch``/``PoolBranch``/``SeparableConv``,
``FactorizedReduction`` and ``AuxiliaryHead``. The reference keeps this NAS
machinery unused by its live training path; it is provided here for component
parity and is fully functional.

TPU-native notes: cells are STATIC DAGs — configuration/connections are Python
tuples fixed at module construction, so XLA sees straight-line code (no dynamic
control flow); DropPath's whole-tensor coin flips (torch uses Python ``random()``
per forward) become scalar bernoulli draws from a flax ``droppath`` rng stream,
keeping the step jittable and reproducible.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

OPERATION_LABELS = (
    "I", "1x1 conv", "3x3 conv", "5x5 conv", "7x7 conv",
    "3x3 depthconv", "5x5 depthconv", "7x7 depthconv",
    "3x3 maxpool", "3x3 avgpool",
)


class _ConvBNReLU1x1(nn.Module):
    """1x1 conv -> BN -> ReLU prologue shared by every branch (aux_models.py:355+)."""

    planes: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.planes, (1, 1), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class ConvBranch(nn.Module):
    """1x1 prologue + kxk (optionally depthwise-separable) conv block
    (aux_models.py:379-416)."""

    planes: int
    kernel: int = 3
    separable: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        # The reference asserts kernel in {3,5,7} yet its own CreateOp('1x1 conv')
        # passes kernel_size=1 — a latent crash in never-exercised code. Kernel 1
        # is permitted here so the full op vocabulary is actually constructible.
        assert self.kernel in (1, 3, 5, 7), "Kernel size must be 1, 3, 5 or 7"
        x = _ConvBNReLU1x1(self.planes)(x, train)
        k = (self.kernel, self.kernel)
        if self.separable:
            # SeparableConvOld: depthwise kxk + pointwise 1x1 (aux_models.py:420-431)
            x = nn.Conv(self.planes, k, feature_group_count=self.planes,
                        padding="SAME", use_bias=False)(x)
            x = nn.Conv(self.planes, (1, 1), use_bias=False)(x)
        else:
            x = nn.Conv(self.planes, k, padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class PoolBranch(nn.Module):
    """1x1 prologue + stride-1 3x3 max/avg pool (aux_models.py:347-375)."""

    planes: int
    kind: str = "max"  # 'max' | 'avg'

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = _ConvBNReLU1x1(self.planes)(x, train)
        if self.kind == "max":
            return nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        if self.kind == "avg":
            return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                               count_include_pad=False)
        raise ValueError(f"Unknown pool {self.kind}")


class SeparableConv(nn.Module):
    """Double depthwise-separable stack (aux_models.py:436-456) — kept for the
    op-vocabulary completeness of the newer MFAS variant."""

    planes: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = (self.kernel, self.kernel)
        for _ in range(2):
            x = nn.Conv(x.shape[-1], k, feature_group_count=x.shape[-1],
                        padding="SAME", use_bias=False)(x)
            x = nn.Conv(self.planes, (1, 1), use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(x)
            x = nn.relu(x)
        return x


def create_op(conv_type, planes: int) -> nn.Module:
    """Op vocabulary dispatch (aux_models.py:467-497); accepts index or label."""
    label = (OPERATION_LABELS[conv_type]
             if isinstance(conv_type, int) else conv_type)
    if label == "I":
        return _ConvBNReLU1x1(planes)  # 1x1-conv-BN-ReLU + identity
    if label.endswith("depthconv"):
        return ConvBranch(planes, int(label[0]), separable=True)
    if label.endswith("conv"):
        return ConvBranch(planes, int(label[0]), separable=False)
    if label == "3x3 maxpool":
        return PoolBranch(planes, "max")
    if label == "3x3 avgpool":
        return PoolBranch(planes, "avg")
    raise NotImplementedError(conv_type)


def _drop_path(x, key, keep_prob: float, force_keep, train: bool):
    """Whole-tensor DropPath with inverted scaling (aux_models.py:527-539):
    keep when u <= keep_prob OR the sibling branch was already dropped.
    Returns (output, dropped)."""
    if not train:
        return x, jnp.zeros((), bool)
    u = jax.random.uniform(key)
    keep = (u <= keep_prob) | force_keep
    return jnp.where(keep, x / keep_prob, jnp.zeros_like(x)), ~keep


class CellBlock(nn.Module):
    """Two ops whose outputs sum; coupled DropPath keeps at least one branch
    alive (aux_models.py:151-174)."""

    op1_type: Any
    op2_type: Any
    planes: int
    drop_path: float = 0.1

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        a = create_op(self.op1_type, self.planes)(x1, train)
        b = create_op(self.op2_type, self.planes)(x2, train)
        keep = 1.0 - self.drop_path
        if train and self.drop_path > 0:
            k1, k2 = jax.random.split(self.make_rng("droppath"))
            a, a_dropped = _drop_path(a, k1, keep, jnp.zeros((), bool), train)
            b, _ = _drop_path(b, k2, keep, a_dropped, train)
        return a + b


class Cell(nn.Module):
    """Search-phase cell: block DAG over (x1, x2), SUM of leaf outputs + BN
    (aux_models.py:178-233). ``configuration``: per-block (op1, op2) indexes;
    ``connections``: per-block (in1, in2) into [-2=x1, -1=x2, 0..=block i]."""

    configuration: Sequence[Tuple[Any, Any]]
    connections: Sequence[Tuple[int, int]]
    planes: int
    drop_path: float = 0.1

    def _leaf_mask(self):
        used = [False] * len(self.connections)
        for c in self.connections:
            for i in c:
                if i >= 0:
                    used[i] = True
        return used

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        outs = [x1, x2]
        for (ops, conn) in zip(self.configuration, self.connections):
            outs.append(CellBlock(ops[0], ops[1], self.planes, self.drop_path)(
                outs[conn[0] + 2], outs[conn[1] + 2], train))
        leaves = [o for o, used in zip(outs[2:], self._leaf_mask()) if not used]
        out = sum(leaves)
        return nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(out)


class FixedCell(nn.Module):
    """Final-network cell: leaf outputs CONCAT depthwise + 1x1 reduction
    (conv -> ReLU -> BN, the reference's dim_reduc order; aux_models.py:236-298)."""

    configuration: Sequence[Tuple[Any, Any]]
    connections: Sequence[Tuple[int, int]]
    planes: int
    drop_path: float = 0.1

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        outs = [x1, x2]
        for (ops, conn) in zip(self.configuration, self.connections):
            outs.append(CellBlock(ops[0], ops[1], self.planes, self.drop_path)(
                outs[conn[0] + 2], outs[conn[1] + 2], train))
        used = [False] * len(self.connections)
        for c in self.connections:
            for i in c:
                if i >= 0:
                    used[i] = True
        leaves = [o for o, u in zip(outs[2:], used) if not u]
        out = jnp.concatenate(leaves, axis=-1)
        out = nn.Conv(self.planes, (1, 1), use_bias=False)(out)
        out = nn.relu(out)
        return nn.BatchNorm(use_running_average=not train)(out)


class FactorizedReduction(nn.Module):
    """Halve H/W (and retarget channels) via two offset stride-2 1x1-conv paths
    (ENAS; aux_models.py:303-343)."""

    out_planes: int
    stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.out_planes % 2 == 0, (
            "Need even number of filters when using this factorized reduction.")
        if self.stride == 1:
            x = nn.Conv(self.out_planes, (1, 1), use_bias=False)(x)
            return nn.BatchNorm(use_running_average=not train)(x)
        s = (self.stride, self.stride)
        p1 = nn.Conv(self.out_planes // 2, (1, 1), strides=s, use_bias=False)(x)
        # path 2: pad bottom/right then crop top/left => samples the odd grid
        shifted = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
        p2 = nn.Conv(self.out_planes // 2, (1, 1), strides=s, use_bias=False)(shifted)
        out = jnp.concatenate([p1, p2], axis=-1)
        return nn.BatchNorm(use_running_average=not train)(out)


class AuxiliaryHead(nn.Module):
    """Side classifier tap (aux_models.py:500-521)."""

    num_classes: int
    filters: int = 96

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.avg_pool(x, (5, 5), strides=(2, 2), count_include_pad=False)
        x = nn.Conv(self.filters * 2, (1, 1), use_bias=False)(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train)(x))
        x = nn.Conv(self.filters * 6, (2, 2), padding="VALID", use_bias=False)(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train)(x))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)
