"""MFAS cell machinery (models/mfas.py vs reference aux_models.py:151-539)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avmnist_tpu.models.mfas import (
    AuxiliaryHead,
    Cell,
    CellBlock,
    FactorizedReduction,
    FixedCell,
    OPERATION_LABELS,
    create_op,
)

P = 8  # planes


def _init_apply(mod, *xs, train=True, rngs_extra=None):
    rngs = {"params": jax.random.key(0)}
    if rngs_extra:
        rngs.update(rngs_extra)
    vs = mod.init(rngs, *xs, train=train)
    out, _ = mod.apply(vs, *xs, train=train, rngs=rngs_extra,
                       mutable=["batch_stats"])
    return out


def test_all_ops_preserve_shape():
    x = jnp.ones((2, 12, 12, 4))
    for i, label in enumerate(OPERATION_LABELS):
        op = create_op(i, P)
        vs = op.init(jax.random.key(0), x, train=False)
        y = op.apply(vs, x, train=False)
        assert y.shape == (2, 12, 12, P), label
        # index and label dispatch agree structurally
        assert type(create_op(label, P)) is type(op)


def test_cellblock_sums_two_branches():
    x1 = jnp.ones((2, 8, 8, P))
    x2 = 2.0 * jnp.ones((2, 8, 8, P))
    block = CellBlock("I", "I", P, drop_path=0.0)
    out = _init_apply(block, x1, x2)
    assert out.shape == (2, 8, 8, P)


def test_droppath_keeps_at_least_one_branch():
    """Coupled DropPath: if branch 1 drops, branch 2 is force-kept
    (aux_models.py:167-170) — the sum is never all-zero."""
    x = jnp.ones((1, 4, 4, P))
    block = CellBlock("I", "I", P, drop_path=0.95)  # drop almost always
    rngs = {"params": jax.random.key(0), "droppath": jax.random.key(0)}
    vs = block.init(rngs, x, x, train=True)
    zero_both = 0
    for s in range(40):
        out, _ = block.apply(vs, x, x, train=True,
                             rngs={"droppath": jax.random.key(s)},
                             mutable=["batch_stats"])
        if float(jnp.abs(out).max()) == 0.0:
            zero_both += 1
    assert zero_both == 0


def test_cell_and_fixedcell_dag():
    """2-block DAG: block0(x1, x2), block1(x1, block0). Only block1 is a leaf,
    so Cell sums one output and FixedCell concats one (then 1x1-reduces)."""
    cfg = [(0, 0), (1, 2)]
    conns = [(-2, -1), (-2, 0)]
    x1 = jnp.ones((2, 8, 8, P))
    x2 = jnp.ones((2, 8, 8, P))
    for cls in (Cell, FixedCell):
        cell = cls(configuration=cfg, connections=conns, planes=P, drop_path=0.0)
        out = _init_apply(cell, x1, x2)
        assert out.shape == (2, 8, 8, P), cls.__name__


def test_cell_multi_leaf_concat_width():
    """Two independent blocks -> two leaves: FixedCell concats to 2P before the
    1x1 reduction back to P; Cell sums (shape P throughout)."""
    cfg = [(0, 0), (1, 1)]
    conns = [(-2, -1), (-2, -1)]
    x = jnp.ones((2, 6, 6, P))
    cell = FixedCell(configuration=cfg, connections=conns, planes=P, drop_path=0.0)
    vs = cell.init({"params": jax.random.key(0)}, x, x, train=False)
    # the reduction conv consumes 2P input channels
    reduc_kernels = [v for k, v in jax.tree_util.tree_leaves_with_path(vs["params"])
                     if v.ndim == 4 and v.shape[2] == 2 * P]
    assert reduc_kernels, "concat width not 2*planes"
    out = _init_apply(cell, x, x)
    assert out.shape == (2, 6, 6, P)


def test_factorized_reduction_halves_hw():
    x = jnp.ones((2, 9, 9, 4))
    fr = FactorizedReduction(out_planes=P)
    out = _init_apply(fr, x)
    assert out.shape == (2, 5, 5, P)  # ceil(9/2) with VALID-on-strided-1x1 = 5
    fr1 = FactorizedReduction(out_planes=P, stride=1)
    out1 = _init_apply(fr1, x)
    assert out1.shape == (2, 9, 9, P)


def test_auxiliary_head_logits():
    x = jnp.ones((2, 14, 14, 96))
    head = AuxiliaryHead(num_classes=10, filters=96)
    out = _init_apply(head, x)
    assert out.shape == (2, 10)
