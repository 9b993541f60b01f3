"""SPMD partition-quality regression tests (round-4/round-5 findings).

GSPMD's sharding propagation gives up inside the on-device augmentation region
(per-sample RNG + retry-RRC gathers); without an explicit re-anchor
(objectives/common.py anchor_data_sharding) XLA silently all-gathers the
augmented views and REPLICATES the whole network on every device — the step
still produces correct losses, so only a cost-model check catches it. These
tests pin the per-device FLOPs ratio between the 1-device and 8-device
compiles: data-parallel partitioning must cut per-device work substantially.

Round 5: the augment bank itself runs under shard_map over the data axis
(common.shard_map_augment) — without it GSPMD partitions the augment region
SPATIALLY and reshards at the fold boundary (measured 1.24 GB/step of
all-gather/all-to-all/permute at global batch 8192, ~25 % of the 8-device DINO
step). test_augment_region_no_resharding pins that the resharding term stays
deleted. Because the meshed bank uses per-DEVICE RNG streams
(docs/DEVIATIONS.md "Meshed augmentation RNG streams"), exact
meshed-vs-single loss equality is asserted on identity_augment configs; the
full-augment meshed loss is checked distributionally (finite + same scale).

(The driver dryrun asserts "a gradient all-reduce exists, no all-to-all" on
the same backend; scripts/collective_profile.py writes the measured collective
payload artifact used by bench.py's v5e-8 projections.)
"""
import jax
import numpy as np
import pytest

from avmnist_tpu.parallel import replicate_state, shard_batch

# mesh8 fixture: session-scoped, from tests/conftest.py


def _per_device_flops(objective, batch_arrays, mesh=None):
    state = objective.init_fn(jax.random.key(0))
    if mesh is not None:
        state = replicate_state(state, mesh)
        batch = shard_batch(batch_arrays, mesh)
    else:
        one = jax.devices()[0]
        state = jax.device_put(state, one)
        batch = {k: jax.device_put(np.asarray(v), one)
                 for k, v in batch_arrays.items()}
    compiled = objective.step_fn.lower(state, batch, jax.random.key(1)).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    loss = float(jax.device_get(
        compiled(state, batch, jax.random.key(1))[1]["train_loss"]))
    return float(ca.get("flops", 0.0)), compiled, loss


def _batch(synthetic_arrays, n=32):
    train, _ = synthetic_arrays
    return train.gather(np.arange(n))


def _resharding_bytes(compiled):
    """Sum of batch-shaped resharding collectives (all-gather / all-to-all /
    collective-permute) in the optimized HLO, via the same extractor that
    writes docs/collective_profile.json."""
    from scripts.collective_profile import collect

    ops = collect(compiled.as_text())
    return sum(o["bytes"] for o in ops
               if o["op"] in ("all-gather", "all-to-all", "collective-permute"))


def test_dino_step_partitions_over_mesh(synthetic_arrays, mesh8):
    """The 8-device DINO step must do ~1/8 the per-device FLOPs of the 1-device
    compile (threshold 1/4 allows collective/padding overhead) and must contain
    a gradient all-reduce. Full-augment config: per-device augment streams make
    the meshed loss a different (distributionally identical) draw, so the loss
    check here is scale-level; exactness is pinned by
    test_dino_mesh_loss_exact_identity_augment."""
    from avmnist_tpu.objectives.dino import DinoConfig, make_dino_objective

    cfg = DinoConfig(model_name="multi_central", projection_dim=16,
                     output_dim=32, encoder_output_dim=32,
                     n_global_views=2, n_local_views=2)
    batch = _batch(synthetic_arrays)
    f1, _, loss1 = _per_device_flops(make_dino_objective(cfg), batch)
    f8, compiled, loss8 = _per_device_flops(make_dino_objective(cfg, mesh=mesh8),
                                            batch, mesh8)
    assert f8 < f1 / 4, (
        f"replicated lowering: per-device flops {f8:.3e} vs 1-device {f1:.3e}")
    assert "all-reduce" in compiled.as_text()
    # different augment draws, same distribution: the init-state DINO loss is
    # dominated by the temperature/centering structure, not the crop draws
    assert np.isfinite(loss8)
    assert abs(loss8 - loss1) / max(abs(loss1), 1e-9) < 0.25, (loss1, loss8)


def test_dino_mesh_loss_exact_identity_augment(synthetic_arrays, mesh8):
    """Meshed == single-device DINO loss EXACTLY (f32 tolerance) when the
    augment bank is the identity — proves the sharded network/loss/EMA/center
    math is a pure layout change; only the augment RNG streams differ under a
    mesh (docs/DEVIATIONS.md)."""
    from avmnist_tpu.objectives.dino import DinoConfig, make_dino_objective

    cfg = DinoConfig(model_name="multi_central", projection_dim=16,
                     output_dim=32, encoder_output_dim=32,
                     n_global_views=2, n_local_views=2, identity_augment=True)
    batch = _batch(synthetic_arrays)
    _, _, loss1 = _per_device_flops(make_dino_objective(cfg), batch)
    _, _, loss8 = _per_device_flops(make_dino_objective(cfg, mesh=mesh8),
                                    batch, mesh8)
    assert abs(loss8 - loss1) / max(abs(loss1), 1e-9) < 2e-2, (loss1, loss8)


def test_augment_region_no_resharding(synthetic_arrays, mesh8):
    """The shard_map'd augment bank must compile with ZERO batch-shaped
    resharding collectives: before the round-5 fix the 8-device DINO step
    carried 19.3 MB of all-gather/all-to-all/permute at global batch 128
    (1.24 GB at the bench batch — ~25 % collective overhead,
    docs/collective_profile.json r4). Allow only a trivial residual (<1 % of
    the r4 payload at this test's smaller shapes)."""
    from avmnist_tpu.objectives.dino import DinoConfig, make_dino_objective

    cfg = DinoConfig(model_name="multi_central", projection_dim=16,
                     output_dim=32, encoder_output_dim=32,
                     n_global_views=2, n_local_views=2)
    batch = _batch(synthetic_arrays)
    _, compiled, _ = _per_device_flops(make_dino_objective(cfg, mesh=mesh8),
                                       batch, mesh8)
    resh = _resharding_bytes(compiled)
    assert resh < 200_000, (
        f"augment-boundary resharding is back: {resh} bytes of "
        f"all-gather/all-to-all/permute in the 8-device DINO step")


@pytest.mark.slow
def test_simclr_step_partitions_over_mesh(synthetic_arrays, mesh8):
    from avmnist_tpu.objectives.simclr import SimCLRConfig, make_simclr_objective

    cfg = SimCLRConfig(output_dim=32, projection_dim=16, audio_only=True)
    batch = _batch(synthetic_arrays)
    f1, _, loss1 = _per_device_flops(make_simclr_objective(cfg), batch)
    f8, compiled, loss8 = _per_device_flops(make_simclr_objective(cfg, mesh=mesh8),
                                            batch, mesh8)
    assert f8 < f1 / 4, (
        f"replicated lowering: per-device flops {f8:.3e} vs 1-device {f1:.3e}")
    assert "all-reduce" in compiled.as_text()
    assert _resharding_bytes(compiled) < 200_000
    # NT-Xent at init on random crops: same scale, different draws
    assert np.isfinite(loss8)
    assert abs(loss8 - loss1) / max(abs(loss1), 1e-9) < 0.25, (loss1, loss8)
