import numpy as np

from avmnist_tpu.data import (
    Batches,
    load_avmnist,
    make_synthetic_avmnist,
    split_train_val,
    prefetch_to_device,
)


def test_synthetic_roundtrip(synthetic_dir):
    train = load_avmnist(synthetic_dir, "train")
    test = load_avmnist(synthetic_dir, "test")
    assert len(train) == 256 and len(test) == 64
    assert train.image.shape == (256, 28, 28)
    assert train.audio.shape == (256, 112, 112) and train.audio.dtype == np.uint8
    b = train.gather(np.arange(8))
    assert b["image"].shape == (8, 28, 28) and b["image"].dtype == np.float32
    assert b["audio"].shape == (8, 112, 112) and b["audio"].dtype == np.uint8
    assert b["label"].shape == (8,)


def test_audio_is_headerless_memmap(synthetic_dir):
    # The audio artifact must NOT be a standard .npy (reference writes raw memmaps,
    # audio_gen.ipynb cell 8) — first bytes are pixel data, not the NPY magic.
    with open(f"{synthetic_dir}/audio/train_data_augmented_burst_noise.npy", "rb") as f:
        assert f.read(6) != b"\x93NUMPY"


def test_split_deterministic(synthetic_arrays):
    train, _ = synthetic_arrays
    a, b = split_train_val(train, 200, 56, seed=1)
    a2, b2 = split_train_val(train, 200, 56, seed=1)
    assert np.array_equal(a.indices, a2.indices)
    assert len(np.intersect1d(a.indices, b.indices)) == 0
    c, _ = split_train_val(train, 200, 56, seed=2)
    assert not np.array_equal(a.indices, c.indices)


def test_batches_shapes_and_reshuffle(synthetic_arrays):
    train, _ = synthetic_arrays
    split, _ = split_train_val(train, 200, 56, seed=0)
    batches = Batches(split, batch_size=64, shuffle=True, seed=3)
    e1 = [b["label"].copy() for b in batches]
    e2 = [b["label"].copy() for b in batches]
    assert len(e1) == 3  # drop remainder: 200 // 64
    assert all(b.shape == (64,) for b in e1)
    assert not all(np.array_equal(x, y) for x, y in zip(e1, e2))  # epoch reshuffle


def test_batches_pad_final(synthetic_arrays):
    train, _ = synthetic_arrays
    batches = Batches(train, batch_size=100, shuffle=False, drop_remainder=True, pad_final=True)
    out = list(batches)
    assert len(out) == 3
    assert out[-1]["image"].shape == (100, 28, 28)
    assert int(out[-1]["valid"]) == 56


def test_compute_audio_stats(synthetic_arrays):
    train, _ = synthetic_arrays
    m, s = train.compute_audio_stats()
    x = np.asarray(train.audio, np.float32) / 255.0
    assert np.isclose(m, x.reshape(len(x), -1).mean(1).mean(), atol=1e-5)
    assert np.isclose(s, x.reshape(len(x), -1).std(1).mean(), atol=1e-5)


def test_host_shard(synthetic_arrays):
    from avmnist_tpu.data import host_shard

    train, _ = synthetic_arrays
    shards = [host_shard(train, p, 4) for p in range(4)]
    assert sum(len(s) for s in shards) == len(train)
    all_idx = np.concatenate([s.indices for s in shards])
    assert len(np.unique(all_idx)) == len(train)  # disjoint cover
    split, _ = split_train_val(train, 200, 56, seed=0)
    sub = host_shard(split, 1, 2)
    assert len(sub) == 100
    assert set(sub.indices) <= set(split.indices)


def test_prefetch_to_device(synthetic_arrays, mesh8):
    import jax
    from avmnist_tpu.parallel import batch_sharding

    train, _ = synthetic_arrays
    batches = Batches(train, batch_size=64, shuffle=False)
    out = list(prefetch_to_device(batches, size=2, sharding=batch_sharding(mesh8)))
    assert len(out) == 4
    assert out[0]["image"].shape == (64, 28, 28)
    # sharded over 8 devices on dim 0
    assert len(out[0]["image"].sharding.device_set) == 8
