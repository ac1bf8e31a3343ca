"""Patch pipeline: h5 sharding, mesh padding, extraction, whitening."""

import numpy as np
import pytest

from prosper_tpu.data.patches import (
    extract_patches,
    load_h5_shard,
    pad_for_mesh,
    synthetic_patches,
    whiten,
    write_h5_dataset,
)


def test_h5_shard_roundtrip(tmp_path):
    y = np.arange(100 * 4, dtype=np.float32).reshape(100, 4)
    p = str(tmp_path / "d.h5")
    write_h5_dataset(p, y)
    parts = [load_h5_shard(p, parts=3, index=i) for i in range(3)]
    np.testing.assert_array_equal(np.concatenate(parts), y)


def test_pad_for_mesh():
    y = np.ones((100, 4), np.float32)
    d = pad_for_mesh(y, n_shards=8, chunk=16)
    assert d["y"].shape[0] % (8 * 16) == 0
    assert d["valid"].sum() == 100
    assert (d["y"][100:] == 0).all()


def test_extract_patches_dc_removed():
    rng = np.random.default_rng(0)
    imgs = rng.random((3, 32, 32))
    p = extract_patches(imgs, 8, 50, seed=1)
    assert p.shape == (50, 64)
    np.testing.assert_allclose(p.mean(axis=1), 0.0, atol=1e-5)


def test_whiten_decorrelates():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((4, 4))
    y = rng.standard_normal((5000, 4)) @ A.T
    yw, mean, T = whiten(y)
    cov = yw.T @ yw / yw.shape[0]
    np.testing.assert_allclose(cov, np.eye(4), atol=0.1)


def test_synthetic_patches_spectrum():
    p = synthetic_patches(200, patch_size=16, seed=3)
    assert p.shape == (200, 256)
    assert abs(p.std() - 1.0) < 0.1
    # no DC component
    np.testing.assert_allclose(p.reshape(200, -1).mean(axis=1), 0.0, atol=0.05)


def test_padded_training_ignores_padding():
    """valid=0 rows must not affect learned parameters."""
    from prosper_tpu.data.bars import bars_gt_params
    from prosper_tpu.engine.anneal import LinearAnnealing
    from prosper_tpu.engine.em import EM
    from prosper_tpu.models.linear import BSC

    model = BSC(16, 8, 5, 3, chunk=64)
    gt = bars_gt_params(model, intensity=10.0, sigma=1.0)
    data = model.generate_data(gt, 100, seed=4)

    y64 = data["y"][:64]
    init = model.standard_init({"y": y64}, seed=5)

    # exact-fit padding is a no-op
    assert pad_for_mesh(y64, n_shards=1, chunk=64)["y"].shape[0] == 64

    padded = pad_for_mesh(y64, n_shards=1, chunk=128)
    em_pad = EM(model, LinearAnnealing(5),
                {"y": padded["y"], "valid": padded["valid"]},
                params=dict(init), seed=5)
    em_ref = EM(model, LinearAnnealing(5), {"y": y64},
                params=dict(init), seed=5)
    p_pad = em_pad.run()
    p_ref = em_ref.run()
    np.testing.assert_allclose(np.asarray(p_pad["W"]), np.asarray(p_ref["W"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(p_pad["sigma"]), float(p_ref["sigma"]),
                               rtol=1e-3)
