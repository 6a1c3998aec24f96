"""Golden-file tests of the v2.2 scene codec against the shipped toy scenes."""

import numpy as np
import pytest

from piml_tpu.scene import Scene, codec


def test_decode_toy_shapes(toy_path):
    d = codec.decode(toy_path)
    T, N, _ = d["position"].shape
    assert N == 3
    assert d["velocity"].shape == (T, N, 2)
    assert d["mask_p"].shape == (T, N)
    assert d["meta_data"]["time_unit"] == pytest.approx(0.08)
    # NaN exactly where absent
    absent = d["mask_p"] == 0
    assert np.isnan(d["position"][absent]).all()
    assert np.isfinite(d["position"][~absent]).all()
    # masks drop trailing frames per trajectory
    assert (d["mask_v"].sum(0) == d["mask_p"].sum(0) - 1).all()
    assert (d["mask_a"].sum(0) == d["mask_p"].sum(0) - 2).all()


def test_finite_difference_semantics(toy_path):
    d = codec.decode(toy_path)
    dt = d["meta_data"]["time_unit"]
    p, v, mv = d["position"], d["velocity"], d["mask_v"]
    ts, ns = np.nonzero(mv)
    expect = (p[ts + 1, ns] - p[ts, ns]) / dt
    np.testing.assert_allclose(v[ts, ns], expect, rtol=1e-5, atol=1e-5)
    # velocity zero where mask_v == 0
    assert (v[mv == 0] == 0).all()


def test_roundtrip(toy_path, tmp_path):
    d = codec.decode(toy_path)
    out = str(tmp_path / "roundtrip.npy")
    codec.encode(out, d["meta_data"], d["position"], d["mask_p"], d["waypoints"],
                 d["destination"], d["obstacles"])
    d2 = codec.decode(out)
    np.testing.assert_allclose(
        np.nan_to_num(d["position"]), np.nan_to_num(d2["position"]), atol=1e-6
    )
    np.testing.assert_array_equal(d["mask_p"], d2["mask_p"])
    np.testing.assert_array_equal(d["dest_idx"], d2["dest_idx"])
    np.testing.assert_allclose(d["obstacles"], d2["obstacles"], atol=1e-6)


def test_scene_pytree(toy_path):
    import jax

    scene = Scene.load(toy_path)
    leaves = jax.tree_util.tree_leaves(scene)
    assert len(leaves) == 11
    scene2 = scene.pad_agents(8).pad_time(scene.num_steps + 5)
    assert scene2.num_pedestrians == 8
    assert scene2.mask_p.shape[0] == scene.num_steps + 5
    assert float(scene2.mask_p[:, 3:].sum()) == 0.0


def test_dummy_obstacles():
    meta = {"time_unit": 0.08, "version": "v2.2"}
    trajs = [[(0.0, 0.0, 0), (0.1, 0.0, 1), (0.2, 0.0, 2)]]
    dests = [[(1.0, 0.0, 0)]]
    d = codec.decode_arrays(meta, trajs, dests, np.zeros((0,)))
    np.testing.assert_allclose(d["obstacles"], codec.DUMMY_OBSTACLES)
