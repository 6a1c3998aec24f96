"""Dataset processors and baseline exporters on synthetic fixtures."""

import os

import numpy as np
import pytest

from piml_tpu.data import processing
from piml_tpu.scene import Scene, codec


def test_homography_projective():
    pts = np.array([[100.0, 200.0], [500.0, 800.0]])
    out = processing.apply_homography(pts, processing.GC_HOMOGRAPHY)
    assert out.shape == (2, 2)
    assert np.isfinite(out).all()


def test_interpolate_cubic_and_fallback():
    traj = np.array([[0.0, 0, 0], [1, 1, 10], [2, 0, 20], [3, -1, 30]])
    frames = np.arange(0, 31)
    out = processing.interpolate_trajectory(traj, frames)
    assert out.shape == (31, 3)
    np.testing.assert_allclose(out[0, :2], [0, 0], atol=1e-9)
    np.testing.assert_allclose(out[30, :2], [3, -1], atol=1e-9)
    # two points: cubic impossible → linear fallback
    short = np.array([[0.0, 0, 0], [1, 2, 10]])
    out = processing.interpolate_trajectory(short, np.arange(0, 11))
    np.testing.assert_allclose(out[5, :2], [0.5, 1.0], atol=1e-9)


def test_split_at_gaps():
    t = [[(0.0, 0.0, 0), (0.1, 0.0, 1), (0.2, 0.0, 5), (0.3, 0.0, 6)]]
    parts = processing.split_at_gaps(t)
    assert len(parts) == 2
    assert [p[0][2] for p in parts] == [0, 5]


def test_process_gc_fixture(tmp_path):
    """Synthetic GC annotation dir → v2.2 scene loadable by the codec."""
    ann = tmp_path / "ann"
    ann.mkdir()
    # two pedestrians crossing the crop window, image coords near the
    # homography's valid region, frames sampled every 20 (25 fps)
    for i, x0 in [(1, 700), (2, 1000)]:
        rows = []
        for j in range(40):
            rows += [str(x0 + 6 * j), str(500 + 3 * j), str(19000 + 20 * j)]
        (ann / f"{i:06d}.txt").write_text("\n".join(rows))
    out = str(tmp_path / "gc.npy")
    processing.process_gc(str(ann), out, ped_range=(1, 3),
                          time_range_s=(760, 790),
                          space_range=((0, 0), (40, 40)))
    scene = Scene.load(out)
    assert scene.num_pedestrians >= 1
    assert scene.meta_data["time_unit"] == pytest.approx(0.08)
    assert scene.obstacles.shape[0] == 100  # circular obstacle


def test_process_ucy_fixture(tmp_path):
    vsp = tmp_path / "students003.vsp"
    lines = ["2 - number of splines"]
    for start in (0, 100):
        lines.append("5 - spline points")
        for j in range(5):
            lines.append(f"{100 + 20 * j} {200 + 10 * j} {start + j * 25} 0")
    vsp.write_text("\n".join(lines))
    out = str(tmp_path / "ucy.npy")
    processing.process_ucy(str(vsp), out, time_range_s=(0, 10))
    scene = Scene.load(out)
    assert scene.num_pedestrians == 2
    assert scene.meta_data["time_unit"] == pytest.approx(0.08)
    # UCY has no obstacles → codec substitutes the far-away dummy pair
    np.testing.assert_allclose(np.asarray(scene.obstacles),
                               codec.DUMMY_OBSTACLES)


def test_exporters(tmp_path, toy_path):
    scene = Scene.load(toy_path)
    for fmt, sep in [("sgan", "\t"), ("stgcnn", "\t")]:
        out = processing.export_scene(scene, str(tmp_path / f"{fmt}.txt"), fmt)
        lines = open(out).read().strip().split("\n")
        assert len(lines) == int(np.asarray(scene.mask_p).sum())
        first = lines[0].split(sep)
        assert len(first) == 4
    out = processing.export_scene(scene, str(tmp_path / "sl.txt"), "social_lstm")
    first = open(out).readline().split(" ")
    assert len(first) == 4  # frame ped y x
