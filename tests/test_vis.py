"""Visualization smoke tests (Agg backend, no display)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from piml_tpu.scene import Scene
from piml_tpu.utils.vis import (_actors, _update, state_animation,
                                state_animation_compare)


def test_animation_frames_render(toy_path):
    scene = Scene.load(toy_path)
    fig, ax = plt.subplots()
    actors = _actors(ax, scene)
    # render an empty frame and a populated one
    drawn0 = _update(0, scene, actors)
    present = np.asarray(scene.mask_p).sum(1)
    frame = int(np.argmax(present))
    drawn = _update(frame, scene, actors)
    assert len(drawn) > len(drawn0) or present[frame] == present[0]
    plt.close(fig)


def test_compare_animation_builds(toy_path):
    scene = Scene.load(toy_path)
    fig, ax = plt.subplots()
    ani = state_animation_compare(ax, scene, scene)
    assert ani is not None
    plt.close(fig)


def _time_slice(scene, t):
    """First ``t`` frames of a scene (time-leading fields only)."""
    return scene.replace(
        position=scene.position[:t], velocity=scene.velocity[:t],
        acceleration=scene.acceleration[:t], destination=scene.destination[:t],
        dest_idx=scene.dest_idx[:t], mask_p=scene.mask_p[:t],
        mask_v=scene.mask_v[:t], mask_a=scene.mask_a[:t],
    )


def _export_gif(scene, out):
    from matplotlib import animation

    fig, ax = plt.subplots()
    state_animation(ax, scene, movie_file=str(out),
                    writer=animation.PillowWriter(fps=5))
    plt.close(fig)
    assert out.exists() and out.stat().st_size > 1000


def test_animation_export_gif(tmp_path):
    """Movie export smoke test: ffmpeg is absent in this container, so the
    Pillow writer exports a GIF (same FuncAnimation.save path as the
    reference's mp4 export, visualization.py:90-95).  Default path renders
    a 20-frame slice; the full 750-frame export is the slow variant."""
    scene = _time_slice(
        Scene.load("/root/reference/data/GC_Dataset/GC_Dataset_toy1.npy"), 20)
    _export_gif(scene, tmp_path / "toy.gif")


@pytest.mark.slow
def test_animation_export_gif_full(tmp_path):
    """Full-length GC toy export (226 s): opt-in via -m slow."""
    scene = Scene.load("/root/reference/data/GC_Dataset/GC_Dataset_toy1.npy")
    _export_gif(scene, tmp_path / "toy_full.gif")


def test_animation_html_and_mp4_fallback(tmp_path, toy_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from piml_tpu.scene import Scene
    from piml_tpu.utils.vis import state_animation

    import jax

    scene = Scene.load(toy_path)
    T = scene.num_steps
    # 3-frame slice keeps the render cheap (writers rasterize every frame)
    small = jax.tree_util.tree_map(
        lambda x: x[:3] if hasattr(x, "shape") and x.shape and x.shape[0] == T
        else x, scene)

    fig, ax = plt.subplots()
    html = str(tmp_path / "anim.html")
    state_animation(ax, small, movie_file=html)
    assert (tmp_path / "anim.html").stat().st_size > 0
    plt.close(fig)

    fig, ax = plt.subplots()
    mp4 = str(tmp_path / "anim.mp4")
    import warnings

    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        state_animation(ax, small, movie_file=mp4)
    # ffmpeg absent in this image -> graceful GIF fallback
    assert (tmp_path / "anim.gif").exists() or (tmp_path / "anim.mp4").exists()
    plt.close(fig)
