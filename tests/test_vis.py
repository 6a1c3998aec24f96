"""Visualization smoke tests (Agg backend, no display)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from piml_tpu.scene import Scene
from piml_tpu.utils.vis import _actors, _update, state_animation_compare


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
