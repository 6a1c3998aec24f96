"""Native codec core vs the pure-numpy path."""

import numpy as np
import pytest

from piml_tpu import native
from piml_tpu.scene import codec


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def _numpy_decode(meta, trajs, dests, obstacles):
    """Force the numpy fallback by monkeypatching densify off."""
    old = native.densify
    native.densify = lambda *a, **k: None
    try:
        return codec.decode_arrays(meta, trajs, dests, obstacles)
    finally:
        native.densify = old


def test_densify_matches_numpy(lib, rng):
    meta = {"time_unit": 0.08, "version": "v2.2"}
    trajs, dests = [], []
    for i in range(12):
        start = rng.randint(0, 10)
        length = rng.randint(3, 30)
        xs = np.cumsum(rng.randn(length)) + 10 * i
        ys = np.cumsum(rng.randn(length))
        trajs.append([(float(x), float(y), int(start + j))
                      for j, (x, y) in enumerate(zip(xs, ys))])
        dests.append([(float(xs[-1]), float(ys[-1]), int(start + length - 1))])
    obstacles = rng.randn(5, 2)

    fast = codec.decode_arrays(meta, trajs, dests, obstacles)
    slow = _numpy_decode(meta, trajs, dests, obstacles)
    for key in ["position", "velocity", "acceleration", "mask_p", "mask_v", "mask_a"]:
        np.testing.assert_allclose(
            np.nan_to_num(fast[key]), np.nan_to_num(slow[key]),
            atol=1e-4, err_msg=key,
        )
        if key.startswith("mask"):
            np.testing.assert_array_equal(fast[key], slow[key])


def test_sparsify_roundtrip(lib, rng):
    T, N = 20, 4
    mask = (rng.rand(T, N) < 0.6).astype(np.float32)
    pos = rng.randn(T, N, 2).astype(np.float32)
    pos[mask == 0] = np.nan
    points, offsets = native.sparsify(pos, mask)
    assert points.shape[0] == int(mask.sum())
    # each row round-trips to the dense position
    for n in range(N):
        for row in points[offsets[n]:offsets[n + 1]]:
            t = int(row[2])
            np.testing.assert_allclose(row[:2], pos[t, n], atol=1e-6)


def test_shuffled_indices(lib):
    out = native.shuffled_indices(100, seed=7)
    assert sorted(out.tolist()) == list(range(100))
    out2 = native.shuffled_indices(100, seed=7)
    np.testing.assert_array_equal(out, out2)  # deterministic
    out3 = native.shuffled_indices(100, seed=8)
    assert not np.array_equal(out, out3)
