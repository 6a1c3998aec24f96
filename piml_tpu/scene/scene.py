"""The :class:`Scene` pytree — fixed-capacity masked scene state.

The reference keeps scene state in a mutable ``RawData`` object of dense torch
tensors that are dynamically grown along both time and agent axes and use NaN
to mark out-of-frame agents (reference: src/data/data.py:14-340).  On TPU,
shapes must be static under ``jit``; ``Scene`` therefore carries padded
``(T, N)`` arrays with explicit masks and is registered as a JAX pytree so it
flows through ``jit`` / ``scan`` / ``grad`` unchanged.  NaN padding is kept in
``position`` / ``destination`` / ``waypoints`` deliberately — it is load-bearing
in the reference's feature pipeline (distance=inf handling, arrival
retirement) and is handled branch-free by the physics kernels.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from piml_tpu.scene import codec


@struct.dataclass
class Scene:
    """Dense scene state.

    Shapes (T = frames, N = agent capacity, D = waypoint capacity, M = obstacle
    points):

    - ``position`` / ``velocity`` / ``acceleration`` / ``destination``: (T, N, 2)
    - ``waypoints``: (D, N, 2); ``dest_idx``: (T, N) int32; ``dest_num``: (N,) int32
    - ``obstacles``: (M, 2)
    - ``mask_p`` / ``mask_v`` / ``mask_a``: (T, N) float32 presence masks
    """

    position: jax.Array
    velocity: jax.Array
    acceleration: jax.Array
    destination: jax.Array
    waypoints: jax.Array
    dest_idx: jax.Array
    dest_num: jax.Array
    obstacles: jax.Array
    mask_p: jax.Array
    mask_v: jax.Array
    mask_a: jax.Array
    meta_data: Dict[str, Any] = struct.field(pytree_node=False, default_factory=dict)

    # ------------------------------------------------------------------
    @property
    def num_steps(self) -> int:
        return self.position.shape[0]

    @property
    def num_pedestrians(self) -> int:
        return self.position.shape[1]

    @property
    def num_destinations(self) -> int:
        return self.waypoints.shape[0]

    @property
    def time_unit(self) -> float:
        return float(self.meta_data["time_unit"])

    # ------------------------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "Scene":
        """Load a v2.2 ``.npy`` scene file."""
        d = codec.decode(path)
        return cls.from_arrays(d)

    @classmethod
    def from_arrays(cls, d: Dict[str, np.ndarray]) -> "Scene":
        # HOST arrays by design: scene I/O, hashing (feature-cache keys) and
        # wrangling are host-side — eager jnp.asarray here parked every scene
        # on the TPU and made np.asarray(scene.position) a device-to-host
        # pull through the tunnel, which can block for minutes when another
        # process holds the chip (measured: the round-3 iter0v hang).  The
        # jitted compute transfers exactly what it needs, when it needs it.
        return cls(
            position=np.asarray(d["position"], np.float32),
            velocity=np.asarray(d["velocity"], np.float32),
            acceleration=np.asarray(d["acceleration"], np.float32),
            destination=np.asarray(d["destination"], np.float32),
            waypoints=np.asarray(d["waypoints"], np.float32),
            dest_idx=np.asarray(d["dest_idx"], np.int32),
            dest_num=np.asarray(d["dest_num"], np.int32),
            obstacles=np.asarray(d["obstacles"], np.float32),
            mask_p=np.asarray(d["mask_p"], np.float32),
            mask_v=np.asarray(d["mask_v"], np.float32),
            mask_a=np.asarray(d["mask_a"], np.float32),
            meta_data=d["meta_data"],
        )

    def save(self, path: str) -> None:
        """Round-trip back to the v2.2 file format."""
        codec.encode(
            path,
            self.meta_data,
            np.asarray(self.position),
            np.asarray(self.mask_p),
            np.asarray(self.waypoints),
            np.asarray(self.destination),
            np.asarray(self.obstacles),
        )

    # ------------------------------------------------------------------
    def pad_agents(self, n_cap: int) -> "Scene":
        """Pad the agent axis to capacity ``n_cap`` with inactive slots.

        Replaces the reference's dynamic ``add_pedestrians`` tensor growth
        (src/data/data.py:259-303) with static pre-allocation.
        """
        n = self.num_pedestrians
        if n_cap < n:
            raise ValueError(f"capacity {n_cap} < current agents {n}")
        if n_cap == n:
            return self
        dn = n_cap - n

        def pad2(x, fill):
            return jnp.concatenate(
                [x, jnp.full(x.shape[:-2] + (dn, x.shape[-1]), fill, x.dtype)], axis=-2
            )

        def padm(x, fill=0.0):
            return jnp.concatenate(
                [x, jnp.full(x.shape[:-1] + (dn,), fill, x.dtype)], axis=-1
            )

        return self.replace(
            position=pad2(self.position, jnp.nan),
            velocity=pad2(self.velocity, 0.0),
            acceleration=pad2(self.acceleration, 0.0),
            destination=pad2(self.destination, jnp.nan),
            waypoints=pad2(self.waypoints, jnp.nan),
            dest_idx=padm(self.dest_idx, 0),
            dest_num=padm(self.dest_num, 1),
            mask_p=padm(self.mask_p),
            mask_v=padm(self.mask_v),
            mask_a=padm(self.mask_a),
        )

    def pad_time(self, t_cap: int) -> "Scene":
        t = self.num_steps
        if t_cap < t:
            raise ValueError(f"capacity {t_cap} < current steps {t}")
        if t_cap == t:
            return self
        dt_ = t_cap - t

        def padt(x, fill):
            return jnp.concatenate(
                [x, jnp.full((dt_,) + x.shape[1:], fill, x.dtype)], axis=0
            )

        return self.replace(
            position=padt(self.position, jnp.nan),
            velocity=padt(self.velocity, 0.0),
            acceleration=padt(self.acceleration, 0.0),
            destination=padt(self.destination, jnp.nan),
            dest_idx=padt(self.dest_idx, 0),
            mask_p=padt(self.mask_p, 0.0),
            mask_v=padt(self.mask_v, 0.0),
            mask_a=padt(self.mask_a, 0.0),
        )


def rotate(scene: Scene, theta_deg: float) -> Scene:
    """Rotation augmentation (reference: src/utils/data_augmentation.py:11-40)."""
    th = np.deg2rad(theta_deg)
    rot = jnp.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], jnp.float32)
    return _linear_map(scene, rot)


def mirror(scene: Scene, theta_deg: float) -> Scene:
    """Mirror augmentation (reference: src/utils/data_augmentation.py:42-69)."""
    th = np.deg2rad(theta_deg)
    m = jnp.array(
        [[np.cos(2 * th), np.sin(2 * th)], [np.sin(2 * th), -np.cos(2 * th)]], jnp.float32
    )
    return _linear_map(scene, m)


def _linear_map(scene: Scene, mat: jax.Array) -> Scene:
    ap = lambda x: jnp.einsum("ij,...j->...i", mat, x)
    return scene.replace(
        position=ap(scene.position),
        velocity=ap(scene.velocity),
        acceleration=ap(scene.acceleration),
        destination=ap(scene.destination),
        waypoints=ap(scene.waypoints),
        obstacles=ap(scene.obstacles) if scene.obstacles.size else scene.obstacles,
    )


def random_walk_noise(key: jax.Array, velocity: jax.Array, mask_v: jax.Array,
                      noise_std_last_step: float) -> jax.Array:
    """GNS-style cumulative velocity noise (reference: src/functions/noises.py:9-19)."""
    t = velocity.shape[0]
    noise = jax.random.normal(key, velocity.shape) * (noise_std_last_step / t ** 0.5)
    noise = noise * mask_v[..., None]
    noise = jnp.cumsum(noise, axis=0)
    return noise * mask_v[..., None]
