"""Oracle tests for `random_walk_noise` (reference: src/functions/noises.py:9-19)
and `rollout_mae_powerlaw` (reference: src/utils/utils.py:102-128) — the two
components VERDICT r3 flagged as implemented-but-untested."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from piml_tpu.scene import random_walk_noise
from piml_tpu.utils.analysis import rollout_mae_powerlaw


class TestRandomWalkNoise:
    def test_matches_numpy_oracle_of_reference_transform(self):
        """Same Gaussian draw pushed through a numpy transcription of the
        reference's scale → mask → cumsum → mask pipeline must match exactly."""
        key = jax.random.PRNGKey(7)
        t, n = 9, 5
        rng = np.random.default_rng(3)
        velocity = jnp.asarray(rng.normal(size=(t, n, 2)), jnp.float32)
        mask = jnp.asarray(rng.integers(0, 2, size=(t, n)), jnp.float32)
        std = 0.25

        out = random_walk_noise(key, velocity, mask, std)

        # reconstruct the identical raw draw, then apply the reference
        # semantics in numpy (noises.py:14-18): scale by std/sqrt(T), mask,
        # cumulative-sum over time, mask again.
        z = np.asarray(jax.random.normal(key, velocity.shape))
        expected = z * (std / t ** 0.5)
        expected = expected * np.asarray(mask)[..., None]
        expected = np.cumsum(expected, axis=0)
        expected = expected * np.asarray(mask)[..., None]
        np.testing.assert_allclose(np.asarray(out), expected, rtol=0, atol=0)

    def test_masked_agents_get_zero_noise(self):
        key = jax.random.PRNGKey(0)
        t, n = 6, 4
        velocity = jnp.ones((t, n, 2))
        mask = jnp.zeros((t, n)).at[:, 0].set(1.0)
        out = np.asarray(random_walk_noise(key, velocity, mask, 1.0))
        assert np.all(out[:, 1:] == 0.0)
        assert np.any(out[:, 0] != 0.0)

    def test_last_step_variance_scales_to_noise_std(self):
        """Variance of the final accumulated step must be ~noise_std² — the
        point of the 1/sqrt(T) per-step scaling."""
        key = jax.random.PRNGKey(42)
        t, n, std = 16, 4096, 0.3
        velocity = jnp.zeros((t, n, 2))
        mask = jnp.ones((t, n))
        out = np.asarray(random_walk_noise(key, velocity, mask, std))
        got = out[-1].std()
        assert got == pytest.approx(std, rel=0.05)

    def test_interrupted_presence_masks_resumed_walk(self):
        """An agent masked out mid-trajectory contributes no increments while
        absent, and its walk resumes from the pre-gap value (cumsum of masked
        increments), matching the reference's mask-cumsum-mask order."""
        key = jax.random.PRNGKey(5)
        t = 8
        velocity = jnp.zeros((t, 1, 2))
        mask = jnp.asarray([[1], [1], [0], [0], [1], [1], [1], [1]], jnp.float32)
        out = np.asarray(random_walk_noise(key, velocity, mask, 1.0))
        # absent frames are zeroed by the outer mask
        assert np.all(out[2:4] == 0.0)
        # resumed frame = pre-gap walk + new increment (no increments accrued
        # during the gap)
        z = np.asarray(jax.random.normal(key, velocity.shape)) * (1.0 / t ** 0.5)
        expected_resume = z[0, 0] + z[1, 0] + z[4, 0]
        np.testing.assert_allclose(out[4, 0], expected_resume, rtol=1e-6)


class TestRolloutMaePowerlaw:
    def _synthetic(self, a=0.8, b=-1.2, time_unit=0.5, n_agents=6, t_frames=40):
        """Build label/pred so each horizon bucket's MAE is exactly
        e^b · t^a at the bucket's right edge t (constant error inside each
        bucket ⇒ the bucket mean equals that value ⇒ polyfit is exact)."""
        split_s = list(range(0, 12, 2))
        split_f = [int(t / time_unit) for t in split_s]
        T, N = t_frames, n_agents
        rng = np.random.default_rng(0)
        label = rng.normal(size=(T, N, 2))
        pred = label.copy()
        mask = np.zeros((T, N))
        for p in range(N):
            begin = p  # staggered entries
            end = begin + split_f[-1]
            mask[begin:end + 1, p] = 1
            for nb in range(1, len(split_f)):
                err = np.exp(b) * split_s[nb] ** a
                lo, hi = begin + split_f[nb - 1], begin + split_f[nb]
                pred[lo:hi, p, 0] += err  # unit-direction offset of norm err
        return label, pred, mask, time_unit, (a, b)

    def test_recovers_known_exponents(self):
        label, pred, mask, tu, (a, b) = self._synthetic()
        maes, a_hat, b_hat = rollout_mae_powerlaw(label, pred, mask, tu)
        split_s = np.arange(2, 12, 2)
        np.testing.assert_allclose(maes, np.exp(b) * split_s ** a, rtol=1e-6)
        assert a_hat == pytest.approx(a, abs=1e-6)
        assert b_hat == pytest.approx(b, abs=1e-6)

    def test_short_agents_excluded(self):
        """An agent simulated for less than split_s[-1] seconds must not
        enter the buckets even with a huge error (utils.py:113-116 valid
        gate)."""
        label, pred, mask, tu, (a, b) = self._synthetic()
        T, N = mask.shape
        label2 = np.concatenate([label, np.zeros((T, 1, 2))], axis=1)
        pred2 = np.concatenate([pred, np.full((T, 1, 2), 1e6)], axis=1)
        mask2 = np.concatenate([mask, np.zeros((T, 1))], axis=1)
        mask2[0:3, N] = 1  # present only 3 frames ≪ split_f[-1]
        maes, a_hat, b_hat = rollout_mae_powerlaw(label2, pred2, mask2, tu)
        assert a_hat == pytest.approx(a, abs=1e-6)
        assert b_hat == pytest.approx(b, abs=1e-6)

    def test_nan_fit_when_insufficient_buckets(self):
        """With no agent lasting the full horizon there is nothing to fit."""
        T, N = 6, 3
        label = np.zeros((T, N, 2))
        pred = np.ones((T, N, 2))
        mask = np.ones((T, N))  # 6 frames < split_f[-1] = 20 at tu=0.5
        maes, a_hat, b_hat = rollout_mae_powerlaw(label, pred, mask, 0.5)
        assert np.isnan(a_hat) and np.isnan(b_hat)
