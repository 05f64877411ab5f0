"""Autofocus / Fresnel-fringe-removal RL environment.

Gym-API-compatible (reset/step/action_space/observation_space, no gym
dependency) rebuild of the reference's `Fresnel_Env`
(em_env/fresnel_env.py:14-328): the agent shifts stage Z; reward derives
from proximity to the optimal z, which the env pre-computes by scanning z
and spline-interpolating the minimum of the kurtosis-of-Laplacian
sharpness metric (fresnel_env.py:163-208).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from emx.scope.protocol import MicroscopeClient


def fresnel_quantifier(img: np.ndarray, rectify: bool = True) -> float:
    """Fisher kurtosis of the image Laplacian; low values indicate absent
    Fresnel fringes (reference fresnel_env.py:163-179). With rectify, only
    Laplacian values >= mean contribute."""
    img = np.asarray(img, np.float32)
    lap = (
        -4 * img
        + np.roll(img, 1, 0) + np.roll(img, -1, 0)
        + np.roll(img, 1, 1) + np.roll(img, -1, 1)
    ).ravel()
    if rectify:
        lap = lap[lap >= lap.mean()]
    m = lap.mean()
    c = lap - m
    var = np.mean(c**2)
    if var < 1e-20:
        return 0.0
    return float(np.mean(c**4) / var**2 - 3.0)  # Fisher (-3)


def _spline_min(xs: np.ndarray, ys: np.ndarray, factor: int) -> float:
    """Minimum location by cubic-spline upsampling (the reference's
    InterpolatedUnivariateSpline argmin, fresnel_env.py:188-208)."""
    try:
        from scipy.interpolate import InterpolatedUnivariateSpline

        ius = InterpolatedUnivariateSpline(xs, ys)
        finer = np.linspace(xs[0], xs[-1], factor * len(xs))
        return float(finer[np.argmin(ius(finer))])
    except Exception:  # scipy-free fallback: parabolic around argmin
        i = int(np.argmin(ys))
        if 0 < i < len(xs) - 1:
            denom = ys[i - 1] - 2 * ys[i] + ys[i + 1]
            if abs(denom) > 1e-12:
                return float(xs[i] + 0.5 * (ys[i - 1] - ys[i + 1]) / denom
                             * (xs[1] - xs[0]))
        return float(xs[i])


@dataclasses.dataclass
class Box:
    low: float
    high: float
    shape: tuple

    def sample(self, rng=None):
        rng = rng or np.random.default_rng()
        return rng.uniform(self.low, self.high, self.shape).astype(np.float32)


class FresnelEnv:
    def __init__(
        self,
        client: MicroscopeClient,
        max_shift: float = 1.0,
        max_z_dist: float = 4.0,
        z_scan_points: int = 9,
        x_bounds: tuple[float, float] = (0.0, 256.0),
        y_bounds: tuple[float, float] = (0.0, 256.0),
        interp_factor: int = 8,
        proximity: float = 0.1,
        max_episode_steps: int = 32,
        seed: int = 0,
        scan_halfwidth: float | None = None,
        rehome: bool = True,
    ):
        self.client = client
        self.max_shift = max_shift
        self.max_z_dist = max_z_dist
        # The kurtosis-of-Laplacian metric has a narrow minimum basin:
        # it peaks just off focus and DECAYS again at large defocus
        # (fringes wash out), so shot noise in the far tails can fall
        # below the in-focus minimum. Scanning the reference's full
        # +-max_z_dist window (fresnel_env.py:188-208) therefore lands
        # the spline argmin on a tail point a few z-units off often
        # enough to make proximity-judged evaluation unwinnable by any
        # policy. `scan_halfwidth` restricts the SCAN (not the episode
        # start range) to the metric's monotone basin.
        self.scan_halfwidth = (max_z_dist if scan_halfwidth is None
                               else scan_halfwidth)
        # Park the stage at the last scan-estimated focus before each
        # new field's scan (what an operator does between fields);
        # without it, one failed episode strands z outside the scan
        # window of the next reset and the target estimate drifts
        # unboundedly episode-over-episode.
        self.rehome = rehome
        self._home_z = 0.0
        self.z_scan_points = z_scan_points
        self.x_bounds = x_bounds
        self.y_bounds = y_bounds
        self.interp_factor = interp_factor
        self.proximity = proximity
        self.max_episode_steps = max_episode_steps
        self.rng = np.random.default_rng(seed)

        self.action_space = Box(-max_shift, max_shift, (1,))
        self.z = 0.0
        self.target_z = 0.0
        self.prev_diff = 0.0
        self._steps = 0
        obs = self.client.get_image()
        self.observation_space = Box(0.0, 1.0, obs.shape)

    # -- optimal-z estimation (fresnel_env.py:188-208) ----------------------
    def find_optimal_z(self) -> float:
        z0 = self.z
        zs = np.linspace(z0 - self.scan_halfwidth, z0 + self.scan_halfwidth,
                         self.z_scan_points)
        ks = np.empty_like(zs)
        for i, z in enumerate(zs):
            self.client.move_stage_abs(z=float(z))
            ks[i] = fresnel_quantifier(self.client.get_image())
        self.client.move_stage_abs(z=z0)
        return _spline_min(zs, ks, self.interp_factor)

    def collect_focal_series(self, defocuses) -> np.ndarray:
        return self.client.collect_focal_series(defocuses)

    # -- gym API -------------------------------------------------------------
    def reset(self):
        new_x = self.rng.uniform(*self.x_bounds)
        new_y = self.rng.uniform(*self.y_bounds)
        self.client.move_stage_abs(x=new_x, y=new_y)
        if self.rehome:
            self.client.move_stage_abs(z=float(self._home_z))
            self.z = float(self._home_z)
        self.target_z = self.find_optimal_z()
        self._home_z = self.target_z
        # Random starting offset from the optimum.
        start = self.target_z + self.rng.uniform(0.3, 1.0) * self.max_z_dist * (
            1 if self.rng.random() > 0.5 else -1
        )
        self.client.move_stage_abs(z=float(start))
        self.z = float(start)
        self.prev_diff = abs(self.target_z - self.z)
        self._steps = 0
        return self.client.get_image()

    def step(self, action):
        shift = float(np.clip(np.asarray(action).ravel()[0],
                              -self.max_shift, self.max_shift))
        self.client.shift_stage(dz=shift)
        self.z += shift
        ob = self.client.get_image()
        diff = abs(self.target_z - self.z)
        reward = 1.0 if diff <= self.prev_diff else -1.0
        self.prev_diff = diff
        self._steps += 1
        done = diff < self.proximity or self._steps >= self.max_episode_steps
        return ob, reward, done, {"distance": diff}

    def close(self):
        self.client.terminate()


class StackedFresnelEnv:
    """Observation wrapper for DQN autofocus: stacks the previous and
    current frames plus a constant plane encoding the last action's
    z-shift. Single-frame Fresnel contrast weakly encodes the defocus
    SIGN (under/overfocus fringes differ), but the (prev, cur, action)
    stack makes the improvement direction directly observable — the
    keras-rl agent in the reference gets the same effect from its
    window_length frame memory (em_env/fresnel_remover.py:96-101)."""

    def __init__(self, env: FresnelEnv, max_shift: float | None = None):
        self.env = env
        self.max_shift = float(max_shift if max_shift is not None
                               else env.max_shift)
        self._prev = None
        self.max_episode_steps = env.max_episode_steps

    @property
    def target_z(self):
        return self.env.target_z

    @property
    def z(self):
        return self.env.z

    def _stack(self, obs, action_z: float):
        a = np.full_like(obs, action_z / max(self.max_shift, 1e-9))
        prev = obs if self._prev is None else self._prev
        out = np.stack([prev, obs, a], axis=-1).astype(np.float32)
        self._prev = obs
        return out

    def reset(self):
        self._prev = None
        return self._stack(self.env.reset(), 0.0)

    def step(self, action):
        obs, reward, done, info = self.env.step(action)
        shift = float(np.asarray(action).ravel()[0])
        return self._stack(obs, shift), reward, done, info

    def close(self):
        self.env.close()
