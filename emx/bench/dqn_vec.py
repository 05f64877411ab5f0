"""Reference-scale DQN autofocus on the batched jitted simulator.

The serial trainer (emx.bench.dqn_run) tops out ~13 env-steps/s on this
host — 20x short of the reference's 1.75M-step training budget
(em_env/fresnel_remover.py:93-118). VecFresnelEnv advances B episodes
per jitted call, and the agent's batched path (act_batch/observe_batch,
Double-DQN targets) trains from the shared replay buffer, which reaches
reference scale in under an hour of CPU.

Trains on a 512-specimen pool (the serial run's collapse mode was
overfitting its single training specimen: eval on an unseen specimen
scored below random). Evaluation is unchanged from dqn_run — greedy
policy on the raw serial FresnelEnv (scan-estimated target, unseen
specimen seed) against the random and hill-climb baselines — so the
numbers are directly comparable to the serial run's.

Usage: python -m emx.bench.dqn_vec [out_dir] [total_env_steps] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _save_policy(agent, out_dir: str) -> None:
    import jax

    flat = {"/".join(map(str, p)): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(agent.params)[0]}
    # np.savez appends ".npz" unless the name already ends with it —
    # the temp name must keep that suffix or os.replace misses the file.
    tmp = os.path.join(out_dir, "policy.tmp.npz")
    np.savez(tmp, **flat)
    os.replace(tmp, os.path.join(out_dir, "policy.npz"))


def main(out_dir: str = "docs/runs/dqn_autofocus",
         total_steps: int = 1_500_000, batch_envs: int = 128,
         train_steps_per_iter: int = 2, cpu: bool = True,
         policy_npz: str | None = None) -> dict:
    if cpu:
        # The sim + Q-net are small; per-iter tunnel latency on the axon
        # TPU path dwarfs the compute, and the chip belongs to the
        # denoiser/GAN jobs. jax is pre-imported (sitecustomize), so the
        # config update is required in addition to the env var.
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    from emx.bench.dqn_run import (hillclimb_policy, make_env,
                                   random_policy, run_policy)
    from emx.scope.dqn import DQNAgent, DQNConfig
    from emx.scope.vec_env import VecFresnelConfig, VecFresnelEnv
    from emx.utils.metrics import MetricsLogger

    os.makedirs(out_dir, exist_ok=True)
    vcfg = VecFresnelConfig(batch=batch_envs, image_size=48,
                            num_specimens=512, max_z_dist=3.0,
                            proximity=0.15, max_episode_steps=16,
                            specimen_seed=7)
    env = VecFresnelEnv(vcfg)
    cfg = DQNConfig(num_actions=7, features=(32, 64), max_shift=1.0,
                    gamma=0.95, learning_rate=3e-4,
                    eps_decay_steps=total_steps // 2, warmup=5_000,
                    target_update_every=1_000, buffer_size=80_000,
                    batch_size=256, double=True, seed=0)
    agent = DQNAgent((vcfg.image_size, vcfg.image_size, 3), cfg)
    logger = MetricsLogger(out_dir)

    if policy_npz:  # evaluate an already-trained policy (skip training)
        import jax as _jax

        flat = dict(np.load(policy_npz))
        leaves, treedef = _jax.tree_util.tree_flatten_with_path(agent.params)
        agent.params = _jax.tree_util.tree_unflatten(
            treedef, [np.asarray(flat["/".join(map(str, p))])
                      for p, _ in leaves])
        total_steps = 0

    state, obs = env.reset(seed=0)
    obs = np.asarray(obs)
    t0 = time.perf_counter()
    iters = total_steps // batch_envs
    done_dists: list[float] = []
    done_solved: list[float] = []
    for it in range(iters):
        actions = agent.act_batch(obs)
        shifts = agent.shifts[actions]
        state, next_obs, shaped, done, info = env.step(state, shifts)
        next_obs = np.asarray(next_obs)
        solved = np.asarray(info["solved"])
        # Same shaping as the serial trainer: distance closed, plus a
        # terminal bonus for crossing the proximity window.
        rewards = np.asarray(shaped) + 2.0 * solved
        agent.observe_batch(obs, actions, rewards, next_obs,
                            np.asarray(done), train_steps=train_steps_per_iter)
        d = np.asarray(done)
        if d.any():
            done_dists.extend(np.asarray(info["distance"])[d].tolist())
            done_solved.extend(solved[d].astype(np.float32).tolist())
        obs = next_obs
        if (it + 1) % 200 == 0:
            rate = agent.step_count / (time.perf_counter() - t0)
            logger.log(agent.step_count,
                       train_solve_rate=float(np.mean(done_solved or [0])),
                       train_final_distance=float(np.mean(done_dists or [0])),
                       epsilon=agent.epsilon(), env_steps_per_s=rate)
            done_dists, done_solved = [], []
        if (it + 1) % 1000 == 0:
            # Crash/timeout insurance: snapshot the policy so a killed
            # run can still be evaluated via policy_npz.
            _save_policy(agent, out_dir)
    train_s = time.perf_counter() - t0

    # Greedy eval on the vec env itself (fresh episodes, no exploration):
    # separates "policy didn't learn" from "serial-eval-env mismatch".
    vstate, vobs = env.reset(seed=4242)
    vec_dists, vec_solved = [], []
    while len(vec_dists) < 200:
        a = agent.act_batch(np.asarray(vobs), greedy=True)
        vstate, vobs, _, vdone, vinfo = env.step(vstate, agent.shifts[a])
        d = np.asarray(vdone)
        if d.any():
            vec_dists.extend(np.asarray(vinfo["distance"])[d].tolist())
            vec_solved.extend(
                np.asarray(vinfo["solved"])[d].astype(np.float32).tolist())
    vec_eval = {"solve_rate": round(float(np.mean(vec_solved)), 3),
                "mean_final_distance": round(float(np.mean(vec_dists)), 3),
                "episodes": len(vec_dists)}

    eval_env = make_env(seed=123)
    n_eval = 50

    def dqn_policy(o, rng, st):
        return agent.action_to_shift(agent.act(o, greedy=True)), None

    # true_z=0.0: make_env's SimulatedMicroscope has optimal_z=0, so the
    # scan-estimate-based env scoring can be reported alongside the
    # ground-truth focusing error.
    results = {
        "dqn": run_policy(eval_env, dqn_policy, n_eval, true_z=0.0),
        "random": run_policy(eval_env, random_policy, n_eval, true_z=0.0),
        "hillclimb": run_policy(eval_env, hillclimb_policy, n_eval,
                                true_z=0.0),
    }
    # Ground-truth-target rows (round-4 verdict next-7): the same
    # serial env, but reward/termination/distance all use the
    # simulator's true optimum (optimal_z=0) instead of the focal-scan
    # estimate — the clean policy-error number the confounded row above
    # cannot give (the estimate's own error dominated it).
    gt_env = make_env(seed=321)
    for name, pol in (("dqn_true_target", dqn_policy),
                      ("random_true_target", random_policy),
                      ("hillclimb_true_target", hillclimb_policy)):
        results[name] = run_policy(gt_env, pol, n_eval, true_z=0.0,
                                   target_override=0.0)
    summary = {
        "metric": "dqn_autofocus",
        "trainer": "vec",
        "policy_npz": policy_npz,
        "train_env_steps": agent.step_count,
        "train_gradient_steps": agent.train_count,
        "batch_envs": batch_envs,
        "train_s": round(train_s, 1),
        "env_steps_per_s": round(agent.step_count / train_s, 1),
        "vec_greedy_eval": vec_eval,
        "eval_episodes": n_eval,
        **{f"{k}_{m}": v for k, r in results.items() for m, v in r.items()},
        "beats_random": results["dqn"]["mean_return"]
        > results["random"]["mean_return"],
        "beats_hillclimb": results["dqn"]["mean_return"]
        > results["hillclimb"]["mean_return"],
        "beats_random_solve": results["dqn"]["solve_rate"]
        > results["random"]["solve_rate"],
        "beats_random_distance": results["dqn"]["mean_final_distance"]
        < results["random"]["mean_final_distance"],
        "beats_random_true_distance":
            results["dqn"]["mean_final_true_distance"]
            < results["random"]["mean_final_true_distance"],
        "beats_hillclimb_true_distance":
            results["dqn"]["mean_final_true_distance"]
            < results["hillclimb"]["mean_final_true_distance"],
        "gt_solve_rate": results["dqn_true_target"]["solve_rate"],
        "gt_mean_final_distance":
            results["dqn_true_target"]["mean_final_distance"],
        "beats_random_gt":
            results["dqn_true_target"]["mean_final_distance"]
            < results["random_true_target"]["mean_final_distance"],
        "beats_hillclimb_gt":
            results["dqn_true_target"]["mean_final_distance"]
            < results["hillclimb_true_target"]["mean_final_distance"],
    }
    with open(os.path.join(out_dir, "quality.json"), "w") as f:
        json.dump({"results": results, **summary}, f, indent=1)
    # Policy weights for reuse (emx.serve.artifact-style flat npz).
    _save_policy(agent, out_dir)
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "docs/runs/dqn_autofocus",
         int(a[1]) if len(a) > 1 else 1_500_000,
         int(a[2]) if len(a) > 2 else 128,
         policy_npz=a[3] if len(a) > 3 else None)
