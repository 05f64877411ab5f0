"""Microscope protocol / simulator / environment / DQN tests — the
fake-microscope strategy SURVEY.md §4 prescribes."""

import numpy as np
import pytest

from emx.scope import (
    FileTransport,
    FresnelEnv,
    Instruction,
    MicroscopeClient,
    SimulatedMicroscope,
    fresnel_quantifier,
)
from emx.scope.protocol import decode_program, encode_program
from emx.scope.sim import FileMarionette, InProcessTransport


def test_program_encode_decode_roundtrip():
    prog = [
        Instruction("EMSetStageZ", (1.5,)),
        Instruction("get_img", ("shot1",)),
        Instruction("EMChangeBeamShift", (0.25, -0.5)),
        Instruction("EMGetFocus"),
        Instruction("terminate"),
    ]
    text = encode_program(prog)
    out = decode_program(text)
    assert [i.op for i in out] == [i.op for i in prog]
    assert out[0].args == (1.5,)
    assert out[1].args == ("shot1",)
    assert out[2].args == (0.25, -0.5)


def test_simulator_state_machine():
    scope = SimulatedMicroscope(image_size=32)
    client = MicroscopeClient(InProcessTransport(scope))
    client.move_stage_abs(x=10.0, y=20.0, z=1.5)
    assert client.get_stage() == (10.0, 20.0, 1.5)
    client.shift_stage(dx=-2.0, dz=0.5)
    assert client.get_stage() == (8.0, 20.0, 2.0)
    client.set_focus(100.0)
    client.change_focus(-25.0)
    assert client.get_focus() == 75.0
    img = client.get_image()
    assert img.shape == (32, 32)
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_simulator_defocus_changes_image():
    scope = SimulatedMicroscope(image_size=32, dose=0)
    client = MicroscopeClient(InProcessTransport(scope))
    client.move_stage_abs(z=0.0)
    in_focus = client.get_image()
    client.move_stage_abs(z=3.0)
    defocused = client.get_image()
    assert not np.allclose(in_focus, defocused, atol=1e-3)


def test_fresnel_quantifier_prefers_focus():
    scope = SimulatedMicroscope(image_size=48, dose=0, optimal_z=0.0)
    client = MicroscopeClient(InProcessTransport(scope))
    ks = []
    for z in (-2.0, 0.0, 2.0):
        client.move_stage_abs(z=z)
        ks.append(fresnel_quantifier(client.get_image()))
    assert ks[1] < ks[0] and ks[1] < ks[2]


def test_file_transport_against_marionette(tmp_path):
    scope = SimulatedMicroscope(image_size=24, seed=1)
    paths = dict(
        change_path=str(tmp_path / "change.txt"),
        instr_path=str(tmp_path / "instr.txt"),
        state_path=str(tmp_path / "state.txt"),
    )
    marionette = FileMarionette(scope, img_dir=str(tmp_path / "imgs"),
                                **paths).start()
    try:
        client = MicroscopeClient(FileTransport(**paths, poll_s=0.01))
        client.move_stage_abs(z=2.0)
        assert client.get_stage()[2] == 2.0
        img = client.get_image()
        assert img.shape == (24, 24)
    finally:
        marionette.stop()


def test_focal_series_collection():
    scope = SimulatedMicroscope(image_size=24, dose=0)
    client = MicroscopeClient(InProcessTransport(scope))
    client.set_focus(50.0)
    stack = client.collect_focal_series([-100.0, 0.0, 100.0])
    assert stack.shape == (3, 24, 24)
    assert client.get_focus() == 50.0  # restored


def test_fresnel_env_episode():
    scope = SimulatedMicroscope(image_size=48, dose=0, optimal_z=0.0)
    env = FresnelEnv(MicroscopeClient(InProcessTransport(scope)),
                     max_shift=1.0, max_z_dist=0.7, z_scan_points=7,
                     max_episode_steps=8, seed=0)
    obs = env.reset()
    assert obs.shape == (48, 48)
    # Optimal-z estimate should be near the simulator's optimum.
    assert abs(env.target_z - scope.optimal_z) < 0.4
    total_steps = 0
    done = False
    while not done:
        # Oracle policy: move toward target.
        shift = np.clip(env.target_z - env.z, -1.0, 1.0)
        obs, reward, done, info = env.step([shift])
        total_steps += 1
    assert info["distance"] < 0.2
    assert total_steps <= 8


def test_dqn_agent_learns_interface():
    from emx.scope.dqn import DQNAgent, DQNConfig

    cfg = DQNConfig(num_actions=3, warmup=8, batch_size=4,
                    target_update_every=10, buffer_size=64)
    agent = DQNAgent((16, 16), cfg)
    rng = np.random.default_rng(0)
    obs = rng.random((16, 16)).astype(np.float32)
    losses = []
    for i in range(20):
        a = agent.act(obs)
        assert 0 <= a < 3
        next_obs = rng.random((16, 16)).astype(np.float32)
        loss = agent.observe(obs, a, 1.0, next_obs, i % 5 == 4)
        if loss is not None:
            losses.append(loss)
        obs = next_obs
    assert losses and all(np.isfinite(l) for l in losses)
    assert agent.action_to_shift(0) == -cfg.max_shift
