"""Verify drive 2: C++ scopectl daemon + FresnelEnv oracle episode."""
import os
import re
import subprocess
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

proc = subprocess.Popen([os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "build", "scopectl"), "0", "64", "2", "0"],
                        stdout=subprocess.PIPE, text=True)
line = proc.stdout.readline()
m = re.match(r"LISTENING (\d+)", line)
assert m, line
port = int(m.group(1))
print("daemon port", port, flush=True)

from emx.scope import FresnelEnv, MicroscopeClient, SocketTransport

client = MicroscopeClient(SocketTransport(port=port))
env = FresnelEnv(client, max_shift=1.0, max_z_dist=0.7, z_scan_points=7,
                 max_episode_steps=12, seed=0)
obs = env.reset()
print("obs", obs.shape, "target_z", round(env.target_z, 3), flush=True)
done = False
steps = 0
while not done:
    shift = np.clip(env.target_z - env.z, -1.0, 1.0)
    obs, reward, done, info = env.step([shift])
    steps += 1
print(f"oracle episode: steps={steps} final distance={info['distance']:.4f}", flush=True)
assert steps <= 12 and info["distance"] < 0.2, (steps, info)

stack = env.collect_focal_series([-100.0, 0.0, 100.0])
print("focal series", np.asarray(stack).shape, flush=True)
assert np.asarray(stack).shape[0] == 3
env.close()
proc.wait(timeout=10)
print("SCOPE DRIVE PASSED", flush=True)
