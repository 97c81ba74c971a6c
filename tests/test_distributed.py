"""Multi-process jax.distributed validation (the fake-cluster substitute).

SURVEY.md §4: multi-host coverage without a real pod — spawn 2 OS processes
with 4 virtual CPU devices each, wire them with `parallel.init_distributed`
(localhost coordinator), build the 8-device GLOBAL mesh, and run the sharded
PPO collect+train through `F16SimRunner` in both. XLA inserts cross-process
collectives (Gloo on CPU; DCN on a real pod) for the gradient all-reduce.

Parity contract: both processes report identical scalar summaries, and those
match a single-process 8-device run of the same seeded workload — the
multi-host mechanism changes nothing numerically.
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multiproc_smoke.py")

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multiproc_summaries(tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("mpsmoke")
    port = _free_port()
    env = dict(os.environ)
    # the worker appends its own --xla_force_host_platform_device_count=4;
    # drop the 8-device flag this pytest process runs under
    env["XLA_FLAGS"] = ""
    procs, outs = [], []
    for pid in range(2):
        out = str(out_dir / f"p{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--num-processes", "2",
             "--process-id", str(pid),
             "--coordinator", f"localhost:{port}", "--out", out],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    summaries = []
    for proc, out in zip(procs, outs):
        stdout, _ = proc.communicate(timeout=600)
        assert proc.returncode == 0, stdout.decode()[-2000:]
        with open(out) as f:
            summaries.append(json.load(f))
    return summaries


def test_two_process_global_mesh(multiproc_summaries):
    s0, s1 = multiproc_summaries
    assert s0["process_count"] == s1["process_count"] == 2
    assert s0["global_devices"] == s1["global_devices"] == 8
    # both processes computed the SAME global result
    assert s0["reward_sum"] == s1["reward_sum"]
    assert s0["obs_abs_sum"] == s1["obs_abs_sum"]
    assert s0["metrics"] == s1["metrics"]
    for v in s0["metrics"].values():
        assert np.isfinite(v)


def test_multiproc_matches_single_process(multiproc_summaries):
    """The 2x4-device distributed run reproduces the single-process 8-device
    run of the identical seeded workload."""
    from neuralplane_tpu.algorithms.rl_config import RLConfig
    from neuralplane_tpu.envs import ControlEnv
    from neuralplane_tpu.parallel import make_mesh
    from neuralplane_tpu.runner import F16SimRunner

    cfg = RLConfig(buffer_size=8, data_chunk_length=4, ppo_epoch=2,
                   num_mini_batch=1, hidden_sizes=(16,),
                   act_hidden_sizes=(8,), recurrent_hidden_size=8)
    env = ControlEnv(num_envs=16, config="heading")
    runner = F16SimRunner(env, cfg, run_dir="/tmp/mp_single",
                          mesh=make_mesh())
    carry = runner._shard_carry(runner.init_carry(jax.random.PRNGKey(0)))
    carry, batch, _ = runner.collect(runner.train_state.params, carry)
    metrics = runner.train(batch)

    s0 = multiproc_summaries[0]
    np.testing.assert_allclose(float(batch.rewards.sum()), s0["reward_sum"],
                               rtol=1e-5)
    import jax.numpy as jnp
    np.testing.assert_allclose(float(jnp.abs(batch.obs).sum()),
                               s0["obs_abs_sum"], rtol=1e-5)
    for k, v in metrics.items():
        np.testing.assert_allclose(float(v), s0["metrics"][k], rtol=1e-4,
                                   atol=1e-6, err_msg=k)


def _run_two_process(env_name: str, prefix: str):
    import tempfile
    out_dir = tempfile.mkdtemp(prefix=prefix)
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = ""
    procs, outs = [], []
    for pid in range(2):
        out = os.path.join(out_dir, f"p{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--num-processes", "2",
             "--process-id", str(pid), "--env-name", env_name,
             "--coordinator", f"localhost:{port}", "--out", out],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    summaries = []
    for proc, out in zip(procs, outs):
        stdout, _ = proc.communicate(timeout=600)
        assert proc.returncode == 0, stdout.decode()[-2000:]
        with open(out) as f:
            summaries.append(json.load(f))
    return summaries


@pytest.mark.parametrize("env_name,prefix", [
    ("MultipleCombat", "mpteam"),
    # the weapon layer ([n, K] missile slots + locked-victim indices) rides
    # the same env-axis sharding: no cross-process traffic either
    ("MultipleCombatShoot", "mpshoot"),
])
def test_two_process_team_combat(env_name, prefix):
    """The team-combat MAPPO stack runs over the 2-process global mesh too:
    combat groups shard whole along the env axis, so the team game needs no
    cross-process traffic; both processes report identical results."""
    s0, s1 = _run_two_process(env_name, prefix)
    assert s0["global_devices"] == 8
    assert s0["reward_sum"] == s1["reward_sum"]
    assert s0["metrics"] == s1["metrics"]
    for v in s0["metrics"].values():
        assert np.isfinite(v)
