"""Examples must keep running — each is exercised as a subprocess on the
CPU backend (the reference treats runnable docs as part of the surface;
its Example functions are compiled and run by `go test`)."""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


@pytest.mark.parametrize(
    "script,expect",
    [
        ("reverb_file.py", "wrote"),
        ("live_mixing_desk.py", "added live"),
        ("mastering_chain.py", "peak after limiter"),
        ("sharded_flagship.py", "retuned threshold"),
        ("fm_receiver.py", "message correlation"),
        ("multihost_stream.py", "host 1: 200 chunks"),
        ("odd_shapes_and_fusion.py", "SNR vs oracle"),
        ("bursty_network_stream.py", "SNR vs float64 oracle"),
    ],
)
def test_example_runs(script, expect, tmp_path):
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    env["JAX_PLATFORMS"] = "cpu"
    if script in (
        "sharded_flagship.py",
        "odd_shapes_and_fusion.py",
        "bursty_network_stream.py",
    ):
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    if script == "multihost_stream.py":
        # self-launching 2-process demo: no --cpu flag, forces CPU itself
        out = subprocess.run(
            [sys.executable, os.path.join(EXAMPLES, script)],
            capture_output=True, text=True, timeout=280, env=env,
        )
        assert out.returncode == 0, out.stdout + out.stderr
        assert expect in out.stdout
        return
    args = [sys.executable, os.path.join(EXAMPLES, script), "--cpu"]
    if script == "reverb_file.py":
        args += [str(tmp_path / "in.wav"), str(tmp_path / "out.wav")]
    out = subprocess.run(
        args, capture_output=True, text=True, timeout=280, env=env
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert expect in out.stdout
