"""`--one-cpu-tf` effectiveness tests (VERDICT round-1 item 7b).

The reference pins TF to one CPU thread per process
(`bids_registration.py:469-472`); our equivalent must set the XLA/BLAS env
vars BEFORE any jax backend client exists — otherwise the flag is cosmetic.
"""

import json
import os
import subprocess
import sys

import pytest

from multimodal_registration_tpu.onecpu import apply_one_cpu_env, one_cpu_requested

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestFlagParsing:
    def test_default_true(self):
        assert one_cpu_requested(["prog", "--model-path", "x"])

    def test_explicit_false(self):
        assert not one_cpu_requested(["prog", "--one-cpu-tf", "False"])
        assert not one_cpu_requested(["prog", "--one-cpu-tf=0"])

    def test_explicit_true(self):
        assert one_cpu_requested(["prog", "--one-cpu-tf", "true"])
        assert one_cpu_requested(["prog", "--one-cpu-tf=yes"])


class TestApply:
    def test_sets_env(self, monkeypatch):
        monkeypatch.delenv("XLA_FLAGS", raising=False)
        monkeypatch.delenv("OMP_NUM_THREADS", raising=False)
        assert apply_one_cpu_env(["prog"])
        assert "--xla_cpu_multi_thread_eigen=false" in os.environ["XLA_FLAGS"]
        assert os.environ["OMP_NUM_THREADS"] == "1"

    def test_noop_when_disabled(self, monkeypatch):
        monkeypatch.delenv("XLA_FLAGS", raising=False)
        assert not apply_one_cpu_env(["prog", "--one-cpu-tf", "False"])
        assert "xla_cpu_multi_thread_eigen" not in os.environ.get("XLA_FLAGS", "")


@pytest.mark.parametrize(
    "shim", ["3d_reg.py", "bids_registration.py", "bids_two_steps_registration.py"]
)
def test_env_applied_before_backend_init(shim, tmp_path):
    """Run the real shim with a probe: at the moment the pinning env is set,
    no jax backend client may exist yet (XLA reads XLA_FLAGS at client
    creation, so this is the invariant that makes the flag effective)."""
    probe = tmp_path / "probe.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["MMREG_ONECPU_PROBE"] = str(probe)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, shim), "--one-cpu-tf", "True"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    state = json.loads(probe.read_text())
    assert state["applied"]
    assert "--xla_cpu_multi_thread_eigen=false" in state["xla_flags"]
    assert not state["backend_initialized"], (
        "jax backend was already initialized when --one-cpu-tf was applied"
    )
