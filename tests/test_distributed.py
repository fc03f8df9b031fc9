"""Multi-host init: env heuristics (unit) + two-process dryrun (subprocess).

Reference analogue: detectron2.engine.launch / torch.distributed DDP
(train_effocr_localizer_d2.py:258-265).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_initialize_multihost_noop_on_single_host(monkeypatch):
    """No pod env vars -> no-op (jax.distributed.initialize not called)."""
    from effocr_tpu.core import distributed

    for k in ("MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)
    called = []
    monkeypatch.setattr(
        distributed.jax.distributed, "initialize",
        lambda **kw: called.append(kw),
    )
    distributed.initialize_multihost()
    assert called == []


def test_initialize_multihost_noop_on_single_worker_pod(monkeypatch):
    """TPU_WORKER_HOSTNAMES with one host -> still single-process no-op."""
    from effocr_tpu.core import distributed

    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "worker0")
    called = []
    monkeypatch.setattr(
        distributed.jax.distributed, "initialize",
        lambda **kw: called.append(kw),
    )
    distributed.initialize_multihost()
    assert called == []


def test_initialize_multihost_autodetects_multiworker_pod(monkeypatch):
    """Multi-worker pod env -> delegates to jax.distributed.initialize
    with auto-detected arguments (all None)."""
    from effocr_tpu.core import distributed

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "worker0,worker1")
    called = []
    monkeypatch.setattr(
        distributed.jax.distributed, "initialize",
        lambda **kw: called.append(kw),
    )
    distributed.initialize_multihost()
    assert called == [{
        "coordinator_address": None,
        "num_processes": None,
        "process_id": None,
    }]


def test_initialize_multihost_explicit_args(monkeypatch):
    """Explicit coordinator/rank (the launch() dist_url analogue) always
    initializes, regardless of env."""
    from effocr_tpu.core import distributed

    for k in ("MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)
    called = []
    monkeypatch.setattr(
        distributed.jax.distributed, "initialize",
        lambda **kw: called.append(kw),
    )
    distributed.initialize_multihost(
        coordinator_address="127.0.0.1:1234", num_processes=2, process_id=1
    )
    assert called == [{
        "coordinator_address": "127.0.0.1:1234",
        "num_processes": 2,
        "process_id": 1,
    }]


def test_two_process_dryrun():
    """Spawn 2 CPU processes, 8-device global mesh, one sharded train step;
    assert the replicated params stay bit-identical across processes
    (scripts/dryrun_multihost.py)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dryrun_multihost.py"),
         "--port", "37919"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multihost OK" in proc.stdout, proc.stdout
