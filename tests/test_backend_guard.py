"""utils.backend_guard — CLI tools must not hang on a wedged tunnel."""

import subprocess

import pytest

from go_dicom_codec_tpu.utils import backend_guard


def test_cpu_env_short_circuits(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert backend_guard.ensure_live_backend(timeout_s=0.001) is True


def test_hung_probe_falls_back_to_cpu(monkeypatch, capsys):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=kw["timeout"])

    monkeypatch.setattr(backend_guard.subprocess, "run", fake_run)
    assert backend_guard.ensure_live_backend(timeout_s=0.5) is False
    assert "unresponsive" in capsys.readouterr().err
    import jax
    assert jax.default_backend() == "cpu"


def test_failing_probe_falls_back(monkeypatch, capsys):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    class R:
        returncode = 139
    monkeypatch.setattr(backend_guard.subprocess, "run",
                        lambda *a, **kw: R())
    assert backend_guard.ensure_live_backend(timeout_s=0.5) is False
    assert "rc=139" in capsys.readouterr().err


def test_healthy_probe_keeps_backend(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    class R:
        returncode = 0
    monkeypatch.setattr(backend_guard.subprocess, "run",
                        lambda *a, **kw: R())
    assert backend_guard.ensure_live_backend(timeout_s=0.5) is True
