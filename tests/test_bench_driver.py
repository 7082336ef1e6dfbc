"""Driver-entry-point hooks: bench.py backend-init resilience.

The remote-TPU relay has been observed to report UNAVAILABLE on a cold
tunnel; bench.py is the round's single recorded measurement, so its
``_devices_with_retry`` must survive transient init failures (and still
fail loudly when the backend never comes up).
"""

from __future__ import annotations

import json
import pathlib
import sys

import jax.extend.backend
import pytest

# repo root (bench.py lives beside the package)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


def test_devices_retry_recovers(monkeypatch):
    real_devices = bench.jax.devices
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")
        return real_devices()

    cleared = {"n": 0}
    monkeypatch.setattr(bench.jax, "devices", flaky)
    monkeypatch.setattr(
        sys.modules["jax.extend.backend"],
        "clear_backends",
        lambda: cleared.__setitem__("n", cleared["n"] + 1),
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    devs = bench._devices_with_retry(attempts=5, wait_s=0)
    assert devs == real_devices()
    assert calls["n"] == 3  # two failures, then success
    assert cleared["n"] == 2  # backend cache cleared between attempts


def test_devices_retry_gives_up(monkeypatch):
    def always_down():
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    monkeypatch.setattr(bench.jax, "devices", always_down)
    monkeypatch.setattr(
        sys.modules["jax.extend.backend"], "clear_backends", lambda: None
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench._devices_with_retry(attempts=3, wait_s=0)


def test_import_does_not_clobber_cache_config():
    """bench configures its TPU compile cache only when run as a script;
    importing it (this suite) must leave conftest's cache dir in place."""
    assert bench.jax.config.jax_compilation_cache_dir == "/tmp/jax_test_cache"


def test_headline_emits_on_improvement_only(capsys):
    h = bench._Headline()
    h.update(100.0)
    h.update(50.0)   # regression: not re-printed
    h.update(200.0)  # improvement: printed
    lines = [
        json.loads(s) for s in capsys.readouterr().out.strip().splitlines()
    ]
    assert [r["value"] for r in lines] == [100.0, 200.0]
    assert all(
        r["metric"] == "bisenet_r18_infer_images_per_sec_1024x512"
        and r["unit"] == "img/s/chip"
        for r in lines
    )
    assert lines[-1]["vs_baseline"] == pytest.approx(200.0 / 300.0, abs=1e-3)


def test_headline_final_reprints_best(capsys):
    """The driver reads the LAST stdout line; emit_final must re-print the
    best row so a kill after any section still parses."""
    h = bench._Headline()
    h.update(1234.5)
    h.emit_final("test")
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1])["value"] == 1234.5


def test_headline_final_without_measurement_prints_nothing(capsys):
    bench._Headline().emit_final("test")
    assert capsys.readouterr().out == ""


def test_devices_no_retry_on_config_errors(monkeypatch):
    """Deterministic failures (unknown backend) surface immediately."""
    calls = {"n": 0}

    def unknown_backend():
        calls["n"] += 1
        raise RuntimeError("Unknown backend: 'axon'")

    monkeypatch.setattr(bench.jax, "devices", unknown_backend)
    monkeypatch.setattr(
        sys.modules["jax.extend.backend"], "clear_backends", lambda: None
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    with pytest.raises(RuntimeError, match="Unknown backend"):
        bench._devices_with_retry(attempts=5, wait_s=0)
    assert calls["n"] == 1  # no retries
