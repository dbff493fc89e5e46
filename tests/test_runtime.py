"""dlsc_tpu.utils.runtime.wait_for_backend: outage-retry behavior.

The helper probes backend availability in fresh subprocesses (a failed
backend init is cached for the life of a process — see CLAUDE.md). Probes
are mocked here; the conftest's CPU backend is already initialized in the
test process, so the no-op path is exercised for real.
"""

import subprocess
import types
from unittest import mock

import pytest

from dlsc_tpu.utils import wait_for_backend

_OK = types.SimpleNamespace(returncode=0, stderr="")
_UNAVAILABLE = types.SimpleNamespace(
    returncode=1,
    stderr="RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE: "
           "TPU backend setup/compile error (Unavailable).",
)
_OTHER = types.SimpleNamespace(returncode=1, stderr="ImportError: boom")


def test_noop_when_backend_initialized():
    # conftest already initialized the CPU backend in this process; probing
    # could never help (init state is cached), so no subprocess may launch
    with mock.patch.object(subprocess, "run",
                           side_effect=AssertionError("must not probe")):
        wait_for_backend()


def _run_in_uninitialized_state(run_mock, max_probes=3):
    # simulate a fresh process (no backend yet) by mocking the init check
    from jax._src import xla_bridge

    patches = [mock.patch.object(subprocess, "run", side_effect=run_mock)]
    if hasattr(xla_bridge, "backends_are_initialized"):
        patches.append(mock.patch.object(
            xla_bridge, "backends_are_initialized", return_value=False))
    else:
        patches.append(mock.patch.object(xla_bridge, "_backends", {}))
    with patches[0], patches[1]:
        wait_for_backend(max_probes=max_probes)


def test_success_on_first_probe():
    calls = []
    _run_in_uninitialized_state(lambda *a, **k: (calls.append(1), _OK)[1])
    assert len(calls) == 1


def test_recovers_after_transient_unavailable():
    seq = [_UNAVAILABLE, _UNAVAILABLE, _OK]
    _run_in_uninitialized_state(lambda *a, **k: seq.pop(0))
    assert not seq  # all three probes consumed


def test_raises_after_max_probes():
    calls = []
    with pytest.raises(RuntimeError, match="after 3 probes"):
        _run_in_uninitialized_state(
            lambda *a, **k: (calls.append(1), _UNAVAILABLE)[1])
    assert len(calls) == 3


def test_fails_fast_on_non_transient_error():
    calls = []
    with pytest.raises(RuntimeError, match="unavailable"):
        _run_in_uninitialized_state(lambda *a, **k: (calls.append(1), _OTHER)[1])
    assert len(calls) == 1  # not the outage signature: no retries


# -- rng_key ($DLSC_RNG_IMPL) -------------------------------------------------

def test_rng_key_default_is_threefry(monkeypatch):
    import jax

    from dlsc_tpu.utils import rng_key

    monkeypatch.delenv("DLSC_RNG_IMPL", raising=False)
    k = rng_key(7)
    assert str(jax.random.key_impl(k)) == str(jax.random.key_impl(jax.random.key(7)))


def test_rng_key_env_selects_rbg_and_split_preserves_impl(monkeypatch):
    import jax

    from dlsc_tpu.utils import rng_key

    monkeypatch.setenv("DLSC_RNG_IMPL", "rbg")
    k = rng_key(7)
    impl = str(jax.random.key_impl(k))
    assert "rbg" in impl
    # all per-step keys derive via split/fold_in — impl must survive both
    k1, k2 = jax.random.split(k)
    assert "rbg" in str(jax.random.key_impl(k1))
    assert "rbg" in str(jax.random.key_impl(jax.random.fold_in(k2, 3)))
    # and the key is actually usable for mask generation
    mask = jax.random.bernoulli(k1, 0.5, (16,))
    assert mask.shape == (16,)
