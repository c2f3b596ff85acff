"""memory_utils tests (reference tests/test_memory_utils.py analog)."""

from office_person_detection_vit_tpu.utils.memory_utils import (
    cleanup_resources,
    live_device_bytes,
)


class _WithCleanup:
    def __init__(self):
        self.cleaned = False

    def cleanup(self):
        self.cleaned = True


class _RaisingCleanup:
    def cleanup(self):
        raise RuntimeError("boom")


def test_calls_cleanup_hooks():
    a, b = _WithCleanup(), _WithCleanup()
    cleanup_resources(a, b)
    assert a.cleaned and b.cleaned


def test_objects_without_cleanup_tolerated():
    cleanup_resources(object(), None, 42)


def test_raising_cleanup_does_not_propagate():
    ok = _WithCleanup()
    cleanup_resources(_RaisingCleanup(), ok)
    assert ok.cleaned


def test_live_device_bytes_nonnegative_int():
    n = live_device_bytes()
    assert isinstance(n, int) and n >= 0


def test_jit_cache_cleared_and_recompiles():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return x * 2

    f(jnp.ones(4)).block_until_ready()
    cleanup_resources()
    # still usable after clear_caches
    assert float(f(jnp.ones(4)).sum()) == 8.0
