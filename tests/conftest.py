"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding is validated on virtual CPU devices (no TPU pod in CI);
per the build plan all sharding tests use a `('data',)`/`('data','model')`
mesh over these 8 host devices.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import gc

import jax  # noqa: E402
import pytest  # noqa: E402

# jax may already be imported by sitecustomize with a TPU plugin registered;
# switching the platform via config (not env) still works pre-initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# parity tests compare against float32 torch; keep matmuls exact on CPU
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True, scope="module")
def _clear_xla_state_between_modules():
    """Drop compiled executables at every module boundary.

    One long pytest process accumulates hundreds of XLA:CPU compiled
    executables (plus torch oracles and the 8-device mesh) and the native
    compiler eventually segfaults in backend_compile_and_load (~265 tests
    in on this 1-core image).  tools/run_tests.py (per-file subprocesses)
    is the canonical full-suite runner; this fixture makes a bare
    ``pytest tests/`` survive too by releasing each module's executables
    before the next one compiles.  Held jitted fns recompile lazily, so
    cross-module behavior is unchanged.
    """
    yield
    jax.clear_caches()
    gc.collect()

# Real-corpus NLTK tests: this image ships no corpora and has no egress, so
# synthesize a tiny genuine data tree (tests/nltk_minicorpus.py) unless real
# corpora are already installed.  Runs at import so skipif gates see it.
def _ensure_nltk_data():
    import sys
    import tempfile

    try:
        import nltk.data
    except ImportError:  # pragma: no cover - nltk is baked into this image
        return
    try:
        nltk.data.find("corpora/wordnet")
        nltk.data.find("corpora/stopwords")
        nltk.data.find("tokenizers/punkt_tab/english/")
        return
    except LookupError:
        pass
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from nltk_minicorpus import install

    install(os.path.join(tempfile.gettempdir(), "mars_nltk_minidata"))


_ensure_nltk_data()
