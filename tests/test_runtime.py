"""Runtime helper tests: compile cache config, profiler context, timer."""

import os
import time
from unittest.mock import patch

import jax

from tinydiffusionmodels_tpu.runtime import (
    StepTimer,
    enable_compile_cache,
    profile_trace,
)


class TestCompileCache:
    def test_sets_cache_dir(self, tmp_path):
        with patch.dict(os.environ, {"TDM_COMPILE_CACHE": "1"}):
            enable_compile_cache(str(tmp_path / "cache"))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")

    def test_opt_out(self, tmp_path):
        before = jax.config.jax_compilation_cache_dir
        with patch.dict(os.environ, {"TDM_COMPILE_CACHE": "0"}):
            enable_compile_cache(str(tmp_path / "nope"))
        assert jax.config.jax_compilation_cache_dir == before


class TestProfileTrace:
    def test_noop_without_logdir(self):
        with profile_trace(None):
            pass  # must not start a trace or raise

    def test_trace_writes_files(self, tmp_path):
        with profile_trace(str(tmp_path / "trace")):
            jax.block_until_ready(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))
        # jax.profiler writes a plugins/profile dir inside the logdir.
        assert any((tmp_path / "trace").rglob("*"))


class TestStepTimer:
    def test_rate(self):
        t = StepTimer()
        t.tick(10)
        time.sleep(0.01)
        assert 0 < t.rate() < 10 / 0.01 * 2
