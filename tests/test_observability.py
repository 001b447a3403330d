"""Stats + profiling module tests (SURVEY §5.1 analogues)."""

import io
import sys

import pytest

from kjarni_tpu.core.profiling import (device_memory_report, host_memory_mb,
                                       print_memory_usage)
from kjarni_tpu.core.stats import GenerationStats, enable_stats, stats_enabled


class TestStats:
    def test_counters_and_tps(self):
        s = GenerationStats()
        s.start()
        s.mark_prefill(10)
        s.mark_decode_done(20)
        assert s.prompt_tokens == 10
        assert s.generated_tokens == 20
        assert s.prefill_tps >= 0
        assert s.decode_tps >= 0

    def test_print_gated_by_global_toggle(self, capsys):
        s = GenerationStats()
        s.start()
        s.mark_prefill(1)
        s.mark_decode_done(1)
        enable_stats(False)
        s.print_summary()
        assert capsys.readouterr().out == ""
        enable_stats(True)
        try:
            s.print_summary()
            out = capsys.readouterr().out
            assert "prefill" in out and "decode" in out
        finally:
            enable_stats(False)

    def test_toggle_roundtrip(self):
        enable_stats(True)
        assert stats_enabled()
        enable_stats(False)
        assert not stats_enabled()


class TestProfiling:
    def test_host_memory(self):
        m = host_memory_mb()
        assert m["rss_mb"] > 0
        assert m["peak_rss_mb"] >= m["rss_mb"] * 0.5

    def test_device_report_structure(self):
        report = device_memory_report()
        assert report
        assert all("device" in r for r in report)

    def test_print_memory_usage_runs(self, capsys):
        print_memory_usage()
        out = capsys.readouterr().out
        assert "host rss" in out

    def test_trace_annotate_context_managers(self, tmp_path):
        import jax.numpy as jnp
        from kjarni_tpu.core.profiling import annotate, trace
        with trace(tmp_path):
            with annotate("test-region"):
                jnp.sum(jnp.ones((8, 8))).block_until_ready()
        # a trace directory should have been produced
        assert any(tmp_path.iterdir())
