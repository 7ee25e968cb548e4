"""Benchmark / application CLI (replaces test/benchmark)."""
