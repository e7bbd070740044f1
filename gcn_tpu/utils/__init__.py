"""Shared utilities (timing/benchmark helpers)."""
