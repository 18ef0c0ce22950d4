"""Distributed spatial + data-pipeline operators (DataFrame-level plans)."""
