"""Logical pipeline plans: config → DataFrame DAG → sinks."""
