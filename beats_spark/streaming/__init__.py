"""Structured Streaming variants of the pipeline (memqueue/ACK
semantics map to triggers + checkpointing)."""
