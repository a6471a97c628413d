"""Effectful pipeline stages (SURVEY.md §2.1 S9-S11, §2.10 X1-X5).

The reference's network-bound stages — Selenium fetch, LLM extraction,
HTTP download — become *pluggable operators*: each stage is pure Spark
plumbing (mapInPandas with a declared output StructType, dead-letter
channel, per-partition resource reuse) around an injected effect
function. Tests and the driver's correctness gate run deterministic
fake effects; a production deployment swaps in real HTTP/LLM clients
without touching the plan shape.
"""
