"""Structured-Streaming surface. The reference's --stream mode is bounded
pipelined execution with no event-time semantics (SURVEY §2.10); here we
provide the idiomatic Spark superset: watermarks, tumbling/sliding windows,
and the batch twins used by the oracle harness."""
