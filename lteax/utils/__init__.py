"""Cross-cutting utilities: metrics, tracing, structured logging."""
