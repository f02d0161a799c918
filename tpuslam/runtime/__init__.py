"""Frame pipeline runtime: front-end extraction, perf tracing, logging."""
