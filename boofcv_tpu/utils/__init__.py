"""Support utilities: profiling/tracing, moving averages."""
