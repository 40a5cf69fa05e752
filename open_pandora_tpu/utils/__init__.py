"""Host-side utilities: video IO, profiling, logging."""
