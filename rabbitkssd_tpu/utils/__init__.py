"""Host-side utilities (heap emulation, timers, logging)."""
