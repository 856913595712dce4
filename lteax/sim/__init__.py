"""Channel simulators for tests and BER/BLER sweeps."""
