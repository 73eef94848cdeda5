"""Object facades with reference-parity APIs over the functional ops core."""
