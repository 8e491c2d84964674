"""Command-line entry points (train / evaluate / demo / extract features)."""
