"""Encoder algorithms: block geometry, mode decision, reconstruction."""
