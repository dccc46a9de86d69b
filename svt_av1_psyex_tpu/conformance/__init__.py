"""Conformance oracles: dav1d decode harness + mirror stream decoder."""
