"""Native (C) backends: dav1d conformance shim, entropy coder."""
