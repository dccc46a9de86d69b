"""Device compute kernels.

Every op has a spec-exact integer reference implementation (numpy,
batched) used for conformance-critical paths and as the test oracle for
the Pallas/TPU kernels. TPU variants live in ops/pallas/.
"""
