"""Pure-Python specification implementations.

Bit-exact (IEEE double, identical operation order, platform libm) replicas
of the QVZ algorithm pieces whose floating-point and integer decisions are
baked into the bitstream. They serve as test oracles for the native C++
runtime and the JAX fast paths, and as a correct-by-construction fallback.
They are intentionally scalar and slow; production paths live in
qvz_tpu.native (host) and qvz_tpu.ops (device).
"""
