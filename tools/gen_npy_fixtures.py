#!/usr/bin/env python3
"""Generate the real-NumPy cross-validation fixtures for NpySpec.

Writes a float32 matrix + int64 id vector with np.save (NumPy's own
writer — the interop counterpart our Scala reader must parse) into
src/test/resources/npy_cross/, and prints the float32 payload sum the
spec pins. Deterministic: fixed seed, fixed shape. Vendored outputs are
committed so `sbt test` exercises the interop everywhere without
needing a Python toolchain on the box (r17 ask #7).
"""
import numpy as np
import os

out = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "npy_cross")
os.makedirs(out, exist_ok=True)

rng = np.random.RandomState(42)
vecs = rng.standard_normal((20, 8)).astype(np.float32)
ids = np.arange(100, 120, dtype=np.int64)

np.save(os.path.join(out, "x.vec.npy"), vecs)
np.save(os.path.join(out, "x.ids.npy"), ids)

# the reference sum, accumulated by numpy over the float32 payload —
# the spec asserts our double-fold agrees to float32 epsilon, which
# proves the raw bits round-tripped through the Scala reader
print("rows:", vecs.shape, "ids:", ids[0], "..", ids[-1])
print("float32 sum:", repr(float(vecs.sum())))
