"""Bit-exact reimplementation of glibc's rand() (TYPE_3 additive generator).

The reference seeds C ``rand()`` with ``srand(2448422 + first_local_row)``
(multilevel/par_multilevel.hpp:209-219) to form deterministic CF-splitting
weights. Reproducing those weights bit-exactly lets our hierarchies match
the reference's default-constructed solvers.

Algorithm (glibc stdlib/random_r.c, TYPE_3: degree 31, separation 3):
  r[0] = seed
  r[i] = (16807 * r[i-1]) % 2147483647  for i in 1..30  (signed Schrage)
  r[i] = r[i-31]                        for i in 31..33
  r[i] = (r[i-31] + r[i-3]) mod 2^32    for i >= 34
  output_k = r[k] >> 1 with the first output at k = 344.
"""

from __future__ import annotations

import numpy as np


class GlibcRand:
    def __init__(self, seed: int):
        seed = seed & 0xFFFFFFFF
        if seed == 0:
            seed = 1
        r = [0] * 34
        r[0] = seed
        for i in range(1, 31):
            # Schrage's method on signed int32, matching glibc exactly
            hi, lo = divmod(r[i - 1], 127773)
            word = 16807 * lo - 2836 * hi
            if word < 0:
                word += 2147483647
            r[i] = word
        for i in range(31, 34):
            r[i] = r[i - 31]
        self.r = r
        for _ in range(310):
            self._next()

    def _next(self) -> int:
        r = self.r
        val = (r[-31] + r[-3]) & 0xFFFFFFFF
        r.append(val)
        if len(r) > 64:
            del r[:31]
        return val >> 1

    def rand(self) -> int:
        return self._next()

    def random_doubles(self, n: int) -> np.ndarray:
        """double(rand())/RAND_MAX as the reference computes weights."""
        return np.array([self._next() for _ in range(n)],
                        dtype=np.float64) / 2147483647.0


def form_rand_weights(local_n: int, first_n: int) -> np.ndarray:
    """form_rand_weights (par_multilevel.hpp:209-219)."""
    from raptor_tpu import native
    if native.available():
        return native.glibc_rand_doubles(2448422 + first_n, local_n)
    return GlibcRand(2448422 + first_n).random_doubles(local_n)
