#!/usr/bin/env python
"""TPU worker health probe: exits 0 iff a trivial jit compiles AND runs
within --timeout seconds. Used between device experiments — after a
worker crash/hang the axon backend can stall in restart backoff, which
otherwise reads as the NEXT experiment failing."""

import sys
import time


def main():
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    x = jnp.arange(1024, dtype=jnp.float32)
    y = jax.device_get(jax.jit(lambda v: (v * 2 + 1).sum())(x))
    dt = time.time() - t0
    ok = abs(float(y) - (1024 * 1023 + 1024)) < 1e-3
    print(f"health {'ok' if ok else 'BAD'} in {dt:.1f}s")
    sys.exit(0 if ok and dt < deadline else 1)


if __name__ == "__main__":
    main()
