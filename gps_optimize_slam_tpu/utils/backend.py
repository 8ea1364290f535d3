"""Trace-time platform resolution for auto-gated code paths.

Several modules pick between implementations at trace time — Pallas vs jnp
consensus counting (`ops.ransac`), tiled vs materialised NN evaluation
(`ops.metrics`), associative vs sequential Kalman scans (`models.fusion`),
gather strategies (`ops.alignment`). `jax.default_backend()` alone is the
wrong oracle for that choice: it reports the process-level default platform
even inside a `jax.default_device(cpu_device)` context, where the traced
computation will in fact compile for (and run on) CPU. That exact pattern is
how bench.py cross-checks the TPU f32 result against a CPU f64 run in the
same process — routing it to a TPU-only Pallas kernel breaks the check.
"""

from __future__ import annotations

import jax


def effective_platform() -> str:
    """The platform a computation traced *now* will run on.

    Honors an active ``jax.default_device(...)`` override (the committed
    device's platform); otherwise falls back to ``jax.default_backend()``.
    """
    dd = jax.config.jax_default_device
    if dd is not None:
        plat = getattr(dd, "platform", None)
        return plat if plat is not None else str(dd)
    return jax.default_backend()
