"""Compile-platform resolution for auto-gated code paths.

Several modules pick between implementations at trace time — Pallas vs jnp
consensus counting (`ops.ransac`), tiled vs materialised NN evaluation
(`ops.metrics`), associative vs sequential Kalman scans (`models.fusion`),
gather strategies (`ops.alignment`). Those choices must be made against the
platform the traced program will actually COMPILE FOR, which is not always
the process default: a `jax.jit(..., in_shardings=NamedSharding(mesh, ...))`
program compiles for the mesh's devices, and a `jax.default_device(...)`
context retargets everything inside it. Round 3 shipped exactly this bug
(MULTICHIP_r03): `sim3_ransac` consulted the process default (real TPU) while
being traced into a program jitted for a virtual CPU mesh, emitted a
`pl.pallas_call`, and XLA aborted with "Only interpret mode is supported on
CPU backend".

The architecture after that fix:

* Every gated op takes an explicit ``platform`` argument ("cpu"/"tpu"/...).
* "auto" is resolved ONLY at explicit resolution boundaries — places where
  the target devices are known and tracing has not started: the public
  `models.fusion.fuse_core` wrapper (default device), `parallel.mesh._fused_fn`
  (mesh devices), `parallel.seqpar.fuse_ekf_rts_seqparallel` (mesh devices),
  the chunked host drivers, and `parallel.mesh.evaluate_batch` (the outputs'
  own sharding). :func:`resolve_platform` is that boundary helper.
* `effective_platform()` survives only inside this module, as the fallback
  oracle when no mesh/devices/sharding is available.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax


def effective_platform() -> str:
    """The platform a computation dispatched *now* on the default path runs
    on: honors an active ``jax.default_device(...)`` override (the committed
    device's platform); otherwise ``jax.default_backend()``.

    This is the process-default oracle — it CANNOT see a mesh or sharding a
    program will be jitted onto. Do not call it inside code that may be
    traced for non-default devices; accept a resolved ``platform`` argument
    and let a boundary call :func:`resolve_platform` instead.
    """
    dd = jax.config.jax_default_device
    if dd is not None:
        plat = getattr(dd, "platform", None)
        return plat if plat is not None else str(dd)
    return jax.default_backend()


def resolve_platform(
    platform: str = "auto",
    *,
    mesh=None,
    devices: Optional[Sequence] = None,
    sharding=None,
) -> str:
    """Resolve an ``"auto"`` platform choice against the actual target.

    Precedence: an explicit non-"auto" ``platform`` wins; then the ``mesh``'s
    devices; then ``devices``; then a ``sharding``'s device set; finally the
    process-default oracle (:func:`effective_platform`).

    Call this at RESOLUTION BOUNDARIES only — before tracing starts, where
    the target devices are known (see module docstring). The resolved string
    is then threaded explicitly through the traced code.
    """
    if platform != "auto":
        return platform
    if mesh is not None:
        return next(iter(mesh.devices.flat)).platform
    if devices:
        return devices[0].platform
    if sharding is not None:
        ds = getattr(sharding, "device_set", None)
        if ds:
            return next(iter(ds)).platform
    return effective_platform()
